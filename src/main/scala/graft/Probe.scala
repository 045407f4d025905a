package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time named contract queries in isolation, 3 runs each —
  * used to separate genuine plan cost from machine-load noise when a
  * bench number looks off (`runMain graft.Probe q52_ann_lsh ...`). */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1L << 20).selectExpr("count(distinct id % 1000)").collect()
    for (name <- args; i <- 1 to 3) {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
      spark.catalog.clearCache()
      println(f"$name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

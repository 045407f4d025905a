package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark: times every SparkEntry query at the driver's SF.
  *
  * Each query is forced through the `noop` datasource (not `count()`):
  * noop consumes every row and every column downstream of the plan, so
  * Catalyst cannot prune away expression-heavy projections the way it can
  * under a count-only terminal — the timing covers the real work.
  *
  * The result JSON is printed to stdout AND written to a file
  * (`SPARK_GRAFT_BENCH_OUT`, default `bench_out.json`) so the driver can
  * parse it even when an sbt logger decorates stdout lines.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // parity with Verify
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/scheduler warmup on synthetic data so the first timed
    // query doesn't absorb session initialization (no fixture data is
    // touched or cached here)
    spark.range(1L << 20).selectExpr("count(distinct id % 1000)").collect()
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      val dt = (System.nanoTime() - t0) / 1e9
      // queries that persist multi-consumer intermediates (dedup family)
      // must not leave them pinned for later queries — both for memory
      // and so every timing is self-contained regardless of run order
      spark.catalog.clearCache()
      name -> dt
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    println(json)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    try Files.writeString(Paths.get(out), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    spark.stop()
  }
}

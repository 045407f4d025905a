package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders, SparkSession}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udf

/** The UDF/UDAF extension surface (SURVEY.md §2.2 last row).
  *
  * Kept deliberately small: built-ins and native expressions cover the
  * query catalog (Catalyst can optimize those; it cannot see into a Scala
  * closure). These exist to demonstrate — and test — the extension points
  * a user of the engine would reach for.
  */
object Udfs {

  /** Scala UDF: cosine similarity over float arrays (closure variant of
    * [[CosineSimilarity]] — same left-to-right accumulation). */
  val cosineSimUdf = udf { (a: Seq[Float], b: Seq[Float]) =>
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Typed Aggregator UDAF: exact weighted mean Σ(v·w)/Σw with a
    * two-field buffer — mergeable, so Spark can compute map-side
    * partials and combine across partitions. */
  object WeightedMean extends Aggregator[(Double, Double), (Double, Double), Double] {
    override def zero: (Double, Double) = (0.0, 0.0)
    override def reduce(b: (Double, Double), in: (Double, Double)): (Double, Double) =
      (b._1 + in._1 * in._2, b._2 + in._2)
    override def merge(a: (Double, Double), b: (Double, Double)): (Double, Double) =
      (a._1 + b._1, a._2 + b._2)
    override def finish(r: (Double, Double)): Double =
      if (r._2 == 0.0) Double.NaN else r._1 / r._2
    override def bufferEncoder: Encoder[(Double, Double)] =
      Encoders.tuple(Encoders.scalaDouble, Encoders.scalaDouble)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def weightedMean: Column = org.apache.spark.sql.functions.udaf(WeightedMean)
    .apply(org.apache.spark.sql.functions.col("value"), org.apache.spark.sql.functions.col("weight"))

  /** Register the SQL-callable forms on a session. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("cosine_sim", cosineSimUdf)
    spark.udf.register("weighted_mean", org.apache.spark.sql.functions.udaf(WeightedMean))
    CosineSimilarity.register(spark)
  }
}

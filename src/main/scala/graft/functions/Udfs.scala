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

  /** Typed Aggregator UDAF: weighted mean Σ(v·w)/Σw with a two-field
    * buffer — mergeable, so Spark computes map-side partials and combines
    * across partitions.
    *
    * The buffer accumulates in exact `BigDecimal` arithmetic (each double
    * quantized via `BigDecimal.valueOf`, i.e. its shortest decimal
    * representation — the identity mapping for the fixtures' 2-dp money
    * values), so the sum is order-independent and the final
    * double-division result is deterministic under any partitioning —
    * which is what lets q57 hash-match DuckDB's
    * `CAST(SUM(decimal v*w) AS DOUBLE) / CAST(SUM(decimal w) AS DOUBLE)`
    * exactly. Same discipline as [[graft.functions.Decimals]]: exact
    * decimal until the last step, IEEE double only at the output. */
  object WeightedMean extends Aggregator[(Double, Double), (java.math.BigDecimal, java.math.BigDecimal), Double] {
    private val Zero = java.math.BigDecimal.ZERO
    override def zero: (java.math.BigDecimal, java.math.BigDecimal) = (Zero, Zero)
    override def reduce(
        b: (java.math.BigDecimal, java.math.BigDecimal),
        in: (Double, Double)): (java.math.BigDecimal, java.math.BigDecimal) = {
      val v = java.math.BigDecimal.valueOf(in._1)
      val w = java.math.BigDecimal.valueOf(in._2)
      (b._1.add(v.multiply(w)), b._2.add(w))
    }
    override def merge(
        a: (java.math.BigDecimal, java.math.BigDecimal),
        b: (java.math.BigDecimal, java.math.BigDecimal)): (java.math.BigDecimal, java.math.BigDecimal) =
      (a._1.add(b._1), a._2.add(b._2))
    override def finish(r: (java.math.BigDecimal, java.math.BigDecimal)): Double =
      if (r._2.signum == 0) Double.NaN else r._1.doubleValue() / r._2.doubleValue()
    override def bufferEncoder: Encoder[(java.math.BigDecimal, java.math.BigDecimal)] =
      Encoders.tuple(Encoders.DECIMAL, Encoders.DECIMAL)
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  def weightedMean(value: Column, weight: Column): Column =
    org.apache.spark.sql.functions.udaf(WeightedMean).apply(value, weight)

  def weightedMean: Column = weightedMean(
    org.apache.spark.sql.functions.col("value"), org.apache.spark.sql.functions.col("weight"))

  /** Register the SQL-callable forms on a session. */
  def registerAll(spark: SparkSession): Unit = {
    spark.udf.register("cosine_sim", cosineSimUdf)
    spark.udf.register("weighted_mean", org.apache.spark.sql.functions.udaf(WeightedMean))
    CosineSimilarity.register(spark)
  }
}

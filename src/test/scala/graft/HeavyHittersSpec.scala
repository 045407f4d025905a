package graft

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.functions._

import graft.functions.HeavyHitters
import graft.sources.Tables

/** Pins the Misra-Gries guarantees of [[HeavyHitters]] against exact
  * word counts — the sketch's contract is an error envelope, not exact
  * values (estimates are stream-order-dependent), so this spec is the
  * correctness net that a hash-oracle cannot be. */
class HeavyHittersSpec extends SparkSpec {

  private lazy val exact: Map[String, Long] = {
    Tables.documents(spark, sfDir)
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy("word").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  private lazy val sketch: Map[String, Long] = {
    val mg = udaf(HeavyHitters, Encoders.STRING)
    Tables.fanOut(Tables.documents(spark, sfDir))
      .select(explode(split(col("text"), " ")).as("word"))
      .agg(mg(col("word")).as("sketch"))
      .collect().head.getAs[Map[String, Long]]("sketch")
  }

  test("estimates never exceed true counts (decrement-only error)") {
    assert(sketch.nonEmpty && sketch.size <= HeavyHitters.K)
    sketch.foreach { case (w, est) =>
      val t = exact.getOrElse(w, 0L)
      assert(est <= t, s"'$w' est=$est exceeds true=$t")
    }
  }

  test("undercount stays within N/(K+1), merges included") {
    val n = exact.values.sum
    val bound = n / (HeavyHitters.K + 1)
    sketch.foreach { case (w, est) =>
      val t = exact(w)
      assert(t - est <= bound, s"'$w' true=$t est=$est error > $bound")
    }
  }

  test("every item above the N/(K+1) frequency threshold is present") {
    val n = exact.values.sum
    val threshold = n / (HeavyHitters.K + 1)
    val mustHave = exact.filter(_._2 > threshold).keySet
    assert(mustHave.nonEmpty, "fixture must contain heavy hitters")
    val missing = mustHave -- sketch.keySet
    assert(missing.isEmpty, s"guaranteed heavy hitters absent: $missing")
  }

  test("q102 face returns the sketch top-10 with positive estimates") {
    val rows = graft.ops.TextOps.q102HeavyHitters.run(spark, sfDir).collect()
    assert(rows.nonEmpty && rows.length <= 10)
    assert(rows.forall(_.getAs[Long]("est_count") > 0))
    // the face must agree with the raw sketch it exposes
    rows.foreach { r =>
      val w = r.getAs[String]("word")
      assert(exact.contains(w), s"'$w' not a corpus word")
      assert(r.getAs[Long]("exact_count") == exact(w),
        s"'$w': emitted exact twin ${r.getAs[Long]("exact_count")} vs ${exact(w)}")
      assert(r.getAs[Boolean]("within_bound"),
        s"'$w': the emitted MG-guarantee verdict must hold")
    }
  }
}

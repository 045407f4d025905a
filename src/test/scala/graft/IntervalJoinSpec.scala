package graft

import org.apache.spark.sql.functions._

import graft.ops.Temporal
import graft.plans.Interval

/** The custom interval-join operator (logical node → strategy → exec). */
class IntervalJoinSpec extends SparkSpec {

  test("property: sweep exec equals a driver-side reference over random inputs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val genRow = for {
      key <- Gen.frequency(9 -> Gen.choose(1L, 3L).map(Option(_)), 1 -> Gen.const(Option.empty[Long]))
      t <- Gen.choose(0L, 40L) // dense → many duplicates, overlapping windows
    } yield (key, t)
    val genRows = Gen.listOfN(50, genRow)
    val W = 7L
    for (seed <- 1 to 8) {
      val lRows = genRows(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rRows = genRows(Gen.Parameters.default, Seed(seed + 200L)).get
        .zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
      val got = Interval.join(
        lRows.toDF("key", "ltime", "lid"), rRows.toDF("key", "rtime", "rid"),
        "key", "ltime", "rtime", W)
        .toDF("key", "ltime", "lid", "rkey", "rtime", "rid")
        .select(col("lid"), col("rid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).sorted
      val want = (for {
        (Some(lk), lt, lid) <- lRows
        (rk, rt, rid) <- rRows
        if rk.contains(lk) && rt >= lt - W && rt < lt
      } yield (lid, rid)).sorted
      assert(got.sameElements(want), s"seed $seed: got ${got.length}, want ${want.length}")
    }
  }

  test("q81 native interval join equals the sort-merge band formulation (q55) exactly") {
    val native = Temporal.q81IntervalNative.run(spark, sfDir).collect().map(_.toString)
    val composed = Temporal.q55IntervalJoin.run(spark, sfDir).collect().map(_.toString)
    assert(native.toSeq == composed.toSeq)
  }

  test("the plan is the custom exec with clustered+sorted children, no SMJ") {
    val df = Temporal.q81IntervalNative.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"), s"custom exec must appear:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastNestedLoopJoin")
      && !plan.contains("CartesianProduct"), s"no fallback operators:\n$plan")
    assert(plan.contains("hashpartitioning"), "children must be clustered on the key")
    assert(plan.contains("Sort "), "children must be sorted (key, time)")
  }
}

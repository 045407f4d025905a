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

  test("interval islands: tied start times accumulate in flag order (s, event_id)") {
    import spark.implicits._
    // user 1: two intervals share s=0 and the EARLIER event_id has the
    // LARGER e — the regression shape where an island-sum ordered by
    // (s, e) visited the short interval first and handed it the previous
    // island's id; then a genuine gap. user 2: rows tied on BOTH s and e
    // (event_id makes assignment deterministic).
    val iv = Seq(
      (1L, 1L, 0L, 100L), (1L, 2L, 0L, 10L), (1L, 3L, 200L, 250L),
      (2L, 1L, 0L, 50L), (2L, 2L, 0L, 50L), (2L, 3L, 100L, 150L))
      .toDF("user_id", "event_id", "s", "e")
    val got = Temporal.intervalIslands(iv)
      .select(col("user_id"), col("island"), col("start_us"), col("end_us"),
        col("covered"), col("n"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5))).toSet
    val want = Set(
      (1L, 1L, 0L, 100L, 100L, 2L), (1L, 2L, 200L, 250L, 50L, 1L),
      (2L, 1L, 0L, 50L, 50L, 2L), (2L, 2L, 100L, 150L, 50L, 1L))
    assert(got == want, s"tied-start islands mis-assigned: $got")
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

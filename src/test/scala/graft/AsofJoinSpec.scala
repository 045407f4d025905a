package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Temporal
import graft.plans.Asof

/** The custom as-of join operator (logical node → strategy → exec). */
class AsofJoinSpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def tiny() = {
    import spark.implicits._
    val quotes = Seq( // key, qtime, qid
      (1L, ts("2024-01-01 10:00:00"), 100L),
      (1L, ts("2024-01-01 10:00:00"), 101L), // tie on time: larger id must win
      (1L, ts("2024-01-01 10:05:00"), 102L),
      (2L, ts("2024-01-01 09:00:00"), 200L))
      .toDF("key", "qtime", "qid")
    val trades = Seq( // key, ttime, tid
      (1L, ts("2024-01-01 10:00:00"), 1L),  // equal time: match allowed
      (1L, ts("2024-01-01 10:03:00"), 2L),
      (2L, ts("2024-01-01 08:59:59"), 3L),
      (3L, ts("2024-01-01 00:00:00"), 4L))  // key with no left rows
      .toDF("key", "ttime", "tid")
    (trades, quotes)
  }

  test("streaming merge semantics: last match per key, ties by tie-break, outer nulls") {
    val (trades, quotes) = tiny()
    val out = Asof.join(trades, quotes, "key", "ttime", "qtime", Seq("qid"))
      .toDF("key", "ttime", "tid", "qkey", "qtime", "qid")
      .select(col("tid"), col("qid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(1L) == 101L, "equal-time quote matches, larger qid wins the tie")
    assert(out(2L) == 101L, "10:03 trade still sees the 10:00 quote (last <=)")
    assert(out(3L) == -1L, "9:00 quote is after the 8:59:59 trade: no match")
    assert(out(4L) == -1L, "key 3 has no quotes: outer null")
  }

  test("null keys never match (SQL equi-join semantics)") {
    import spark.implicits._
    val left = Seq(
      (Option.empty[Long], ts("2024-01-01 10:00:00"), 10L),
      (Option(1L), ts("2024-01-01 10:00:00"), 11L))
      .toDF("key", "ltime", "lid")
    val right = Seq(
      (Option.empty[Long], ts("2024-01-01 09:00:00"), 20L),
      (Option(1L), ts("2024-01-01 09:00:00"), 21L))
      .toDF("key", "rtime", "rid")
    val out = Asof.join(left, right, "key", "ltime", "rtime", Seq("rid"))
      .toDF("key", "ltime", "lid", "rkey", "rtime", "rid")
      .select(col("lid"), col("rid"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(10L) == -1L, "null-keyed left row must NOT pick up the null-keyed right row")
    assert(out(11L) == 21L, "non-null keys still match")
  }

  test("property: custom exec equals a driver-side reference over random inputs") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    import spark.implicits._
    val genRow = for {
      key <- Gen.frequency(9 -> Gen.choose(1L, 4L).map(Option(_)), 1 -> Gen.const(Option.empty[Long]))
      t <- Gen.choose(0L, 50L) // small domain → many duplicate times
    } yield (key, t)
    val genRows = Gen.listOfN(60, genRow)
    for (seed <- 1 to 8) {
      val lRows = genRows(Gen.Parameters.default, Seed(seed.toLong)).get
        .zipWithIndex.map { case ((k, t), i) => (k, t, i.toLong) }
      val rRows = genRows(Gen.Parameters.default, Seed(seed + 100L)).get
        .zipWithIndex.map { case ((k, t), i) => (k, t, 1000L + i) }
      val left = lRows.toDF("key", "ltime", "lid")
      val right = rRows.toDF("key", "rtime", "rid")
      val got = Asof.join(left, right, "key", "ltime", "rtime", Seq("rid"))
        .toDF("key", "ltime", "lid", "rkey", "rtime", "rid")
        .select(col("lid"), col("rid"))
        .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
      val want = lRows.map { case (k, lt, lid) =>
        lid -> (k match {
          case None => None
          case Some(key) => rRows.filter(r => r._1.contains(key) && r._2 <= lt)
            .sortBy(r => (r._2, r._3)).lastOption.map(_._3)
        })
      }.toMap
      assert(got == want, s"seed $seed")
    }
  }

  test("q63 native as-of equals the composed window formulation (q46) exactly") {
    val native = Temporal.q63AsofNative.run(spark, sfDir).collect().map(_.toString)
    val composed = Temporal.q46AsofJoin.run(spark, sfDir).collect().map(_.toString)
    assert(native.toSeq == composed.toSeq)
    assert(native.nonEmpty)
  }

  test("the plan is the custom exec with clustered+sorted children, no window, no SMJ") {
    val df = Temporal.q63AsofNative.run(spark, sfDir)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), s"custom exec must appear:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("WindowExec")
      && !plan.contains("CartesianProduct"), s"no fallback operators:\n$plan")
    // EnsureRequirements satisfied our distribution/ordering requirements
    assert(plan.contains("hashpartitioning"), "children must be clustered on the key")
    assert(plan.contains("Sort "), "children must be sorted (key, time)")
  }

  test("bucketed inputs satisfy the operator's distribution without a shuffle") {
    val (trades, quotes) = tiny()
    graft.sources.Sinks.writeBucketed(trades, "asof_trades_b", "key", 4)
    graft.sources.Sinks.writeBucketed(quotes, "asof_quotes_b", "key", 4)
    val out = Asof.join(spark.table("asof_trades_b"), spark.table("asof_quotes_b"),
      "key", "ttime", "qtime", Seq("qid"))
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed-by-key tables must feed the merge shuffle-free:\n$plan")
    assert(out.count() == 4)
    spark.sql("DROP TABLE IF EXISTS asof_trades_b")
    spark.sql("DROP TABLE IF EXISTS asof_quotes_b")
  }

  test("install is idempotent") {
    Asof.install(spark)
    Asof.install(spark)
    assert(spark.experimental.extraStrategies.count(_ == graft.plans.AsofJoinStrategy) == 1)
  }
}

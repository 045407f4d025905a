package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Temporal/reshaping operators Spark has no single built-in for:
  * as-of join (composed from a sorted window — preference order (a) of the
  * build rules: compose built-ins before writing a custom SparkPlan) and
  * pivot.
  */
object Temporal {
  import QueryDef.sql

  /** As-of join: for every purchase event, the same user's most recent
    * click at-or-before the purchase time.
    *
    * Implementation is the *sort-merge as-of* scale path: union both event
    * types, one shuffle on user_id, one ordered window pass carrying the
    * last-seen click — O(n log n), no per-purchase range-join explosion
    * (the naive `c.ts <= p.ts` join is quadratic in events-per-user; that
    * formulation is kept only in the DuckDB oracle where it's exact).
    * Tie-breaks (same-timestamp clicks) resolve to the highest event_id in
    * both formulations. */
  val q46AsofJoin: QueryDef = sql(
    "q46_asof_join",
    """WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT * FROM events WHERE event_type = 'click'),
      |j AS (SELECT p.event_id AS purchase_id, p.user_id, p.ts AS purchase_ts,
      |        c.event_id AS click_id, c.ts AS click_ts,
      |        ROW_NUMBER() OVER (PARTITION BY p.event_id
      |                           ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |      FROM p LEFT JOIN c ON c.user_id = p.user_id AND c.ts <= p.ts)
      |SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
      |FROM j WHERE rn = 1
      |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .filter(col("event_type").isin("click", "purchase"))
    // 'click' < 'purchase' lexicographically, so a click at exactly the
    // purchase timestamp sorts first and is visible to the purchase row.
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_type"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("lc",
        last(when(col("event_type") === "click",
          struct(col("ts"), col("event_id"))), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(
        col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"),
        col("lc.event_id").as("click_id"), col("lc.ts").as("click_ts"))
      .orderBy(col("purchase_id"))
  }

  /** Pivot: events reshaped to one row per user × one count column per
    * event type. Pivot values are pinned (not inferred) so the plan is a
    * single pass and the output schema is deterministic. */
  val q47Pivot: QueryDef = sql(
    "q47_pivot",
    """SELECT user_id,
      |  COUNT(*) FILTER (WHERE event_type = 'click') AS click,
      |  COUNT(*) FILTER (WHERE event_type = 'error') AS error,
      |  COUNT(*) FILTER (WHERE event_type = 'purchase') AS purchase,
      |  COUNT(*) FILTER (WHERE event_type = 'signup') AS signup,
      |  COUNT(*) FILTER (WHERE event_type = 'view') AS view
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val types = Seq("click", "error", "purchase", "signup", "view")
    val pivoted = Tables.events(s, dir)
      .groupBy(col("user_id"))
      .pivot("event_type", types)
      .count()
    types.foldLeft(pivoted)((df, t) => df.withColumn(t, coalesce(col(t), lit(0L))))
      .orderBy(col("user_id"))
  }

  /** Interval self-join: every (purchase, click) pair of the same user
    * where the click happened in the 10 minutes before the purchase — the
    * events-on-time-window theta join. Equi on user_id (so the shuffle is
    * keyed), range condition applied inside the join; at scale this is a
    * sort-merge join with a bounded time band, and the streaming face
    * (StreamingOps.purchaseClickJoin) runs the same condition with
    * watermark-bounded state. */
  val q55IntervalJoin: QueryDef = sql(
    "q55_interval_join",
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id, p.user_id,
      |  p.ts AS purchase_ts, c.ts AS click_ts
      |FROM events p JOIN events c
      |  ON c.user_id = p.user_id
      |  AND p.event_type = 'purchase' AND c.event_type = 'click'
      |  AND c.ts >= p.ts - INTERVAL 10 MINUTE AND c.ts < p.ts
      |ORDER BY purchase_id, click_id""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id").as("c_user"), col("ts").as("click_ts"))
    p.join(c, col("c_user") === col("user_id") &&
        col("click_ts") >= col("purchase_ts") - expr("INTERVAL 10 MINUTES") &&
        col("click_ts") < col("purchase_ts"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        col("purchase_ts"), col("click_ts"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  /** The same interval join through the CUSTOM OPERATOR path
    * ([[graft.plans.IntervalJoin]] → injected strategy →
    * [[graft.plans.IntervalJoinExec]]): one sweep per co-partitioned
    * sorted partition with a ring buffer holding only the rows inside
    * the 10-minute window — O(n + matches) versus the sort-merge
    * band-filter's per-key pair scan. Shares q55's oracle verbatim, so
    * the custom physical plan is hash-verified (the q63 pattern). */
  val q81IntervalNative: QueryDef = QueryDef(
    "q81_interval_native",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      graft.plans.Interval.join(p, c, "user_id", "purchase_ts", "click_ts", 10L * 60 * 1000 * 1000)
        .toDF("purchase_id", "user_id", "purchase_ts", "click_id", "r_user", "click_ts")
        .select(col("purchase_id"), col("click_id"), col("user_id"),
          col("purchase_ts"), col("click_ts"))
        .orderBy(col("purchase_id"), col("click_id"))
    },
    q55IntervalJoin.oracle)

  /** The same as-of join through the CUSTOM OPERATOR path
    * ([[graft.plans.AsofJoin]] logical node → injected strategy →
    * [[graft.plans.AsofJoinExec]] streaming merge): one forward pass per
    * co-partitioned sorted partition, no union/window row inflation.
    * Shares q46's DuckDB oracle verbatim — the custom physical plan is
    * itself hash-verified, the same proof pattern as q45 for the custom
    * expression. */
  val q63AsofNative: QueryDef = QueryDef(
    "q63_asof_native",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val p = ev.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("purchase_ts"))
      val c = ev.filter(col("event_type") === "click")
        .select(col("event_id").as("click_id"), col("user_id"), col("ts").as("click_ts"))
      graft.plans.Asof.join(p, c, "user_id", "purchase_ts", "click_ts", Seq("click_id"))
        .toDF("purchase_id", "user_id", "purchase_ts", "click_id", "r_user", "click_ts")
        .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
          col("click_id"), col("click_ts"))
        .orderBy(col("purchase_id"))
    },
    q46AsofJoin.oracle)

  val all: Seq[QueryDef] = Seq(
    q46AsofJoin, q47Pivot, q55IntervalJoin, q63AsofNative, q81IntervalNative)
}

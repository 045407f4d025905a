package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.Decimals._
import graft.sources.Tables

/** Relational batch operator inventory (SURVEY.md §2.2, rows "Scans" through
  * "Math/decimal" + JSON): one named query per operator family, each with a
  * DuckDB oracle.
  *
  * Scale posture (100 TB): constant-size dimensions (region, nation,
  * literal band tables, single query rows) carry an explicit `broadcast()`
  * hint; data-proportional dimensions (customer, supplier) deliberately do
  * NOT — the planner/AQE broadcasts them while they fit and switches to a
  * shuffle join at sizes where a forced broadcast would OOM. Fact-fact
  * joins shuffle on their join key only; every aggregate is a hash
  * aggregate with map-side partials; all
  * money arithmetic is DECIMAL (exact, order-independent → also
  * oracle-deterministic, see [[graft.functions.Decimals]]). Every query ends
  * in a deterministic ORDER BY on a unique key set.
  */
object Analytics {
  import QueryDef.sql

  /** TPC-H Q1-style pricing summary: hash aggregation with partial
    * (map-side) aggregates; group key cardinality is tiny so the shuffle
    * moves only pre-aggregated rows regardless of input scale. */
  val q01PricingSummary: QueryDef = sql(
    "q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2))) * (CAST(1 AS DECIMAL(3,2)) + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    // fanOut: four decimal products per row over a single-split scan —
    // the q59 pattern; decimal sums are partition-order-independent
    val l = Tables.fanOut(Tables.lineitem(s, dir).select(
      col("l_returnflag"), col("l_linestatus"),
      col("l_quantity"), col("l_extendedprice"), col("l_discount"), col("l_tax")))
    val one = lit(1).cast(DecimalType(3, 2))
    val discPrice = money(col("l_extendedprice")) * (one - rate(col("l_discount")))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(qty(col("l_quantity"))).as("sum_qty"),
        dsum(money(col("l_extendedprice"))).as("sum_base_price"),
        dsum(discPrice).as("sum_disc_price"),
        dsum(discPrice * (one + rate(col("l_tax")))).as("sum_charge"),
        davg(qty(col("l_quantity"))).as("avg_qty"),
        davg(money(col("l_extendedprice"))).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** TPC-H Q6-style selective scan: the three predicates and the 2-column
    * projection must reach the parquet reader (PushedFilters / ReadSchema)
    * so a 100 TB scan only decodes the row groups + columns it needs. */
  val q02SelectiveFilter: QueryDef = sql(
    "q02_selective_filter",
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.03 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount") >= 0.03 && col("l_discount") <= 0.07 &&
        col("l_quantity") < 24)
      .agg(
        dsum(money(col("l_extendedprice")) * rate(col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))
  }

  /** TPC-H Q3-style: broadcast dim (customer at this scale would be a
    * shuffle join; segment filter first prunes it), fact-fact shuffle join
    * on orderkey, agg, top-k. */
  val q03ShippingPriority: QueryDef = sql(
    "q03_shipping_priority",
    """SELECT l.l_orderkey,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  o.o_orderdate
      |FROM customer c
      |JOIN orders o ON c.c_custkey = o.o_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE c.c_mktsegment = 'BUILDING'
      |  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l.l_orderkey, o.o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
    val one = lit(1).cast(DecimalType(3, 2))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      // customer scales with the data (unlike nation/region): no forced
      // hint — the planner/AQE broadcasts the filtered segment while it
      // fits and falls back to a shuffle join at sizes where a forced
      // broadcast would OOM
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount")))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style star join: region/nation broadcast (25 + 5 rows always),
    * customer broadcast at small SF (AQE re-plans at scale), orders⋈lineitem
    * shuffles once on orderkey. */
  val q05LocalRevenue: QueryDef = sql(
    "q05_local_revenue",
    """SELECT n.n_name,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM region r
      |JOIN nation n ON n.n_regionkey = r.r_regionkey
      |JOIN customer c ON c.c_nationkey = n.n_nationkey
      |JOIN orders o ON o.o_custkey = c.c_custkey
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |WHERE r.r_name = 'ASIA'
      |  AND o.o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
      |  AND o.o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin) { (s, dir) =>
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, dir)
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val l = Tables.lineitem(s, dir)
    val one = lit(1).cast(DecimalType(3, 2))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey")) // data-proportional: AQE decides
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount")))).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** Left-semi join (EXISTS): orders that contain at least one heavy line.
    * Semi joins only ship the join key — at scale this is the cheapest way
    * to express EXISTS; never materialize the inner side. */
  val q06SemiJoin: QueryDef = sql(
    "q06_semi_join",
    """SELECT o.o_orderkey, o.o_totalprice
      |FROM orders o
      |WHERE EXISTS (SELECT 1 FROM lineitem l
      |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 48)
      |ORDER BY o.o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir).filter(col("l_quantity") >= 48)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_semi")
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  /** Left-anti join (NOT EXISTS): orders with no lineitems at all. */
  val q07AntiJoin: QueryDef = sql(
    "q07_anti_join",
    """SELECT o.o_orderkey, o.o_orderstatus
      |FROM orders o
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
      |ORDER BY o.o_orderkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val l = Tables.lineitem(s, dir)
    o.join(l, o("o_orderkey") === l("l_orderkey"), "left_anti")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .orderBy(col("o_orderkey"))
  }

  /** Theta/range join against a tiny literal band table — broadcast
    * nested-loop by construction; the band side never grows with data
    * scale so BNLJ stays O(rows × bands). */
  val q08RangeJoin: QueryDef = sql(
    "q08_range_join",
    """SELECT b.band, COUNT(*) AS n_parts,
      |  CAST(SUM(CAST(p.p_retailprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM part p
      |JOIN (VALUES ('low', CAST(900.0 AS DOUBLE), CAST(907.0 AS DOUBLE)),
      |             ('mid', CAST(907.0 AS DOUBLE), CAST(914.0 AS DOUBLE)),
      |             ('high', CAST(914.0 AS DOUBLE), CAST(921.0 AS DOUBLE))) AS b(band, lo, hi)
      |  ON p.p_retailprice >= b.lo AND p.p_retailprice < b.hi
      |GROUP BY b.band
      |ORDER BY b.band""".stripMargin) { (s, dir) =>
    import s.implicits._
    val bands = Seq(("low", 900.0, 907.0), ("mid", 907.0, 914.0), ("high", 914.0, 921.0))
      .toDF("band", "lo", "hi")
    Tables.part(s, dir)
      .join(broadcast(bands), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("band"))
      .agg(count(lit(1)).as("n_parts"), dsum(money(col("p_retailprice"))).as("sum_price"))
      .orderBy(col("band"))
  }

  /** Exact distinct aggregation. `count(distinct)` expands to a two-phase
    * partial-distinct plan in Spark — at 100 TB prefer
    * approx_count_distinct (HLL, one pass, mergeable) when tolerance
    * allows; the exact form is kept here because the oracle must be exact. */
  val q09DistinctUsers: QueryDef = sql(
    "q09_distinct_users",
    """SELECT event_type,
      |  COUNT(DISTINCT user_id) AS n_users,
      |  COUNT(*) AS n_events
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n_events"))
      .orderBy(col("event_type"))
  }

  /** Rollup (hierarchical grouping sets); NULL grouping markers are
    * COALESCEd so the output keys are unique and sortable. */
  val q10Rollup: QueryDef = sql(
    "q10_rollup",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(money(col("l_extendedprice"))).as("sum_price"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_price"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** Cube over two independent dimensions. */
  val q11Cube: QueryDef = sql(
    "q11_cube",
    """SELECT COALESCE(o_orderstatus, 'ALL') AS status,
      |  COALESCE(o_orderpriority, 'ALL') AS priority,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), dsum(money(col("o_totalprice"))).as("sum_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n"), col("sum_price"))
      .orderBy(col("status"), col("priority"))
  }

  /** Ranking window: top-3 parts per brand. One shuffle on the partition
    * key; rank early and filter so downstream only sees k rows/group. */
  val q12WindowRank: QueryDef = sql(
    "q12_window_rank",
    """SELECT p_brand, p_partkey, p_retailprice, rn
      |FROM (SELECT p_brand, p_partkey, p_retailprice,
      |        ROW_NUMBER() OVER (PARTITION BY p_brand
      |                           ORDER BY p_retailprice DESC, p_partkey) AS rn
      |      FROM part)
      |WHERE rn <= 3
      |ORDER BY p_brand, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
    Tables.part(s, dir)
      .select(col("p_brand"), col("p_partkey"), col("p_retailprice"),
        row_number().over(w).as("rn"))
      .filter(col("rn") <= 3)
      .orderBy(col("p_brand"), col("rn"))
  }

  /** Analytic window with explicit ROWS frame: per-customer running
    * revenue. Exact decimal running sum → double for output. */
  val q13WindowRunning: QueryDef = sql(
    "q13_window_running",
    """SELECT o_custkey, o_orderkey, o_orderdate,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)))
      |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        sum(money(col("o_totalprice"))).over(w).cast("double").as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  /** Time-RANGE window frame — the rolling feature-engineering shape:
    * per event, count + exact sum over the same user's trailing
    * 10 minutes. A RANGE frame is VALUE-determined, so rows with tied
    * timestamps all enter the frame regardless of their physical order —
    * deterministic where a ROWS frame over ties would not be. One
    * shuffle on user_id, one sorted pass; the sliding frame state is
    * bounded by the interval's event density. */
  val q82TimeRangeFrame: QueryDef = sql(
    "q82_time_range_frame",
    """SELECT event_id, user_id, ts,
      |  COUNT(*) OVER w AS n_10m,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_10m
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts
      |             RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    Tables.events(s, dir).createOrReplaceTempView("events_v")
    s.sql(
      """SELECT event_id, user_id, ts,
        |  COUNT(*) OVER w AS n_10m,
        |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE) AS sum_10m
        |FROM events_v
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts
        |             RANGE BETWEEN INTERVAL '10' MINUTE PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin)
  }

  /** Recursive CTE (Spark 4's WITH RECURSIVE): a 30-day date spine
    * drives calendar densification — daily order counts INCLUDING
    * zero-order days, the classic gap-filling shape that plain relational
    * SQL cannot express without a generated series. The spine is 30 rows
    * at any data scale (recursion depth, not data, bounds it); the join
    * against the fact side broadcasts the spine. */
  val q83RecursiveCte: QueryDef = sql(
    "q83_recursive_cte",
    """WITH RECURSIVE days(d) AS (
      |  SELECT DATE '1997-01-01'
      |  UNION ALL SELECT d + INTERVAL 1 DAY FROM days WHERE d < DATE '1997-01-30')
      |SELECT CAST(days.d AS DATE) AS day, COUNT(o.o_orderkey) AS n_orders
      |FROM days LEFT JOIN orders o ON CAST(o.o_orderdate AS DATE) = CAST(days.d AS DATE)
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    s.sql(
      """WITH RECURSIVE days(d) AS (
        |  SELECT DATE '1997-01-01'
        |  UNION ALL SELECT date_add(d, 1) FROM days WHERE d < DATE '1997-01-30')
        |SELECT CAST(days.d AS DATE) AS day, COUNT(o.o_orderkey) AS n_orders
        |FROM days LEFT JOIN orders_v o ON CAST(o.o_orderdate AS DATE) = days.d
        |GROUP BY 1
        |ORDER BY 1""".stripMargin)
  }

  /** VARIANT (Spark 4's semi-structured type): ingest the JSON props
    * column ONCE as a variant, then extract typed paths — the
    * shred-on-read shape that avoids re-parsing the JSON text per
    * extracted field (q19/q54 are the schema-full faces). The oracle
    * states the same relation over DuckDB's JSON extraction. */
  val q84Variant: QueryDef = sql(
    "q84_variant",
    """SELECT event_type,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  MAX(CAST(json_extract(props, '$.k') AS BIGINT)) AS max_k
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("v", expr("parse_json(props)"))
      .withColumn("k", expr("variant_get(v, '$.k', 'bigint')"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"), max(col("k")).as("max_k"))
      .orderBy(col("event_type"))
  }

  /** Global top-k: Spark plans orderBy+limit as TakeOrderedAndProject —
    * each partition keeps k rows, only k×partitions reach the driver. */
  val q14TopOrders: QueryDef = sql(
    "q14_top_orders",
    """SELECT o_orderkey, o_custkey, o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(10)
  }

  /** Custkeys of orders placed in [lo, hi) — shared by the set-op queries. */
  private def buyersIn(o: DataFrame, lo: String, hi: String): DataFrame = o
    .filter(col("o_orderdate") >= lit(lo).cast("timestamp") &&
      col("o_orderdate") < lit(hi).cast("timestamp"))
    .select(col("o_custkey"))

  /** Set operators: (buyers-in-1995 ∪ buyers-in-1996) minus big spenders.
    * UNION/INTERSECT/EXCEPT all reduce to shuffles on the full row — keys
    * only here, so the shuffle payload stays minimal. */
  val q15SetOps: QueryDef = sql(
    "q15_set_ops",
    """SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |UNION
      |SELECT o_custkey FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_totalprice > 450000
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val big = o.filter(col("o_totalprice") > 450000).select(col("o_custkey"))
    buyersIn(o, "1995-01-01", "1996-01-01")
      .union(buyersIn(o, "1996-01-01", "1997-01-01")).distinct()
      .except(big)
      .orderBy(col("o_custkey"))
  }

  /** Scalar string-function surface (all codegen'd built-ins). */
  val q16StringFns: QueryDef = sql(
    "q16_string_fns",
    """SELECT p_partkey,
      |  LOWER(p_brand) AS brand_lc,
      |  UPPER(p_name) AS name_uc,
      |  SUBSTR(p_type, 1, 3) AS type3,
      |  LENGTH(p_name) AS name_len,
      |  STRPOS(p_name, 'widget') AS widget_pos,
      |  REPLACE(p_name, ' ', '_') AS name_us,
      |  CONCAT(p_brand, ':', p_type) AS brand_type,
      |  p_name LIKE '%bolt%' AS is_bolt,
      |  REGEXP_EXTRACT(p_name, '([a-z]+) ([a-z]+)', 2) AS second_word
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .select(
        col("p_partkey"),
        lower(col("p_brand")).as("brand_lc"),
        upper(col("p_name")).as("name_uc"),
        substring(col("p_type"), 1, 3).as("type3"),
        length(col("p_name")).as("name_len"),
        instr(col("p_name"), "widget").as("widget_pos"),
        regexp_replace(col("p_name"), " ", "_").as("name_us"),
        concat(col("p_brand"), lit(":"), col("p_type")).as("brand_type"),
        col("p_name").like("%bolt%").as("is_bolt"),
        regexp_extract(col("p_name"), "([a-z]+) ([a-z]+)", 2).as("second_word"))
      .orderBy(col("p_partkey"))
  }

  /** Date/time function surface; month-level truncation and day diffs. */
  val q17DateFns: QueryDef = sql(
    "q17_date_fns",
    """SELECT YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  CAST(MAX(DATE_TRUNC('month', o_orderdate)) AS TIMESTAMP) AS month_start,
      |  DATE_DIFF('day', MAX(CAST(o_orderdate AS DATE)), DATE '2002-01-01') AS days_to_2002
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(
        count(lit(1)).as("n"),
        dsum(money(col("o_totalprice"))).as("sum_price"),
        max(date_trunc("month", col("o_orderdate"))).as("month_start"),
        datediff(lit("2002-01-01").cast("date"), max(col("o_orderdate").cast("date"))).as("days_to_2002"))
      .orderBy(col("y"), col("m"))
  }

  /** Arithmetic / modulo / floor-ceil surface, grouped by a computed key. */
  val q18MathFns: QueryDef = sql(
    "q18_math_fns",
    """SELECT l_orderkey % 7 AS bucket,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
      |  CAST(FLOOR(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) AS BIGINT) AS floor_avg_qty,
      |  CAST(CEIL(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)) AS BIGINT) AS ceil_avg_qty,
      |  SQRT(COUNT(*)) AS sqrt_n,
      |  ABS(CAST(MIN(CAST(l_discount AS DECIMAL(4,2))) - MAX(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)) AS disc_spread
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    val one = lit(1).cast(DecimalType(3, 2))
    Tables.lineitem(s, dir)
      .groupBy((col("l_orderkey") % 7).as("bucket"))
      .agg(
        count(lit(1)).as("n"),
        dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount")))).as("revenue"),
        floor(davg(qty(col("l_quantity")))).cast("long").as("floor_avg_qty"),
        ceil(davg(qty(col("l_quantity")))).cast("long").as("ceil_avg_qty"),
        sqrt(count(lit(1))).as("sqrt_n"),
        abs((min(rate(col("l_discount"))) - max(rate(col("l_discount")))).cast("double")).as("disc_spread"))
      .orderBy(col("bucket"))
  }

  /** JSON extraction from the events props payload. */
  val q19JsonFns: QueryDef = sql(
    "q19_json_fns",
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) > 50) AS n_big_k,
      |  COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val k = get_json_object(col("props"), "$.k").cast("long")
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        sum(k).as("sum_k"),
        count(when(k > 50, 1)).as("n_big_k"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  /** Schema-based JSON parsing (`from_json` into a typed struct — the
    * Catalyst-native path next to q19's per-path `get_json_object`). */
  val q54FromJson: QueryDef = sql(
    "q54_from_json",
    """SELECT event_type,
      |  CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k,
      |  COUNT(*) FILTER (WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) IS NOT NULL) AS n_parsed
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin) { (s, dir) =>
    val parsed = from_json(col("props"), org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType))))
    Tables.events(s, dir)
      .withColumn("j", parsed)
      .groupBy(col("event_type"))
      .agg(
        min(col("j.k")).as("min_k"),
        max(col("j.k")).as("max_k"),
        count(col("j.k")).as("n_parsed"))
      .orderBy(col("event_type"))
  }

  /** CASE WHEN bucketing + conditional aggregation. */
  val q20CaseWhen: QueryDef = sql(
    "q20_case_when",
    """SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
      |            WHEN o_totalprice < 300000 THEN 'mid'
      |            ELSE 'high' END AS price_band,
      |  COUNT(*) AS n,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
      |FROM orders
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(
        when(col("o_totalprice") < 100000, "low")
          .when(col("o_totalprice") < 300000, "mid")
          .otherwise("high").as("price_band"))
      .agg(
        count(lit(1)).as("n"),
        count(when(col("o_orderstatus") === "F", 1)).as("n_finished"),
        dsum(money(col("o_totalprice"))).as("sum_price"))
      .orderBy(col("price_band"))
  }

  /** Bag (multiset) set operators: INTERSECT ALL / EXCEPT ALL preserve
    * multiplicities — one row per matched occurrence. */
  val q50SetOpsAll: QueryDef = sql(
    "q50_set_ops_all",
    """SELECT 'int' AS op, o_custkey FROM (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |  INTERSECT ALL
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
      |UNION ALL
      |SELECT 'exc' AS op, o_custkey FROM (
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1996-01-01 00:00:00'
      |  EXCEPT ALL
      |  SELECT o_custkey FROM orders
      |  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00' AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00')
      |ORDER BY op, o_custkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val a = buyersIn(o, "1995-01-01", "1996-01-01")
    val b = buyersIn(o, "1996-01-01", "1997-01-01")
    a.intersectAll(b).select(lit("int").as("op"), col("o_custkey"))
      .union(a.exceptAll(b).select(lit("exc").as("op"), col("o_custkey")))
      .orderBy(col("op"), col("o_custkey"))
  }

  /** The SQL entry point: temp views + `spark.sql` with an uncorrelated
    * scalar subquery (global average spend as the threshold). The scalar
    * is decimal-summed so both engines agree on the boundary. */
  val q51SqlInterface: QueryDef = sql(
    "q51_sql_interface",
    """SELECT c.c_mktsegment, COUNT(*) AS n_big,
      |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_big
      |FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |WHERE o.o_totalprice >
      |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders)
      |GROUP BY c.c_mktsegment
      |ORDER BY c.c_mktsegment""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir).createOrReplaceTempView("orders_v")
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    val df = s.sql(
      """SELECT c.c_mktsegment, COUNT(*) AS n_big,
        |  CAST(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_big
        |FROM orders_v o JOIN customer_v c ON c.c_custkey = o.o_custkey
        |WHERE o.o_totalprice >
        |  (SELECT CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) FROM orders_v)
        |GROUP BY c.c_mktsegment
        |ORDER BY c.c_mktsegment""".stripMargin)
    // spark.sql analyzes eagerly, so the resolved plan survives the views;
    // drop them to keep the query free of session-level side effects
    s.catalog.dropTempView("orders_v")
    s.catalog.dropTempView("customer_v")
    df
  }

  /** NULL-aware anti join — `NOT IN (subquery)` over a NULLABLE outer
    * key, a physically distinct operator from q07's left_anti: ANSI
    * three-valued logic makes `k NOT IN (...)` NULL (→ filtered) when k
    * is NULL, where a plain anti join KEEPS null-keyed rows (no match).
    * Spark plans the single-column broadcastable form as a
    * BroadcastHashJoin with isNullAwareAntiJoin=true — streamed side
    * never shuffles; the build side is the (small) exclusion list. At
    * 100 TB that is exactly the blocklist-filter shape (drop documents
    * whose possibly-null source id sits on a denylist). */
  /** Typed cogroup (Dataset API surface): per-customer reconciliation of
    * the customer record against that customer's orders in one pass over
    * both groups — the `KeyValueGroupedDataset.cogroup` shape for logic
    * that needs BOTH sides' iterators at once (full-outer semantics with
    * arbitrary per-key Scala). Each side shuffles once on the key, then
    * groups stream pairwise — no materialized join product. Used when a
    * relational join+agg can't express the per-key program; here the
    * equivalent SQL exists and is the oracle. */
  val q87CogroupStats: QueryDef = sql(
    "q87_cogroup_stats",
    """SELECT COALESCE(c.c_custkey, o.o_custkey) AS custkey,
      |  COUNT(o.o_orderkey) AS n_orders,
      |  MAX(o.o_totalprice) AS max_order,
      |  MAX(c.c_acctbal) AS acctbal
      |FROM customer c FULL JOIN orders o ON o.o_custkey = c.c_custkey
      |GROUP BY 1
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    import s.implicits._
    val custs = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_acctbal")).as[(Long, Double)]
    val ords = Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
      .as[(Long, Long, Double)]
    custs.groupByKey(_._1).cogroup(ords.groupByKey(_._1)) { (k, cs, os) =>
      var n = 0L
      var mx = Option.empty[Double]
      os.foreach { o => n += 1; if (mx.forall(_ < o._3)) mx = Some(o._3) }
      Iterator.single((k, n, mx, cs.toList.headOption.map(_._2)))
    }.toDF("custkey", "n_orders", "max_order", "acctbal")
      .orderBy(col("custkey"))
  }

  /** SQL UDF (Spark 4: `CREATE FUNCTION ... RETURN <expr>`): a scalar
    * function declared IN SQL, inlined by Catalyst into the calling plan
    * — unlike a Scala UDF it stays codegen-friendly and optimizable
    * (constant folding, pushdown through it). The oracle inlines the
    * same expression; multiplication order is identical, so doubles
    * match bit-for-bit. */
  val q88SqlUdf: QueryDef = sql(
    "q88_sql_udf",
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1 - l_discount) * (1 + l_tax) AS margin
      |FROM lineitem
      |ORDER BY margin DESC, l_orderkey, l_linenumber
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem_udf_v")
    s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_margin(
            |  price DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS DOUBLE
            |RETURN price * (1 - disc) * (1 + tax)""".stripMargin)
    val df = s.sql(
      """SELECT l_orderkey, l_linenumber,
        |  graft_margin(l_extendedprice, l_discount, l_tax) AS margin
        |FROM lineitem_udf_v
        |ORDER BY margin DESC, l_orderkey, l_linenumber
        |LIMIT 10""".stripMargin)
    s.catalog.dropTempView("lineitem_udf_v")
    df
  }

  /** Z-order (Morton) interleave of two dimensions into one cluster key
    * — the storage-layout operator behind multi-dimensional data
    * skipping: range-partitioning + sorting by `zkey` gives parquet
    * files tight min/max on BOTH source dimensions, so scans filtered
    * on either prune files (what Delta's OPTIMIZE ZORDER does).
    * SinksSpec pins the layout property; this query hash-verifies the
    * bit arithmetic (10 bits per dimension, pure integer ops, identical
    * in both engines). */
  val q89ZorderKey: QueryDef = {
    val sparkTerms = (0 until 10)
      .map(i => s"shiftleft(shiftright(zx, $i) & 1, ${2 * i}) + shiftleft(shiftright(zy, $i) & 1, ${2 * i + 1})")
      .mkString(" + ")
    val duckTerms = (0 until 10)
      .map(i => s"(((zx >> $i) & 1) << ${2 * i}) + (((zy >> $i) & 1) << ${2 * i + 1})")
      .mkString(" + ")
    sql(
      "q89_zorder_key",
      s"""WITH b AS (SELECT event_id,
         |    user_id & 1023 AS zx,
         |    ((CAST(floor(epoch(ts)) AS BIGINT) // 60) % 1440) & 1023 AS zy
         |  FROM events)
         |SELECT event_id, CAST($duckTerms AS BIGINT) AS zkey
         |FROM b ORDER BY zkey, event_id LIMIT 100""".stripMargin) { (s, dir) =>
      zorderKeyed(Tables.events(s, dir), sparkTerms)
        .select(col("event_id"), col("zkey"))
        .orderBy(col("zkey"), col("event_id")).limit(100)
    }
  }

  /** events → (event_id, ..., zkey): shared by q89 and the SinksSpec
    * layout test. */
  def zorderKeyed(events: DataFrame, terms: String = null): DataFrame = {
    val t = if (terms != null) terms else (0 until 10)
      .map(i => s"shiftleft(shiftright(zx, $i) & 1, ${2 * i}) + shiftleft(shiftright(zy, $i) & 1, ${2 * i + 1})")
      .mkString(" + ")
    events
      .withColumn("zx", expr("user_id & 1023"))
      .withColumn("zy", expr("((CAST(ts AS LONG) div 60) % 1440) & 1023"))
      .withColumn("zkey", expr(s"CAST($t AS BIGINT)"))
  }

  /** SCD-2 upsert: apply a change-set to a dimension with effective
    * dating — changed members get their old version closed
    * (`valid_to` = change date, not current) plus a new open version;
    * unchanged members stay one current row. The change-set here is
    * derived deterministically (first urgent order promotes a customer
    * to the PRIORITY segment). Pure joins + union — at 100 TB each leg
    * shuffles once on the dimension key and the union is map-side; this
    * is the MERGE-free formulation for immutable storage (rewrite the
    * dimension snapshot, the lakehouse pattern). */
  val q90Scd2Upsert: QueryDef = sql(
    "q90_scd2_upsert",
    """WITH fu AS (SELECT o_custkey, MIN(o_orderdate) AS eff_date
      |            FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1)
      |SELECT c.c_custkey AS custkey, c.c_mktsegment AS segment,
      |  CAST(NULL AS DATE) AS valid_from, fu.eff_date AS valid_to, 0 AS is_current
      |FROM customer c JOIN fu ON fu.o_custkey = c.c_custkey
      |UNION ALL
      |SELECT c.c_custkey, 'PRIORITY', fu.eff_date, CAST(NULL AS DATE), 1
      |FROM customer c JOIN fu ON fu.o_custkey = c.c_custkey
      |UNION ALL
      |SELECT c.c_custkey, c.c_mktsegment, CAST(NULL AS DATE), CAST(NULL AS DATE), 1
      |FROM customer c ANTI JOIN fu ON fu.o_custkey = c.c_custkey
      |ORDER BY custkey, is_current""".stripMargin) { (s, dir) =>
    val fu = Tables.orders(s, dir)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey")).agg(min(col("o_orderdate")).as("eff_date"))
    val cust = Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"))
    val changed = cust.join(fu, cust("c_custkey") === fu("o_custkey"))
    val nullDate = lit(null).cast("date")
    val closed = changed.select(col("c_custkey").as("custkey"),
      col("c_mktsegment").as("segment"), nullDate.as("valid_from"),
      col("eff_date").as("valid_to"), lit(0).as("is_current"))
    val opened = changed.select(col("c_custkey").as("custkey"),
      lit("PRIORITY").as("segment"), col("eff_date").as("valid_from"),
      nullDate.as("valid_to"), lit(1).as("is_current"))
    val untouched = cust.join(fu, cust("c_custkey") === fu("o_custkey"), "left_anti")
      .select(col("c_custkey").as("custkey"), col("c_mktsegment").as("segment"),
        nullDate.as("valid_from"), nullDate.as("valid_to"), lit(1).as("is_current"))
    closed.unionByName(opened).unionByName(untouched)
      .orderBy(col("custkey"), col("is_current"))
  }

  val q86NullAwareAnti: QueryDef = {
    def text(o: String, c: String) =
      s"""SELECT o_orderstatus, COUNT(*) AS n_orders
         |FROM (SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
         |             ELSE o_custkey END AS k, o_orderstatus FROM $o) t
         |WHERE k NOT IN (SELECT c_custkey FROM $c WHERE c_acctbal < 0)
         |GROUP BY o_orderstatus
         |ORDER BY o_orderstatus""".stripMargin
    sql("q86_null_aware_anti", text("orders", "customer")) { (s, dir) =>
      Tables.orders(s, dir).createOrReplaceTempView("orders_naaj_v")
      Tables.customer(s, dir).createOrReplaceTempView("customer_naaj_v")
      val df = s.sql(text("orders_naaj_v", "customer_naaj_v"))
      s.catalog.dropTempView("orders_naaj_v")
      s.catalog.dropTempView("customer_naaj_v")
      df
    }
  }

  /** HLL sketch distinct — the one-pass mergeable scale path for q09's
    * exact two-phase count(distinct). Rows-only (sketch estimates are not
    * oracle-matchable by design); AnalyticsSpec bounds the error vs exact,
    * and the SAME contract is emitted as columns so the driver's rows
    * check sees it without a hash: (approx, exact twin, bound,
    * within_bound) — the 5%-relative-error bound in micro units,
    * self-evidently satisfied row by row. */
  val q48ApproxDistinct: QueryDef = QueryDef.rowsOnly("q48_approx_distinct") { (s, dir) =>
    Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        countDistinct(col("user_id")).as("exact_users"))
      .select(col("event_type"), col("approx_users"), col("exact_users"),
        expr("abs(approx_users - exact_users) * 1000000L DIV exact_users").as("err_micro"),
        lit(50000L).as("bound_micro"),
        (expr("abs(approx_users - exact_users) * 1000000L")
          <= col("exact_users") * 50000L).as("within_bound"))
      .orderBy(col("event_type"))
  }

  /** TPC-H Q2/Q11-flavored supplier ranking (no partsupp fixture, so the
    * cost relation is lineitem): revenue per supplier, top 3 per nation.
    * nation is a constant 25-row dim → forced broadcast; supplier is
    * data-proportional, so no hint — AQE broadcasts it while it fits
    * (as at fixture scale) and shuffles at sizes where a forced
    * broadcast would OOM. The agg is two-phase on (nation, supplier);
    * the per-nation top-k runs as WindowGroupLimit (rank pushed into the
    * shuffle), never a global sort. */
  val q56SupplierRanking: QueryDef = sql(
    "q56_supplier_ranking",
    """SELECT n_name, s_suppkey, s_name, revenue, rnk FROM (
      |  SELECT n_name, s_suppkey, s_name, revenue,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY revenue DESC, s_suppkey) AS INT) AS rnk
      |  FROM (
      |    SELECT n.n_name, s.s_suppkey, s.s_name,
      |      CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
      |    FROM lineitem l
      |    JOIN supplier s ON l.l_suppkey = s.s_suppkey
      |    JOIN nation n ON s.s_nationkey = n.n_nationkey
      |    GROUP BY n.n_name, s.s_suppkey, s.s_name))
      |WHERE rnk <= 3
      |ORDER BY n_name, rnk""".stripMargin) { (s, dir) =>
    val sup = Tables.supplier(s, dir)
    val nat = Tables.nation(s, dir)
    val l = Tables.lineitem(s, dir)
    val one = lit(1).cast(DecimalType(3, 2))
    val w = Window.partitionBy(col("n_name")).orderBy(col("revenue").desc, col("s_suppkey"))
    l.join(sup, col("l_suppkey") === col("s_suppkey")) // data-proportional: AQE decides
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("s_suppkey"), col("s_name"))
      .agg(dsum(money(col("l_extendedprice")) * (one - rate(col("l_discount")))).as("revenue"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select(col("n_name"), col("s_suppkey"), col("s_name"), col("revenue"), col("rnk"))
      .orderBy(col("n_name"), col("rnk"))
  }

  /** The UDAF extension point in the driver contract: weighted mean of
    * discount by quantity per return flag through
    * [[graft.functions.Udfs.WeightedMean]] (`functions.udaf`). The
    * Aggregator's buffer is exact decimal, so the result is
    * order-independent and hash-matches DuckDB's
    * `CAST(SUM(v·w) AS DOUBLE) / CAST(SUM(w) AS DOUBLE)`. */
  val q57WeightedMean: QueryDef = sql(
    "q57_weighted_mean",
    """SELECT l_returnflag,
      |  CAST(SUM(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
      |    / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS wavg_discount
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(graft.functions.Udfs.weightedMean(col("l_discount"), col("l_quantity")).as("wavg_discount"))
      .orderBy(col("l_returnflag"))
  }

  /** GROUPING SETS proper (the non-hierarchical case rollup/cube can't
    * express): per-returnflag totals, per-linestatus totals, and the grand
    * total — but NOT the (flag, status) pairs. One shuffle; Spark expands
    * the sets map-side like rollup. COALESCE labels make the three set
    * shapes disjoint in the output key space. */
  val q58GroupingSets: QueryDef = sql(
    "q58_grouping_sets",
    """SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
      |  COALESCE(l_linestatus, 'ALL') AS linestatus,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupingSets(
        Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus")), Seq.empty),
        col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(money(col("l_extendedprice"))).as("sum_price"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_price"), col("n"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** Statistical aggregates with deterministic results: mean, sample
    * stddev, and correlation derived from EXACT decimal power sums
    * (Σx, Σx², Σy, Σy², Σxy), converted to double once and combined in an
    * identical IEEE expression in both engines. The built-in
    * `stddev`/`corr` stream in doubles and are partition-order-dependent —
    * the same reason Decimals.dsum exists. At 100 TB the decimal power
    * sums are also the *mergeable* formulation (one map-side pass).
    *
    * The decimal→double casts go THROUGH A STRING in both engines:
    * price² sums carry ~17+ significant digits, where a direct
    * decimal→double cast double-rounds (Java's BigDecimal.doubleValue
    * divides two roundings; DuckDB divides int128 by 10^scale) and the
    * two engines can land one ulp apart. decimal→string is exact and
    * string→double is correctly rounded in both, so the detour is the
    * deterministic conversion. */
  val q59ExactStats: QueryDef = sql(
    "q59_exact_stats",
    """SELECT l_returnflag, n,
      |  sx / n AS mean_qty,
      |  SQRT((n * sxx - sx * sx) / (n * (n - 1))) AS std_qty,
      |  (n * sxy - sx * sy) / (SQRT(n * sxx - sx * sx) * SQRT(n * syy - sy * sy)) AS corr_qp
      |FROM (
      |  SELECT l_returnflag,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sy,
      |    CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS syy,
      |    CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxy
      |  FROM lineitem GROUP BY l_returnflag)
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val x = qty(col("l_quantity"))
    val y = money(col("l_extendedprice"))
    def dsumS(c: org.apache.spark.sql.Column) =
      sum(c).cast("string").cast("double")
    // fanOut: five DECIMAL(24,4) products per row are map-heavy enough
    // to dwarf the slim-row shuffle when the scan arrives single-split;
    // decimal sums are partition-order-independent, so the fan changes
    // nothing downstream
    val sums = Tables.fanOut(Tables.lineitem(s, dir)
        .select(col("l_returnflag"), col("l_quantity"), col("l_extendedprice")))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).cast("double").as("n"),
        dsumS(x).as("sx"), dsumS(x * x).as("sxx"),
        dsumS(y).as("sy"), dsumS(y * y).as("syy"),
        dsumS(x * y).as("sxy"))
    val n = col("n"); val sx = col("sx"); val sxx = col("sxx")
    val sy = col("sy"); val syy = col("syy"); val sxy = col("sxy")
    sums.select(
        col("l_returnflag"), n.as("n"),
        (sx / n).as("mean_qty"),
        sqrt((n * sxx - sx * sx) / (n * (n - lit(1)))).as("std_qty"),
        ((n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))).as("corr_qp"))
      .orderBy(col("l_returnflag"))
  }

  /** Exact interpolated percentiles (median / p95): Spark's `percentile`
    * and DuckDB's `quantile_cont` share the standard definition — linear
    * interpolation at rank (n-1)·q over the sorted values — so exact
    * percentiles are oracle-matchable (the approx path for 100 TB is
    * `approx_percentile`, same shape as q48's HLL vs exact distinct).
    * Inputs are 2-dp doubles; the interpolation arithmetic is the same
    * IEEE expression in both engines. */
  val q60Percentiles: QueryDef = sql(
    "q60_percentiles",
    """SELECT l_returnflag,
      |  quantile_cont(l_extendedprice, 0.5) AS p50_price,
      |  quantile_cont(l_extendedprice, 0.95) AS p95_price
      |FROM lineitem
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("ps"))
      .select(col("l_returnflag"),
        element_at(col("ps"), 1).as("p50_price"),
        element_at(col("ps"), 2).as("p95_price"))
      .orderBy(col("l_returnflag"))
  }

  /** Percentile sketch (q60's scale face): `approx_percentile` merges
    * bounded-size buffers instead of holding every value — mergeable,
    * one pass, map-side partials, the only formulation that works when a
    * group's values don't fit an executor. Rows-only in the contract
    * (sketch internals differ across engines); AnalyticsSpec pins the
    * accuracy-parameter error bound against q60's exact values, and the
    * same contract rides the output as columns — each sketch percentile
    * next to its exact twin, the 2%-relative bound in micro units, and
    * a row-level within_bound verdict — so the driver's rows check sees
    * the contract without a hash. (The exact twin is the audit face;
    * production serves the sketch columns alone.) */
  val q91ApproxPercentiles: QueryDef = QueryDef.rowsOnly(
    "q91_approx_percentiles") { (s, dir) =>
    val approx = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_percentile(l_extendedprice, array(0.5D, 0.95D), 10000)").as("ps"))
      .select(col("l_returnflag"),
        element_at(col("ps"), 1).as("p50_price"),
        element_at(col("ps"), 2).as("p95_price"))
    val exact = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.5D, 0.95D))").as("pe"))
      .select(col("l_returnflag"),
        element_at(col("pe"), 1).as("p50_exact"),
        element_at(col("pe"), 2).as("p95_exact"))
    approx.join(exact, "l_returnflag")
      .select(col("l_returnflag"), col("p50_price"), col("p95_price"),
        col("p50_exact"), col("p95_exact"),
        lit(20000L).as("bound_micro"),
        (abs(col("p50_price") - col("p50_exact")) <= col("p50_exact") * 0.02 &&
          abs(col("p95_price") - col("p95_exact")) <= col("p95_exact") * 0.02)
          .as("within_bound"))
      .orderBy(col("l_returnflag"))
  }

  /** Numeric histogram: fixed-width binning of a value distribution
    * (the `width_bucket` shape, written as floor arithmetic so both
    * engines bin identically). One hash aggregate over integer bucket
    * ids — at any scale this is a map-side-combined count, never a
    * sort; empty buckets are absent by construction (sparse output). */
  val q92Histogram: QueryDef = sql(
    "q92_histogram",
    """SELECT CAST(floor(l_extendedprice / 10000.0) AS INT) AS bucket,
      |  COUNT(*) AS n,
      |  MIN(l_extendedprice) AS lo,
      |  MAX(l_extendedprice) AS hi
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(expr("CAST(floor(l_extendedprice / 10000.0) AS INT)").as("bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("l_extendedprice")).as("lo"),
        max(col("l_extendedprice")).as("hi"))
      .orderBy(col("bucket"))
  }

  /** Mergeable HLL sketch pipeline (Datasketches via Spark 4's
    * `hll_sketch_agg`/`hll_union_agg`): stage 1 builds one sketch per
    * (event_type, day) — the pre-aggregation you'd PERSIST at 100 TB —
    * and stage 2 answers "distinct users over any day range" by merging
    * sketches, never rescanning raw events. Re-aggregatability is the
    * whole point: exact distinct counts cannot be combined across
    * partial aggregates, sketches can. Rows-only in the contract
    * (sketch bytes are engine-specific); ConsistencySpec pins the
    * estimate against q09's exact counts, and the same contract rides
    * the output as columns — estimate, exact twin, the 5% bound in
    * micro units, row-level within_bound — driver-visible without a
    * hash. (The exact twin is the audit face; production serves the
    * merged sketches alone.) */
  val q93HllMerge: QueryDef = QueryDef.rowsOnly("q93_hll_merge") { (s, dir) =>
    val approx = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(expr("hll_sketch_agg(user_id, 14)").as("sk"))
      .groupBy(col("event_type"))
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk, false))").as("approx_users"),
        count(lit(1)).as("n_days"))
    val exact = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("exact_users"))
    approx.join(exact, "event_type")
      .select(col("event_type"), col("approx_users"), col("n_days"),
        col("exact_users"),
        expr("abs(approx_users - exact_users) * 1000000L DIV exact_users").as("err_micro"),
        lit(50000L).as("bound_micro"),
        (expr("abs(approx_users - exact_users) * 1000000L")
          <= col("exact_users") * 50000L).as("within_bound"))
      .orderBy(col("event_type"))
  }

  /** Winsorization: robust statistics after clamping a value column to
    * its own [p05, p95] — the standard outlier treatment before
    * training-data normalization. The winsorized mean decomposes into
    * an EXACT decimal sum of in-range values plus count×bound for each
    * clamped tail (one multiplication and two additions in a fixed
    * order — deterministic doubles in both engines, where a naive
    * float sum of clamped values would be order-dependent). */
  val q94Winsorize: QueryDef = sql(
    "q94_winsorize",
    """WITH b AS (SELECT l_returnflag,
      |    quantile_cont(l_extendedprice, 0.05) AS p05,
      |    quantile_cont(l_extendedprice, 0.95) AS p95
      |  FROM lineitem GROUP BY 1)
      |SELECT l.l_returnflag, b.p05, b.p95,
      |  CAST(SUM(CASE WHEN l.l_extendedprice < b.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_below,
      |  CAST(SUM(CASE WHEN l.l_extendedprice > b.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_above,
      |  ((CAST(SUM(CASE WHEN l.l_extendedprice >= b.p05 AND l.l_extendedprice <= b.p95
      |              THEN CAST(l.l_extendedprice AS DECIMAL(12,2))
      |              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
      |    + (SUM(CASE WHEN l.l_extendedprice < b.p05 THEN 1 ELSE 0 END) * b.p05))
      |    + (SUM(CASE WHEN l.l_extendedprice > b.p95 THEN 1 ELSE 0 END) * b.p95))
      |    / COUNT(*) AS winsorized_mean
      |FROM lineitem l JOIN b ON l.l_returnflag = b.l_returnflag
      |GROUP BY 1, 2, 3
      |ORDER BY 1""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
    val bounds = li.groupBy(col("l_returnflag"))
      .agg(expr("percentile(l_extendedprice, array(0.05D, 0.95D))").as("ps"))
      .select(col("l_returnflag"),
        element_at(col("ps"), 1).as("p05"), element_at(col("ps"), 2).as("p95"))
    // the winsorizing pass is map-heavy (per-row decimal compares+sums
    // against broadcast bounds) — fan out the single-split scan; the
    // bounds pass above stays unfanned (percentile's buffer is the whole
    // column regardless of input partitioning)
    Tables.fanOut(li.select(col("l_returnflag"), col("l_extendedprice")))
      .join(broadcast(bounds), "l_returnflag")
      .groupBy(col("l_returnflag"), col("p05"), col("p95"))
      .agg(
        sum(when(col("l_extendedprice") < col("p05"), 1).otherwise(0)).as("n_below"),
        sum(when(col("l_extendedprice") > col("p95"), 1).otherwise(0)).as("n_above"),
        sum(when(col("l_extendedprice") >= col("p05") && col("l_extendedprice") <= col("p95"),
          col("l_extendedprice").cast("decimal(12,2)")).otherwise(lit(0).cast("decimal(12,2)")))
          .as("kept_sum"),
        count(lit(1)).as("n_total"))
      .select(col("l_returnflag"), col("p05"), col("p95"),
        col("n_below"), col("n_above"),
        (((col("kept_sum").cast("double")
          + (col("n_below") * col("p05")))
          + (col("n_above") * col("p95")))
          / col("n_total")).as("winsorized_mean"))
      .orderBy(col("l_returnflag"))
  }

  /** Fuzzy entity matching: near-identical names found by levenshtein
    * distance WITHIN a blocking key — the classic entity-resolution
    * shape, never corpus × corpus. `rows` is (key, block, name);
    * returns (key_a, key_b, edit_dist) for within-block pairs with
    * edit distance ≤ `maxDist`.
    *
    * Adaptive on the DISTINCT-name cardinality (counted up front — one
    * cheap aggregate):
    *
    * **Value-space path** (distinct names ≤ `valueSpaceLimit`): edit
    * distance is a function of the NAME PAIR, not the row pair — so on
    * low-cardinality attributes (the common entity-resolution case:
    * catalog names, brands, addresses drawn from a bounded vocabulary)
    * the DP runs once per distinct name pair (V² banded DPs, V=64 on
    * the fixture vs 8M row pairs), the surviving (name_a, name_b,
    * dist) relation broadcasts, and row pairs materialize by two
    * EQUI-joins — pair enumeration is then bounded by the TRUE match
    * count, never the block-pair count.
    *
    * **Pair-space path** (names are corpus-cardinality): enumerate
    * within-block pairs with two RECALL-EXACT codegen'd prefilters
    * ahead of the banded DP:
    *   1. length guard — ED ≤ d bounds |Δlen| by d;
    *   2. bag distance — each edit changes the character multiset by at
    *      most 2, so ED ≤ d ⇒ bag-L1 ≤ 2d. Letter counts (capped at 15
    *      — capping only shrinks the measured distance, keeping the
    *      bound safe) are packed once per NAME into two longs of 13
    *      nibbles; the pair test is 26 shift/mask/abs terms, ~10×
    *      cheaper than the DP. (Counting letters only stays safe for
    *      any alphabet: a sub-multiset's distance lower-bounds the full
    *      bag distance.)
    * Two alternative candidate schemes were measured at sf0.1 and
    * REJECTED (SCALE.md "Fuzzy matching"): a (block, length-bucket)
    * explode-join (lengths cluster into 2-3 buckets — 3× shuffle, no
    * pair cut) and PassJoin segment partitioning, Li et al. VLDB'11
    * (recall held, but the small name vocabulary aligns segments so
    * often that 4.3M of 8M pairs survived — slower than enumerating).
    * The under-split stream side fans out before enumeration (the 10×
    * lever — see Tables.fanOut). Both paths return identical answers
    * (the oracle's plain block-join formulation is the proof). */
  def fuzzyPairs(rows: DataFrame, maxDist: Int = 4,
                 valueSpaceLimit: Long = 4096L): DataFrame = {
    val names = rows.select(col("name")).distinct()
    if (names.count() <= valueSpaceLimit) {
      val nd = names.select(col("name").as("name_a"))
        .crossJoin(broadcast(names.select(col("name").as("name_b"))))
        .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b"), maxDist))
        .filter(col("edit_dist").between(0, maxDist))
      val a = rows.select(col("key").as("key_a"), col("block"), col("name").as("name_a"))
      val b = rows.select(col("key").as("key_b"), col("block"), col("name").as("name_b"))
      Tables.fanOut(a)
        .join(broadcast(nd), "name_a")
        .join(b, Seq("block", "name_b"))
        .filter(col("key_a") < col("key_b"))
        .select(col("key_a"), col("key_b"), col("edit_dist"))
    } else {
      def packHalf(half: Int): String = (0 until 13).map { j =>
        val ch = ('a' + half * 13 + j).toChar
        s"shiftleft(CAST(least(length(name) - length(replace(name, '$ch', '')), 15) AS BIGINT), ${4 * j})"
      }.mkString(" + ")
      val p = rows
        .select(col("key"), col("block"), col("name"),
          length(col("name")).as("len"),
          expr(packHalf(0)).as("h0"), expr(packHalf(1)).as("h1"))
      val a = p.select(col("key").as("key_a"), col("block"),
        col("name").as("name_a"), col("len").as("len_a"),
        col("h0").as("ha0"), col("h1").as("ha1"))
      val b = p.select(col("key").as("key_b"), col("block"),
        col("name").as("name_b"), col("len").as("len_b"),
        col("h0").as("hb0"), col("h1").as("hb1"))
      val bagL1 = expr((for (half <- 0 until 2; j <- 0 until 13) yield
        s"abs((shiftright(ha$half, ${4 * j}) & 15) - (shiftright(hb$half, ${4 * j}) & 15))")
        .mkString(" + "))
      Tables.fanOut(a)
        .join(b, Seq("block"))
        .filter(col("key_a") < col("key_b") &&
          abs(col("len_a") - col("len_b")) <= maxDist && bagL1 <= 2 * maxDist)
        // banded DP: the threshold overload computes only the |i-j| <= d
        // diagonal band (O(len·(2d+1)) vs O(len²)) and returns -1 past
        // it — exact for every row the <= d filter keeps
        .withColumn("edit_dist", levenshtein(col("name_a"), col("name_b"), maxDist))
        .filter(col("edit_dist").between(0, maxDist))
        .select(col("key_a"), col("key_b"), col("edit_dist"))
    }
  }

  val q97FuzzyMatch: QueryDef = sql(
    "q97_fuzzy_match",
    """SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
      |  levenshtein(a.p_name, b.p_name) AS edit_dist
      |FROM part a JOIN part b
      |  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
      |WHERE levenshtein(a.p_name, b.p_name) <= 4
      |ORDER BY key_a, key_b""".stripMargin) { (s, dir) =>
    fuzzyPairs(Tables.part(s, dir).select(
        col("p_partkey").as("key"), col("p_brand").as("block"), col("p_name").as("name")))
      .orderBy(col("key_a"), col("key_b"))
  }

  /** Ratio-to-report: each nation's share of its region's revenue — an
    * aggregate re-read through a window over the aggregated frame (group
    * rows, not fact rows, flow through the window, so the window input
    * is dimension-sized). Sums stay DECIMAL end-to-end; the only double
    * operation is the final one division, so shares are deterministic. */
  val q98RevenueShare: QueryDef = sql(
    "q98_revenue_share",
    """WITH rev AS (
      |  SELECT r.r_name, n.n_name,
      |    SUM(CAST(o.o_totalprice AS DECIMAL(12,2))) AS nat_rev
      |  FROM orders o
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  JOIN region r ON r.r_regionkey = n.n_regionkey
      |  GROUP BY 1, 2)
      |SELECT r_name, n_name,
      |  CAST(nat_rev AS DOUBLE) AS nation_revenue,
      |  CAST(nat_rev AS DOUBLE) / CAST(SUM(nat_rev) OVER (PARTITION BY r_name) AS DOUBLE) AS share
      |FROM rev
      |ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    // customer scales with the data (no forced broadcast — AQE decides);
    // nation/region are constant-size and always broadcast
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("c_custkey") === col("o_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("n_nationkey") === col("c_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("r_regionkey") === col("n_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(col("o_totalprice").cast("decimal(12,2)")).as("nat_rev"))
    rev.select(col("r_name"), col("n_name"),
      col("nat_rev").cast("double").as("nation_revenue"),
      (col("nat_rev").cast("double") /
        sum(col("nat_rev")).over(Window.partitionBy(col("r_name"))).cast("double")).as("share"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Left outer join with an ON-clause filter on the preserved side's
    * partner: every customer survives; the big-order restriction lives in
    * the join condition (not a WHERE, which would turn the join inner).
    * COUNT over the nullable right key and COALESCE'd SUM exercise the
    * null-extension path. Same shuffle shape as an inner join at scale —
    * outer-ness costs nothing extra. */
  val q65OuterJoin: QueryDef = sql(
    "q65_outer_join",
    """SELECT c.c_custkey,
      |  COUNT(o.o_orderkey) AS n_big_orders,
      |  CAST(COALESCE(SUM(CAST(o.o_totalprice AS DECIMAL(12,2))), 0) AS DOUBLE) AS big_total
      |FROM customer c
      |LEFT JOIN orders o ON o.o_custkey = c.c_custkey AND o.o_totalprice > 400000
      |GROUP BY c.c_custkey
      |ORDER BY c.c_custkey""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    c.join(o, col("o_custkey") === col("c_custkey") && col("o_totalprice") > 400000, "left")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_big_orders"),
        coalesce(dsum(money(col("o_totalprice"))), lit(0.0)).as("big_total"))
      .orderBy(col("c_custkey"))
  }

  /** Full outer join between two derived relations whose key sets only
    * partially overlap (high-balance customers vs customers holding a
    * very large order): nulls appear on BOTH sides, COALESCE restores the
    * key. Full-outer cannot broadcast (both sides must be preserved) —
    * the plan is a shuffle join keyed on custkey, which is exactly what
    * it should be at 100 TB. */
  val q66FullOuter: QueryDef = sql(
    "q66_full_outer",
    """WITH hc AS (SELECT c_custkey, c_acctbal FROM customer WHERE c_acctbal > 9000),
      |     ho AS (SELECT o_custkey, COUNT(*) AS n_big,
      |            CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS big_total
      |            FROM orders WHERE o_totalprice > 450000 GROUP BY o_custkey)
      |SELECT COALESCE(hc.c_custkey, ho.o_custkey) AS custkey,
      |       hc.c_acctbal, ho.n_big, ho.big_total
      |FROM hc FULL OUTER JOIN ho ON hc.c_custkey = ho.o_custkey
      |ORDER BY custkey""".stripMargin) { (s, dir) =>
    val hc = Tables.customer(s, dir)
      .filter(col("c_acctbal") > 9000)
      .select(col("c_custkey"), col("c_acctbal"))
    val ho = Tables.orders(s, dir)
      .filter(col("o_totalprice") > 450000)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_big"), dsum(money(col("o_totalprice"))).as("big_total"))
    hc.join(ho, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(
        coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_acctbal"), col("n_big"), col("big_total"))
      .orderBy(col("custkey"))
  }

  /** UNPIVOT (wide → long): a per-returnflag aggregate with three metric
    * columns melts into (flag, metric, value) rows via `Dataset.unpivot`
    * (Spark's `Unpivot` logical node — expanded map-side, no shuffle
    * beyond the aggregation's own). The oracle states the same relation
    * as a UNION ALL, the portable relational definition of unpivot. */
  val q67Unpivot: QueryDef = sql(
    "q67_unpivot",
    """WITH w AS (SELECT l_returnflag,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |    CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price,
      |    CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS sum_disc
      |  FROM lineitem GROUP BY l_returnflag)
      |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
      |UNION ALL SELECT l_returnflag, 'sum_price' AS metric, sum_price AS value FROM w
      |UNION ALL SELECT l_returnflag, 'sum_disc' AS metric, sum_disc AS value FROM w
      |ORDER BY l_returnflag, metric""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        dsum(qty(col("l_quantity"))).as("sum_qty"),
        dsum(money(col("l_extendedprice"))).as("sum_price"),
        dsum(rate(col("l_discount"))).as("sum_disc"))
      .unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("sum_disc")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  /** Correlated scalar subqueries (last ship date + line count per order),
    * implemented the way Spark's optimizer decorrelates them: aggregate
    * the inner relation once, left-join it to the outer. COUNT(*) of an
    * empty correlated set is 0, which the decorrelated form reproduces as
    * COALESCE over the null-extended count; MAX stays NULL. One shuffle
    * agg + one join — at 100 TB this beats per-row subquery execution by
    * construction (a correlated rewrite is mandatory, not optional). */
  val q69CorrelatedSubquery: QueryDef = sql(
    "q69_correlated_subquery",
    """SELECT o_orderkey, o_totalprice,
      |  (SELECT MAX(l.l_shipdate) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS last_ship,
      |  (SELECT COUNT(*) FROM lineitem l WHERE l.l_orderkey = o.o_orderkey) AS n_lines
      |FROM orders o
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val per = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(max(col("l_shipdate")).as("last_ship"), count(lit(1)).as("cnt"))
    Tables.orders(s, dir)
      .join(per, col("o_orderkey") === col("l_orderkey"), "left")
      .select(col("o_orderkey"), col("o_totalprice"), col("last_ship"),
        coalesce(col("cnt"), lit(0L)).as("n_lines"))
      .orderBy(col("o_orderkey"))
  }

  /** The remaining analytic window functions in one pass: ntile,
    * percent_rank, cume_dist, lead, lag share a single window spec →
    * one shuffle on o_custkey, one sort per partition, all five computed
    * in the same WindowExec. Definitions are ANSI-standard in both
    * engines; ties are broken by the unique o_orderkey so every value is
    * deterministic. */
  val q71WindowAnalytics: QueryDef = sql(
    "q71_window_analytics",
    """SELECT o_custkey, o_orderkey,
      |  CAST(NTILE(4) OVER w AS INT) AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cdist,
      |  LEAD(o_totalprice, 1) OVER w AS next_price,
      |  LAG(o_totalprice, 1) OVER w AS prev_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cdist"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** Array aggregation / sequence construction: each user's ordered
    * event-type sequence as ONE array row (the next-event-prediction
    * training shape). `collect_list` over a struct keyed by (ts,
    * event_id) then `sort_array` gives a deterministic order inside the
    * aggregation — no window, no second shuffle; DuckDB's
    * `list(x ORDER BY ...)` states the same relation. Per-user sequences
    * are bounded by user activity, not corpus size, so rows stay
    * executor-sized at 100 TB.
    *
    * The contract face serializes the sequence with `array_join(seq, ' ')`
    * (DuckDB `array_to_string`): the driver's pandas hasher cannot sort or
    * hash ndarray cells (r2's "unhashable type" crash), and the
    * space-joined string carries identical information since event types
    * are space-free tokens. [[typedEventSequences]] keeps the typed
    * ARRAY<STRING> face, pinned by a spec. */
  def typedEventSequences(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts")).as("first_ts"),
        max(col("ts")).as("last_ts"),
        expr("transform(array_sort(collect_list(struct(ts, event_id, event_type))), x -> x.event_type)")
          .as("seq"))

  val q73EventSequences: QueryDef = sql(
    "q73_event_sequences",
    """SELECT user_id,
      |  COUNT(*) AS n_events,
      |  MIN(ts) AS first_ts,
      |  MAX(ts) AS last_ts,
      |  array_to_string(list(event_type ORDER BY ts, event_id), ' ') AS seq
      |FROM events
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    typedEventSequences(s, dir)
      .withColumn("seq", array_join(col("seq"), " "))
      .orderBy(col("user_id"))
  }

  /** Part-catalog profile by size: closes fixture coverage of `p_size`.
    * Plain two-phase hash agg; distinct-brand count is the expand-based
    * two-shuffle form, bounded by (size × brand) cardinality. */
  val q75PartProfile: QueryDef = sql(
    "q75_part_profile",
    """SELECT p_size,
      |  COUNT(*) AS n_parts,
      |  COUNT(DISTINCT p_brand) AS n_brands,
      |  CAST(SUM(CAST(p_retailprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_retail
      |FROM part
      |GROUP BY p_size
      |ORDER BY p_size""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .groupBy(col("p_size"))
      .agg(
        count(lit(1)).as("n_parts"),
        countDistinct(col("p_brand")).as("n_brands"),
        davg(money(col("p_retailprice"))).as("avg_retail"))
      .orderBy(col("p_size"))
  }

  /** Order line density: line count vs max line number per order (equal
    * when numbering is gapless), named customer attached — closes
    * coverage of `l_linenumber` and `c_name`. Fact-fact shuffle on
    * orderkey, then top-k via TakeOrderedAndProject. */
  val q76OrderLineDensity: QueryDef = sql(
    "q76_order_line_density",
    """SELECT o.o_orderkey, c.c_name, o.o_totalprice,
      |  COUNT(*) AS n_lines,
      |  MAX(l.l_linenumber) AS max_lineno
      |FROM orders o
      |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |GROUP BY o.o_orderkey, c.c_name, o.o_totalprice
      |ORDER BY o.o_totalprice DESC, o.o_orderkey
      |LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .groupBy(col("o_orderkey"), col("c_name"), col("o_totalprice"))
      .agg(count(lit(1)).as("n_lines"), max(col("l_linenumber")).as("max_lineno"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(20)
  }

  /** Supplier balance rollup per nation: closes coverage of `s_acctbal`.
    * nation is a constant 25-row dim → broadcast. */
  val q77SupplierBalance: QueryDef = sql(
    "q77_supplier_balance",
    """SELECT n.n_name,
      |  COUNT(*) AS n_suppliers,
      |  CAST(SUM(CAST(s.s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal,
      |  MIN(s.s_acctbal) AS min_bal,
      |  MAX(s.s_acctbal) AS max_bal
      |FROM supplier s
      |JOIN nation n ON s.s_nationkey = n.n_nationkey
      |GROUP BY n.n_name
      |ORDER BY n.n_name""".stripMargin) { (s, dir) =>
    Tables.supplier(s, dir)
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        count(lit(1)).as("n_suppliers"),
        dsum(money(col("s_acctbal"))).as("total_bal"),
        min(col("s_acctbal")).as("min_bal"),
        max(col("s_acctbal")).as("max_bal"))
      .orderBy(col("n_name"))
  }

  /** Distinct per-order part sets ("baskets") and the canonical
    * (part_a < part_b) pairs expanded from them — shared by q101/q105.
    *
    * The pair relation is built by ONE hash aggregate on l_orderkey
    * (collect_set — basket size is ≤ 7 lines in TPC-H and small by
    * nature everywhere, so the buffer is bounded) followed by a purely
    * map-side higher-order-function expansion of the C(basket, 2)
    * canonical pairs. Versus the textbook self-join formulation this
    * removes the sort-merge self-join AND the 3-column DISTINCT shuffle
    * over the pair-expanded (largest) relation: pair volume Σ C(b, 2)
    * only ever flows into the final pair-key aggregation. Set semantics
    * make each basket contribute a pair at most once, so downstream
    * counts are order counts by construction. */
  private[ops] def baskets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_partkey"))
      .groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("parts"))

  private[ops] def pairsOf(baskets: DataFrame): DataFrame =
    baskets.select(explode(expr(
        "flatten(transform(parts, x -> transform(filter(parts, y -> y > x), y -> struct(x AS part_a, y AS part_b))))"))
        .as("p"))
      .select(col("p.part_a").as("part_a"), col("p.part_b").as("part_b"))

  /** Co-purchase affinity: part pairs appearing in the same order, by
    * order count — market-basket co-occurrence, the input to any
    * recommender or complementary-product analysis.
    *
    * Pair generation is basket-bounded (see [[baskets]]/[[pairsOf]]):
    * per-order
    * fanout is C(basket, 2) with basket ≤ 7, never corpus × corpus —
    * linear in orders. Top-k rides TakeOrderedAndProject. At 100 TB:
    * one shuffle on orderkey to assemble baskets, one on the pair key
    * to count; a hot SKU pair is still one aggregation key (no skewed
    * join side). */
  val q101Copurchase: QueryDef = sql(
    "q101_copurchase",
    """SELECT part_a, part_b, COUNT(*) AS n_orders
      |FROM (SELECT DISTINCT a.l_orderkey, a.l_partkey AS part_a, b.l_partkey AS part_b
      |      FROM lineitem a JOIN lineitem b
      |        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey)
      |GROUP BY 1, 2
      |ORDER BY n_orders DESC, part_a, part_b
      |LIMIT 20""".stripMargin) { (s, dir) =>
    pairsOf(baskets(s, dir))
      .groupBy(col("part_a"), col("part_b")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("n_orders").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Per-group z-score outlier detection: events whose value sits > 3σ
    * above their event_type's mean — the data-quality / anomaly-
    * surfacing staple (events.value is heavy-tailed; max z ≈ 6-8, so 3σ
    * actually selects, unlike near-uniform order totals).
    *
    * Same exact-stats discipline as q59: values quantize to
    * DECIMAL(12,2) first (the StreamingOps sum_value convention — raw
    * double sums are partition-order-dependent and unverifiable), group
    * sums accumulate in DECIMAL, convert to double through the string
    * detour, and mean/σ derive from (n, Σx, Σx²) in the identical IEEE
    * expression on both engines — so even the z > 3 boundary decides
    * identically. The 5-row stats frame broadcasts back into the fact
    * scan (the q94 bounds pattern): at 100 TB this is one aggregate plus
    * one broadcast-joined filter pass, no sort, no window. */
  val q103Outliers: QueryDef = sql(
    "q103_outliers",
    """WITH s AS (
      |  SELECT event_type,
      |    CAST(COUNT(*) AS DOUBLE) AS n,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sx,
      |    CAST(CAST(SUM(CAST(value AS DECIMAL(12,2)) * CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sxx
      |  FROM events GROUP BY 1)
      |SELECT e.event_type, e.event_id,
      |  CAST(CAST(e.value AS DECIMAL(12,2)) AS DOUBLE) AS value2,
      |  (CAST(CAST(e.value AS DECIMAL(12,2)) AS DOUBLE) - s.sx / s.n)
      |    / SQRT((s.n * s.sxx - s.sx * s.sx) / (s.n * (s.n - 1))) AS z_score
      |FROM events e JOIN s USING (event_type)
      |WHERE (CAST(CAST(e.value AS DECIMAL(12,2)) AS DOUBLE) - s.sx / s.n)
      |    / SQRT((s.n * s.sxx - s.sx * s.sx) / (s.n * (s.n - 1))) > 3
      |ORDER BY event_type, event_id""".stripMargin) { (s, dir) =>
    val x = money(col("value"))
    def dsumS(c: org.apache.spark.sql.Column) = sum(c).cast("string").cast("double")
    val stats = Tables.events(s, dir)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("double").as("n"),
        dsumS(x).as("sx"), dsumS(x * x).as("sxx"))
    val z = (money(col("value")).cast("double") - col("sx") / col("n")) /
      sqrt((col("n") * col("sxx") - col("sx") * col("sx")) /
        (col("n") * (col("n") - lit(1))))
    Tables.events(s, dir)
      .join(broadcast(stats), "event_type")
      .filter(z > 3)
      .select(col("event_type"), col("event_id"),
        money(col("value")).cast("double").as("value2"), z.as("z_score"))
      .orderBy(col("event_type"), col("event_id"))
  }

  /** Time-series gap filling (resampling): daily event counts per type
    * with missing (type, day) combinations zero-filled over the observed
    * span — without the scaffold, downstream rolling averages and charts
    * silently skip empty days.
    *
    * The calendar × type scaffold is built from AGGREGATES (span is one
    * row, the day sequence and type list are dimension-sized), so the
    * cross join is two broadcast dims — never fact-sized. The fact side
    * arrives pre-aggregated to (type, day) rows before the left join. At
    * 100 TB: one hash agg over events plus dimension joins. */
  /** SQL CTE scaffold ending in `filled(event_type, day, n_events)` —
    * shared by q104 (the filled series) and q106 (rolling average). */
  private val gapFillSql =
    """daily AS (
      |  SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
      |         COUNT(*) AS n_events
      |  FROM events GROUP BY 1, 2),
      |span AS (SELECT MIN(day) AS d0, MAX(day) AS d1 FROM daily),
      |days AS (SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
      |                    CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
      |         FROM span),
      |types AS (SELECT DISTINCT event_type FROM daily),
      |filled AS (
      |  SELECT t.event_type AS event_type, d.day AS day,
      |         COALESCE(dl.n_events, 0) AS n_events
      |  FROM days d CROSS JOIN types t
      |  LEFT JOIN daily dl ON dl.event_type = t.event_type AND dl.day = d.day)""".stripMargin

  private def gapFilled(s: SparkSession, dir: String): DataFrame = {
    val daily = Tables.events(s, dir)
      .select(col("event_type"), to_date(date_trunc("day", col("ts"))).as("day"))
      .groupBy(col("event_type"), col("day")).agg(count(lit(1)).as("n_events"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val days = daily.agg(min(col("day")).as("d0"), max(col("day")).as("d1"))
      .select(explode(expr("sequence(d0, d1)")).as("day"))
    val types = daily.select(col("event_type")).distinct()
    days.crossJoin(types)
      .join(daily, Seq("event_type", "day"), "left")
      .select(col("event_type"), col("day"),
        coalesce(col("n_events"), lit(0L)).as("n_events"))
  }

  val q104GapFill: QueryDef = sql(
    "q104_gap_fill",
    s"""WITH $gapFillSql
       |SELECT event_type, day, n_events FROM filled
       |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    gapFilled(s, dir).orderBy(col("event_type"), col("day"))
  }

  /** Trailing 7-day moving average per type over the GAP-FILLED series —
    * the composition q104 exists for: on the sparse series the same
    * window silently averages over present days only and overstates
    * quiet periods. AVG of a bounded-int window is Σ/n with both
    * operands integers, so the double division is identical IEEE in both
    * engines. The window partitions by event_type — dense per-type
    * series shard across the cluster; no global window anywhere. */
  val q106RollingAverage: QueryDef = sql(
    "q106_rolling_average",
    s"""WITH $gapFillSql
       |SELECT event_type, day, n_events,
       |  AVG(n_events) OVER (PARTITION BY event_type ORDER BY day
       |    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS ma7
       |FROM filled
       |ORDER BY event_type, day""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
      .rowsBetween(-6, Window.currentRow)
    gapFilled(s, dir)
      .withColumn("ma7", avg(col("n_events")).over(w))
      .orderBy(col("event_type"), col("day"))
  }

  /** Item-item cosine similarity from co-purchase counts — the
    * collaborative-filtering core on top of q101: parts as binary
    * order-occurrence vectors, cosine(a,b) = n_ab / √(n_a·n_b). Every
    * input is an exact integer count, so the one double expression is
    * identical IEEE in both engines; exact score ties (equal count
    * triples) break on the part keys. Pair counts and per-part
    * occurrence counts BOTH derive from ONE materialized basket
    * aggregate (persisted — three plan consumers, and AQE does not
    * reliably reuse the orderkey exchange across them), plus two
    * broadcast-able occurrence joins; min-support n_ab ≥ 2 prunes
    * noise pairs before ranking. */
  val q105CopurchaseSimilarity: QueryDef = sql(
    "q105_copurchase_similarity",
    """WITH pairs AS (SELECT DISTINCT a.l_orderkey AS ok, a.l_partkey AS pa, b.l_partkey AS pb
      |               FROM lineitem a JOIN lineitem b
      |                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey),
      |pc AS (SELECT pa, pb, COUNT(*) AS n_ab FROM pairs GROUP BY 1, 2),
      |occ AS (SELECT l_partkey, COUNT(DISTINCT l_orderkey) AS n FROM lineitem GROUP BY 1)
      |SELECT pc.pa AS part_a, pc.pb AS part_b, pc.n_ab,
      |  pc.n_ab / SQRT(CAST(oa.n AS DOUBLE) * CAST(ob.n AS DOUBLE)) AS cosine
      |FROM pc
      |JOIN occ oa ON oa.l_partkey = pc.pa
      |JOIN occ ob ON ob.l_partkey = pc.pb
      |WHERE pc.n_ab >= 2
      |ORDER BY cosine DESC, part_a, part_b
      |LIMIT 20""".stripMargin) { (s, dir) =>
    val b = baskets(s, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pc = pairsOf(b)
      .groupBy(col("part_a"), col("part_b")).agg(count(lit(1)).as("n_ab"))
      .filter(col("n_ab") >= 2)
    // per-part order counts from the same basket relation: parts is a
    // SET per order, so a plain count after explode IS count-distinct
    val occ = b.select(explode(col("parts")).as("l_partkey"))
      .groupBy(col("l_partkey")).agg(count(lit(1)).as("n"))
    val cosine = col("n_ab") /
      sqrt(col("na").cast("double") * col("nb").cast("double"))
    pc.join(occ.select(col("l_partkey").as("part_a"), col("n").as("na")), "part_a")
      .join(occ.select(col("l_partkey").as("part_b"), col("n").as("nb")), "part_b")
      .select(col("part_a"), col("part_b"), col("n_ab"), cosine.as("cosine"))
      .orderBy(col("cosine").desc, col("part_a"), col("part_b"))
      .limit(20)
  }

  /** Data-plane referential-integrity scorecard — the DATA half of what
    * the reference's schema lint checks at the METADATA level
    * (`/root/reference/app.py`'s rules flag missing PK/FK DEFINITIONS;
    * this measures whether the rows actually honor them — the two
    * audits a warehouse needs together, since a declared FK can be
    * violated and an undeclared one can hold): every PK uniqueness
    * constraint (count − distinct) and every FK edge (orphan children
    * via null-safe anti-join semantics) across the TPC-H schema plus
    * the documents/embeddings ids, one row per constraint with its
    * violation count. Exact integers; the whole scorecard is one
    * unioned plan. On the driver fixtures it produces a REAL finding:
    * every FK edge holds but lineitem's composite (l_orderkey,
    * l_linenumber) PK is violated (the generator reuses line numbers)
    * — the data-plane/metadata-plane split this op exists to expose.
    *
    * Shape: per-PK one map-side count/distinct aggregate; per-FK one
    * equi-join against the parent's distinct key (broadcast where the
    * parent is dimension-sized, AQE otherwise) reduced to a count. No
    * window, no corpus-scale residue after the aggregates. */
  val q227IntegrityScorecard: QueryDef = {
    val pks: Seq[(String, String, Seq[String])] = Seq(
      ("pk_customer", "customer", Seq("c_custkey")),
      ("pk_orders", "orders", Seq("o_orderkey")),
      ("pk_part", "part", Seq("p_partkey")),
      ("pk_supplier", "supplier", Seq("s_suppkey")),
      ("pk_nation", "nation", Seq("n_nationkey")),
      ("pk_region", "region", Seq("r_regionkey")),
      ("pk_lineitem", "lineitem", Seq("l_orderkey", "l_linenumber")),
      ("pk_documents", "documents", Seq("doc_id")),
      ("pk_embeddings", "embeddings", Seq("vec_id")))
    val fks: Seq[(String, String, String, String, String)] = Seq(
      ("fk_orders_customer", "orders", "o_custkey", "customer", "c_custkey"),
      ("fk_lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
      ("fk_lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
      ("fk_lineitem_supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
      ("fk_customer_nation", "customer", "c_nationkey", "nation", "n_nationkey"),
      ("fk_supplier_nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
      ("fk_nation_region", "nation", "n_regionkey", "region", "r_regionkey"))
    val pkSql = pks.map { case (name, t, cols) =>
      val key = if (cols.length == 1) cols.head else s"(${cols.mkString(", ")})"
      s"""SELECT '$name' AS constraint_name, 'pk' AS kind,
         |  CAST((SELECT COUNT(*) FROM $t) AS BIGINT) AS n_rows,
         |  CAST((SELECT COUNT(*) - COUNT(DISTINCT $key) FROM $t) AS BIGINT) AS n_violations""".stripMargin
    }
    val fkSql = fks.map { case (name, c, ck, p, pk) =>
      s"""SELECT '$name' AS constraint_name, 'fk' AS kind,
         |  CAST((SELECT COUNT(*) FROM $c) AS BIGINT) AS n_rows,
         |  CAST((SELECT COUNT(*) FROM $c LEFT JOIN (SELECT DISTINCT $pk FROM $p) pp
         |        ON $c.$ck = pp.$pk
         |        WHERE pp.$pk IS NULL AND $c.$ck IS NOT NULL) AS BIGINT) AS n_violations""".stripMargin
    }
    QueryDef.sql(
      "q227_integrity_scorecard",
      s"""SELECT constraint_name, kind, n_rows, n_violations,
         |  (n_violations = 0) AS ok
         |FROM (${(pkSql ++ fkSql).mkString("\nUNION ALL\n")})
         |ORDER BY constraint_name""".stripMargin) { (s, dir) =>
      def tbl(t: String): DataFrame = t match {
        case "region" => Tables.region(s, dir);   case "nation" => Tables.nation(s, dir)
        case "customer" => Tables.customer(s, dir); case "supplier" => Tables.supplier(s, dir)
        case "part" => Tables.part(s, dir);       case "orders" => Tables.orders(s, dir)
        case "lineitem" => Tables.lineitem(s, dir)
        case "documents" => Tables.documents(s, dir)
        case "embeddings" => Tables.embeddings(s, dir)
      }
      val pkRows = pks.map { case (name, t, cols) =>
        tbl(t).agg(count(lit(1)).as("n_rows"),
            (count(lit(1)) - countDistinct(cols.head, cols.tail: _*)).as("n_violations"))
          .select(lit(name).as("constraint_name"), lit("pk").as("kind"),
            col("n_rows").cast("long"), col("n_violations").cast("long"))
      }
      val fkRows = fks.map { case (name, c, ck, p, pk) =>
        val child = tbl(c)
        val parent = tbl(p).select(col(pk)).distinct()
        val orphans = child.filter(col(ck).isNotNull)
          .join(parent, child(ck) === parent(pk), "left_anti")
          .agg(count(lit(1)).as("n_violations"))
        child.agg(count(lit(1)).as("n_rows"))
          .crossJoin(orphans)
          .select(lit(name).as("constraint_name"), lit("fk").as("kind"),
            col("n_rows").cast("long"), col("n_violations").cast("long"))
      }
      (pkRows ++ fkRows).reduce(_ unionAll _)
        .withColumn("ok", col("n_violations") === 0L)
        .orderBy(col("constraint_name"))
    }
  }

  /** Market-share rollup — the TPC-H Q8 shape adapted to the fixture
    * schema: one fact table joined through SEVEN dimension hops (part,
    * supplier, orders, customer, customer-nation, region, and a SECOND
    * visit to nation for the supplier side) with selective predicates
    * on three of them, per-year share of one supplier nation inside one
    * region's STANDARD-part market. This is the join-ORDER stress
    * query: the planner must push the p_type/r_name/date predicates
    * into their scans, broadcast every dimension (nation twice, under
    * different aliases), and leave at most the fact-orders edge as a
    * shuffle — PlanSpec pins exactly that. Money math rides the repo's
    * DECIMAL discipline end-to-end; the share is ONE division of two
    * decimal-exact sums.
    *
    * Scale posture: q05's broadcast-star posture at twice the depth —
    * at 100 TB the only corpus-scale exchanges are the lineitem-orders
    * edge and the final small year aggregate. */
  val q231MarketShare: QueryDef = sql(
    "q231_market_share",
    """SELECT CAST(EXTRACT(YEAR FROM o.o_orderdate) AS BIGINT) AS o_year,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_volume,
      |  CAST(COALESCE(SUM(CASE WHEN n2.n_name = 'NATION_3'
      |        THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) END), 0) AS DOUBLE) AS nation_volume,
      |  CAST(COALESCE(SUM(CASE WHEN n2.n_name = 'NATION_3'
      |        THEN CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2))) END), 0) AS DOUBLE)
      |    / CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(3,2)) - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS share
      |FROM lineitem l
      |JOIN part p ON p.p_partkey = l.l_partkey AND p.p_type = 'STANDARD'
      |JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |JOIN nation n2 ON n2.n_nationkey = s.s_nationkey
      |JOIN orders o ON o.o_orderkey = l.l_orderkey AND o.o_orderdate < TIMESTAMP '1999-01-01'
      |JOIN customer c ON c.c_custkey = o.o_custkey
      |JOIN nation n1 ON n1.n_nationkey = c.c_nationkey
      |JOIN region r ON r.r_regionkey = n1.n_regionkey AND r.r_name = 'ASIA'
      |GROUP BY 1
      |ORDER BY o_year""".stripMargin) { (s, dir) =>
    import graft.functions.Decimals._
    val li = Tables.lineitem(s, dir)
    val p = Tables.part(s, dir).filter(col("p_type") === "STANDARD")
    val sup = Tables.supplier(s, dir)
    val n2 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("s_nkey"), col("n_name").as("s_nation"))
    val o = Tables.orders(s, dir).filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
    val c = Tables.customer(s, dir)
    val n1 = Tables.nation(s, dir)
      .select(col("n_nationkey").as("c_nkey"), col("n_regionkey"))
    val r = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    val vol = money(col("l_extendedprice")) *
      (lit(1).cast("decimal(3,2)") - rate(col("l_discount")))
    li
      .join(broadcast(p), col("p_partkey") === col("l_partkey"))
      .join(broadcast(sup), col("s_suppkey") === col("l_suppkey"))
      .join(broadcast(n2), col("s_nkey") === col("s_nationkey"))
      .join(o, col("o_orderkey") === col("l_orderkey"))
      .join(broadcast(c), col("c_custkey") === col("o_custkey"))
      .join(broadcast(n1), col("c_nkey") === col("c_nationkey"))
      .join(broadcast(r), col("r_regionkey") === col("n_regionkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(count(lit(1)).as("n_lines"),
        dsum(vol).as("tv"),
        dsum(when(col("s_nation") === "NATION_3", vol)).as("nv"))
      .select(col("o_year"), col("n_lines"),
        col("tv").cast("double").as("total_volume"),
        coalesce(col("nv"), lit(0)).cast("double").as("nation_volume"),
        (coalesce(col("nv"), lit(0)).cast("double") /
          col("tv").cast("double")).as("share"))
      .orderBy(col("o_year"))
  }

  /** Incremental materialized-view maintenance (the view-maintenance
    * algebra of Blakeley SIGMOD'86 / Gupta SIGMOD'93, in its
    * insert-only partial-aggregate form — the same state merge Spark
    * itself runs between map-side and final aggregation): the monthly
    * revenue MV is REFRESHED by merging the persisted state with a
    * partial aggregate over only the newly-arrived batch, never
    * re-scanning history. The fixture splits orders deterministically
    * (o_orderkey % 10 = 0 is "the new batch"), aggregates the two
    * slices separately, and full-outer-merges them key-by-key:
    * counts/sums add, min/max fold with null-safe least/greatest, and
    * avg is DERIVED at emission from the merged sum and count (avg is
    * not mergeable; sum+count are — the classic MV decomposition).
    * The DuckDB oracle is the DIRECT recompute over the whole table,
    * so the driver hash proves merge ≡ recompute exactly — the
    * correctness condition incremental refresh rests on. Money rides
    * the exact-cents device (per-row floor(x·100+0.5), integer from
    * then on).
    *
    * Scale posture: at 100 TB the base slice is the PERSISTED MV
    * (state-sized, q108's atomic-publish protocol — metadata plane,
    * not a fact scan) and the only corpus-touching pass is the delta
    * batch; the merge shuffles two state-sized relations on the MV
    * key. Here both slices derive from one fixture scan so the whole
    * claim stays inside one oracle-checkable query. */
  val q235MvMaintenance: QueryDef = sql(
    "q235_mv_maintenance",
    """SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS mv_month,
      |  o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev_cents,
      |  CAST(MIN(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS min_cents,
      |  CAST(MAX(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS max_cents,
      |  CAST(CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |       // COUNT(*) AS BIGINT) AS avg_cents
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY mv_month, o_orderpriority""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val base = mvState(o.filter(pmod(col("o_orderkey"), lit(10)) =!= 0))
    val delta = mvState(o.filter(pmod(col("o_orderkey"), lit(10)) === 0))
    mvEmit(mvMerge(base, delta))
  }

  /** The q235 MV's partial-aggregate state over an orders slice:
    * (mv_month, o_orderpriority) → (n, rev, mn, mx) in exact cents.
    * Shared verbatim by the batch refresh and the streaming face
    * ([[StreamingOps.mvMaintainStream]]) so the two can never drift. */
  def mvState(orders: DataFrame): DataFrame = orders
    .withColumn("mv_month", date_trunc("month", col("o_orderdate")).cast("date"))
    .withColumn("cents", expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)"))
    .groupBy(col("mv_month"), col("o_orderpriority"))
    .agg(count(lit(1)).cast("long").as("n"), sum(col("cents")).as("rev"),
      min(col("cents")).as("mn"), max(col("cents")).as("mx"))

  /** Key-wise merge of two [[mvState]] frames — counts/sums add, min/max
    * fold null-safe across the full-outer branches. Associative and
    * commutative, so any batch/trigger split of the input reaches the
    * same state. */
  def mvMerge(base: DataFrame, delta: DataFrame): DataFrame = {
    val b = base.withColumnsRenamed(Map("n" -> "bn", "rev" -> "brev", "mn" -> "bmn", "mx" -> "bmx"))
    val d = delta.withColumnsRenamed(Map("n" -> "dn", "rev" -> "drev", "mn" -> "dmn", "mx" -> "dmx"))
    // null-safe min/max fold: Spark's least/greatest skip nulls only
    // when at least one side is non-null, which the outer join supplies
    b.join(d, Seq("mv_month", "o_orderpriority"), "full_outer")
      .select(col("mv_month"), col("o_orderpriority"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L))).as("n"),
        (coalesce(col("brev"), lit(0L)) + coalesce(col("drev"), lit(0L))).as("rev"),
        least(col("bmn"), col("dmn")).as("mn"),
        greatest(col("bmx"), col("dmx")).as("mx"))
  }

  /** Emission face of the q235 MV: derived avg (sum ÷ count — the
    * non-mergeable aggregate, computed only at read time) + the
    * deterministic order. */
  def mvEmit(state: DataFrame): DataFrame = state
    .select(col("mv_month"), col("o_orderpriority"),
      col("n").as("n_orders"), col("rev").as("rev_cents"),
      col("mn").as("min_cents"), col("mx").as("max_cents"))
    .withColumn("avg_cents", expr("rev_cents DIV n_orders"))
    .orderBy(col("mv_month"), col("o_orderpriority"))

  /** CUPED variance-reduced experiment readout (Deng et al., WSDM'13)
    * — the A/B-test estimator every mature experimentation platform
    * runs: per-user post-period purchase dollars adjusted by the
    * PRE-period covariate (y′ = y − θ·(x − x̄), θ = cov(x,y)/var(x)
    * pooled across arms), which strips the between-user spend variance
    * the randomization already balanced in expectation but not in
    * sample — the same users are whales in both periods, so their
    * pre-period spend explains post-period noise. Arms split by
    * user_id parity; the pre/post boundary is the data-derived corpus
    * midpoint (no wall-clock literal). Every user in EVERY arm row —
    * non-purchasers carry x = y = 0 (dropping them would bias both
    * means).
    *
    * Exactness: per-event cents floor → per-user dollar totals →
    * integer moment sums (n, Σx, Σy, Σxy, Σx²); θ in micro-units by
    * one truncating DIV over the n²-scaled cov/var (zero-variance
    * guarded to 0); adjusted means composed from already-floored
    * micro means so both engines walk identical integer ops. The
    * whole readout is two scans (pre/post slices) + one user-keyed
    * agg + two arm-keyed aggs over user-sized relations — at 100 TB
    * the user table is the only shuffle. */
  val q244Cuped: QueryDef = sql(
    "q244_cuped",
    """WITH mid AS (SELECT MIN(epoch_us(ts)) + (MAX(epoch_us(ts)) - MIN(epoch_us(ts))) // 2 AS m
      |             FROM events),
      |u AS (SELECT DISTINCT user_id FROM events),
      |px AS (SELECT user_id, SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS c
      |       FROM events WHERE event_type = 'purchase'
      |         AND epoch_us(ts) < (SELECT m FROM mid) GROUP BY 1),
      |py AS (SELECT user_id, SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS c
      |       FROM events WHERE event_type = 'purchase'
      |         AND epoch_us(ts) >= (SELECT m FROM mid) GROUP BY 1),
      |uv AS (SELECT u.user_id, u.user_id % 2 AS arm,
      |         COALESCE(px.c, 0) // 100 AS x, COALESCE(py.c, 0) // 100 AS y
      |       FROM u LEFT JOIN px USING (user_id) LEFT JOIN py USING (user_id)),
      |pool AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |           CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy,
      |           CAST(SUM(x * x) AS BIGINT) AS sxx
      |         FROM uv),
      |th AS (SELECT n, sx,
      |         CASE WHEN n * sxx - sx * sx = 0 THEN 0
      |              ELSE (CAST(1000000 AS BIGINT) * (n * sxy - sx * sy)) // (n * sxx - sx * sx)
      |         END AS theta_micro
      |       FROM pool),
      |arms AS (SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_users,
      |           CAST(SUM(x) AS BIGINT) AS sum_x_dollars, CAST(SUM(y) AS BIGINT) AS sum_y_dollars
      |         FROM uv GROUP BY 1)
      |SELECT arm, n_users, sum_x_dollars, sum_y_dollars, th.theta_micro,
      |  (CAST(1000000 AS BIGINT) * sum_y_dollars) // n_users AS mean_y_micro,
      |  (CAST(1000000 AS BIGINT) * sum_y_dollars) // n_users
      |    - (th.theta_micro * ((CAST(1000000 AS BIGINT) * sum_x_dollars) // n_users
      |        - (CAST(1000000 AS BIGINT) * th.sx) // th.n)) // 1000000 AS adj_mean_y_micro
      |FROM arms, th
      |ORDER BY arm""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("t"),
        expr("CAST(FLOOR(value * 100 + 0.5) AS BIGINT)").as("cents"))
    val b = ev.agg(min(col("t")), max(col("t"))).head
    val mid = b.getLong(0) + (b.getLong(1) - b.getLong(0)) / 2
    def slice(pred: org.apache.spark.sql.Column) = ev
      .filter(col("event_type") === "purchase" && pred)
      .groupBy(col("user_id")).agg(sum(col("cents")).as("c"))
    val px = slice(col("t") < mid).withColumnRenamed("c", "cx")
    val py = slice(col("t") >= mid).withColumnRenamed("c", "cy")
    val uv = ev.select(col("user_id")).distinct()
      .join(px, Seq("user_id"), "left").join(py, Seq("user_id"), "left")
      .select(col("user_id"), pmod(col("user_id"), lit(2)).cast("long").as("arm"),
        expr("coalesce(cx, 0L) div 100").as("x"), expr("coalesce(cy, 0L) div 100").as("y"))
    val pool = uv.agg(count(lit(1)).cast("long").as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
      sum(col("x") * col("x")).as("sxx"))
      .withColumn("theta_micro",
        expr("""CASE WHEN n * sxx - sx * sx = 0L THEN 0L
               |ELSE (1000000L * (n * sxy - sx * sy)) DIV (n * sxx - sx * sx) END""".stripMargin))
      .select(col("n"), col("sx"), col("theta_micro"))
    val arms = uv.groupBy(col("arm"))
      .agg(count(lit(1)).cast("long").as("n_users"),
        sum(col("x")).as("sum_x_dollars"), sum(col("y")).as("sum_y_dollars"))
    arms.crossJoin(broadcast(pool))
      .select(col("arm"), col("n_users"), col("sum_x_dollars"), col("sum_y_dollars"),
        col("theta_micro"),
        expr("(1000000L * sum_y_dollars) DIV n_users").as("mean_y_micro"),
        expr("""(1000000L * sum_y_dollars) DIV n_users
               | - (theta_micro * ((1000000L * sum_x_dollars) DIV n_users
               |     - (1000000L * sx) DIV n)) DIV 1000000""".stripMargin)
          .as("adj_mean_y_micro"))
      .orderBy(col("arm"))
  }

  /** Approximate query processing audit — the sample-and-scale-up
    * estimator (Horvitz & Thompson JASA'52; AQUA/BlinkDB lineage:
    * Acharya SIGMOD'99, Agarwal EuroSys'13) run AGAINST ground truth:
    * a deterministic 1/16 sample (md5-fraction device, not rand() —
    * both engines draw the identical sample) of lineitem, per-group
    * count and quantity sums scaled by 16, with the exact relative
    * error of each estimate in micro units. The audit is what a
    * production AQP deployment does once per sampling design: measure
    * the uniform-sample error profile per group so the dashboard
    * knows its bars. One scan computes sample and truth as
    * conditional aggregates (no join, no second pass); the REAL
    * serving path scans only a persisted 1/16 projection — 16× less
    * I/O, which at 100 TB is the difference between interactive and
    * not. Exact integers (quantities are integral in cents-free
    * units; scale-up is ×16; truncating micro error). */
  val q247AqpGroupby: QueryDef = sql(
    "q247_aqp_groupby",
    """WITH l AS (SELECT l_returnflag, l_linestatus,
      |    CAST(l_quantity AS BIGINT) AS qty,
      |    CASE WHEN CAST(('0x' || substr(md5('aqp:' || CAST(l_orderkey AS VARCHAR)
      |      || ':' || CAST(l_linenumber AS VARCHAR)), 1, 4)) AS INT) % 16 = 0
      |      THEN 1 ELSE 0 END AS picked
      |  FROM lineitem)
      |SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(picked) AS BIGINT) AS n_sample,
      |  CAST(16 * SUM(picked) AS BIGINT) AS est_rows,
      |  CAST(COUNT(*) AS BIGINT) AS true_rows,
      |  CAST((CAST(1000000 AS BIGINT) * ABS(16 * SUM(picked) - COUNT(*))) // COUNT(*) AS BIGINT) AS err_rows_micro,
      |  CAST(16 * SUM(CASE WHEN picked = 1 THEN qty ELSE 0 END) AS BIGINT) AS est_qty,
      |  CAST(SUM(qty) AS BIGINT) AS true_qty,
      |  CAST((CAST(1000000 AS BIGINT) * ABS(16 * SUM(CASE WHEN picked = 1 THEN qty ELSE 0 END)
      |    - SUM(qty))) // SUM(qty) AS BIGINT) AS err_qty_micro
      |FROM l
      |GROUP BY 1, 2
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    val l = Tables.lineitem(s, dir).select(col("l_returnflag"), col("l_linestatus"),
      col("l_quantity").cast("long").as("qty"),
      expr("""CASE WHEN CAST(conv(substring(md5(concat('aqp:', CAST(l_orderkey AS STRING),
             |  ':', CAST(l_linenumber AS STRING))), 1, 4), 16, 10) AS INT) % 16 = 0
             |THEN 1L ELSE 0L END""".stripMargin).as("picked"))
    l.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(sum(col("picked")).as("n_sample"),
        (lit(16L) * sum(col("picked"))).as("est_rows"),
        count(lit(1)).cast("long").as("true_rows"),
        sum(when(col("picked") === 1, col("qty")).otherwise(0L)).as("sq"),
        sum(col("qty")).as("true_qty"))
      .select(col("l_returnflag"), col("l_linestatus"), col("n_sample"),
        col("est_rows"), col("true_rows"),
        expr("(1000000L * abs(est_rows - true_rows)) DIV true_rows").as("err_rows_micro"),
        (lit(16L) * col("sq")).as("est_qty"), col("true_qty"),
        expr("(1000000L * abs(16L * sq - true_qty)) DIV true_qty").as("err_qty_micro"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** RFM segmentation — the warehouse-classic customer taxonomy (Hughes
    * 1994; the direct-marketing recency/frequency/monetary model):
    * per-customer days-since-last-order, order count, and lifetime
    * cents, each scored 1–5 by exact NTILE quintile with custkey
    * tie-break (ties would otherwise make bucket edges
    * nondeterministic), then a declared six-segment taxonomy
    * (champions / loyal / recent / at_risk / hibernating / regular)
    * rolled up to segment-level counts and exact-integer averages.
    * The recency anchor is the corpus max order date (data-derived, no
    * wall clock). Shape: one orders aggregate to customer grain, then
    * the quintiles come from [[BlockRank]]'s two-pass exact rank (the
    * customer relation is data-proportional — at 10⁸–10⁹ customers a
    * plain `NTILE OVER (ORDER BY …)` would be a single-partition sort;
    * the block device keeps every corpus-sized window partitioned and
    * reconstructs NTILE arithmetically from the exact rank), one
    * segment rollup — the customer aggregate is the only shuffle and
    * the output is six rows. The monetary quintile is computed by the
    * oracle but used by neither (the taxonomy cuts on R and F only),
    * so the Spark face skips that rank pass entirely.
    * Planted-quintile spec + conservation (`AnalyticsSpec`);
    * no-single-partition-WindowExec pinned in `PlanSpec`. */
  val q253RfmSegments: QueryDef = sql(
    "q253_rfm_segments",
    """WITH mx AS (SELECT MAX(o_orderdate) AS m FROM orders),
      |cust AS (SELECT o_custkey AS c,
      |    CAST(date_diff('day', CAST(MAX(o_orderdate) AS DATE),
      |      (SELECT CAST(m AS DATE) FROM mx)) AS BIGINT) AS r_days,
      |    CAST(COUNT(*) AS BIGINT) AS f_orders,
      |    CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS m_cents
      |  FROM orders GROUP BY 1),
      |scored AS (SELECT c, r_days, f_orders, m_cents,
      |    6 - NTILE(5) OVER (ORDER BY r_days, c) AS r_score,
      |    6 - NTILE(5) OVER (ORDER BY f_orders DESC, c) AS f_score,
      |    6 - NTILE(5) OVER (ORDER BY m_cents DESC, c) AS m_score
      |  FROM cust),
      |seg AS (SELECT *,
      |    CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champions'
      |         WHEN f_score >= 4 THEN 'loyal'
      |         WHEN r_score >= 4 THEN 'recent'
      |         WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
      |         WHEN r_score <= 2 THEN 'hibernating'
      |         ELSE 'regular' END AS segment
      |  FROM scored)
      |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(r_days) AS BIGINT) // COUNT(*) AS avg_r_days,
      |  CAST(SUM(f_orders) AS BIGINT) // COUNT(*) AS avg_f_orders,
      |  CAST(SUM(m_cents) AS BIGINT) AS total_cents
      |FROM seg
      |GROUP BY 1
      |ORDER BY segment""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val mx = o.agg(max(col("o_orderdate")).cast("date").as("mxd"))
    val cust = o.groupBy(col("o_custkey").as("c"))
      .agg(max(col("o_orderdate")).cast("date").as("last_d"),
        count(lit(1)).cast("long").as("f_orders"),
        sum(expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)")).as("m_cents"))
      .crossJoin(broadcast(mx))
      .withColumn("r_days", datediff(col("mxd"), col("last_d")).cast("long"))
      // customer-sized but derived from the ORDERS scan, and read by the
      // n-agg plus both adaptive rank passes (each itself two-pass) — up
      // to ~5 lineage re-derivations without this checkpoint (measured
      // 2.4 s → ~1 s at sf0.1; the r7 verdict's claw-back item)
      .stageBoundary
    val n = cust.agg(count(lit(1)).cast("long").as("n_cust"))
    val rRanked = BlockRank.globalRowNumberAdaptive(
      cust.crossJoin(broadcast(n)), col("r_days"), asc = true,
      Seq(col("r_days").asc, col("c").asc), "rk_r")
      // an adaptive rank pass reads its input three times (stats agg,
      // offsets agg, rank join) — without this checkpoint the second
      // pass re-executes the first's join+window chain per read
      .localCheckpoint(false)
    val fRanked = BlockRank.globalRowNumberAdaptive(
      rRanked, col("f_orders"), asc = false,
      Seq(col("f_orders").desc, col("c").asc), "rk_f")
    val scored = fRanked
      .withColumn("r_score", lit(6) - BlockRank.ntileFromRank("rk_r", "n_cust", 5))
      .withColumn("f_score", lit(6) - BlockRank.ntileFromRank("rk_f", "n_cust", 5))
    scored.withColumn("segment",
        expr("""CASE WHEN r_score >= 4 AND f_score >= 4 THEN 'champions'
               |     WHEN f_score >= 4 THEN 'loyal'
               |     WHEN r_score >= 4 THEN 'recent'
               |     WHEN r_score <= 2 AND f_score >= 3 THEN 'at_risk'
               |     WHEN r_score <= 2 THEN 'hibernating'
               |     ELSE 'regular' END""".stripMargin))
      .groupBy(col("segment"))
      .agg(count(lit(1)).cast("long").as("n_customers"),
        expr("sum(r_days) DIV count(1)").as("avg_r_days"),
        expr("sum(f_orders) DIV count(1)").as("avg_f_orders"),
        sum(col("m_cents")).as("total_cents"))
      .orderBy(col("segment"))
  }

  /** Association rules over co-purchase pairs — the market-basket
    * classic completed (Agrawal SIGMOD'93): q101 stops at raw pair
    * counts; rules add the three measures a merchandiser actually
    * ranks by — support (how often), confidence P(B|A) (how reliable),
    * and lift P(B|A)/P(B) (how much better than chance — the measure
    * that separates genuine affinity from two independently popular
    * items). Both rule directions emitted per qualifying pair
    * (confidence is asymmetric); support floor n(AB) ≥ 2 is q243's
    * frequent core, applied BEFORE the item-count joins so the rule
    * relation is core-sized. Exact integers: all three measures
    * micro-floored from counts (lift = 10⁶·n(AB)·N DIV (n(A)·n(B))).
    * Top-50 by (lift, a, b) rides TakeOrderedAndProject. Planted
    * basket spec with hand-computed measures (`AnalyticsSpec`). */
  val q254AssociationRules: QueryDef = sql(
    "q254_association_rules",
    """WITH li AS (SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem),
      |n_orders AS (SELECT CAST(COUNT(DISTINCT ok) AS BIGINT) AS n FROM li),
      |item AS (SELECT pk, CAST(COUNT(*) AS BIGINT) AS n_i FROM li GROUP BY 1),
      |pr AS (SELECT a.pk AS pa, b.pk AS pb, CAST(COUNT(*) AS BIGINT) AS n_ab
      |       FROM li a JOIN li b ON a.ok = b.ok AND a.pk < b.pk
      |       GROUP BY 1, 2 HAVING COUNT(*) >= 2),
      |dirs AS (SELECT pa AS a, pb AS b, n_ab FROM pr
      |         UNION ALL SELECT pb, pa, n_ab FROM pr),
      |rules AS (SELECT d.a, d.b, d.n_ab, ia.n_i AS n_a, ib.n_i AS n_b,
      |    (CAST(1000000 AS BIGINT) * d.n_ab) // (SELECT n FROM n_orders) AS supp_micro,
      |    (CAST(1000000 AS BIGINT) * d.n_ab) // ia.n_i AS conf_micro,
      |    (CAST(1000000 AS BIGINT) * d.n_ab * (SELECT n FROM n_orders))
      |      // (ia.n_i * ib.n_i) AS lift_micro
      |  FROM dirs d JOIN item ia ON ia.pk = d.a JOIN item ib ON ib.pk = d.b)
      |SELECT a, b, n_ab, n_a, n_b, supp_micro, conf_micro, lift_micro
      |FROM rules
      |ORDER BY lift_micro DESC, a, b
      |LIMIT 50""".stripMargin) { (s, dir) =>
    val li = Tables.lineitem(s, dir)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk")).distinct()
    val nOrders = li.select(col("ok")).distinct().count()
    val item = li.groupBy(col("pk")).agg(count(lit(1)).cast("long").as("n_i"))
    val pr = pairsOf(baskets(s, dir))
      .groupBy(col("part_a").as("pa"), col("part_b").as("pb"))
      .agg(count(lit(1)).cast("long").as("n_ab"))
      .filter(col("n_ab") >= 2)
    val dirs = pr.select(col("pa").as("a"), col("pb").as("b"), col("n_ab"))
      .unionByName(pr.select(col("pb").as("a"), col("pa").as("b"), col("n_ab")))
    dirs
      .join(item.select(col("pk").as("a"), col("n_i").as("n_a")), "a")
      .join(item.select(col("pk").as("b"), col("n_i").as("n_b")), "b")
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        expr(s"(1000000L * n_ab) DIV ${nOrders}L").as("supp_micro"),
        expr("(1000000L * n_ab) DIV n_a").as("conf_micro"),
        expr(s"(1000000L * n_ab * ${nOrders}L) DIV (n_a * n_b)").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("a"), col("b"))
      .limit(50)
  }

  /** Cohort LTV curves — the finance-side completion of q96's retention
    * (retention counts who comes back; LTV accumulates what they're
    * WORTH): customers cohorted by first-order quarter, every order
    * bucketed by cohort-age in quarters, and each cohort's revenue
    * accumulated along its age axis — the per-customer cumulative
    * curve whose plateau is the number an acquisition budget is
    * justified against. Cumulation is a cohort-PARTITIONED window over
    * the bounded age axis (≤ corpus quarters — never a global sort);
    * cohort sizes join back from the first-order aggregate. Exact
    * integers: cents floors, window cumsum, DIV per-customer curve.
    * Conservation (Σ age cents = corpus cents; curves monotone)
    * + planted two-cohort case spec-pinned (`AnalyticsSpec`). */
  val q255CohortLtv: QueryDef = sql(
    "q255_cohort_ltv",
    """WITH firsts AS (SELECT o_custkey AS c,
      |    CAST(date_trunc('quarter', MIN(o_orderdate)) AS DATE) AS cohort
      |  FROM orders GROUP BY 1),
      |sizes AS (SELECT cohort, CAST(COUNT(*) AS BIGINT) AS n_cust FROM firsts GROUP BY 1),
      |aged AS (SELECT f.cohort,
      |    CAST((year(o.o_orderdate) - year(f.cohort)) * 4
      |      + (quarter(o.o_orderdate) - quarter(f.cohort)) AS BIGINT) AS age_q,
      |    CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders o JOIN firsts f ON f.c = o.o_custkey),
      |by_age AS (SELECT cohort, age_q, CAST(SUM(cents) AS BIGINT) AS age_cents
      |           FROM aged GROUP BY 1, 2),
      |cum AS (SELECT cohort, age_q, age_cents,
      |    CAST(SUM(age_cents) OVER (PARTITION BY cohort ORDER BY age_q
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents
      |  FROM by_age)
      |SELECT cum.cohort, cum.age_q, s.n_cust, cum.age_cents, cum.cum_cents,
      |  cum.cum_cents // s.n_cust AS ltv_per_cust_cents
      |FROM cum JOIN sizes s ON s.cohort = cum.cohort
      |ORDER BY cum.cohort, age_q""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir)
    val firsts = o.groupBy(col("o_custkey").as("c"))
      .agg(date_trunc("quarter", min(col("o_orderdate"))).cast("date").as("cohort"))
    val sizes = firsts.groupBy(col("cohort")).agg(count(lit(1)).cast("long").as("n_cust"))
    val aged = o.join(firsts, col("c") === col("o_custkey"))
      .select(col("cohort"),
        ((year(col("o_orderdate")) - year(col("cohort"))) * 4
          + (quarter(col("o_orderdate")) - quarter(col("cohort")))).cast("long").as("age_q"),
        expr("CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)").as("cents"))
    val byAge = aged.groupBy(col("cohort"), col("age_q")).agg(sum(col("cents")).as("age_cents"))
    byAge.withColumn("cum_cents",
        sum(col("age_cents")).over(Window.partitionBy(col("cohort")).orderBy(col("age_q"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("long"))
      .join(broadcast(sizes), "cohort")
      .select(col("cohort"), col("age_q"), col("n_cust"), col("age_cents"), col("cum_cents"),
        expr("cum_cents DIV n_cust").as("ltv_per_cust_cents"))
      .orderBy(col("cohort"), col("age_q"))
  }

  /** Right-to-erasure (GDPR Art. 17) deletion-cascade planner — the
    * governance query a lakehouse runs BEFORE touching a file: given a
    * deletion request set (deterministic md5 2% of customers), walk
    * the FK graph (customer → orders → lineitem) with semi-joins and
    * emit the blast radius per table, PLUS the physical cost the
    * logical count hides: with immutable 200-row files (q250's shard
    * convention) every touched file is REWRITTEN whole, so the
    * planner reports files touched and WRITE AMPLIFICATION (rows
    * rewritten per row deleted) — the number that decides whether to
    * delete eagerly or tombstone-and-compact (q170). Exact integers
    * and pure semi-join/aggregate shape; the request set never
    * leaves keyspace (no PII moves). Planted-cascade spec + request-
    * fraction and amplification identities (`AnalyticsSpec`). */
  val q256DeletionCascade: QueryDef = sql(
    "q256_deletion_cascade",
    """WITH req AS (SELECT c_custkey AS k FROM customer
      |  WHERE CAST(('0x' || substr(md5('gdpr:' || CAST(c_custkey AS VARCHAR)), 1, 4)) AS INT)
      |    % 50 = 0),
      |del_o AS (SELECT o_orderkey FROM orders WHERE o_custkey IN (SELECT k FROM req)),
      |del_l AS (SELECT l_orderkey, l_linenumber FROM lineitem
      |          WHERE l_orderkey IN (SELECT o_orderkey FROM del_o)),
      |files AS (SELECT l_orderkey // 200 AS f, CAST(COUNT(*) AS BIGINT) AS n_rows
      |          FROM lineitem GROUP BY 1),
      |touched AS (SELECT DISTINCT l_orderkey // 200 AS f FROM del_l),
      |amp AS (SELECT CAST(SUM(files.n_rows) AS BIGINT) AS rewritten
      |        FROM files JOIN touched ON touched.f = files.f),
      |rows_ AS (
      |  SELECT 'customer' AS tbl, (SELECT CAST(COUNT(*) AS BIGINT) FROM customer) AS n_total,
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM req) AS n_affected
      |  UNION ALL SELECT 'orders', (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM del_o)
      |  UNION ALL SELECT 'lineitem', (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM del_l)
      |  UNION ALL SELECT 'lineitem_files', (SELECT CAST(COUNT(*) AS BIGINT) FROM files),
      |    (SELECT CAST(COUNT(*) AS BIGINT) FROM touched)
      |  UNION ALL SELECT 'write_amplification', (SELECT CAST(COUNT(*) AS BIGINT) FROM del_l),
      |    (SELECT rewritten FROM amp))
      |SELECT tbl, n_total, n_affected,
      |  CASE WHEN n_total = 0 THEN 0
      |       ELSE (CAST(1000000 AS BIGINT) * n_affected) // n_total END AS frac_micro
      |FROM rows_
      |ORDER BY tbl""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir)
    val o = Tables.orders(s, dir)
    val li = Tables.lineitem(s, dir)
    val req = cust.filter(expr(
        "CAST(conv(substring(md5(concat('gdpr:', CAST(c_custkey AS STRING))), 1, 4), 16, 10) AS INT) % 50 = 0"))
      .select(col("c_custkey").as("k"))
    val delO = o.join(broadcast(req), col("o_custkey") === col("k"), "left_semi")
      .select(col("o_orderkey"))
    val delL = li.join(delO, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .select(col("l_orderkey"), col("l_linenumber"))
    val files = li.groupBy(expr("l_orderkey div 200").as("f"))
      .agg(count(lit(1)).cast("long").as("n_rows"))
    val touched = delL.select(expr("l_orderkey div 200").as("f")).distinct()
    // r11 (guide §2.4, the q304/q355 fusion): the report was 10
    // sequential driver actions (9 counts + the amplification head) —
    // pure scheduler serialization. Each (n_total, n_affected) pair is
    // now a 1-row aggregate × 1-row aggregate cross of two single-row
    // relations, and the five rows union into ONE lazy job whose
    // branches schedule in parallel; no value ever visits the driver.
    // delL is recomputed per consuming branch (scan + two broadcast
    // semi-joins) — measured cheaper than serializing on a barrier.
    def pair(tbl: String, total: DataFrame, affected: DataFrame): DataFrame =
      total.agg(count(lit(1)).cast("long").as("n_total")).crossJoin(
        affected.agg(count(lit(1)).cast("long").as("n_affected")))
        .select(lit(tbl).as("tbl"), col("n_total"), col("n_affected"))
    val rows =
      pair("customer", cust, req)
        .unionAll(pair("orders", o, delO))
        .unionAll(pair("lineitem", li, delL))
        .unionAll(pair("lineitem_files", files, touched))
        // amplification row: total = deleted rows, affected = rows the
        // immutable files force to be rewritten; frac = amplification
        .unionAll(delL.agg(count(lit(1)).cast("long").as("n_total")).crossJoin(
            files.join(touched, "f").agg(sum(col("n_rows")).as("n_affected")))
          .select(lit("write_amplification").as("tbl"),
            col("n_total"), col("n_affected")))
    rows
      .withColumn("frac_micro",
        expr("CASE WHEN n_total = 0 THEN 0L ELSE (1000000L * n_affected) DIV n_total END"))
      .orderBy(col("tbl"))
  }

  /** Equi-depth histogram construction + fidelity audit — the ANALYZE
    * primitive behind q246's estimates (Piatetsky-Shapiro & Connell
    * SIGMOD'84; every CBO's `height-balanced histogram`): 16 buckets
    * with boundaries at exact value-at-rank cuts (rank i·N/16 via
    * ROW_NUMBER — the value at a rank is deterministic under ties even
    * though tie ORDER isn't), then per-bucket actual row counts and
    * the deviation from the N/16 ideal in micro. Run on TWO columns
    * side by side because the contrast IS the lesson: near-unique
    * price buckets sit at deviation 0 while 50-distinct-value
    * quantity buckets deviate up to ~30% — ties can't be split across
    * a boundary, the documented failure mode of height balancing on
    * low-cardinality columns (and the reason q246's bucket refinement
    * carries per-bucket ndv). Exact integers throughout; bucket
    * assignment joins the 16-row boundary relation against DISTINCT
    * values, never row-at-a-time. The ranking pass is the ANALYZE
    * posture: once per table version, amortized like the q112 layout
    * writes. Hand-planted tie case + per-column row conservation
    * (`AnalyticsSpec`). */
  val q257EquiDepthAudit: QueryDef = sql(
    "q257_equidepth_audit", {
      def side(colName: String, cexpr: String) =
        s"""${colName}_v AS (SELECT $cexpr AS c FROM lineitem),
           |${colName}_n AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM ${colName}_v),
           |${colName}_rk AS (SELECT c, ROW_NUMBER() OVER (ORDER BY c) AS r FROM ${colName}_v),
           |${colName}_cuts AS (SELECT CAST(t.i AS BIGINT) AS bucket,
           |    (t.i * (SELECT nn FROM ${colName}_n)) // 16 AS r
           |  FROM generate_series(1, 16) t(i)),
           |${colName}_bnd AS (SELECT c2.bucket, k.c AS hi
           |  FROM ${colName}_cuts c2 JOIN ${colName}_rk k ON k.r = c2.r),
           |${colName}_vals AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS cnt
           |  FROM ${colName}_v GROUP BY 1),
           |${colName}_asg AS (SELECT v2.c, v2.cnt,
           |    1 + SUM(CASE WHEN b.hi < v2.c AND b.bucket < 16 THEN 1 ELSE 0 END) AS bucket
           |  FROM ${colName}_vals v2 CROSS JOIN ${colName}_bnd b GROUP BY 1, 2),
           |${colName}_agg AS (SELECT '$colName' AS col_name, CAST(bucket AS BIGINT) AS bucket,
           |    CAST(SUM(cnt) AS BIGINT) AS n_rows, MIN(c) AS lo_val, MAX(c) AS hi_val
           |  FROM ${colName}_asg GROUP BY 1, 2),
           |${colName}_out AS (SELECT col_name, bucket, lo_val, hi_val, n_rows,
           |    (CAST(1000000 AS BIGINT) * ABS(16 * n_rows - (SELECT nn FROM ${colName}_n)))
           |      // (SELECT nn FROM ${colName}_n) AS dev_micro
           |  FROM ${colName}_agg)""".stripMargin
      s"""WITH ${side("price_cents", "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)")},
         |${side("quantity", "CAST(l_quantity AS BIGINT)")}
         |SELECT * FROM price_cents_out
         |UNION ALL SELECT * FROM quantity_out
         |ORDER BY col_name, bucket""".stripMargin
    }) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val li = Tables.lineitem(s, dir)
    def side(colName: String, cexpr: String): DataFrame = {
      val v = li.select(expr(cexpr).as("c"))
      // r11 (guide §2.4 fewer actions): nn previously rode the driver
      // via v.count() — one sequential full-scan ACTION per side before
      // the real job. The cut ranks now read nn from a 1-row broadcast
      // aggregate, and dev_micro recovers nn from bucket conservation
      // (every row lands in exactly one bucket, so Σ n_rows = nn — the
      // identity AnalyticsSpec already pins); the whole two-sided audit
      // is ONE lazy job.
      val nn = v.agg(count(lit(1)).as("nn"))
      // corpus-sized rank via the block two-pass device (ties need no
      // tiebreak: only the VALUE at each rank is read, and that is
      // order-invariant among equal values)
      val rk = BlockRank.globalRowNumberAdaptive(v, col("c"), asc = true,
        Seq(col("c").asc), "r")
      val cuts = s.range(1, 17).crossJoin(broadcast(nn))
        .select(col("id").as("bucket"), expr("(id * nn) DIV 16").as("r"))
      val bnd = broadcast(cuts).join(rk, "r").select(col("bucket"), col("c").as("hi"))
      val vals = v.groupBy(col("c")).agg(count(lit(1)).cast("long").as("cnt"))
      val asg = vals.crossJoin(broadcast(bnd))
        .groupBy(col("c"), col("cnt"))
        .agg((lit(1L) + sum(when(col("hi") < col("c") && col("bucket") < 16, 1L).otherwise(0L)))
          .as("bucket"))
      asg.groupBy(col("bucket"))
        .agg(sum(col("cnt")).as("n_rows"), min(col("c")).as("lo_val"), max(col("c")).as("hi_val"))
        // 16-row relation: the unpartitioned window is a single trivial task
        .withColumn("nn", sum(col("n_rows")).over(
          Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
        .select(lit(colName).as("col_name"), col("bucket"), col("lo_val"), col("hi_val"),
          col("n_rows"),
          expr("(1000000L * abs(16 * n_rows - nn)) DIV nn").as("dev_micro"))
    }
    side("price_cents", "CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)")
      .unionByName(side("quantity", "CAST(l_quantity AS BIGINT)"))
      .orderBy(col("col_name"), col("bucket"))
  }

  /** Bitemporal as-of query — BOTH time axes at once (Snodgrass 1992;
    * SQL:2011 system+application time; Jensen & Snodgrass TKDE'99),
    * the ability that separates "time travel" (q176: one axis) from
    * an auditable warehouse: VALID time (when a price was actually effective)
    * and TRANSACTION time (when the warehouse learned it) answer
    * "what did we THINK the price on date D was, as of knowledge
    * state T" — and a retroactive correction changes the answer for a
    * PAST valid date between two knowledge states without touching
    * valid history. The history is synthesized deterministically from
    * part (tx0 initial load; tx1 new valid era — irrelevant to D;
    * tx2 retroactive corrections of the original era for md5 %7
    * parts; tx3 later era), and the reading rule is the bitemporal
    * standard: among rows with tx ≤ T and valid_from ≤ D, latest
    * valid_from wins, then latest tx (newest knowledge about that
    * era). Output: per part bucket, both readings (as-of tx1 vs tx3)
    * and how many parts the correction silently changed — the audit
    * diff a regulator asks for. One synthesized history scan + one
    * per-(part, reading) window; exact cents. Hand-walked planted
    * correction spec (`AnalyticsSpec`). */
  val q261BitemporalAsof: QueryDef = sql(
    "q261_bitemporal_asof",
    """WITH hist AS (
      |  SELECT p_partkey AS pk, 0 AS tx, DATE '1995-01-01' AS valid_from,
      |    CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM part
      |  UNION ALL
      |  SELECT p_partkey, 1, DATE '1995-07-01',
      |    CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) + 500
      |  FROM part
      |  WHERE CAST(('0x' || substr(md5('era:' || CAST(p_partkey AS VARCHAR)), 1, 4)) AS INT) % 5 = 0
      |  UNION ALL
      |  SELECT p_partkey, 2, DATE '1995-01-01',
      |    CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) + 100
      |  FROM part
      |  WHERE CAST(('0x' || substr(md5('fix:' || CAST(p_partkey AS VARCHAR)), 1, 4)) AS INT) % 7 = 0
      |  UNION ALL
      |  SELECT p_partkey, 3, DATE '1996-01-01',
      |    CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT) + 900
      |  FROM part
      |  WHERE CAST(('0x' || substr(md5('new:' || CAST(p_partkey AS VARCHAR)), 1, 4)) AS INT) % 11 = 0),
      |readings AS (SELECT t.asof_tx, h.pk, h.valid_from, h.tx, h.cents,
      |    ROW_NUMBER() OVER (PARTITION BY t.asof_tx, h.pk
      |      ORDER BY h.valid_from DESC, h.tx DESC) AS rn
      |  FROM (SELECT 1 AS asof_tx UNION ALL SELECT 3) t
      |  JOIN hist h ON h.tx <= t.asof_tx AND h.valid_from <= DATE '1995-03-01'),
      |px AS (SELECT asof_tx, pk, cents FROM readings WHERE rn = 1),
      |wide AS (SELECT a.pk, a.cents AS cents_tx1, b.cents AS cents_tx3
      |  FROM px a JOIN px b ON b.pk = a.pk AND a.asof_tx = 1 AND b.asof_tx = 3)
      |SELECT pk % 16 AS bucket, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  CAST(SUM(CASE WHEN cents_tx1 <> cents_tx3 THEN 1 ELSE 0 END) AS BIGINT) AS n_corrected,
      |  CAST(SUM(cents_tx1) AS BIGINT) AS sum_cents_tx1,
      |  CAST(SUM(cents_tx3) AS BIGINT) AS sum_cents_tx3
      |FROM wide
      |GROUP BY 1
      |ORDER BY bucket""".stripMargin) { (s, dir) =>
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    val p = Tables.part(s, dir)
      .select(col("p_partkey").as("pk"),
        expr("CAST(FLOOR(p_retailprice * 100 + 0.5) AS BIGINT)").as("base"))
    def frac(tag: String, m: Int) = expr(
      s"CAST(conv(substring(md5(concat('$tag:', CAST(pk AS STRING))), 1, 4), 16, 10) AS INT) % $m = 0")
    val hist = p.select(col("pk"), lit(0).as("tx"), lit("1995-01-01").cast("date").as("valid_from"),
        col("base").as("cents"))
      .unionByName(p.filter(frac("era", 5)).select(col("pk"), lit(1).as("tx"),
        lit("1995-07-01").cast("date").as("valid_from"), (col("base") + 500L).as("cents")))
      .unionByName(p.filter(frac("fix", 7)).select(col("pk"), lit(2).as("tx"),
        lit("1995-01-01").cast("date").as("valid_from"), (col("base") + 100L).as("cents")))
      .unionByName(p.filter(frac("new", 11)).select(col("pk"), lit(3).as("tx"),
        lit("1996-01-01").cast("date").as("valid_from"), (col("base") + 900L).as("cents")))
    val asof = Seq(1, 3).toDF("asof_tx")
    val readings = broadcast(asof).join(hist,
        col("tx") <= col("asof_tx") && col("valid_from") <= lit("1995-03-01").cast("date"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("asof_tx"), col("pk"))
        .orderBy(col("valid_from").desc, col("tx").desc)))
      .filter(col("rn") === 1)
    val px1 = readings.filter(col("asof_tx") === 1).select(col("pk"), col("cents").as("cents_tx1"))
    val px3 = readings.filter(col("asof_tx") === 3).select(col("pk"), col("cents").as("cents_tx3"))
    px1.join(px3, "pk")
      .groupBy(pmod(col("pk"), lit(16)).cast("long").as("bucket"))
      .agg(count(lit(1)).cast("long").as("n_parts"),
        sum(when(col("cents_tx1") =!= col("cents_tx3"), 1L).otherwise(0L)).as("n_corrected"),
        sum(col("cents_tx1")).as("sum_cents_tx1"),
        sum(col("cents_tx3")).as("sum_cents_tx3"))
      .orderBy(col("bucket"))
  }

  /** Benford first-digit audit (Newcomb 1881; Benford 1938; Nigrini's
    * forensic-accounting screen): the distribution of leading digits of
    * order totals vs the log-law P(d) = log10(1 + 1/d), with per-digit
    * chi-square contributions — the fraud/synthetic-data tripwire (fixture
    * prices are uniform-ish, so the audit SHOULD flag them; the value is
    * the measurement, not conformance).
    *
    * Digit extraction never touches libm: cents = floor(price·100) is one
    * exact double op, and the leading digit is the first character of the
    * BIGINT's decimal rendering — integer→string is exact in any engine
    * (log10-based extraction risks a 1-ulp boundary flip at powers of 10).
    * The Benford probabilities are pinned micro-unit CONSTANTS, not
    * engine-computed logs. One scan + a 9-row broadcast; counts exact;
    * chi-square is the same IEEE expression both engines. */
  val q266BenfordAudit: QueryDef = sql(
    "q266_benford_audit",
    """WITH c AS (
      |  SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM orders),
      |obs AS (SELECT digit, CAST(COUNT(*) AS BIGINT) AS n_obs FROM c GROUP BY 1),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM c),
      |b(digit, exp_micro) AS (VALUES
      |  (1, 301029), (2, 176091), (3, 124938), (4, 96910), (5, 79181),
      |  (6, 66946), (7, 57991), (8, 51152), (9, 45757))
      |SELECT b.digit, COALESCE(obs.n_obs, 0) AS n_obs,
      |  COALESCE(obs.n_obs, 0) * 1000000 // tot.n AS obs_micro,
      |  CAST(b.exp_micro AS BIGINT) AS exp_micro,
      |  (CAST(COALESCE(obs.n_obs, 0) * 1000000 - tot.n * b.exp_micro AS DOUBLE)
      |   * CAST(COALESCE(obs.n_obs, 0) * 1000000 - tot.n * b.exp_micro AS DOUBLE))
      |  / ((CAST(tot.n AS DOUBLE) * CAST(b.exp_micro AS DOUBLE)) * 1000000.0) AS chi2_term
      |FROM b LEFT JOIN obs ON obs.digit = b.digit, tot
      |ORDER BY b.digit""".stripMargin) { (s, dir) =>
    import s.implicits._
    val digits = Tables.orders(s, dir).select(
      expr("CAST(substring(CAST(CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS STRING), 1, 1) AS BIGINT)")
        .as("digit"))
    val obs = digits.groupBy(col("digit")).agg(count(lit(1)).as("n_obs"))
    val tot = digits.agg(count(lit(1)).as("n"))
    val bench = Seq(
      (1L, 301029L), (2L, 176091L), (3L, 124938L), (4L, 96910L), (5L, 79181L),
      (6L, 66946L), (7L, 57991L), (8L, 51152L), (9L, 45757L))
      .toDF("digit", "exp_micro")
    bench.join(obs, Seq("digit"), "left").crossJoin(broadcast(tot))
      .select(col("digit"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        expr("coalesce(n_obs, 0L) * 1000000L DIV n").as("obs_micro"),
        col("exp_micro"),
        expr("""(CAST(coalesce(n_obs, 0L) * 1000000L - n * exp_micro AS DOUBLE)
               | * CAST(coalesce(n_obs, 0L) * 1000000L - n * exp_micro AS DOUBLE))
               | / ((CAST(n AS DOUBLE) * CAST(exp_micro AS DOUBLE)) * 1000000.0D)"""
          .stripMargin).as("chi2_term"))
      .orderBy(col("digit"))
  }

  /** Neyman-optimal stratified sample allocation (Neyman JRSS 1934; the
    * survey-sampling design every AQP layer reuses): a budget of 1000
    * sample rows split across the (returnflag, linestatus) strata
    * ∝ N_h·S_h — wide, volatile strata get the budget; tight ones are
    * cheap to estimate (vs the proportional split q247 measures).
    * Integerization is LARGEST-REMAINDER (Hamilton): floor every exact
    * allocation, then hand the leftover rows to the largest fractional
    * parts — the unique deterministic rounding that conserves the budget.
    *
    * One map-side-combined pass builds (n, Σcents, Σcents²) per stratum
    * in exact BIGINTs (cents² sums overflow 2⁶³ past ~10⁶ rows/stratum —
    * lift the two sums to DECIMAL(38,0) at larger SF); the variance and
    * everything after runs on the 6-row stratum relation through one
    * ordered running-sum window (doubles summed in PINNED stratum order —
    * unordered double aggregation would be engine-dependent). */
  val q267NeymanAllocation: QueryDef = sql(
    "q267_neyman_allocation",
    """WITH st AS (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(COUNT(*) AS BIGINT) AS n_rows,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS s1,
      |    CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)
      |             * CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS s2
      |  FROM lineitem GROUP BY 1, 2),
      |sd AS (
      |  SELECT l_returnflag, l_linestatus, n_rows,
      |    SQRT((CAST(n_rows AS DOUBLE) * CAST(s2 AS DOUBLE)
      |          - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
      |         / (CAST(n_rows AS DOUBLE) * CAST(n_rows - 1 AS DOUBLE))) AS s_h
      |  FROM st),
      |wt AS (
      |  SELECT *, CAST(n_rows AS DOUBLE) * s_h AS w,
      |    ROW_NUMBER() OVER (ORDER BY l_returnflag, l_linestatus) AS rn,
      |    SUM(CAST(n_rows AS DOUBLE) * s_h)
      |      OVER (ORDER BY l_returnflag, l_linestatus
      |            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw
      |  FROM sd),
      |tw AS (SELECT cumw AS total_w FROM wt WHERE rn = (SELECT MAX(rn) FROM wt)),
      |ex AS (
      |  SELECT l_returnflag, l_linestatus, n_rows, s_h,
      |    1000.0 * w / total_w AS exact_a,
      |    CAST(FLOOR(1000.0 * w / total_w) AS BIGINT) AS base
      |  FROM wt, tw),
      |rem AS (SELECT CAST(1000 - SUM(base) AS BIGINT) AS leftover FROM ex),
      |rk AS (
      |  SELECT *, ROW_NUMBER() OVER (
      |    ORDER BY exact_a - base DESC, l_returnflag, l_linestatus) AS frn
      |  FROM ex)
      |SELECT rk.l_returnflag, rk.l_linestatus, rk.n_rows, rk.s_h,
      |  rk.base + CASE WHEN rk.frn <= rem.leftover THEN 1 ELSE 0 END AS alloc
      |FROM rk, rem
      |ORDER BY rk.l_returnflag, rk.l_linestatus""".stripMargin) { (s, dir) =>
    val cents = expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)")
    val st = Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_rows"), sum(cents).as("s1"),
        sum(cents * cents).as("s2"))
    val sd = st.select(col("l_returnflag"), col("l_linestatus"), col("n_rows"),
      expr("""SQRT((CAST(n_rows AS DOUBLE) * CAST(s2 AS DOUBLE)
             | - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             | / (CAST(n_rows AS DOUBLE) * CAST(n_rows - 1 AS DOUBLE)))"""
        .stripMargin).as("s_h"))
    val ord = Window.orderBy(col("l_returnflag"), col("l_linestatus"))
    val wt = sd
      .withColumn("w", col("n_rows").cast("double") * col("s_h"))
      .withColumn("rn", row_number().over(ord))
      .withColumn("cumw", sum(col("w")).over(
        ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val tw = wt.agg(max(col("rn")).as("mrn"))
      .join(wt.select(col("rn"), col("cumw")), col("mrn") === col("rn"))
      .select(col("cumw").as("total_w"))
    val ex = wt.crossJoin(broadcast(tw))
      .withColumn("exact_a", lit(1000.0) * col("w") / col("total_w"))
      .withColumn("base", expr("CAST(FLOOR(1000.0D * w / total_w) AS BIGINT)"))
    val rem = ex.agg((lit(1000L) - sum(col("base"))).as("leftover"))
    val rk = ex.withColumn("frn", row_number().over(
      Window.orderBy((col("exact_a") - col("base")).desc,
        col("l_returnflag"), col("l_linestatus"))))
    rk.crossJoin(broadcast(rem))
      .select(col("l_returnflag"), col("l_linestatus"), col("n_rows"), col("s_h"),
        (col("base") + when(col("frn") <= col("leftover"), 1L).otherwise(0L)).as("alloc"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Revenue-concentration audit: the Gini coefficient and the Lorenz
    * curve of per-customer order revenue (Gini 1912; Lorenz 1905) — the
    * "how head-heavy is this corpus" one-pager (the same shape argument
    * as q201's Zipf audit, on money instead of words; a Gini near 0 says
    * broadcast-the-dims, near 1 says the q114 hot-key device will be
    * needed).
    *
    * All moments are exact integers: revenue in BIGINT cents, rank·revenue
    * products summed exactly (Σ rn·rev < 2⁶³ to ~10⁶ customers — lift to
    * DECIMAL(38,0) past that), so the Gini double is ONE division of
    * exact integers. The rank and the deciles come from [[BlockRank]]'s
    * two-pass device (rank exact → NTILE reconstructed arithmetically),
    * so the customer-sized relation never sees a single-partition
    * window; the only global-order window left is the 10-row decile
    * cumsum. The customer aggregate is the only corpus-scale stage.
    * No-single-partition-WindowExec pinned in `PlanSpec`. */
  val q268GiniLorenz: QueryDef = sql(
    "q268_gini_lorenz",
    """WITH rev AS (
      |  SELECT o_custkey, CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |rk AS (
      |  SELECT o_custkey, cents,
      |    ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rn,
      |    NTILE(10) OVER (ORDER BY cents, o_custkey) AS decile
      |  FROM rev),
      |tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s0,
      |               CAST(SUM(rn * cents) AS BIGINT) AS s1 FROM rk),
      |dec AS (
      |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |    CAST(SUM(cents) AS BIGINT) AS dec_cents
      |  FROM rk GROUP BY 1),
      |cum AS (
      |  SELECT decile, n_customers,
      |    CAST(SUM(dec_cents) OVER (ORDER BY decile
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
      |  FROM dec)
      |SELECT cum.decile, cum.n_customers, cum.cum_cents,
      |  CAST(cum.cum_cents AS DOUBLE) / CAST(tot.s0 AS DOUBLE) AS cum_share,
      |  (2.0 * CAST(tot.s1 AS DOUBLE) - CAST(tot.n + 1 AS DOUBLE) * CAST(tot.s0 AS DOUBLE))
      |    / (CAST(tot.n AS DOUBLE) * CAST(tot.s0 AS DOUBLE)) AS gini
      |FROM cum, tot
      |ORDER BY cum.decile""".stripMargin) { (s, dir) =>
    val rev = Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val nrel = rev.agg(count(lit(1)).cast("long").as("n_tot"))
    val rk = BlockRank.globalRowNumberAdaptive(
        rev.crossJoin(broadcast(nrel)), col("cents"), asc = true,
        Seq(col("cents").asc, col("o_custkey").asc), "rn")
      .withColumn("decile", BlockRank.ntileFromRank("rn", "n_tot", 10))
    val tot = rk.agg(count(lit(1)).as("n"), sum(col("cents")).as("s0"),
      sum(col("rn") * col("cents")).as("s1"))
    val dec = rk.groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("dec_cents"))
    val cum = dec.withColumn("cum_cents",
      sum(col("dec_cents")).over(Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    cum.crossJoin(broadcast(tot))
      .select(col("decile"), col("n_customers"), col("cum_cents"),
        (col("cum_cents").cast("double") / col("s0").cast("double")).as("cum_share"),
        ((lit(2.0) * col("s1").cast("double")
          - (col("n") + 1).cast("double") * col("s0").cast("double"))
          / (col("n").cast("double") * col("s0").cast("double"))).as("gini"))
      .orderBy(col("decile"))
  }

  /** Changelog merge — the CDC apply step (Debezium/Delta `MERGE` shape):
    * a base snapshot plus a stream of versioned upserts and deletes
    * collapses to latest-version-wins per key, deletes dropping the row
    * — the third lakehouse write primitive beside q90's SCD-2 (history-
    * preserving) and q235's MV maintenance (aggregate-merging). The
    * changelog is carved deterministically out of orders: every key ≡ 3
    * (mod 4) gets an upsert bumping its total by one cent at version =
    * key, and every key ≡ 7 (mod 8) a delete at version = key + 1 —
    * so some keys see upsert THEN delete and the version order decides.
    *
    * One key-partitioned window (max version wins, ROW_NUMBER = 1),
    * delete filter, then a status-keyed fingerprint aggregate (count,
    * cent sum, bit_xor of key hashes) that pins every surviving row.
    * At 100 TB: the window is the shuffle; changelog and base co-
    * partition on the key, and the output fingerprint is the cheap
    * cross-engine equality proof for any CDC pipeline. */
  val q287CdcApply: QueryDef = sql(
    "q287_cdc_apply",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(0 AS BIGINT) AS version, 'U' AS op
      |  FROM orders),
      |ups AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(FLOOR(o_totalprice * 100) AS BIGINT) + 1 AS cents,
      |    o_orderkey AS version, 'U' AS op
      |  FROM orders WHERE o_orderkey % 4 = 3),
      |dels AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st, CAST(0 AS BIGINT) AS cents,
      |    o_orderkey + 1 AS version, 'D' AS op
      |  FROM orders WHERE o_orderkey % 8 = 7),
      |log AS (SELECT * FROM base UNION ALL SELECT * FROM ups UNION ALL SELECT * FROM dels),
      |latest AS (
      |  SELECT k, st, cents, op FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY version DESC, op DESC) AS rn
      |    FROM log) WHERE rn = 1),
      |live AS (SELECT k, st, cents FROM latest WHERE op = 'U')
      |SELECT st AS o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n_live,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  bit_xor(CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT)) AS key_fp
      |FROM live GROUP BY 1
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val cents = expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")
    val base = o.select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      cents.as("cents"), lit(0L).as("version"), lit("U").as("op"))
    val ups = o.filter(col("o_orderkey") % 4 === 3)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        (cents + 1L).as("cents"), col("o_orderkey").as("version"), lit("U").as("op"))
    val dels = o.filter(col("o_orderkey") % 8 === 7)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        lit(0L).as("cents"), (col("o_orderkey") + 1L).as("version"), lit("D").as("op"))
    val log = base.unionAll(ups).unionAll(dels)
    val latest = log.withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("version").desc, col("op").desc)))
      .filter(col("rn") === 1)
    latest.filter(col("op") === "U")
      .groupBy(col("st").as("o_orderstatus"))
      .agg(count(lit(1)).as("n_live"), sum(col("cents")).as("sum_cents"),
        expr("bit_xor(CAST(conv(substring(md5(CAST(k AS STRING)), 1, 15), 16, 10) AS BIGINT))")
          .as("key_fp"))
      .orderBy(col("o_orderstatus"))
  }

  /** XML shredding through Spark 4's native `from_xml` — the
    * semi-structured surface beside JSON (q19/q54) and VARIANT (q84).
    * Orders render to canonical XML and parse back through the real
    * XML codec into a typed struct; the per-status fingerprint of the
    * PARSED values can only match the oracle (which computes the same
    * aggregate straight from the table — DuckDB has no XML) if every
    * value survived the serialize→parse round trip bit-for-bit. The
    * XML path is genuinely exercised on the Spark side; the oracle
    * proves round-trip identity, the same device as q44a's structural
    * slice. Scan-level: render + parse stay inside the projection. */
  val q290XmlShred: QueryDef = sql(
    "q290_xml_shred",
    """SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
      |  bit_xor(CAST(('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT)) AS key_fp
      |FROM orders
      |GROUP BY 1
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(concat(
        lit("<o><k>"), col("o_orderkey"),
        lit("</k><st>"), col("o_orderstatus"),
        lit("</st><c>"), expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)"),
        lit("</c></o>")).as("xml"))
      .select(expr("from_xml(xml, 'k BIGINT, st STRING, c BIGINT')").as("p"))
      .select(col("p.k").as("k"), col("p.st").as("o_orderstatus"), col("p.c").as("cents"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
        expr("bit_xor(CAST(conv(substring(md5(CAST(k AS STRING)), 1, 15), 16, 10) AS BIGINT))")
          .as("key_fp"))
      .orderBy(col("o_orderstatus"))
  }

  /** Difference-in-differences (Card & Krueger AER 1994 made it canon):
    * the treatment effect as (treated post − pre) − (control post − pre),
    * differencing away both the group gap and the common time trend —
    * the quasi-experimental readout when assignment wasn't randomized
    * (q244's CUPED assumes a randomized A/B; DiD is what you run on a
    * staged rollout). Cohorts are deterministic (treat = odd user id,
    * post = day 15 of the window); the metric is event value in exact
    * floor-cents.
    *
    * One conditional-aggregate pass builds all four cell moments
    * (map-side combined); the estimate is one double expression of
    * eight exact integers. Emitted as one row carrying every cell so
    * the hash pins the full 2×2 table, not just the headline. */
  val q293DiffInDiff: QueryDef = sql(
    "q293_diff_in_diff",
    """WITH base AS (
      |  SELECT CAST(user_id % 2 AS BIGINT) AS treat,
      |    CASE WHEN CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)
      |      >= (SELECT MIN(CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)) + 15 FROM events)
      |      THEN 1 ELSE 0 END AS post,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |m AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_tp,
      |    CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_tq,
      |    CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_cp,
      |    CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_cq,
      |    CAST(SUM(CASE WHEN treat = 1 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_tp,
      |    CAST(SUM(CASE WHEN treat = 1 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_tq,
      |    CAST(SUM(CASE WHEN treat = 0 AND post = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_cp,
      |    CAST(SUM(CASE WHEN treat = 0 AND post = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_cq
      |  FROM base)
      |SELECT n_tp, n_tq, n_cp, n_cq, s_tp, s_tq, s_cp, s_cq,
      |  (CAST(s_tp AS DOUBLE) / CAST(n_tp AS DOUBLE) - CAST(s_tq AS DOUBLE) / CAST(n_tq AS DOUBLE))
      |  - (CAST(s_cp AS DOUBLE) / CAST(n_cp AS DOUBLE) - CAST(s_cq AS DOUBLE) / CAST(n_cq AS DOUBLE))
      |    AS did_cents
      |FROM m""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val d0 = ev.agg(min(expr("unix_micros(date_trunc('day', ts)) div 86400000000L")).as("d0"))
    val base = ev.crossJoin(broadcast(d0)).select(
      (col("user_id") % 2).as("treat"),
      when(expr("unix_micros(date_trunc('day', ts)) div 86400000000L") >= col("d0") + 15, 1L)
        .otherwise(0L).as("post"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    def cell(t: Int, p: Int, agg: Column, name: String): Column =
      sum(when(col("treat") === t && col("post") === p, agg).otherwise(0L)).as(name)
    base.agg(
        cell(1, 1, lit(1L), "n_tp"), cell(1, 0, lit(1L), "n_tq"),
        cell(0, 1, lit(1L), "n_cp"), cell(0, 0, lit(1L), "n_cq"),
        cell(1, 1, col("cents"), "s_tp"), cell(1, 0, col("cents"), "s_tq"),
        cell(0, 1, col("cents"), "s_cp"), cell(0, 0, col("cents"), "s_cq"))
      .withColumn("did_cents", expr(
        """(CAST(s_tp AS DOUBLE) / CAST(n_tp AS DOUBLE) - CAST(s_tq AS DOUBLE) / CAST(n_tq AS DOUBLE))
          |- (CAST(s_cp AS DOUBLE) / CAST(n_cp AS DOUBLE) - CAST(s_cq AS DOUBLE) / CAST(n_cq AS DOUBLE))"""
          .stripMargin))
  }

  /** Standardized effect size + experiment sizing: Cohen's d (Cohen 1988)
    * between purchase and click event values, with the sample size per
    * arm an 80%-power / 5%-α two-sample test would need to detect the
    * OBSERVED effect — the "is this difference big enough to chase, and
    * what would confirming it cost" pair every experimentation review
    * asks for (q244 reduces variance, q293 removes trends; this prices
    * the next experiment). Moments are exact integer cent sums; d and
    * n-per-arm are single double expressions with the z-constants
    * pinned as literals (1.96, 0.8416). One conditional-aggregate
    * pass. */
  val q295EffectSize: QueryDef = sql(
    "q295_effect_size",
    """WITH m AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s1,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS s2,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(FLOOR(value * 100) AS BIGINT) * CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS q1,
      |    CAST(SUM(CASE WHEN event_type = 'click' THEN CAST(FLOOR(value * 100) AS BIGINT) * CAST(FLOOR(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT) AS q2
      |  FROM events),
      |d AS (
      |  SELECT n1, n2, s1, s2,
      |    (CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)) AS diff_cents,
      |    SQRT(((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
      |        + (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) / CAST(n2 AS DOUBLE))
      |      / CAST(n1 + n2 - 2 AS DOUBLE)) AS sd_pooled
      |  FROM m)
      |SELECT n1, n2, diff_cents, sd_pooled,
      |  diff_cents / sd_pooled AS cohen_d,
      |  CAST(CEIL(2.0 * ((1.96 + 0.8416) * sd_pooled / diff_cents)
      |           * ((1.96 + 0.8416) * sd_pooled / diff_cents)) AS BIGINT) AS n_per_arm_80
      |FROM d""".stripMargin) { (s, dir) =>
    val cents = expr("CAST(FLOOR(value * 100) AS BIGINT)")
    def side(t: String, a: Column, name: String): Column =
      sum(when(col("event_type") === t, a).otherwise(0L)).as(name)
    val m = Tables.events(s, dir).agg(
      side("purchase", lit(1L), "n1"), side("click", lit(1L), "n2"),
      side("purchase", cents, "s1"), side("click", cents, "s2"),
      side("purchase", cents * cents, "q1"), side("click", cents * cents, "q2"))
    m.select(col("n1"), col("n2"),
        expr("CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(s2 AS DOUBLE) / CAST(n2 AS DOUBLE)")
          .as("diff_cents"),
        expr("""SQRT(((CAST(n1 AS DOUBLE) * CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)) / CAST(n1 AS DOUBLE)
               |    + (CAST(n2 AS DOUBLE) * CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE)) / CAST(n2 AS DOUBLE))
               |  / CAST(n1 + n2 - 2 AS DOUBLE))""".stripMargin).as("sd_pooled"))
      .select(col("n1"), col("n2"), col("diff_cents"), col("sd_pooled"),
        (col("diff_cents") / col("sd_pooled")).as("cohen_d"),
        expr("""CAST(CEIL(2.0D * ((1.96D + 0.8416D) * sd_pooled / diff_cents)
               |          * ((1.96D + 0.8416D) * sd_pooled / diff_cents)) AS BIGINT)""".stripMargin)
          .as("n_per_arm_80"))
  }

  /** Exact weighted median per group: the price at which half the
    * QUANTITY (not half the rows) sits below — the inventory-weighted
    * center an unweighted median (q60) misreports whenever cheap items
    * ship in bulk. The device is the distributed weighted-quantile
    * selector: one group-partitioned sort, a running weight sum, and the
    * first row where 2·cum ≥ W (integer comparison — no W/2 division, no
    * doubles anywhere). Groups partition the windows, so nothing funnels
    * through one partition; at a billion rows per group the same
    * selection runs on a range-partitioned sort. Weights are exact
    * floored quantities; ties on price break by orderkey/linenumber so
    * both engines select the identical row. */
  val q299WeightedMedian: QueryDef = sql(
    "q299_weighted_median",
    """WITH w AS (
      |  SELECT l_returnflag, CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
      |    CAST(FLOOR(l_quantity) AS BIGINT) AS qty, l_orderkey, l_linenumber
      |  FROM lineitem),
      |cum AS (
      |  SELECT l_returnflag, cents, qty,
      |    SUM(qty) OVER (PARTITION BY l_returnflag
      |      ORDER BY cents, l_orderkey, l_linenumber
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cw,
      |    SUM(qty) OVER (PARTITION BY l_returnflag) AS tw
      |  FROM w),
      |hit AS (
      |  SELECT l_returnflag, cents, cw, tw,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY cw) AS rn
      |  FROM cum WHERE 2 * cw >= tw)
      |SELECT l_returnflag, CAST(tw AS BIGINT) AS total_qty,
      |  CAST(cents AS BIGINT) AS weighted_median_cents
      |FROM hit WHERE rn = 1
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val w = Tables.lineitem(s, dir).select(col("l_returnflag"),
      expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").as("cents"),
      expr("CAST(FLOOR(l_quantity) AS BIGINT)").as("qty"),
      col("l_orderkey"), col("l_linenumber"))
    val byPrice = Window.partitionBy(col("l_returnflag"))
      .orderBy(col("cents"), col("l_orderkey"), col("l_linenumber"))
    val cum = w
      .withColumn("cw", sum(col("qty")).over(
        byPrice.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("tw", sum(col("qty")).over(Window.partitionBy(col("l_returnflag"))))
    cum.filter(lit(2L) * col("cw") >= col("tw"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("l_returnflag")).orderBy(col("cw"))))
      .filter(col("rn") === 1)
      .select(col("l_returnflag"), col("tw").as("total_qty"),
        col("cents").as("weighted_median_cents"))
      .orderBy(col("l_returnflag"))
  }

  /** A/A-test harness audit (Kohavi's experimentation-platform smoke
    * test): sixteen PSEUDO-experiments, each splitting users by an
    * independent md5 bit, measure the same metric in both arms — every
    * delta should be noise-sized, and ONE split showing "signal" means
    * the bucketing or the metric pipeline is broken (the platform bug
    * A/B results silently inherit). Splits and arms are md5-derived
    * (the q62 device), so the whole audit replays identically anywhere;
    * one conditional-aggregate pass builds all 32 arm moments. Emitted
    * per split: arm sizes and the mean delta in cents (one double
    * expression of exact integers). */
  val q309AaHarness: QueryDef = sql(
    "q309_aa_harness",
    """WITH s(split) AS (VALUES (0), (1), (2), (3), (4), (5), (6), (7),
      |                        (8), (9), (10), (11), (12), (13), (14), (15)),
      |armed AS (
      |  SELECT s.split, CAST(FLOOR(e.value * 100) AS BIGINT) AS cents,
      |    CAST(('0x' || substr(md5('aa:' || CAST(s.split AS VARCHAR) || ':'
      |      || CAST(e.user_id AS VARCHAR)), 1, 4)) AS INT) % 2 AS arm
      |  FROM events e, s),
      |m AS (
      |  SELECT split,
      |    CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN arm = 0 THEN cents ELSE 0 END) AS BIGINT) AS s_a,
      |    CAST(SUM(CASE WHEN arm = 1 THEN cents ELSE 0 END) AS BIGINT) AS s_b
      |  FROM armed GROUP BY 1)
      |SELECT CAST(split AS BIGINT) AS split, n_a, n_b,
      |  CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
      |    - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS delta_cents
      |FROM m
      |ORDER BY split""".stripMargin) { (s, dir) =>
    import s.implicits._
    val splits = (0 to 15).map(_.toLong).toDF("split")
    val armed = Tables.events(s, dir).crossJoin(broadcast(splits))
      .select(col("split"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"),
        pmod(expr("CAST(conv(substring(md5(concat('aa:', CAST(split AS STRING), ':', CAST(user_id AS STRING))), 1, 4), 16, 10) AS INT)"),
          lit(2)).as("arm"))
    armed.groupBy(col("split"))
      .agg(sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_a"),
        sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_b"),
        sum(when(col("arm") === 0, col("cents")).otherwise(0L)).as("s_a"),
        sum(when(col("arm") === 1, col("cents")).otherwise(0L)).as("s_b"))
      .select(col("split"), col("n_a"), col("n_b"),
        expr("""CAST(s_a AS DOUBLE) / CAST(n_a AS DOUBLE)
               |  - CAST(s_b AS DOUBLE) / CAST(n_b AS DOUBLE)""".stripMargin).as("delta_cents"))
      .orderBy(col("split"))
  }

  /** ABC inventory classification (the Pareto 80/95 cut finance and
    * supply chains run on everything): parts ranked by revenue, class A
    * carries the first 80% of cumulative revenue, B to 95%, C the tail —
    * q268 measures HOW concentrated revenue is; this hands operations
    * the actual A/B/C part lists (summarized per class; the per-part
    * assignment is the intermediate relation). Exact BIGINT cents and
    * micro shares; the class boundary is an integer comparison on the
    * cumulative share. The cumulative revenue comes from
    * [[BlockRank.globalRunningSumAdaptive]] (the part relation is
    * data-proportional — a plain `SUM OVER (ORDER BY …)` would be a
    * single-partition sort at 10⁸ parts) and the grand total from a
    * broadcast 1-row aggregate instead of a second global window.
    * No-single-partition-WindowExec pinned in `PlanSpec`. */
  val q311AbcClasses: QueryDef = sql(
    "q311_abc_classes",
    """WITH rev AS (
      |  SELECT l_partkey, CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |rk AS (
      |  SELECT l_partkey, cents,
      |    SUM(cents) OVER (ORDER BY cents DESC, l_partkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(cents) OVER () AS tot
      |  FROM rev),
      |cls AS (
      |  SELECT l_partkey, cents,
      |    CASE WHEN cum * 100 <= tot * 80 THEN 'A'
      |         WHEN cum * 100 <= tot * 95 THEN 'B'
      |         ELSE 'C' END AS abc
      |  FROM rk)
      |SELECT abc, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  CAST(SUM(cents) AS BIGINT) AS revenue_cents,
      |  CAST(SUM(cents) * 1000000 // MAX(tot2.t) AS BIGINT) AS share_micro
      |FROM cls, (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev) tot2
      |GROUP BY abc
      |ORDER BY abc""".stripMargin) { (s, dir) =>
    val rev = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    val totRel = rev.agg(sum(col("cents")).as("tot"))
    val rk = BlockRank.globalRunningSumAdaptive(
      rev.crossJoin(broadcast(totRel)), col("cents"), asc = false,
      Seq(col("cents").desc, col("l_partkey").asc), col("cents"), "cum")
    rk.withColumn("abc",
        when(col("cum") * 100 <= col("tot") * 80, "A")
          .when(col("cum") * 100 <= col("tot") * 95, "B")
          .otherwise("C"))
      .groupBy(col("abc"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("revenue_cents"),
        expr("SUM(cents) * 1000000L DIV MAX(tot)").as("share_micro"))
      .orderBy(col("abc"))
  }

  /** Trending movers: the parts whose popularity RANK moved most between
    * the two halves of the shipping window — the "what's rising" board
    * (level changes mislead when everything grows; RANK deltas isolate
    * relative movement). Halves split on the median ship day via NTILE
    * over days; ranks are dense per half with deterministic part
    * tie-breaks; only parts present in BOTH halves qualify (a debut is
    * a different list). Two half-keyed aggregates + one join; top 20 by
    * absolute delta with pinned ties. */
  val q315TrendingMovers: QueryDef = sql(
    "q315_trending_movers",
    """WITH days AS (
      |  SELECT DISTINCT CAST(epoch_us(date_trunc('day', l_shipdate)) // 86400000000 AS BIGINT) AS d
      |  FROM lineitem),
      |half AS (SELECT d, NTILE(2) OVER (ORDER BY d) AS h FROM days),
      |cnt AS (
      |  SELECT half.h, l.l_partkey, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM lineitem l
      |  JOIN half ON half.d = CAST(epoch_us(date_trunc('day', l.l_shipdate)) // 86400000000 AS BIGINT)
      |  GROUP BY 1, 2),
      |rk AS (
      |  SELECT h, l_partkey, n,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY h ORDER BY n DESC, l_partkey) AS BIGINT) AS rnk
      |  FROM cnt)
      |SELECT a.l_partkey, a.rnk AS rank_first, b.rnk AS rank_second,
      |  a.rnk - b.rnk AS rank_gain
      |FROM rk a JOIN rk b ON b.l_partkey = a.l_partkey AND a.h = 1 AND b.h = 2
      |ORDER BY ABS(a.rnk - b.rnk) DESC, a.l_partkey
      |LIMIT 20""".stripMargin) { (s, dir) =>
    val dayE = expr("unix_micros(date_trunc('day', l_shipdate)) div 86400000000L")
    val days = Tables.lineitem(s, dir).select(dayE.as("d")).distinct()
    val half = days.withColumn("h", ntile(2).over(Window.orderBy(col("d"))))
    val cnt = Tables.lineitem(s, dir).select(col("l_partkey"), dayE.as("d"))
      .join(broadcast(half), Seq("d"))
      .groupBy(col("h"), col("l_partkey")).agg(count(lit(1)).as("n"))
    val rk = cnt.withColumn("rnk", row_number().over(
        Window.partitionBy(col("h")).orderBy(col("n").desc, col("l_partkey")))
      .cast("long"))
      .stageBoundary // part-sized; both join sides
    rk.filter(col("h") === 1)
      .select(col("l_partkey"), col("rnk").as("rank_first"))
      .join(rk.filter(col("h") === 2)
        .select(col("l_partkey"), col("rnk").as("rank_second")), Seq("l_partkey"))
      .select(col("l_partkey"), col("rank_first"), col("rank_second"),
        (col("rank_first") - col("rank_second")).as("rank_gain"))
      .orderBy(abs(col("rank_first") - col("rank_second")).desc, col("l_partkey"))
      .limit(20)
  }

  /** Top-k + OTHER rollup — the dashboard contract every BI tile obeys:
    * the ten highest-revenue parts as named rows plus ONE exact residual
    * bucket, so the tile always sums to 100% (a bare top-k silently
    * drops the tail; the OTHER row is where "should this tile have more
    * slots" decisions come from). Ranks cut by a WindowGroupLimit-
    * friendly row_number; the residual aggregates everything past the
    * cut in the same pass. Exact cents, shares in micro. */
  val q317TopkOther: QueryDef = sql(
    "q317_topk_other",
    """WITH rev AS (
      |  SELECT l_partkey, CAST(SUM(CAST(FLOOR(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM lineitem GROUP BY 1),
      |rk AS (SELECT l_partkey, cents,
      |         ROW_NUMBER() OVER (ORDER BY cents DESC, l_partkey) AS rn
      |       FROM rev),
      |tot AS (SELECT CAST(SUM(cents) AS BIGINT) AS t FROM rev),
      |rows_out AS (
      |  SELECT rn AS rank, CAST(l_partkey AS VARCHAR) AS label,
      |    CAST(1 AS BIGINT) AS n_items, cents FROM rk WHERE rn <= 10
      |  UNION ALL
      |  SELECT 11, 'OTHER', CAST(COUNT(*) AS BIGINT), CAST(SUM(cents) AS BIGINT)
      |  FROM rk WHERE rn > 10)
      |SELECT CAST(rank AS BIGINT) AS rank, label, n_items,
      |  CAST(cents AS BIGINT) AS revenue_cents,
      |  cents * 1000000 // tot.t AS share_micro
      |FROM rows_out, tot
      |ORDER BY rank""".stripMargin) { (s, dir) =>
    val rev = Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(sum(expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    // the tail aggregate reads EVERY rank (rn > 10), so this is not the
    // WindowGroupLimit top-k shape — the part-sized rank rides the
    // block two-pass device instead of a single-partition sort
    val rk = BlockRank.globalRowNumberAdaptive(rev, col("cents"), asc = false,
        Seq(col("cents").desc, col("l_partkey").asc), "rn")
      .stageBoundary // part-sized; head and tail consumers
    val tot = rev.agg(sum(col("cents")).as("t"))
    val head = rk.filter(col("rn") <= 10)
      .select(col("rn").cast("long").as("rank"),
        col("l_partkey").cast("string").as("label"),
        lit(1L).as("n_items"), col("cents"))
    val tail = rk.filter(col("rn") > 10)
      .agg(count(lit(1)).as("n_items"), sum(col("cents")).as("cents"))
      .select(lit(11L).as("rank"), lit("OTHER").as("label"),
        col("n_items"), col("cents"))
    head.unionAll(tail).crossJoin(broadcast(tot))
      .select(col("rank"), col("label"), col("n_items"),
        col("cents").as("revenue_cents"),
        expr("cents * 1000000L DIV t").as("share_micro"))
      .orderBy(col("rank"))
  }

  /** Quantile treatment effects (Doksum Ann. Statist. 1974; the
    * distributional A/B readout): the treated-minus-control difference
    * at each outcome DECILE — a mean effect (q293/q295) of zero can
    * hide a tail redistribution, and the QTE profile is where it
    * surfaces. Arms are the q293 parity assignment; each decile is an
    * exact order-statistic pick at ⌈q·n⌉ within its arm (arm-
    * partitioned windows — no single-axis sort), so every emitted
    * number is an exact integer cent and the effect one subtraction. */
  val q323QuantileEffects: QueryDef = sql(
    "q323_quantile_effects",
    """WITH a AS (
      |  SELECT CAST(user_id % 2 AS BIGINT) AS treat,
      |    CAST(FLOOR(value * 100) AS BIGINT) AS cents
      |  FROM events),
      |r AS (SELECT treat, cents,
      |        ROW_NUMBER() OVER (PARTITION BY treat ORDER BY cents) AS rn,
      |        COUNT(*) OVER (PARTITION BY treat) AS n
      |      FROM a),
      |q(decile, qm) AS (VALUES (1, 100000), (2, 200000), (3, 300000), (4, 400000),
      |  (5, 500000), (6, 600000), (7, 700000), (8, 800000), (9, 900000)),
      |pick AS (
      |  SELECT q.decile, r.treat, CAST(MIN(r.cents) AS BIGINT) AS cents
      |  FROM q JOIN r ON r.rn = CAST((q.qm * r.n + 999999) // 1000000 AS BIGINT)
      |  GROUP BY 1, 2)
      |SELECT t.decile AS decile, t.cents AS treated_cents, c.cents AS control_cents,
      |  t.cents - c.cents AS qte_cents
      |FROM pick t JOIN pick c ON c.decile = t.decile AND t.treat = 1 AND c.treat = 0
      |ORDER BY decile""".stripMargin) { (s, dir) =>
    import s.implicits._
    val a = Tables.events(s, dir).select(
      (col("user_id") % 2).as("treat"),
      expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
    val byArm = Window.partitionBy(col("treat")).orderBy(col("cents"))
    val r = a.withColumn("rn", row_number().over(byArm))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("treat"))))
    val q = (1 to 9).map(d => (d.toLong, d * 100000L)).toDF("decile", "qm")
    val pick = broadcast(q).join(r,
        col("rn") === expr("(qm * n + 999999L) DIV 1000000L"))
      .groupBy(col("decile"), col("treat")).agg(min(col("cents")).as("cents"))
      .stageBoundary // 18 rows; both join sides
    pick.filter(col("treat") === 1)
      .select(col("decile"), col("cents").as("treated_cents"))
      .join(pick.filter(col("treat") === 0)
        .select(col("decile"), col("cents").as("control_cents")), Seq("decile"))
      .select(col("decile"), col("treated_cents"), col("control_cents"),
        (col("treated_cents") - col("control_cents")).as("qte_cents"))
      .orderBy(col("decile"))
  }

  /** Wilson-lower-bound ranking (Wilson JASA 1927; the "how not to sort
    * by average rating" correction): parts ranked by the 95% LOWER
    * bound of their return rate, not the naive share — a part with 2
    * returns in 3 sales must not outrank one with 40 in 100, and the
    * lower bound is exactly the shrinkage that encodes "confidently
    * bad beats possibly bad". Emits naive share beside the bound so
    * the re-ranking it causes is visible. Counts exact; the bound one
    * identical closed-form expression per row (pinned z² literals,
    * q288's device). One part-keyed aggregate + TakeOrdered top-k. */
  val q324WilsonRanking: QueryDef = sql(
    "q324_wilson_ranking",
    """WITH p AS (
      |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS r
      |  FROM lineitem GROUP BY 1),
      |s AS (
      |  SELECT l_partkey, n, r,
      |    r * 1000000 // n AS naive_micro,
      |    (CAST(r AS DOUBLE) + 1.9208 - 1.96 * SQRT((CAST(r AS DOUBLE) * CAST(n - r AS DOUBLE))
      |       / CAST(n AS DOUBLE) + 0.9604)) / (CAST(n AS DOUBLE) + 3.8416) AS wilson_lo
      |  FROM p)
      |SELECT l_partkey, n, r, naive_micro, wilson_lo
      |FROM s
      |ORDER BY wilson_lo DESC, l_partkey
      |LIMIT 20""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("r"))
      .select(col("l_partkey"), col("n"), col("r"),
        expr("r * 1000000L DIV n").as("naive_micro"),
        expr("""(CAST(r AS DOUBLE) + 1.9208D - 1.96D * SQRT((CAST(r AS DOUBLE) * CAST(n - r AS DOUBLE))
               |  / CAST(n AS DOUBLE) + 0.9604D)) / (CAST(n AS DOUBLE) + 3.8416D)""".stripMargin)
          .as("wilson_lo"))
      .orderBy(col("wilson_lo").desc, col("l_partkey"))
      .limit(20)
  }

  /** Incremental JOIN-view maintenance by the classic delta rule
    * (Blakeley et al. SIGMOD'86; the join-side companion to q235's
    * aggregate MV and q287's snapshot CDC): for V = O ⋈ C maintained
    * under inserts ΔO and ΔC, the exact increment is
    *   ΔV = ΔO ⋈ C₀  ∪  O₀ ⋈ ΔC  ∪  ΔO ⋈ ΔC
    * — three joins whose LARGER side appears exactly once each, so at
    * 100 TB a daily delta costs O(|Δ|·avg-fanout) instead of re-joining
    * two full facts (the entire point of maintaining the view). The
    * face keeps the view as mergeable partial-aggregate state at the
    * (c_nationkey, o_orderpriority) grain — counts and cent-sums ADD,
    * the md5 key fingerprint folds by bit_xor (commutative/associative,
    * the q287 device) — merges base state with the delta state, and
    * emits the merged view. The oracle computes the full join from
    * scratch: the hash can only match if the delta rule misses no pair
    * and double-counts none (bit_xor cancels a double-counted key, so
    * over-counting shows as loudly as dropping).
    *
    * Scale posture: ΔC (customer-delta) rides broadcast joins; the two
    * O-sized joins scan each fact once; the state merge is grain-sized.
    * Splits are hash-residue classes of the keys — deterministic, no
    * sampling. */
  val q332DeltaJoinMv: QueryDef = sql(
    "q332_delta_join_mv",
    """WITH v AS (
      |  SELECT c.c_nationkey, o.o_orderpriority,
      |    CAST(FLOOR(o.o_totalprice * 100) AS BIGINT) AS cents,
      |    CAST(('0x' || substr(md5(CAST(o.o_orderkey AS VARCHAR)), 1, 15)) AS BIGINT) AS kf
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
      |SELECT c_nationkey, o_orderpriority,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  CAST(SUM(cents) AS BIGINT) AS sum_cents,
      |  bit_xor(kf) AS key_fp
      |FROM v GROUP BY 1, 2
      |ORDER BY c_nationkey, o_orderpriority""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir).select(
      col("o_custkey"), col("o_orderpriority"), col("o_orderkey"),
      expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").as("cents"))
    val c = Tables.customer(s, dir).select(col("c_custkey"), col("c_nationkey"))
    val (o0, dO) = (o.filter(col("o_orderkey") % 5 =!= 0), o.filter(col("o_orderkey") % 5 === 0))
    val (c0, dC) = (c.filter(col("c_custkey") % 7 =!= 0), c.filter(col("c_custkey") % 7 === 0))
    val base = joinMvState(o0, c0)
    // the delta rule: each term joins a DELTA against a base (or delta)
    // side — the customer deltas are dimension-sized and broadcast
    val delta = joinMvState(dO, c0)
      .unionByName(joinMvState(o0, broadcast(dC)))
      .unionByName(joinMvState(dO, broadcast(dC)))
    joinMvEmit(joinMvMerge(base, delta))
  }

  /** The q332 join-view's partial-aggregate state over one orders slice
    * ⋈ one customer slice: (c_nationkey, o_orderpriority) →
    * (n, sc cents, bit_xor key fingerprint). Shared verbatim by the
    * batch delta rule and the streaming refresh loop
    * ([[graft.ops.StreamingOps.joinMvMaintainStream]]) so the two can
    * never drift (the q235 mvState discipline, applied to a JOIN view).
    * `orders` needs (o_custkey, o_orderpriority, o_orderkey, cents);
    * `cust` needs (c_custkey, c_nationkey). */
  def joinMvState(orders: DataFrame, cust: DataFrame): DataFrame = orders
    .join(cust, col("c_custkey") === col("o_custkey"))
    .groupBy(col("c_nationkey"), col("o_orderpriority"))
    .agg(count(lit(1)).as("n"), sum(col("cents")).as("sc"),
      expr("bit_xor(CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT))")
        .as("fp"))

  /** Merge two join-MV states: counts and cent-sums ADD, fingerprints
    * fold by bit_xor — associative and commutative, so merge order
    * never matters (but NOT idempotent: a state merged twice cancels
    * its fingerprints, which is why the streaming face logs files). */
  def joinMvMerge(a: DataFrame, b: DataFrame): DataFrame = a.unionByName(b)
    .groupBy(col("c_nationkey"), col("o_orderpriority"))
    .agg(sum(col("n")).as("n"), sum(col("sc")).as("sc"),
      expr("bit_xor(fp)").as("fp"))

  /** Emit a join-MV state in the q332 contract shape. */
  def joinMvEmit(state: DataFrame): DataFrame = state
    .select(col("c_nationkey"), col("o_orderpriority"),
      col("n").as("n_rows"), col("sc").as("sum_cents"), col("fp").as("key_fp"))
    .orderBy(col("c_nationkey"), col("o_orderpriority"))

  /** Normalize a raw orders frame to [[joinMvState]]'s orders shape. */
  def joinMvOrders(orders: DataFrame): DataFrame = orders.select(
    col("o_custkey"), col("o_orderpriority"), col("o_orderkey"),
    expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)").as("cents"))

  /** CDC-log compaction plan (the Kafka log-compaction / Iceberg
    * rewrite_position_deletes economics, priced on q287's change log):
    * a change log replayed from the beginning costs its FULL length;
    * compaction keeps only the latest record per key and drops keys
    * whose latest record is a tombstone. The audit emits the exact
    * before/after economics — log records, compacted records, live
    * rows, terminal tombstones, the retention fraction — plus the
    * bit_xor key fingerprint of the LIVE set, which must equal the
    * fingerprint q287 derives by replaying the whole log: the hash
    * proves compaction loses nothing and resurrects nothing (a dropped
    * live key or a kept-dead key both flip the fp). Per-status grain so
    * the plan shows WHERE the reclaim is.
    *
    * Scale posture: one window max per key (the same per-key latest
    * q287 pays), grain-sized aggregates — compaction planning costs one
    * log pass, the compaction it prices saves every future replay. */
  val q344CdcCompaction: QueryDef = sql(
    "q344_cdc_compaction",
    """WITH base AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st,
      |    CAST(0 AS BIGINT) AS version, 'U' AS op
      |  FROM orders),
      |ups AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st, o_orderkey AS version, 'U' AS op
      |  FROM orders WHERE o_orderkey % 4 = 3),
      |dels AS (
      |  SELECT o_orderkey AS k, o_orderstatus AS st, o_orderkey + 1 AS version, 'D' AS op
      |  FROM orders WHERE o_orderkey % 8 = 7),
      |log AS (SELECT * FROM base UNION ALL SELECT * FROM ups UNION ALL SELECT * FROM dels),
      |latest AS (
      |  SELECT k, st, op FROM (
      |    SELECT *, ROW_NUMBER() OVER (PARTITION BY k ORDER BY version DESC, op DESC) AS rn
      |    FROM log) WHERE rn = 1),
      |lg AS (SELECT st, CAST(COUNT(*) AS BIGINT) AS n_log FROM log GROUP BY 1),
      |cp AS (SELECT st,
      |         CAST(COUNT(*) AS BIGINT) AS n_compacted,
      |         CAST(SUM(CASE WHEN op = 'U' THEN 1 ELSE 0 END) AS BIGINT) AS n_live,
      |         CAST(SUM(CASE WHEN op = 'D' THEN 1 ELSE 0 END) AS BIGINT) AS n_tombstones,
      |         bit_xor(CASE WHEN op = 'U'
      |           THEN CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 15)) AS BIGINT)
      |           ELSE 0 END) AS live_fp
      |       FROM latest GROUP BY 1)
      |SELECT cp.st AS o_orderstatus, lg.n_log, cp.n_compacted, cp.n_live,
      |  cp.n_tombstones,
      |  cp.n_compacted * 1000000 // lg.n_log AS retained_micro,
      |  cp.live_fp
      |FROM cp JOIN lg USING (st)
      |ORDER BY o_orderstatus""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val o = Tables.orders(s, dir)
    val base = o.select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
      lit(0L).as("version"), lit("U").as("op"))
    val ups = o.filter(col("o_orderkey") % 4 === 3)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_orderkey").as("version"), lit("U").as("op"))
    val dels = o.filter(col("o_orderkey") % 8 === 7)
      .select(col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        (col("o_orderkey") + 1L).as("version"), lit("D").as("op"))
    val log = base.unionAll(ups).unionAll(dels)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val latest = log.withColumn("rn", row_number().over(
        Window.partitionBy(col("k")).orderBy(col("version").desc, col("op").desc)))
      .filter(col("rn") === 1)
    val lg = log.groupBy(col("st")).agg(count(lit(1)).as("n_log"))
    val cp = latest.groupBy(col("st"))
      .agg(count(lit(1)).as("n_compacted"),
        sum(when(col("op") === "U", 1L).otherwise(0L)).as("n_live"),
        sum(when(col("op") === "D", 1L).otherwise(0L)).as("n_tombstones"),
        expr("bit_xor(CASE WHEN op = 'U' THEN CAST(conv(substring(md5(CAST(k AS STRING)), 1, 15), 16, 10) AS BIGINT) ELSE 0L END)")
          .as("live_fp"))
    cp.join(lg, "st")
      .select(col("st").as("o_orderstatus"), col("n_log"), col("n_compacted"),
        col("n_live"), col("n_tombstones"),
        expr("n_compacted * 1000000L DIV n_log").as("retained_micro"),
        col("live_fp"))
      .orderBy(col("o_orderstatus"))
  }

  /** Kruskal–Wallis rank ANOVA (Kruskal & Wallis JASA 1952) of line
    * revenue across return flags — the distribution-free "do these
    * groups differ?" test a curation pipeline runs when the value
    * column is heavy-tailed and a mean-based ANOVA (q211) would be
    * driven by outliers. This one ranks THE FACT TABLE itself — every
    * lineitem row gets an exact global rank via [[BlockRank]] (at 10⁹
    * rows a plain `RANK() OVER (ORDER BY …)` is the canonical
    * single-partition killer), tie-broken by (orderkey, linenumber) so
    * both engines produce the same permutation (the classical test
    * mid-ranks ties; the deterministic tiebreak is the q333/q349
    * rounded-rank discipline applied to rank statistics — documented
    * deviation, identical in both engines). Per-group rank sums are
    * exact BIGINTs; H is one identical IEEE expression over them,
    * ROUND 6 because its Σ R²/n term is a float sum over groups whose
    * accumulation order neither engine pins. */
  val q360KruskalWallis: QueryDef = sql(
    "q360_kruskal_wallis",
    """WITH v AS (
      |  SELECT l_returnflag AS grp,
      |    CAST(FLOOR(l_extendedprice * 100) AS BIGINT) AS cents,
      |    l_orderkey, l_linenumber
      |  FROM lineitem),
      |rk AS (
      |  SELECT grp,
      |    ROW_NUMBER() OVER (ORDER BY cents, l_orderkey, l_linenumber) AS r
      |  FROM v),
      |g AS (SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_j,
      |        CAST(SUM(r) AS BIGINT) AS rank_sum
      |      FROM rk GROUP BY 1),
      |tot AS (SELECT CAST(SUM(n_j) AS BIGINT) AS n,
      |          SUM(12.0 * (CAST(rank_sum AS DOUBLE) * CAST(rank_sum AS DOUBLE))
      |              / CAST(n_j AS DOUBLE)) AS s
      |        FROM g)
      |SELECT g.grp AS l_returnflag, g.n_j, g.rank_sum, tot.n,
      |  ROUND(tot.s / (CAST(tot.n AS DOUBLE) * (CAST(tot.n AS DOUBLE) + 1.0))
      |    - 3.0 * (CAST(tot.n AS DOUBLE) + 1.0), 6) AS h_stat
      |FROM g, tot
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val v = Tables.lineitem(s, dir).select(col("l_returnflag").as("grp"),
      expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)").as("cents"),
      col("l_orderkey"), col("l_linenumber"))
    val rk = BlockRank.globalRowNumberAdaptive(v, col("cents"), asc = true,
      Seq(col("cents").asc, col("l_orderkey").asc, col("l_linenumber").asc), "r")
    val g = rk.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_j"), sum(col("r")).as("rank_sum"))
    val tot = g.agg(sum(col("n_j")).as("n"),
      sum(lit(12.0) * (col("rank_sum").cast("double") * col("rank_sum").cast("double"))
        / col("n_j").cast("double")).as("s"))
    g.crossJoin(broadcast(tot))
      .select(col("grp").as("l_returnflag"), col("n_j"), col("rank_sum"), col("n"),
        // ROUND 6: s is a float sum over a handful of group terms whose
        // accumulation order neither engine pins
        round(col("s") / (col("n").cast("double") * (col("n").cast("double") + lit(1.0)))
          - lit(3.0) * (col("n").cast("double") + lit(1.0)), 6).as("h_stat"))
      .orderBy(col("l_returnflag"))
  }

  /** Coarsened Exact Matching ATT (Iacus, King & Porro, Political
    * Analysis 2012): the effect of the BUILDING market segment on
    * customer lifetime spend, balanced on coarsened covariates —
    * nation × account-balance band (floor(acctbal/2000)). Strata with
    * no treated or no control drop (that is CEM's whole move: refuse
    * to extrapolate where no counterfactual exists); the matched ATT
    * reweights each stratum's treated−control mean gap by its treated
    * count. Completes the causal shelf: q293 needs a time axis, q244 a
    * pre-period covariate, q308 a score ranking — CEM is the
    * cross-sectional answer when all you have is categorical
    * covariates. Exact integer device: per-stratum gaps in
    * centi-cents via integer division (a double Σ over strata would be
    * aggregation-order-dependent), the final weighted mean one more
    * integer divide — overflow-safe to ~10⁹ customers × 10⁶-cent
    * spends. Naive (unmatched) gap ships alongside: the bias CEM
    * removed is the row's point. One grouped pass over
    * customer⋈orders, stratum-parallel. */
  val q375CemAtt: QueryDef = sql(
    "q375_cem_att",
    """WITH sp AS (
      |  SELECT o_custkey, CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1),
      |base AS (
      |  SELECT c_custkey, c_nationkey AS nat,
      |    CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS bal_bucket,
      |    CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END AS treat,
      |    COALESCE(sp.cents, 0) AS y
      |  FROM customer LEFT JOIN sp ON sp.o_custkey = c_custkey),
      |cell AS (
      |  SELECT nat, bal_bucket,
      |    CAST(SUM(treat) AS BIGINT) AS n_t, CAST(SUM(1 - treat) AS BIGINT) AS n_c,
      |    CAST(SUM(CASE WHEN treat = 1 THEN y ELSE 0 END) AS BIGINT) AS s_t,
      |    CAST(SUM(CASE WHEN treat = 0 THEN y ELSE 0 END) AS BIGINT) AS s_c
      |  FROM base GROUP BY 1, 2),
      |mt AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata_matched,
      |    CAST(SUM(n_t) AS BIGINT) AS n_treated_matched,
      |    CAST(SUM(n_t * (s_t * 100 // n_t - s_c * 100 // n_c)) AS BIGINT) AS wnum
      |  FROM cell WHERE n_t > 0 AND n_c > 0),
      |tt AS (
      |  SELECT CAST(SUM(n_t) AS BIGINT) AS nt_all, CAST(SUM(n_c) AS BIGINT) AS nc_all,
      |    CAST(SUM(s_t) AS BIGINT) AS st_all, CAST(SUM(s_c) AS BIGINT) AS sc_all
      |  FROM cell)
      |SELECT mt.n_strata_matched, mt.n_treated_matched, tt.nt_all AS n_treated_total,
      |  CAST(mt.wnum // mt.n_treated_matched AS DOUBLE) / 100 AS att_cents,
      |  CAST(st_all * 100 // nt_all - sc_all * 100 // nc_all AS DOUBLE) / 100 AS naive_cents
      |FROM mt, tt""".stripMargin) { (s, dir) =>
    val sp = Tables.orders(s, dir).groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val base = Tables.customer(s, dir)
      .join(sp, col("o_custkey") === col("c_custkey"), "left")
      .select(col("c_nationkey").as("nat"),
        expr("CAST(FLOOR(c_acctbal / 2000) AS BIGINT)").as("bal_bucket"),
        when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L).as("treat"),
        coalesce(col("cents"), lit(0L)).as("y"))
    val cell = base.groupBy(col("nat"), col("bal_bucket"))
      .agg(sum(col("treat")).as("n_t"), sum(lit(1L) - col("treat")).as("n_c"),
        sum(when(col("treat") === 1, col("y")).otherwise(0L)).as("s_t"),
        sum(when(col("treat") === 0, col("y")).otherwise(0L)).as("s_c"))
      .stageBoundary // strata-sized; feeds the matched and total aggs
    val mt = cell.filter(col("n_t") > 0 && col("n_c") > 0)
      .agg(count(lit(1)).as("n_strata_matched"), sum(col("n_t")).as("n_treated_matched"),
        sum(expr("n_t * (s_t * 100L DIV n_t - s_c * 100L DIV n_c)")).as("wnum"))
    val tt = cell.agg(sum(col("n_t")).as("nt_all"), sum(col("n_c")).as("nc_all"),
      sum(col("s_t")).as("st_all"), sum(col("s_c")).as("sc_all"))
    mt.crossJoin(broadcast(tt))
      .select(col("n_strata_matched"), col("n_treated_matched"),
        col("nt_all").as("n_treated_total"),
        expr("CAST(wnum DIV n_treated_matched AS DOUBLE) / 100").as("att_cents"),
        expr("CAST(st_all * 100L DIV nt_all - sc_all * 100L DIV nc_all AS DOUBLE) / 100")
          .as("naive_cents"))
  }

  /** Simpson's-paradox screen (Simpson JRSS-B 1951; the Bickel et al.
    * Science 1975 admissions case is the canonical instance): does the
    * balance→spend association hold WITHIN every nation stratum, or
    * does the aggregate sign come from stratum composition? Per
    * stratum and overall, the n-scaled covariance n·Σxy − Σx·Σy of
    * (account-balance dollars, lifetime-spend dollars), whose SIGN is
    * the association direction — plus a flip flag against the pooled
    * sign. Any flipped stratum means a stratum-blind policy read
    * (q375's CEM exists precisely for that case). The moments n/Σx/Σy/
    * Σxy are exact BIGINTs; the covariance itself is ONE final DOUBLE
    * expression over them (the q391 k-CTE device) because the pooled
    * products n·Σxy and Σx·Σy reach ~2.5e18 already at sf0.1 and grow
    * ~quadratically with corpus size — a pure-BIGINT form would wrap
    * (Spark) or raise (DuckDB) at roughly 2× the gated fixture. Only
    * the sign and magnitude are reported, and the double sign is exact
    * whenever the true covariance exceeds the cancellation floor
    * ~2⁻⁵²·n·Σxy — many decades of headroom for a non-degenerate
    * association. The reported magnitude is `cov_giga` = ROUND(cov/1e9)
    * — a coarser scaled unit, so the COMPARED output is stable against
    * low-bit drift from a future evaluator/FMA change in either engine
    * (ADVICE r8: the raw ~2.5e18 double relied on bit-identical IEEE
    * sequences); sign and flipped still read the unrounded double, so
    * the flip verdict keeps its full cancellation-floor headroom. One
    * grouped pass + one broadcast total row; strata are
    * nation-parallel. */
  val q385SimpsonsFlip: QueryDef = sql(
    "q385_simpsons_flip",
    """WITH sp AS (
      |  SELECT o_custkey, CAST(SUM(CAST(FLOOR(o_totalprice) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1),
      |base AS (
      |  SELECT c_nationkey AS nat, CAST(FLOOR(c_acctbal) AS BIGINT) AS x,
      |    COALESCE(sp.y, 0) AS y
      |  FROM customer LEFT JOIN sp ON sp.o_custkey = c_custkey),
      |per AS (
      |  SELECT nat, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(y) AS BIGINT) AS sy, CAST(SUM(x * y) AS BIGINT) AS sxy
      |  FROM base GROUP BY 1),
      |tot AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(SUM(sx) AS BIGINT) AS sx,
      |    CAST(SUM(sy) AS BIGINT) AS sy, CAST(SUM(sxy) AS BIGINT) AS sxy
      |  FROM per),
      |ov AS (SELECT CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov_scaled FROM tot),
      |pc AS (
      |  SELECT nat, n, CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
      |               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE) AS cov
      |  FROM per),
      |rows_ AS (
      |  SELECT CAST(-1 AS BIGINT) AS nat, tot.n,
      |    ROUND(ov.cov_scaled / 1e9, 0) AS cov_giga,
      |    CAST(CASE WHEN ov.cov_scaled > 0 THEN 1 WHEN ov.cov_scaled < 0 THEN -1 ELSE 0 END AS BIGINT) AS sign,
      |    CAST(0 AS BIGINT) AS flipped
      |  FROM tot, ov
      |  UNION ALL
      |  SELECT pc.nat, pc.n, ROUND(pc.cov / 1e9, 0),
      |    CAST(CASE WHEN pc.cov > 0 THEN 1 WHEN pc.cov < 0 THEN -1 ELSE 0 END AS BIGINT),
      |    CAST(CASE WHEN SIGN(pc.cov) <> SIGN(ov.cov_scaled)
      |              AND pc.cov <> 0 THEN 1 ELSE 0 END AS BIGINT)
      |  FROM pc, ov)
      |SELECT nat AS stratum, n, cov_giga, sign, flipped
      |FROM rows_ ORDER BY stratum""".stripMargin) { (s, dir) =>
    val sp = Tables.orders(s, dir).groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(FLOOR(o_totalprice) AS BIGINT)")).as("y"))
    val base = Tables.customer(s, dir)
      .join(sp, col("o_custkey") === col("c_custkey"), "left")
      .select(col("c_nationkey").as("nat"),
        expr("CAST(FLOOR(c_acctbal) AS BIGINT)").as("x"),
        coalesce(col("y"), lit(0L)).as("y"))
    val per = base.groupBy(col("nat"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("y")).as("sxy"))
      .stageBoundary // nation-sized; totals + the stratum rows
    val tot = per.agg(sum(col("n")).as("n"), sum(col("sx")).as("sx"),
      sum(col("sy")).as("sy"), sum(col("sxy")).as("sxy"))
    val ov = tot.select(col("n"),
      (col("n").cast("double") * col("sxy").cast("double")
        - col("sx").cast("double") * col("sy").cast("double")).as("cov_all"))
    val overall = ov.select(lit(-1L).as("stratum"), col("n"),
      round(col("cov_all") / lit(1e9), 0).as("cov_giga"),
      signum(col("cov_all")).cast("long").as("sign"), lit(0L).as("flipped"))
    val strata = per.crossJoin(broadcast(ov.select(col("cov_all"))))
      .select(col("nat").as("stratum"), col("n"),
        (col("n").cast("double") * col("sxy").cast("double")
          - col("sx").cast("double") * col("sy").cast("double")).as("cov_raw"),
        col("cov_all"))
      .select(col("stratum"), col("n"),
        round(col("cov_raw") / lit(1e9), 0).as("cov_giga"),
        signum(col("cov_raw")).cast("long").as("sign"),
        when(signum(col("cov_raw")) =!= signum(col("cov_all")) &&
          col("cov_raw") =!= 0, 1L).otherwise(0L).as("flipped"))
    overall.unionByName(strata).orderBy(col("stratum"))
  }

  /** Group-sequential monitoring of the parity A/B split (Pocock,
    * Biometrika 1977): the interim-analysis protocol that makes
    * PEEKING legal — five equally-spaced looks at the cumulative
    * purchase-value z statistic, each judged against the Pocock
    * 5-look/α=0.05 boundary 2.413 instead of the fixed-test 1.96 (the
    * repo's experiment shelf prices effects after the fact — q244,
    * q293, q295; this is the DURING-the-test discipline, and the
    * naive-vs-Pocock crossing columns show exactly the false-alarm
    * surface unadjusted peeking buys). Arms are the deterministic
    * user-parity split (the q293 device); per-look moments are exact
    * integer cent sums via five conditional aggregates in ONE events
    * pass (cutoffs from the observed day span on a broadcast row); z
    * is a single double expression per look, NULL-guarded at the
    * zero-variance degeneracy. */
  val q390SequentialTest: QueryDef = sql(
    "q390_sequential_test",
    """WITH ev AS (
      |  SELECT CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT) AS d,
      |    user_id % 2 AS arm, CAST(FLOOR(value * 100) AS BIGINT) AS cents
      |  FROM events WHERE event_type = 'purchase'),
      |sp AS (SELECT MIN(d) AS lo, MAX(d) AS hi FROM ev),
      |looks(k) AS (VALUES (1), (2), (3), (4), (5)),
      |cut AS (SELECT k, sp.lo + ((sp.hi - sp.lo + 1) * k) // 5 - 1 AS cutoff FROM looks, sp),
      |m AS (SELECT c.k, c.cutoff,
      |    CAST(SUM(CASE WHEN ev.arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN ev.arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
      |    CAST(SUM(CASE WHEN ev.arm = 1 THEN ev.cents ELSE 0 END) AS BIGINT) AS s1,
      |    CAST(SUM(CASE WHEN ev.arm = 0 THEN ev.cents ELSE 0 END) AS BIGINT) AS s0,
      |    CAST(SUM(CASE WHEN ev.arm = 1 THEN ev.cents * ev.cents ELSE 0 END) AS BIGINT) AS q1,
      |    CAST(SUM(CASE WHEN ev.arm = 0 THEN ev.cents * ev.cents ELSE 0 END) AS BIGINT) AS q0
      |  FROM cut c JOIN ev ON ev.d <= c.cutoff
      |  GROUP BY 1, 2),
      |z AS (SELECT k AS look, cutoff AS cutoff_day, n1, n0,
      |    CASE WHEN n1 >= 2 AND n0 >= 2
      |          AND (CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1) > 0
      |          AND (CAST(n0 AS DOUBLE) * q0 - CAST(s0 AS DOUBLE) * s0) > 0
      |      THEN (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
      |        / SQRT((CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1) / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1))
      |             + (CAST(n0 AS DOUBLE) * q0 - CAST(s0 AS DOUBLE) * s0) / (CAST(n0 AS DOUBLE) * n0 * (n0 - 1)))
      |    END AS z
      |  FROM m)
      |SELECT look, cutoff_day, n1, n0, z,
      |  CAST(CASE WHEN ABS(z) >= 2.413 THEN 1 ELSE 0 END AS BIGINT) AS crossed_pocock,
      |  CAST(CASE WHEN ABS(z) >= 1.96 THEN 1 ELSE 0 END AS BIGINT) AS crossed_naive
      |FROM z ORDER BY look""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir).filter(col("event_type") === "purchase")
      .select(expr("unix_micros(date_trunc('day', ts)) div 86400000000L").as("d"),
        (col("user_id") % 2).as("arm"),
        expr("CAST(FLOOR(value * 100) AS BIGINT)").as("cents"))
      .stageBoundary // purchase-sized; span + the look pass
    val sp = ev.agg(min(col("d")).as("lo"), max(col("d")).as("hi"))
    val looks = s.range(1, 6).select(col("id").as("k"))
    val cut = broadcast(looks.crossJoin(broadcast(sp))
      .select(col("k"), expr("lo + ((hi - lo + 1) * k) DIV 5 - 1").as("cutoff")))
    def cell(arm: Int, a: Column, name: String): Column =
      sum(when(col("arm") === arm, a).otherwise(0L)).as(name)
    val m = cut.join(ev, col("d") <= col("cutoff"))
      .groupBy(col("k"), col("cutoff"))
      .agg(cell(1, lit(1L), "n1"), cell(0, lit(1L), "n0"),
        cell(1, col("cents"), "s1"), cell(0, col("cents"), "s0"),
        cell(1, col("cents") * col("cents"), "q1"),
        cell(0, col("cents") * col("cents"), "q0"))
    m.select(col("k").as("look"), col("cutoff").as("cutoff_day"), col("n1"), col("n0"),
        expr("""CASE WHEN n1 >= 2 AND n0 >= 2
               |      AND (CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1) > 0
               |      AND (CAST(n0 AS DOUBLE) * q0 - CAST(s0 AS DOUBLE) * s0) > 0
               |  THEN (CAST(s1 AS DOUBLE) / n1 - CAST(s0 AS DOUBLE) / n0)
               |    / SQRT((CAST(n1 AS DOUBLE) * q1 - CAST(s1 AS DOUBLE) * s1) / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1))
               |         + (CAST(n0 AS DOUBLE) * q0 - CAST(s0 AS DOUBLE) * s0) / (CAST(n0 AS DOUBLE) * n0 * (n0 - 1)))
               |END""".stripMargin).as("z"))
      .select(col("look"), col("cutoff_day"), col("n1"), col("n0"), col("z"),
        expr("CAST(CASE WHEN ABS(z) >= 2.413D THEN 1 ELSE 0 END AS BIGINT)").as("crossed_pocock"),
        expr("CAST(CASE WHEN ABS(z) >= 1.96D THEN 1 ELSE 0 END AS BIGINT)").as("crossed_naive"))
      .orderBy(col("look"))
  }

  val all: Seq[QueryDef] = Seq(
    q390SequentialTest,
    q385SimpsonsFlip,
    q375CemAtt,
    q360KruskalWallis,
    q332DeltaJoinMv, q344CdcCompaction,
    q227IntegrityScorecard, q231MarketShare, q235MvMaintenance, q244Cuped, q247AqpGroupby,
    q266BenfordAudit, q267NeymanAllocation, q268GiniLorenz, q287CdcApply, q290XmlShred,
    q293DiffInDiff, q295EffectSize, q299WeightedMedian, q309AaHarness, q311AbcClasses,
    q315TrendingMovers, q317TopkOther, q323QuantileEffects, q324WilsonRanking,
    q253RfmSegments, q254AssociationRules, q255CohortLtv, q256DeletionCascade,
    q257EquiDepthAudit, q261BitemporalAsof,
    q01PricingSummary, q02SelectiveFilter, q03ShippingPriority, q05LocalRevenue,
    q06SemiJoin, q07AntiJoin, q08RangeJoin, q09DistinctUsers, q10Rollup,
    q11Cube, q12WindowRank, q13WindowRunning, q14TopOrders, q15SetOps,
    q16StringFns, q17DateFns, q18MathFns, q19JsonFns, q20CaseWhen,
    q48ApproxDistinct, q50SetOpsAll, q51SqlInterface, q54FromJson,
    q56SupplierRanking, q57WeightedMean, q58GroupingSets, q59ExactStats,
    q60Percentiles, q65OuterJoin, q66FullOuter, q67Unpivot,
    q69CorrelatedSubquery, q71WindowAnalytics, q73EventSequences,
    q75PartProfile, q76OrderLineDensity, q77SupplierBalance,
    q82TimeRangeFrame, q83RecursiveCte, q84Variant, q86NullAwareAnti,
    q87CogroupStats, q88SqlUdf, q89ZorderKey, q90Scd2Upsert,
    q91ApproxPercentiles, q92Histogram, q93HllMerge, q94Winsorize,
    q97FuzzyMatch, q98RevenueShare, q101Copurchase, q103Outliers, q104GapFill,
    q105CopurchaseSimilarity, q106RollingAverage)
}

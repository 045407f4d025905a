package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The block two-pass rank device, shared: a distributed exact global
  * ROW_NUMBER (and the order statistics built on it — NTILE, cumulative
  * sums) WITHOUT a single-partition window over a data-proportional
  * relation.
  *
  * The trap it removes: `ROW_NUMBER() OVER (ORDER BY k)` on a relation
  * that grows with the data plans as ONE WindowExec on ONE partition —
  * Spark itself warns (`WindowExec: No Partition Defined ... serious
  * performance degradation`), and at 10⁸–10⁹ rows the single sorted
  * partition is the same scale-killer class as an unbudgeted node-relation
  * broadcast. The device (the q100 shard-packing / q204 budget-select
  * decomposition, generalized):
  *
  *   1. coarsen the leading sort key into a BLOCK key by any monotone
  *      map (the value itself when its range is bounded — days, small
  *      counts; `value div width` otherwise). Monotonicity means block
  *      order extends the row order, so ranks compose.
  *   2. per-block counts → a blocks-sized offset relation; its exclusive
  *      running total is the ONLY global-order window, over ≈
  *      value-range/width rows regardless of corpus size.
  *   3. broadcast the offsets back; global rank = block offset +
  *      ROW_NUMBER within the block (partitioned window, parallel).
  *
  * Ranks are exact integers, so the decomposition is bit-identical to the
  * naive global window — every caller's DuckDB oracle keeps the plain
  * `ROW_NUMBER()/NTILE()/SUM() OVER (ORDER BY ...)` form, proving it.
  *
  * Block-width choice at 100 TB: pick the coarsening so the offsets
  * relation stays ~10³–10⁵ rows (broadcastable) while no single block
  * collects a disproportionate share (finer width bounds any hot block;
  * both needs are monotone in width, tuned per value distribution).
  *
  * Cost shape: the input is read TWICE (the per-block count/sum pass,
  * then the rank pass) — both fully parallel, column-pruned scans. The
  * naive global window reads once but pays a single-task sort that
  * grows with the corpus; two parallel scans vs one serial sort is the
  * whole trade, and it inverts in the device's favor long before the
  * single task spills. Callers ranking an already-persisted relation
  * pay the second read from cache.
  */
object BlockRank {

  /** Internal column names — prefixed so PlanSpec can recognize the
    * offsets relation (the one legitimate unpartitioned window) in a
    * physical plan. */
  val BlkCol = "_blk"
  val BlkCountCol = "_blk_n"
  val BlkOffsetCol = "_blk_off"

  /** Add `out` = exact 1-based global ROW_NUMBER of `df` under the total
    * order (block order, then `inner` within block), computed by the
    * two-pass device. `blk` MUST be a monotone coarsening of the leading
    * `inner` key (ascending when `blkAsc`, descending otherwise) and
    * `inner` must be a total order within a block — together they must
    * reproduce the intended global ORDER BY exactly. */
  def globalRowNumber(
      df: DataFrame, blk: Column, blkAsc: Boolean,
      inner: Seq[Column], out: String): DataFrame = {
    val withBlk = df.withColumn(BlkCol, blk)
    val blkOrd = if (blkAsc) col(BlkCol).asc else col(BlkCol).desc
    val offsets = withBlk.groupBy(col(BlkCol))
      .agg(count(lit(1)).as(BlkCountCol))
      .withColumn(BlkOffsetCol, coalesce(
        sum(col(BlkCountCol)).over(
          Window.orderBy(blkOrd).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(BlkCol), col(BlkOffsetCol))
    withBlk.join(broadcast(offsets), Seq(BlkCol))
      .withColumn(out,
        (col(BlkOffsetCol) + row_number().over(
          Window.partitionBy(col(BlkCol)).orderBy(inner: _*))).cast("long"))
      .drop(BlkCol, BlkOffsetCol)
  }

  /** [[globalRowNumber]] PER GROUP — exact 1-based row number within
    * each distinct `grpNames` tuple under (block order, then `inner`),
    * for the alphabet-partitioned window class (`PARTITION BY lang
    * ORDER BY …` where each partition is corpus/|alphabet| — still one
    * task per language at 10⁹ docs): the heavy windows partition by
    * (group, block); the only per-group ordered window runs on the
    * groups × blocks offsets relation. That relation must stay
    * broadcastable — true when the group alphabet is bounded (langs,
    * flags, sources), which is this device's use case; for
    * data-proportional groups use a plain partitioned window (each
    * group is then small) — the two devices cover complementary
    * regimes. `blk` must be a monotone coarsening of the leading
    * `inner` key WITHIN every group (a `floor(value × 2²⁰)` scale-up
    * works for bounded doubles: floor of a monotone map is monotone,
    * and `inner` breaks intra-block ties exactly). */
  def groupedRowNumber(
      df: DataFrame, grpNames: Seq[String], blk: Column, blkAsc: Boolean,
      inner: Seq[Column], out: String): DataFrame = {
    val withBlk = df.withColumn(BlkCol, blk)
    val blkOrd = if (blkAsc) col(BlkCol).asc else col(BlkCol).desc
    val offsets = withBlk.groupBy(grpNames.map(col) :+ col(BlkCol): _*)
      .agg(count(lit(1)).as(BlkCountCol))
      .withColumn(BlkOffsetCol, coalesce(
        sum(col(BlkCountCol)).over(
          Window.partitionBy(grpNames.map(col): _*).orderBy(blkOrd)
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(grpNames.map(col) :+ col(BlkCol) :+ col(BlkOffsetCol): _*)
    withBlk.join(broadcast(offsets), grpNames :+ BlkCol)
      .withColumn(out,
        (col(BlkOffsetCol) + row_number().over(
          Window.partitionBy(grpNames.map(col) :+ col(BlkCol): _*)
            .orderBy(inner: _*))).cast("long"))
      .drop(BlkCol, BlkOffsetCol)
  }

  /** Add `out` = exact running SUM of `value` under the same block-total
    * order (the q204 prefix-sum face of the device): the offsets relation
    * carries exclusive cumulative block VALUE totals instead of counts.
    * Integer `value` makes the decomposition bit-equal to
    * `SUM(value) OVER (ORDER BY ... ROWS UNBOUNDED PRECEDING)`. */
  def globalRunningSum(
      df: DataFrame, blk: Column, blkAsc: Boolean,
      inner: Seq[Column], value: Column, out: String): DataFrame = {
    val withBlk = df.withColumn(BlkCol, blk)
    val blkOrd = if (blkAsc) col(BlkCol).asc else col(BlkCol).desc
    val offsets = withBlk.groupBy(col(BlkCol))
      .agg(sum(value).as(BlkCountCol))
      .withColumn(BlkOffsetCol, coalesce(
        sum(col(BlkCountCol)).over(
          Window.orderBy(blkOrd).rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(col(BlkCol), col(BlkOffsetCol))
    withBlk.join(broadcast(offsets), Seq(BlkCol))
      .withColumn(out,
        (col(BlkOffsetCol) + sum(value).over(
          Window.partitionBy(col(BlkCol)).orderBy(inner: _*)
            .rowsBetween(Window.unboundedPreceding, 0))).cast("long"))
      .drop(BlkCol, BlkOffsetCol)
  }

  /** [[globalRunningSum]] within groups (the [[groupedRowNumber]] face
    * of the prefix-sum device): exact running SUM of `value` per group
    * under (block order, `inner` within block) — for the
    * few-large-groups shape where `PARTITION BY grp ORDER BY …` still
    * funnels each data-proportional group through one task. The offsets
    * window runs over (groups × blocks) rows only. Bit-equal to
    * `SUM(value) OVER (PARTITION BY grp ORDER BY … ROWS UNBOUNDED
    * PRECEDING)` for integer `value`. */
  def groupedRunningSum(
      df: DataFrame, grpNames: Seq[String], blk: Column, blkAsc: Boolean,
      inner: Seq[Column], value: Column, out: String): DataFrame = {
    val withBlk = df.withColumn(BlkCol, blk)
    val blkOrd = if (blkAsc) col(BlkCol).asc else col(BlkCol).desc
    val offsets = withBlk.groupBy(grpNames.map(col) :+ col(BlkCol): _*)
      .agg(sum(value).as(BlkCountCol))
      .withColumn(BlkOffsetCol, coalesce(
        sum(col(BlkCountCol)).over(
          Window.partitionBy(grpNames.map(col): _*).orderBy(blkOrd)
            .rowsBetween(Window.unboundedPreceding, -1)),
        lit(0L)))
      .select(grpNames.map(col) :+ col(BlkCol) :+ col(BlkOffsetCol): _*)
    withBlk.join(broadcast(offsets), grpNames :+ BlkCol)
      .withColumn(out,
        (col(BlkOffsetCol) + sum(value).over(
          Window.partitionBy(grpNames.map(col) :+ col(BlkCol): _*)
            .orderBy(inner: _*)
            .rowsBetween(Window.unboundedPreceding, 0))).cast("long"))
      .drop(BlkCol, BlkOffsetCol)
  }

  /** [[globalRowNumber]] with the block width derived FROM THE DATA: a
    * 1-row (min, width) aggregate over the integer leading key sizes the
    * coarsening `(value - min) div width` to ≈ `targetBlocks` blocks
    * regardless of the key's scale — margins that grow with the corpus,
    * cents whose range nobody wants to hand-tune. No static width to
    * outgrow: offsets stay ≤ targetBlocks + 1 rows at ANY data size and
    * per-block occupancy stays ≈ n/targetBlocks (uniform keys). The key
    * must be integral and non-null; `asc` is the direction of the total
    * order on `value` (inner must start with `value` in that direction). */
  def globalRowNumberAdaptive(
      df: DataFrame, value: Column, asc: Boolean,
      inner: Seq[Column], out: String,
      targetBlocks: Int = 65536): DataFrame = {
    val staged = withAdaptiveBlockStats(df, value, targetBlocks)
    globalRowNumber(staged, adaptiveBlk(value), asc, inner, out)
      .drop(BlkMinCol, BlkWidthCol)
  }

  /** [[globalRunningSum]] with the same data-derived block width. */
  def globalRunningSumAdaptive(
      df: DataFrame, value: Column, asc: Boolean,
      inner: Seq[Column], sumValue: Column, out: String,
      targetBlocks: Int = 65536): DataFrame = {
    val staged = withAdaptiveBlockStats(df, value, targetBlocks)
    globalRunningSum(staged, adaptiveBlk(value), asc, inner, sumValue, out)
      .drop(BlkMinCol, BlkWidthCol)
  }

  private val BlkMinCol = "_blk_mn"
  private val BlkWidthCol = "_blk_w"

  private def withAdaptiveBlockStats(
      df: DataFrame, value: Column, targetBlocks: Int): DataFrame = {
    val stats = df.agg(min(value).cast("long").as(BlkMinCol),
        max(value).cast("long").as("_blk_mx"))
      .select(col(BlkMinCol),
        greatest(lit(1L),
          expr(s"(_blk_mx - $BlkMinCol) div $targetBlocks")).as(BlkWidthCol))
    df.crossJoin(broadcast(stats))
  }

  private def adaptiveBlk(value: Column): Column =
    ((value.cast("long") - col(BlkMinCol)) / col(BlkWidthCol)).cast("long")

  /** NTILE(k) reconstructed from an exact global rank: with n rows the
    * SQL-standard allocation gives the first (n mod k) buckets
    * ceil(n/k) rows and the rest floor(n/k) — a pure integer function of
    * (rank, n), so the tile needs NO window at all once the rank exists.
    * `rankCol`/`nCol` are column NAMES (the formula needs integer `div`,
    * which only the SQL expression surface exposes). The q = 0 branch
    * (n < k) never divides by zero: every rank lands in the CASE's first
    * arm because big = n·1 ≥ rank. Output is INT, matching NTILE. */
  def ntileFromRank(rankCol: String, nCol: String, k: Int): Column = {
    val q = s"($nCol div $k)"
    val rem = s"($nCol % $k)"
    val big = s"($rem * ($q + 1))"
    expr(
      s"""CAST(CASE WHEN $rankCol <= $big
         |  THEN ($rankCol + $q) div ($q + 1)
         |  ELSE $rem + ($rankCol - $big + $q - 1) div $q
         |END AS INT)""".stripMargin)
  }
}

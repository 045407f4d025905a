package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ops.BlockRank

/** The block two-pass rank device must be BIT-IDENTICAL to the naive
  * global window it replaces — on ties, on negatives, on skew, in both
  * directions, and at every targetBlocks (including degenerate widths).
  * The callers' DuckDB oracles keep the plain `ROW_NUMBER()/NTILE()/SUM()
  * OVER (ORDER BY …)` form, so any divergence here is a correctness bug
  * in the device, not a tolerance question. */
class BlockRankSpec extends SparkSpec {
  import spark.implicits._

  /** Deterministic adversarial fixture: heavy ties (v in a small range),
    * negatives, a skewed hot value, and a unique tiebreak key. */
  private def fixture(n: Int): DataFrame =
    spark.range(n).select(col("id").as("k"),
      // ~n/4 rows pile on v=7 (hot block), the rest spread over ±50
      when(col("id") % 4 === 0, lit(7L))
        .otherwise((col("id") * 37 % 101) - 50).cast("long").as("v"),
      (col("id") * 13 % 29).cast("long").as("w"))

  private def naiveRank(df: DataFrame, asc: Boolean): DataFrame = {
    val ord = if (asc) Seq(col("v").asc, col("k").asc) else Seq(col("v").desc, col("k").asc)
    df.withColumn("rn_naive", row_number().over(Window.orderBy(ord: _*)).cast("long"))
  }

  test("globalRowNumberAdaptive equals the naive global ROW_NUMBER (asc and desc, ties, negatives)") {
    val df = fixture(5000)
    for (asc <- Seq(true, false); blocks <- Seq(1, 3, 64, 100000)) {
      val inner = if (asc) Seq(col("v").asc, col("k").asc) else Seq(col("v").desc, col("k").asc)
      val got = BlockRank.globalRowNumberAdaptive(df, col("v"), asc, inner, "rn", blocks)
      val bad = got.join(naiveRank(df, asc), "k")
        .filter(col("rn") =!= col("rn_naive")).count()
      assert(bad == 0, s"asc=$asc blocks=$blocks: $bad rank mismatches")
    }
  }

  test("globalRunningSumAdaptive equals the naive global running SUM") {
    val df = fixture(5000)
    for (asc <- Seq(true, false); blocks <- Seq(1, 7, 64)) {
      val inner = if (asc) Seq(col("v").asc, col("k").asc) else Seq(col("v").desc, col("k").asc)
      val ord = if (asc) Seq(col("v").asc, col("k").asc) else Seq(col("v").desc, col("k").asc)
      val got = BlockRank.globalRunningSumAdaptive(df, col("v"), asc, inner, col("w"), "cum", blocks)
      val want = df.withColumn("cum_naive",
        sum(col("w")).over(Window.orderBy(ord: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      val bad = got.join(want.select(col("k"), col("cum_naive")), "k")
        .filter(col("cum") =!= col("cum_naive")).count()
      assert(bad == 0, s"asc=$asc blocks=$blocks: $bad cumsum mismatches")
    }
  }

  test("ntileFromRank reproduces NTILE(k) exactly, including n % k != 0 and n < k") {
    for (n <- Seq(3, 5, 10, 47, 1000); k <- Seq(2, 5, 10)) {
      val df = spark.range(n).select((col("id") + 1).cast("long").as("rn"))
        .withColumn("n", lit(n.toLong))
      val got = df.withColumn("tile", BlockRank.ntileFromRank("rn", "n", k))
      val want = df.withColumn("tile_naive", ntile(k).over(Window.orderBy(col("rn"))))
      val bad = got.join(want.select(col("rn"), col("tile_naive")), "rn")
        .filter(col("tile") =!= col("tile_naive")).count()
      assert(bad == 0, s"n=$n k=$k: NTILE reconstruction diverged")
      assert(got.schema("tile").dataType.typeName == "integer", "NTILE output type is INT")
    }
  }

  test("the device plans every corpus-sized window partitioned; only the block-aggregate window is global") {
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val df = fixture(2000)
    val plan = BlockRank.globalRowNumberAdaptive(
      df, col("v"), asc = true, Seq(col("v").asc, col("k").asc), "rn")
      .queryExecution.optimizedPlan
    val windows = plan.collect { case w: LWindow => w }
    val (global, parted) = windows.partition(_.partitionSpec.isEmpty)
    assert(parted.nonEmpty, "the per-block rank must be a partitioned window")
    assert(global.nonEmpty, "the offsets prefix sum is the one global window")
    global.foreach { w =>
      assert(w.collect { case a: Aggregate => a }.nonEmpty,
        s"a global window may only range over the block aggregate:\n$w")
      assert(w.orderSpec.exists(_.child.references.exists(_.name == BlockRank.BlkCol)),
        s"the global window must order by the block key:\n$w")
    }
  }

  test("groupedRowNumber equals the naive partitioned ROW_NUMBER, including double keys via a floor-scaled block") {
    val df = spark.range(4000).select(col("id").as("k"),
      concat(lit("g"), (col("id") % 5).cast("string")).as("g"),
      // a double measure with heavy ties and sub-integer structure
      ((col("id") * 37 % 101).cast("double") / 7.0).as("v"))
    for (asc <- Seq(true, false)) {
      val inner = if (asc) Seq(col("v").asc, col("k").asc) else Seq(col("v").desc, col("k").asc)
      val got = BlockRank.groupedRowNumber(df, Seq("g"),
        floor(col("v") * 1048576).cast("long"), asc, inner, "rn")
      val want = df.withColumn("rn_naive", row_number().over(
        Window.partitionBy(col("g")).orderBy(inner: _*)).cast("long"))
      val bad = got.join(want.select(col("k"), col("rn_naive")), "k")
        .filter(col("rn") =!= col("rn_naive")).count()
      assert(bad == 0, s"asc=$asc: $bad grouped rank mismatches")
    }
  }

  test("groupedRunningSum equals the naive partitioned running SUM (ties, negatives, hot value)") {
    val df = fixture(4000).withColumn("g",
      concat(lit("g"), (col("k") % 5).cast("string")))
    for (asc <- Seq(true, false)) {
      val inner = if (asc) Seq(col("v").asc, col("k").asc) else Seq(col("v").desc, col("k").asc)
      val got = BlockRank.groupedRunningSum(df, Seq("g"),
        expr("v DIV 8"), asc, inner, col("w"), "cum")
      val want = df.withColumn("cum_naive",
        sum(col("w")).over(Window.partitionBy(col("g")).orderBy(inner: _*)
          .rowsBetween(Window.unboundedPreceding, 0)).cast("long"))
      val bad = got.join(want.select(col("k"), col("cum_naive")), "k")
        .filter(col("cum") =!= col("cum_naive")).count()
      assert(bad == 0, s"asc=$asc: $bad grouped running-sum mismatches")
    }
  }

  test("empty input yields empty output (the suspects relation can be empty at some SF)") {
    val df = fixture(100).filter(col("v") > 1000)
    assert(BlockRank.globalRowNumberAdaptive(
      df, col("v"), asc = true, Seq(col("v").asc, col("k").asc), "rn").count() == 0)
  }

  test("constant key degenerates to one block but stays exact") {
    val df = spark.range(500).select(col("id").as("k"), lit(42L).as("v"))
    val got = BlockRank.globalRowNumberAdaptive(
      df, col("v"), asc = true, Seq(col("v").asc, col("k").asc), "rn")
    val bad = got.filter(col("rn") =!= col("k") + 1).count()
    assert(bad == 0, "constant-key ranks must follow the tiebreak order exactly")
  }
}

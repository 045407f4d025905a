package graft

import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Contract of [[Tables.fanOut]] — the under-split-scan parallelizer
  * (SCALE.md "Under-split scans"): it must change PARTITIONING, never
  * data, and must be a no-op when the source already splits. */
class FanOutSpec extends SparkSpec {

  test("fan-out preserves rows and values exactly") {
    val raw = Tables.documents(spark, sfDir)
    val fanned = Tables.fanOut(raw)
    assert(fanned.count() == raw.count())
    // exact multiset equality via two-sided except
    assert(fanned.exceptAll(raw).isEmpty && raw.exceptAll(fanned).isEmpty)
  }

  test("an under-split source fans out to engine parallelism") {
    val raw = Tables.documents(spark, sfDir)
    assume(raw.rdd.getNumPartitions < spark.sparkContext.defaultParallelism,
      "fixture should arrive under-split (single row group)")
    val fanned = Tables.fanOut(raw)
    assert(fanned.rdd.getNumPartitions == spark.sparkContext.defaultParallelism)
  }

  test("a well-split source passes through untouched (no extra shuffle)") {
    val wide = Tables.documents(spark, sfDir)
      .repartition(spark.sparkContext.defaultParallelism + 4)
    val out = Tables.fanOut(wide)
    // the guard must not add a second exchange on top of an already
    // parallel frame — the plan object passes through identically
    assert(out eq wide)
  }

  test("downstream filters still push through the fan-out to the scan") {
    val scans = Tables.fanOut(Tables.documents(spark, sfDir))
      .filter(col("lang") === "en")
      .queryExecution.executedPlan.collectLeaves().map(_.toString).mkString("\n")
    assert(scans.contains("PushedFilters") && scans.contains("lang"),
      "predicate must reach the parquet scan below the repartition:\n" + scans)
  }
}

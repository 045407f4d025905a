package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet-backed table loaders for the driver fixtures
  * (`/root/testdata/sf*`, see TESTDATA.md / FIXTURES.md §B).
  *
  * All reads go through `spark.read.parquet` so Catalyst handles column
  * pruning and predicate pushdown into the scan — at 100 TB these tables
  * would be partitioned/bucketed parquet on distributed storage and the
  * same code holds; nothing here assumes a local filesystem beyond the
  * path string.
  */
object Tables {
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) in some fixture
    * generations and TIMESTAMP(MICROS, isAdjustedToUTC=false) in others,
    * so the loader adapts to what the footer declares rather than pinning
    * one generation's layout. Nanos would be rejected by Spark 4 outright
    * (PARQUET_TYPE_ILLEGAL), so the legacy conf reads them as LONG first.
    * Either way the column lands as a session-tz TIMESTAMP at microsecond
    * precision — DuckDB reads both layouts as the same naive micros, and
    * Verify/Bench pin the session zone to UTC, so oracle values agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    normalizeEventsTs(load(s, d, "events"))
  }

  /** Normalizes an events frame's `ts` to TimestampType: nanos-as-LONG
    * gets the integer-div shim (`div`, NOT `/` — epoch nanos exceed double
    * precision and float division would round the microsecond up on ~half
    * the rows); native timestamp columns (NTZ or not) just cast, which is
    * the identity under the UTC session zone both harness mains set. */
  def normalizeEventsTs(df: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampType}
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => df
      case _ => df.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")

  /** Round-robin fan-out to engine parallelism, applied at the head of
    * map-HEAVY pipelines (shingling, hashing, regex, array folds, edit
    * distance) — and ONLY when the source arrives under-split.
    *
    * Why it exists: Spark parallelizes a parquet scan by row group, and a
    * source written as few large row groups (the fixtures are exactly one)
    * yields a 1-partition scan — every pre-shuffle map operator then runs
    * on a single core no matter how many the cluster has (measured 10× on
    * q97: 12 s → 1.2 s). On production multi-row-group files the guard
    * makes this a no-op; when it does fire, the cost is one shuffle of
    * the slim input rows, repaid by parallelizing the expensive map work.
    *
    * Where NOT to use it (each measured at sf0.1): plain projections,
    * filters and sampling (the shuffle is pure overhead); small
    * dimension-like tables where per-row work is a bounded fold
    * (embeddings: 2k rows × 128-dim dot products finish before the
    * shuffle would); and value-collecting aggregates (exact percentile —
    * the aggregation state is the whole column regardless of input
    * partitioning, so fanning moves bytes without cutting the critical
    * path). Applied at: document text pipelines (tokenize / shingle /
    * md5 / regex per character) and the q97 pair-enumeration join. */
  def fanOut(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}

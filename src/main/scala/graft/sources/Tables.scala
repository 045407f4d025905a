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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark 4 rejects by
    * default (PARQUET_TYPE_ILLEGAL). Read nanos as long via the legacy
    * conf, then convert to a regular (microsecond) timestamp — the fixture
    * has no sub-microsecond components, and DuckDB's reader truncates to
    * micros the same way, so oracle values agree. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    // integer `div`, NOT `/`: epoch nanos exceed double precision and
    // float division would round the microsecond up on ~half the rows
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
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

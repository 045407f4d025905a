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
}

package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Output-side surface beyond the reference's CSV/console (Report):
  * partitioned and bucketed writers — the layouts a 100 TB deployment
  * depends on for partition pruning and shuffle-free joins.
  */
object Sinks {
  /** Hive-style partitioned parquet: downstream scans with a predicate on
    * a partition column prune whole directories (PartitionFilters). */
  def writePartitioned(df: DataFrame, path: String, partitionCols: String*): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(partitionCols: _*).parquet(path)

  /** Bucketed + sorted table (requires a table catalog, so it writes as a
    * managed table): two tables bucketed the same way join without a
    * shuffle — the persistent form of co-partitioning. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String, numBuckets: Int): Unit =
    df.write.mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** Single-file JSON lines export (small result sets only). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode(SaveMode.Overwrite).json(path)

  def readJson(spark: SparkSession, path: String): DataFrame = spark.read.json(path)

  /** ORC round-trip — the second columnar format Spark ships natively;
    * same pushdown/pruning machinery as parquet (PushedFilters in the
    * OrcScan), so a deployment standardized on ORC keeps every plan
    * property this engine relies on. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame = spark.read.orc(path)

  /** Header CSV export/import (the generic-source face of Report's
    * reference-exact CSV sink). */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite).option("header", "true").csv(path)

  def readCsv(spark: SparkSession, path: String, schema: String): DataFrame =
    spark.read.option("header", "true").schema(schema).csv(path)
}

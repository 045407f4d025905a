package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Analytics, Classifier, Contracts, Dedup, Graph, Layout, Multimodal, QueryDef, SchemaLint, Similarity, StreamingOps, Temporal, TextOps, Tokenizer}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 registers one entry in
  * [[queries]]; operators expressible in ANSI SQL also register a DuckDB
  * oracle in [[oracleSql]] (same column names, deterministic ORDER BY —
  * the driver hash-compares values after sorting columns by name).
  */
object SparkEntry {
  private def registry: Seq[QueryDef] =
    SchemaLint.all ++ Analytics.all ++ Temporal.all ++ TextOps.all ++
      Dedup.all ++ Similarity.all ++ StreamingOps.all ++ Multimodal.all ++
      Layout.all ++ Classifier.all ++ Tokenizer.all ++ Graph.all ++
      Contracts.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    ops.Analytics.q05LocalRevenue.run(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(o => q.name -> o)).toMap
}

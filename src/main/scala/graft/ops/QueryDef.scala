package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named engine capability: a Spark query over the fixture dir plus an
  * optional DuckDB-equivalent SQL oracle (driver contract, SparkEntry).
  *
  * `oracle = None` → the driver records a weaker rows-only check (used for
  * ops DuckDB cannot express, e.g. session windows, streaming state).
  */
final case class QueryDef(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, Some(oracle))
  def rowsOnly(name: String)(run: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, run, None)
}

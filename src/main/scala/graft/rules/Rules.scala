package graft.rules

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.catalog.Catalog

/** The reference's five schema-lint rules (`/root/reference/app.py:41-105`)
  * as whole-relation DataFrame transforms.
  *
  * The reference's per-table nested loop + hand-built membership sets
  * (`app.py:31-38,34-35`) vanish: each rule is a filter/anti-join/project
  * over the `columns` relation, so Catalyst keeps the whole pipeline in one
  * codegen'd stage and the (tiny) index/FK relations are broadcast into
  * `left_anti` joins — the scale-correct replacement for `x not in set`.
  *
  * Message strings reproduce the `app.py` f-strings byte-for-byte,
  * including R2's trailing space (`app.py:61-62`) and R4's missing final
  * period (`app.py:92`).
  */
object Rules {
  private val orderCols = Seq("table_seq", "ordinal", "rule_id")
  private val outCols = Seq("table", "column", "issue_type", "issue", "recommendation")

  private def issueRow(ruleId: Int, issueType: String, issue: Column, recommendation: Column)(df: DataFrame): DataFrame =
    df.select(
      col("table_seq"), col("ordinal"), lit(ruleId).as("rule_id"),
      col("table_name").as("table"), col("column_name").as("column"),
      lit(issueType).as("issue_type"), issue.as("issue"), recommendation.as("recommendation"))

  /** `column.name not in indexed_columns` (`app.py:44,55`) as a broadcast
    * left-anti join on (table, column). */
  private def notIndexed(columns: DataFrame, catalog: Catalog): DataFrame =
    columns.join(
      broadcast(catalog.indexCols.select("table_name", "column_name")),
      Seq("table_name", "column_name"), "left_anti")

  /** `column.name not in foreign_key_columns` (`app.py:55`); only the FIRST
    * constrained column of each FK counts (`app.py:35`). */
  private def notFkCovered(columns: DataFrame, catalog: Catalog): DataFrame =
    columns.join(
      broadcast(catalog.fkCols.filter(col("ordinal_position") === 1)
        .select("table_name", "column_name")),
      Seq("table_name", "column_name"), "left_anti")

  /** Rule 1 (`app.py:42-51`): large VARCHAR/TEXT, not indexed, not unique.
    * The `hasattr … and length` guard means a NULL/0 length never fires. */
  def rule1(catalog: Catalog): DataFrame = {
    val candidates = catalog.columns
      .filter(col("data_type").isin("VARCHAR", "TEXT") &&
        col("char_max_length").isNotNull && col("char_max_length") =!= 0 &&
        col("char_max_length") >= 255 && !col("is_unique"))
    issueRow(1, "Query performance - missing index",
      concat(lit("Large "), col("data_type"), lit(" column '"), col("column_name"),
        lit("' in '"), col("table_name"), lit("' is not indexed.")),
      concat(lit("Add an index on '"), col("table_name"), lit("("), col("column_name"),
        lit(")' to improve query performance.")))(notIndexed(candidates, catalog))
  }

  /** Rule 2 (`app.py:53-63`): id-named columns lacking FK/index/PK.
    * Matches `lower(name)` prefix OR suffix "id" (`app.py:54`); trailing
    * space in the recommendation is the reference's own (`app.py:62`). */
  def rule2(catalog: Catalog): DataFrame = {
    val lcName = lower(col("column_name"))
    val candidates = catalog.columns
      .filter((lcName.endsWith("id") || lcName.startsWith("id")) && !col("is_primary_key"))
    issueRow(2, "Normalization - Data integrity",
      concat(lit("Potential foreign key column '"), col("column_name"),
        lit("' is not properly defined.")),
      concat(lit("Define a foreign key constraint and index for '"), col("column_name"),
        lit("' referencing the appropriate table and add the correct kind of index. ")))(
      notIndexed(notFkCovered(candidates, catalog), catalog))
  }

  /** Rule 3 (`app.py:65-76`): monetary-named columns not DECIMAL/NUMERIC.
    * Substring (not word) match, keyword list order as in `app.py:66-67`;
    * type comparison is case-sensitive (`app.py:68`). */
  def rule3(catalog: Catalog): DataFrame = {
    val keywords = Seq("price", "amount", "total", "cost", "value", "balance", "rate")
    val lcName = lower(col("column_name"))
    val candidates = catalog.columns
      .filter(keywords.map(k => lcName.contains(k)).reduce(_ || _) &&
        !col("data_type").isin("DECIMAL", "NUMERIC"))
    issueRow(3, "Data type - Precision error",
      concat(lit("Monetary column '"), col("column_name"), lit("' is of type '"),
        col("data_type"), lit("', expected DECIMAL or NUMERIC.")),
      concat(lit("Consider changing the column '"), col("table_name"), lit("("),
        col("column_name"),
        lit(")' to DECIMAL or NUMERIC for better precision in monetary calculations.")))(candidates)
  }

  /** Rule 4 (`app.py:78-93`): expected-type dictionary lookup — implemented
    * as a broadcast join against a 3-row literal relation (`app.py:79-83`). */
  def rule4(catalog: Catalog): DataFrame = {
    val spark = catalog.columns.sparkSession
    import spark.implicits._
    val expected = Seq("rating" -> "FLOAT", "created_at" -> "DATETIME", "order_date" -> "DATETIME")
      .toDF("expected_name", "expected_type")
    val candidates = catalog.columns
      .join(broadcast(expected), lower(col("column_name")) === col("expected_name"))
      .filter(col("data_type") =!= col("expected_type"))
    issueRow(4, "Data type mismatch",
      concat(lit("Column '"), col("column_name"), lit("' has type '"), col("data_type"),
        lit("', expected '"), col("expected_type"), lit("'.")),
      concat(lit("Change column '"), col("table_name"), lit("("), col("column_name"),
        lit(")' to '"), col("expected_type"), lit("' to match the expected type defined")))(candidates)
  }

  /** Rule 5 (`app.py:95-105`): NOT NULL policy columns that allow NULL. */
  def rule5(catalog: Catalog): DataFrame = {
    val nonNullable = Seq("email", "price", "total_amount", "order_date", "rating")
    val candidates = catalog.columns
      .filter(lower(col("column_name")).isin(nonNullable: _*) && col("is_nullable"))
    issueRow(5, "Data Integrity - NULL values not allowed",
      concat(lit("Critical column '"), col("column_name"), lit("' allows NULL values.")),
      concat(lit("Alter column '"), col("table_name"), lit("("), col("column_name"),
        lit(")' to NOT NULL to maintain data integrity.")))(candidates)
  }

  /** All five rules union-all'd in reference emission order: tables in
    * catalog order, columns in DDL order, rules R1→R5 per column
    * (`app.py:31,38,42-105` — one column can emit several issues). */
  def all(catalog: Catalog): DataFrame =
    Seq(rule1 _, rule2 _, rule3 _, rule4 _, rule5 _)
      .map(r => r(catalog))
      .reduce(_ unionByName _)
      .orderBy(orderCols.map(col): _*)
      .select(outCols.map(col): _*)
}

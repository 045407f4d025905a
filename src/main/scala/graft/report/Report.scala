package graft.report

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** Report sinks mirroring the reference's two outputs
  * (`/root/reference/app.py:110-137`).
  */
object Report {
  /** CSV header is the literal list from `app.py:111`. */
  val header = Seq("Table", "Column", "Issue Type", "Issue", "Recommendation")

  /** CSV export (`app.py:110-119`): header row, UTF-8, quote-only-when-
    * needed (Spark's default, matching Python csv). Path pattern
    * `exports/{database}_schema_issues.csv` per `app.py:135`. The
    * `coalesce(1)` mirrors the reference's single-file output — for a
    * genuinely huge report you would drop it and write partitioned. */
  def writeCsv(issues: DataFrame, exportsDir: String, database: String): String = {
    val path = s"$exportsDir/${database}_schema_issues.csv"
    issues
      .select(
        col("table").as("Table"), col("column").as("Column"),
        col("issue_type").as("Issue Type"), col("issue").as("Issue"),
        col("recommendation").as("Recommendation"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(path)
    path
  }

  /** Console report (`app.py:126-137`): five labeled lines + blank per
    * issue, or the no-issues message. Driver-side by design — the
    * reference's stdout report is inherently a collect. */
  def renderConsole(issues: DataFrame, database: String): String = {
    val rows = issues.collect()
    if (rows.isEmpty) s"""No issues detected in schema "$database"."""
    else {
      val sb = new StringBuilder(s"""Schema "$database" issues detected:\n""")
      rows.foreach { r =>
        sb.append(s"Table: ${r.getAs[String]("table")}\n")
        sb.append(s"Column: ${r.getAs[String]("column")}\n")
        sb.append(s"Issue Type: ${r.getAs[String]("issue_type")}\n")
        sb.append(s"Issue: ${r.getAs[String]("issue")}\n")
        sb.append(s"Recommendation: ${r.getAs[String]("recommendation")}\n\n")
      }
      sb.result()
    }
  }
}

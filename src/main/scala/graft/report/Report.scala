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
    * needed (Spark's default, matching Python csv). Produces the exact
    * single-FILE artifact `exports/{database}_schema_issues.csv` of
    * `app.py:135`: the `coalesce(1)` write lands in a staging directory,
    * then the lone `part-*.csv` is renamed onto the target path via the
    * Hadoop FileSystem API — so the same code works on HDFS/S3A, and a
    * user of the reference gets a byte-compatible artifact shape. For a
    * genuinely huge report you would drop the coalesce and write
    * partitioned. */
  def writeCsv(issues: DataFrame, exportsDir: String, database: String): String = {
    import org.apache.hadoop.fs.Path
    val target = new Path(s"$exportsDir/${database}_schema_issues.csv")
    val staging = new Path(s"$exportsDir/.${database}_schema_issues.csv.tmp")
    issues
      .select(
        col("table").as("Table"), col("column").as("Column"),
        col("issue_type").as("Issue Type"), col("issue").as("Issue"),
        col("recommendation").as("Recommendation"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(staging.toString)
    val fs = target.getFileSystem(issues.sparkSession.sessionState.newHadoopConf())
    val part = fs.listStatus(staging)
      .map(_.getPath).find(_.getName.startsWith("part-"))
      .getOrElse(sys.error(s"no part file written under $staging"))
    if (fs.exists(target)) fs.delete(target, true)
    if (!fs.rename(part, target)) sys.error(s"could not rename $part to $target")
    fs.delete(staging, true)
    // the local ChecksumFileSystem renames its .crc sidecar alongside —
    // the reference's artifact is just the one CSV file
    fs.delete(new Path(target.getParent, s".${target.getName}.crc"), false)
    target.toString
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

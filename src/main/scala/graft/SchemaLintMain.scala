package graft

import org.apache.spark.sql.SparkSession

import graft.catalog.Catalog
import graft.ops.SchemaLint
import graft.report.Report
import graft.rules.Rules

/** The reference's `__main__` flow (`/root/reference/app.py:122-137`) as a
  * Spark application: load catalog → detect flaws → console report →
  * optional CSV export gated on EXPORT_TO_CSV=YES (case/whitespace-
  * insensitive, `app.py:134`).
  *
  * Catalog source selection:
  *   - `--jdbc <url> <database> [dialect]` — live RDBMS via JDBC
  *     (`app.py:123-124`'s engine.connect, as three bulk scans);
  *   - `--parquet <dir> <database>` — offline catalog snapshot;
  *   - no args — the built-in ecommerce_db fixture (demo mode).
  */
object SchemaLintMain {
  /** Database (schema) name from the connection string — urlparse path
    * minus the leading slash (`app.py:14-22`), with the reference's exact
    * failure message when the path is empty (`app.py:20`).
    *
    * Accepts both SQLAlchemy-style URLs (`mysql+pymysql://…/db`, the
    * reference's input) and JDBC URLs (`jdbc:mysql://…/db`, what
    * [[graft.catalog.Catalog.fromJdbc]] connects with): the `jdbc:`
    * prefix is stripped before parsing (URI would otherwise treat the
    * whole URL as opaque with a null path). Uses the raw (undecoded)
    * path like Python's urlparse, with a regex fallback for characters
    * URI rejects outright. */
  def databaseNameFromUrl(dbUrl: String): String = {
    val stripped = dbUrl.stripPrefix("jdbc:")
    val fromUri =
      try Option(new java.net.URI(stripped).getRawPath).getOrElse("").stripPrefix("/")
      catch { case _: java.net.URISyntaxException => "" }
    val name =
      if (fromUri.nonEmpty) fromUri
      else "^[^:]+://[^/]*/([^/?;#]+)".r.findFirstMatchIn(stripped)
        .map(_.group(1)).getOrElse("")
    require(name.nonEmpty, "Could not extract database name from DB_URL.")
    name
  }

  /** `DB_URL` from the environment, failing with the reference's exact
    * message when unset (`app.py:10-12`). */
  def dbUrlFromEnv(env: Map[String, String] = sys.env): String =
    env.getOrElse("DB_URL", sys.error(
      "Connect String (DB_URL) not set. Please provide it in the .env file."))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[4]"))
      .appName("graft-schema-lint")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val (catalog, database) = args.toList match {
      case "--jdbc" :: url :: db :: rest =>
        (Catalog.fromJdbc(spark, url, db, rest.headOption.getOrElse("mysql")), db)
      case "--parquet" :: dir :: db :: Nil => (Catalog.fromParquet(spark, dir), db)
      case "--env" :: rest => // the reference's own flow: DB_URL from env (app.py:10-22,123)
        val url = dbUrlFromEnv()
        val db = databaseNameFromUrl(url)
        (Catalog.fromJdbc(spark, url, db, rest.headOption.getOrElse("mysql")), db)
      case Nil => (SchemaLint.fixtureCatalog(spark), "ecommerce_db")
      case other =>
        System.err.println(s"unrecognized args: ${other.mkString(" ")}"); sys.exit(2)
    }

    val issues = Rules.all(catalog).cache()
    print(Report.renderConsole(issues, database))
    if (!issues.isEmpty && sys.env.getOrElse("EXPORT_TO_CSV", "NO").trim.toUpperCase == "YES") {
      val path = Report.writeCsv(issues, sys.env.getOrElse("EXPORTS_DIR", "exports"), database)
      println(s"Results exported to $path") // app.py:119
    }
    spark.stop()
  }
}

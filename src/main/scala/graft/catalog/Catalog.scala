package graft.catalog

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One row per column of the analyzed schema — the engine's input relation.
  *
  * Mirrors what the reference reflects per column (`/root/reference/app.py:38-44,55,97`):
  * type class name (`app.py:39`), `type.length` (`app.py:43`), `unique`
  * (`app.py:44`), `primary_key` (`app.py:55`), `nullable` (`app.py:97`).
  * `tableSeq`/`ordinal` carry the reference's iteration order
  * (`app.py:31,38`) so report row order is reproducible.
  */
final case class ColumnMeta(
    table_name: String,
    table_seq: Int,
    column_name: String,
    ordinal: Int,
    data_type: String,
    char_max_length: Option[Int],
    is_nullable: Boolean,
    is_unique: Boolean,
    is_primary_key: Boolean)

/** One row per (index, column) — the `indexed_columns` source (`app.py:32,34`). */
final case class IndexCol(table_name: String, index_name: String, column_name: String)

/** One row per (FK constraint, column) with its position — the
  * `foreign_key_columns` source (`app.py:33,35`). The reference counts only
  * the FIRST constrained column of each FK; consumers filter
  * `ordinal_position = 1` to reproduce that quirk.
  */
final case class FkCol(
    table_name: String,
    constraint_name: String,
    column_name: String,
    ordinal_position: Int,
    referenced_table: String)

/** The catalog snapshot the rule engine runs over: three small relations
  * (SURVEY.md §1.3). At 100 TB-of-data scale these stay tiny (they describe
  * schemas, not data) — they are always broadcast into the anti-joins.
  */
final case class Catalog(columns: DataFrame, indexCols: DataFrame, fkCols: DataFrame)

object Catalog {
  /** In-memory catalog for tests/fixtures. */
  def fromRows(
      spark: SparkSession,
      cols: Seq[ColumnMeta],
      idx: Seq[IndexCol] = Seq.empty,
      fks: Seq[FkCol] = Seq.empty): Catalog = {
    import spark.implicits._
    Catalog(cols.toDF(), idx.toDF(), fks.toDF())
  }

  /** Offline catalog snapshot (parquet) — same three relations on disk. */
  def fromParquet(spark: SparkSession, dir: String): Catalog = Catalog(
    spark.read.parquet(s"$dir/columns.parquet"),
    spark.read.parquet(s"$dir/index_cols.parquet"),
    spark.read.parquet(s"$dir/fk_cols.parquet"))

  /** Live-RDBMS catalog over JDBC, replacing the reference's N+1 access
    * pattern (one reflect + 2 round-trips per table, `app.py:28,32-33`)
    * with three bulk `information_schema` scans — each pushed down to the
    * server as a single query via the JDBC `query` option.
    *
    * Dialects: MySQL (`information_schema.statistics`) and PostgreSQL
    * (`information_schema.table_constraints`-based), per the reference's
    * supported backends (`/root/reference/README.md:21-28`,
    * `requirements.txt:2-5`). Code-complete; not exercised in this harness
    * (no live DB) — unit coverage is via [[fromRows]].
    */
  /** Lowest-level JDBC entry: three catalog queries (columns / index
    * columns / FK columns, shaped per §1.3) pushed to the server whole.
    * The dialect methods below supply the information_schema SQL;
    * custom/embedded engines (tests use in-memory Derby) can pass their
    * own. */
  def fromJdbcQueries(
      spark: SparkSession, url: String,
      columnsSql: String, indexColsSql: String, fkColsSql: String,
      driver: Option[String] = None): Catalog = {
    def jdbc(query: String): DataFrame = {
      val r = spark.read.format("jdbc").option("url", url).option("query", query)
      driver.fold(r)(d => r.option("driver", d)).load()
    }
    Catalog(jdbc(columnsSql), jdbc(indexColsSql), jdbc(fkColsSql))
  }

  def fromJdbc(spark: SparkSession, url: String, database: String, dialect: String = "mysql"): Catalog = {
    require(database.nonEmpty, "Could not extract database name from DB_URL.") // app.py:20
    def jdbc(query: String): DataFrame =
      spark.read.format("jdbc").option("url", url).option("query", query).load()
    dialect match {
      case "mysql" => Catalog(
        jdbc(s"""SELECT c.table_name, DENSE_RANK() OVER (ORDER BY c.table_name) AS table_seq,
                 |       c.column_name, c.ordinal_position AS ordinal,
                 |       UPPER(c.data_type) AS data_type,
                 |       c.character_maximum_length AS char_max_length,
                 |       c.is_nullable = 'YES' AS is_nullable,
                 |       EXISTS (SELECT 1 FROM information_schema.statistics s
                 |               WHERE s.table_schema = c.table_schema AND s.table_name = c.table_name
                 |                 AND s.column_name = c.column_name AND s.non_unique = 0
                 |                 AND s.index_name <> 'PRIMARY') AS is_unique,
                 |       c.column_key = 'PRI' AS is_primary_key
                 |FROM information_schema.columns c
                 |WHERE c.table_schema = '$database'""".stripMargin),
        jdbc(s"""SELECT s.table_name, s.index_name, s.column_name
                 |FROM information_schema.statistics s
                 |WHERE s.table_schema = '$database' AND s.index_name <> 'PRIMARY'""".stripMargin),
        jdbc(s"""SELECT k.table_name, k.constraint_name, k.column_name,
                 |       k.ordinal_position, k.referenced_table_name AS referenced_table
                 |FROM information_schema.key_column_usage k
                 |WHERE k.table_schema = '$database' AND k.referenced_table_name IS NOT NULL""".stripMargin))
      case "postgresql" => Catalog(
        jdbc(s"""SELECT c.table_name, DENSE_RANK() OVER (ORDER BY c.table_name) AS table_seq,
                 |       c.column_name, c.ordinal_position AS ordinal,
                 |       UPPER(c.data_type) AS data_type,
                 |       c.character_maximum_length AS char_max_length,
                 |       c.is_nullable = 'YES' AS is_nullable,
                 |       EXISTS (SELECT 1 FROM information_schema.table_constraints tc
                 |               JOIN information_schema.constraint_column_usage cu
                 |                 ON cu.constraint_name = tc.constraint_name
                 |               WHERE tc.constraint_type = 'UNIQUE' AND tc.table_name = c.table_name
                 |                 AND cu.column_name = c.column_name) AS is_unique,
                 |       EXISTS (SELECT 1 FROM information_schema.table_constraints tc
                 |               JOIN information_schema.constraint_column_usage cu
                 |                 ON cu.constraint_name = tc.constraint_name
                 |               WHERE tc.constraint_type = 'PRIMARY KEY' AND tc.table_name = c.table_name
                 |                 AND cu.column_name = c.column_name) AS is_primary_key
                 |FROM information_schema.columns c
                 |WHERE c.table_catalog = '$database' AND c.table_schema = 'public'""".stripMargin),
        jdbc("""SELECT t.relname AS table_name, i.relname AS index_name, a.attname AS column_name
                 |FROM pg_index ix
                 |JOIN pg_class t ON t.oid = ix.indrelid
                 |JOIN pg_class i ON i.oid = ix.indexrelid
                 |JOIN pg_attribute a ON a.attrelid = t.oid AND a.attnum = ANY(ix.indkey)
                 |WHERE NOT ix.indisprimary""".stripMargin),
        jdbc("""SELECT tc.table_name, tc.constraint_name, kcu.column_name,
                 |       kcu.ordinal_position, ccu.table_name AS referenced_table
                 |FROM information_schema.table_constraints tc
                 |JOIN information_schema.key_column_usage kcu ON kcu.constraint_name = tc.constraint_name
                 |JOIN information_schema.constraint_column_usage ccu ON ccu.constraint_name = tc.constraint_name
                 |WHERE tc.constraint_type = 'FOREIGN KEY'""".stripMargin))
      case other => throw new IllegalArgumentException(s"unsupported dialect: $other")
    }
  }
}

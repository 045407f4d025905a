package graft.catalog

/** The per-backend `information_schema` SQL behind [[Catalog.fromJdbc]],
  * extracted so tests can execute every query string against mock catalog
  * tables (JdbcCatalogSpec) — a typo in a column name or a syntax slip
  * fails a spec instead of shipping untested.
  *
  * The reference supports MySQL and PostgreSQL
  * (`/root/reference/README.md:21-28`, `requirements.txt:2-5`); its
  * SQLAlchemy `inspect()` does one reflection round-trip per table
  * (`app.py:28,31-35`) — here each backend is three bulk scans pushed to
  * the server whole.
  *
  * The database name is interpolated into the SQL (JDBC's `query` option
  * cannot bind parameters); [[escaped]] doubles single quotes so a quoted
  * name cannot break out of the string literal.
  */
object Dialects {
  /** The three catalog queries of one backend, shaped per SURVEY §1.3:
    * columns / index columns / FK columns. */
  final case class DialectSql(columnsSql: String, indexColsSql: String, fkColsSql: String)

  /** SQL-string-literal escape for the interpolated database name. */
  def escaped(database: String): String = database.replace("'", "''")

  def mysql(database: String): DialectSql = {
    val db = escaped(database)
    DialectSql(
      s"""SELECT c.table_name, DENSE_RANK() OVER (ORDER BY c.table_name) AS table_seq,
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
         |WHERE c.table_schema = '$db'""".stripMargin,
      s"""SELECT s.table_name, s.index_name, s.column_name
         |FROM information_schema.statistics s
         |WHERE s.table_schema = '$db' AND s.index_name <> 'PRIMARY'""".stripMargin,
      s"""SELECT k.table_name, k.constraint_name, k.column_name,
         |       k.ordinal_position, k.referenced_table_name AS referenced_table
         |FROM information_schema.key_column_usage k
         |WHERE k.table_schema = '$db' AND k.referenced_table_name IS NOT NULL""".stripMargin)
  }

  def postgresql(database: String): DialectSql = {
    val db = escaped(database)
    DialectSql(
      s"""SELECT c.table_name, DENSE_RANK() OVER (ORDER BY c.table_name) AS table_seq,
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
         |WHERE c.table_catalog = '$db' AND c.table_schema = 'public'""".stripMargin,
      """SELECT t.relname AS table_name, i.relname AS index_name, a.attname AS column_name
        |FROM pg_index ix
        |JOIN pg_class t ON t.oid = ix.indrelid
        |JOIN pg_class i ON i.oid = ix.indexrelid
        |JOIN pg_attribute a ON a.attrelid = t.oid AND a.attnum = ANY(ix.indkey)
        |WHERE NOT ix.indisprimary""".stripMargin,
      """SELECT tc.table_name, tc.constraint_name, kcu.column_name,
        |       kcu.ordinal_position, ccu.table_name AS referenced_table
        |FROM information_schema.table_constraints tc
        |JOIN information_schema.key_column_usage kcu ON kcu.constraint_name = tc.constraint_name
        |JOIN information_schema.constraint_column_usage ccu ON ccu.constraint_name = tc.constraint_name
        |WHERE tc.constraint_type = 'FOREIGN KEY'""".stripMargin)
  }

  def apply(dialect: String, database: String): DialectSql = dialect match {
    case "mysql" => mysql(database)
    case "postgresql" => postgresql(database)
    case other => throw new IllegalArgumentException(s"unsupported dialect: $other")
  }
}

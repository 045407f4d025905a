package graft

import java.nio.file.{Files, Paths}

import graft.catalog.Dialects

/** Dev-only dumper: writes the MySQL/PostgreSQL catalog SQL of
  * [[Dialects]] to a JSON file so `dev/dialect_check.py` can execute the
  * exact shipped strings against DuckDB's Postgres-flavored parser and
  * mocked catalog tables — a second engine's opinion on top of
  * JdbcCatalogSpec's Spark-SQL execution. Test scope: never ships. */
object DialectsDump {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/dialects.json")
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    def obj(d: Dialects.DialectSql): String =
      s"""{"columnsSql": ${q(d.columnsSql)}, "indexColsSql": ${q(d.indexColsSql)}, "fkColsSql": ${q(d.fkColsSql)}}"""
    val json =
      s"""{"mysql": ${obj(Dialects.mysql("mydb"))}, "postgresql": ${obj(Dialects.postgresql("pgdb"))}}"""
    Files.writeString(Paths.get(out), json)
    println(s"wrote $out")
  }
}

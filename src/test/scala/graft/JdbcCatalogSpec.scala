package graft

import java.sql.DriverManager

import graft.catalog.Catalog
import graft.ops.SchemaLint
import graft.rules.Rules

/** End-to-end JDBC catalog path (SURVEY.md §7.2.3: "exercised in tests via
  * an embedded-JDBC stand-in"): the ecommerce_db fixture is loaded into an
  * in-memory Derby database, read back through Spark's JDBC source with
  * the three bulk catalog queries, and run through all five rules. */
class JdbcCatalogSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  private def seedDerby(): Unit = {
    val conn = DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      def tryDrop(t: String): Unit =
        try st.execute(s"DROP TABLE $t") catch { case _: Exception => () }
      Seq("COLS_META", "IDX_META", "FK_META").foreach(tryDrop)
      st.execute("""CREATE TABLE COLS_META (
        table_name VARCHAR(64), table_seq INT, column_name VARCHAR(64),
        ordinal INT, data_type VARCHAR(32), char_max_length INT,
        is_nullable BOOLEAN, is_unique BOOLEAN, is_primary_key BOOLEAN)""")
      st.execute("CREATE TABLE IDX_META (table_name VARCHAR(64), index_name VARCHAR(64), column_name VARCHAR(64))")
      st.execute("""CREATE TABLE FK_META (table_name VARCHAR(64), constraint_name VARCHAR(64),
        column_name VARCHAR(64), ordinal_position INT, referenced_table VARCHAR(64))""")

      val insCols = conn.prepareStatement("INSERT INTO COLS_META VALUES (?,?,?,?,?,?,?,?,?)")
      SchemaLint.fixtureColumns.foreach { c =>
        insCols.setString(1, c.table_name); insCols.setInt(2, c.table_seq)
        insCols.setString(3, c.column_name); insCols.setInt(4, c.ordinal)
        insCols.setString(5, c.data_type)
        c.char_max_length match {
          case Some(l) => insCols.setInt(6, l)
          case None => insCols.setNull(6, java.sql.Types.INTEGER)
        }
        insCols.setBoolean(7, c.is_nullable); insCols.setBoolean(8, c.is_unique)
        insCols.setBoolean(9, c.is_primary_key)
        insCols.executeUpdate()
      }
      val insIdx = conn.prepareStatement("INSERT INTO IDX_META VALUES (?,?,?)")
      SchemaLint.fixtureIndexCols.foreach { i =>
        insIdx.setString(1, i.table_name); insIdx.setString(2, i.index_name)
        insIdx.setString(3, i.column_name); insIdx.executeUpdate()
      }
      val insFk = conn.prepareStatement("INSERT INTO FK_META VALUES (?,?,?,?,?)")
      SchemaLint.fixtureFkCols.foreach { f =>
        insFk.setString(1, f.table_name); insFk.setString(2, f.constraint_name)
        insFk.setString(3, f.column_name); insFk.setInt(4, f.ordinal_position)
        insFk.setString(5, f.referenced_table); insFk.executeUpdate()
      }
    } finally conn.close()
  }

  test("rules over a catalog read through the JDBC source match the in-memory fixture") {
    seedDerby()
    val catalog = Catalog.fromJdbcQueries(spark, url,
      columnsSql = "SELECT * FROM COLS_META",
      indexColsSql = "SELECT * FROM IDX_META",
      fkColsSql = "SELECT * FROM FK_META",
      driver = Some("org.apache.derby.jdbc.EmbeddedDriver"))
    val viaJdbc = Rules.all(catalog).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    val inMemory = SchemaLint.report(spark).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq
    assert(viaJdbc == inMemory)
    assert(viaJdbc.length == 18)
  }
}

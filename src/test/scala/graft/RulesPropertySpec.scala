package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.catalog.{Catalog, ColumnMeta, FkCol, IndexCol}
import graft.rules.Rules

/** Property-based rule invariants over random catalogs (SURVEY.md §5.2.3).
  * Catalogs are drawn from seeded ScalaCheck generators (deterministic runs;
  * the scalatest-scalacheck bridge is not available offline). */
class RulesPropertySpec extends SparkSpec {

  private val genType = Gen.oneOf("VARCHAR", "TEXT", "INTEGER", "FLOAT", "DECIMAL",
    "NUMERIC", "DATETIME", "DATE", "TINYINT", "DOUBLE")
  private val genName = Gen.oneOf("id", "user_id", "email", "price", "total_amount",
    "order_date", "rating", "name", "guid", "created_at", "balance_x", "note")

  private val genColumn: Gen[ColumnMeta] = for {
    table <- Gen.oneOf("t1", "t2", "t3")
    name <- genName
    dt <- genType
    len <- Gen.option(Gen.choose(1, 512))
    nullable <- Gen.oneOf(true, false)
    unique <- Gen.oneOf(true, false)
    pk <- Gen.oneOf(true, false)
  } yield ColumnMeta(table, table.last.toString.toInt, name, 1, dt,
    if (dt == "VARCHAR" || dt == "TEXT") len else None, nullable, unique, pk)

  private val genCatalog: Gen[(Seq[ColumnMeta], Seq[IndexCol], Seq[FkCol])] = for {
    colsRaw <- Gen.listOfN(25, genColumn)
    cols = colsRaw.groupBy(c => (c.table_name, c.column_name)).map(_._2.head).toSeq
      .zipWithIndex.map { case (c, i) => c.copy(ordinal = i + 1) }
    indexed <- Gen.someOf(cols)
    fkd <- Gen.someOf(cols)
  } yield (
    cols,
    indexed.map(c => IndexCol(c.table_name, s"ix_${c.column_name}", c.column_name)).toSeq,
    fkd.map(c => FkCol(c.table_name, s"fk_${c.column_name}", c.column_name, 1, "other")).toSeq)

  test("invariants hold over random catalogs") {
    val samples = (1 to 15).flatMap(i =>
      genCatalog.apply(Gen.Parameters.default, Seed(i.toLong)))
    assert(samples.size >= 10, "generator should produce most samples")
    samples.foreach { case (cols, idx, fks) =>
      val catalog = Catalog.fromRows(spark, cols, idx, fks)
      val issues = Rules.all(catalog).collect()
      val colSet = cols.map(c => (c.table_name, c.column_name)).toSet
      val idxSet = idx.map(i => (i.table_name, i.column_name)).toSet
      val colByKey = cols.map(c => (c.table_name, c.column_name) -> c).toMap

      // every issue points at a real column
      issues.foreach(r => assert(colSet.contains((r.getString(0), r.getString(1)))))

      // R1 never fires on indexed or unique columns
      issues.filter(_.getString(2) == "Query performance - missing index").foreach { r =>
        val key = (r.getString(0), r.getString(1))
        assert(!idxSet.contains(key))
        assert(!colByKey(key).is_unique)
      }

      // R5 never fires on NOT NULL columns
      issues.filter(_.getString(2) == "Data Integrity - NULL values not allowed").foreach { r =>
        assert(colByKey((r.getString(0), r.getString(1))).is_nullable)
      }

      // total row count equals the sum of independent per-rule counts
      val ruleSum = Seq(Rules.rule1 _, Rules.rule2 _, Rules.rule3 _, Rules.rule4 _, Rules.rule5 _)
        .map(r => r(catalog).count()).sum
      assert(issues.length.toLong == ruleSum)
    }
  }

  // ---- databaseNameFromUrl vs the real urlparse ------------------------

  private val genUrlPart: Gen[String] = Gen.oneOf(
    "host", "host:3306", "u:p@host", "u%ss:p@host:5432", "", "a b",
    "127.0.0.1:3306", "[::1]:5432", "u:p%40ss@h")
  private val genPath: Gen[String] = Gen.oneOf(
    "/db", "/db/extra", "//double", "/my%20db", "/db;param", "/db?x=1",
    "/db#frag", "/:odd", "/db;a/b;c", "", "/", "/db?x=1#f", "/db#f?x=1")
  private val genScheme: Gen[String] = Gen.oneOf(
    "mysql://", "mysql+pymysql://", "postgresql+psycopg2://", "postgres://",
    "9bad://", "://", "", "mysql:", "mysql:single/path")

  /** The engine must agree with `urlparse(url).path.lstrip('/')`
    * (`app.py:14-20`) on every URL shape — verified by running CPython's
    * own urlparse over the whole corpus in one subprocess (python3 is in
    * the container; cancel rather than fail where it is not). */
  test("databaseNameFromUrl matches CPython urlparse over a fuzz corpus") {
    assume(new java.io.File("/usr/bin/python3").exists ||
      scala.util.Try(Runtime.getRuntime.exec(Array("python3", "--version")).waitFor() == 0).getOrElse(false))
    val urls = (for {
      i <- 1 to 120
      g = for { s <- genScheme; a <- genUrlPart; p <- genPath } yield
        if (s.endsWith("://")) s + a + p else s + p.stripPrefix("/")
      u <- g.apply(Gen.Parameters.default, Seed(i.toLong))
    } yield u).distinct.filter(u => !u.contains('\n'))
    val in = java.nio.file.Files.createTempFile("urls", ".txt")
    java.nio.file.Files.writeString(in, urls.mkString("\n"))
    val script =
      """import sys
        |from urllib.parse import urlparse
        |for line in open(sys.argv[1], encoding='utf-8').read().split('\n'):
        |    try:
        |        name = urlparse(line).path.lstrip('/')
        |    except ValueError:
        |        name = ''
        |    print(name if name else '<<ERROR>>')
        |""".stripMargin
    val sf = java.nio.file.Files.createTempFile("upar", ".py")
    java.nio.file.Files.writeString(sf, script)
    val out = new StringBuilder
    val rc = scala.sys.process.Process(Seq("python3", sf.toString, in.toString))
      .!(scala.sys.process.ProcessLogger(l => { out.append(l).append('\n') }, _ => ()))
    assert(rc == 0, "python3 urlparse run failed")
    val expected = out.result().stripLineEnd.split("\n", -1)
    assert(expected.length == urls.length)
    urls.zip(expected).foreach { case (u, exp) =>
      val got = scala.util.Try(SchemaLintMain.databaseNameFromUrl(u)).getOrElse("<<ERROR>>")
      assert(got == exp, s"url <$u>: engine=$got urlparse=$exp")
    }
  }
}

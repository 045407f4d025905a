package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Planted-case semantics of the ExactSubstr span dedup (q126). */
class SpanDedupSpec extends SparkSpec {

  private def run(docs: Seq[(Long, String)], n: Int = 5): Map[Long, (Long, Long, String)] = {
    val s = spark
    import s.implicits._
    Dedup.spanDedup(
        docs.toDF("doc_id", "text").withColumn("toks", split(col("text"), " ")), n)
      .collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_dropped"), r.getAs[String]("clean_text"))))
      .toMap
  }

  test("a shared span survives only in the lower-(doc_id, pos) document") {
    val span = "a b c d e"
    val out = run(Seq(
      1L -> s"x1 x2 $span x3 x4",
      2L -> s"y1 $span y2 y3 y4"))
    assert(out(1L) == ((9L, 0L, s"x1 x2 $span x3 x4")), "first occurrence keeps its tokens")
    assert(out(2L) == ((9L, 5L, "y1 y2 y3 y4")), "later occurrence loses exactly the span")
  }

  test("overlapping duplicated spans merge their covered positions") {
    // doc 2 repeats a 6-token run from doc 1: both 5-gram occurrences
    // inside it are duplicates; the union covers all 6 tokens once
    val out = run(Seq(
      1L -> "p q a b c d e f r s",
      2L -> "w a b c d e f z"))
    assert(out(2L) == ((8L, 6L, "w z")))
  }

  test("a within-doc repeat keeps exactly its first copy") {
    val out = run(Seq(3L -> "a b c d e t a b c d e"))
    // second occurrence (pos 7..11) is covered; tokens 1..6 survive
    assert(out(3L) == ((11L, 5L, "a b c d e t")))
  }

  test("docs shorter than the span width and unique docs pass untouched") {
    val out = run(Seq(
      4L -> "too short",
      5L -> "entirely unique tokens only here now"))
    assert(out(4L) == ((2L, 0L, "too short")))
    assert(out(5L) == ((6L, 0L, "entirely unique tokens only here now")))
  }

  test("an exact duplicate document is emptied, not dropped from the output") {
    val text = "m n o p q r s"
    val out = run(Seq(6L -> text, 7L -> text))
    assert(out(6L) == ((7L, 0L, text)))
    assert(out(7L)._2 == 7L && out(7L)._3 == "")
  }

  test("fixture run drops spans while total token accounting balances") {
    val res = Dedup.q126SpanDedup.run(spark, sfDir).collect()
    assert(res.length == 500)
    val dropped = res.map(_.getAs[Long]("n_dropped")).sum
    assert(dropped > 0, "fixture contains cross-doc duplicated 10-gram spans")
    res.foreach { r =>
      val kept = r.getAs[String]("clean_text")
      val nKept = if (kept.isEmpty) 0 else kept.split(" ").length
      assert(nKept == r.getAs[Long]("n_tokens") - r.getAs[Long]("n_dropped"))
    }
  }
}

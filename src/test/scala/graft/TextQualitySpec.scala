package graft

import org.apache.spark.sql.functions._

import graft.ops.TextOps

/** Behavior of the round-4 text-curation operators on constructed inputs:
  * q117's repetition thresholds (which never fire on the near-random
  * fixture corpus) and q118's mixture rebalancing arithmetic. */
class TextQualitySpec extends SparkSpec {

  test("repetition metrics flag degenerate docs and clear natural ones") {
    import spark.implicits._
    val docs = Seq(
      (0L, "spam spam spam spam spam spam"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("doc_id", "text").withColumn("toks", split(col("text"), " "))
    val m = TextOps.repetitionMetrics(docs).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    // 6×"spam": 5 identical bigrams (share 1.0), 2 identical 5-grams (dup 0.5)
    assert(m(0L).getAs[Double]("top_bigram_share") == 1.0)
    assert(m(0L).getAs[Double]("dup_5gram_frac") == 0.5)
    assert(m(0L).getAs[Boolean]("repetitive"))
    // all-distinct doc: share 1/7, zero duplicate 5-grams
    assert(math.abs(m(1L).getAs[Double]("top_bigram_share") - 1.0 / 7) < 1e-15)
    assert(m(1L).getAs[Double]("dup_5gram_frac") == 0.0)
    assert(!m(1L).getAs[Boolean]("repetitive"))
  }

  test("source remix: exact rates, binding source keeps all, deterministic") {
    import spark.implicits._
    val docs = ((0 until 40).map(i => (i.toLong, "src0")) ++
      (40 until 60).map(i => (i.toLong, "src1")) ++
      (60 until 70).map(i => (i.toLong, "src2")))
      .toDF("doc_id", "source")
    // uniform target over sources sized 40/20/10 → cap = 10 docs per source
    val rates = TextOps.sourceRates(docs, lit(1)).collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Double]("rate")).toMap
    assert(rates == Map("src0" -> 0.25, "src1" -> 0.5, "src2" -> 1.0))
    val kept = TextOps.remixSources(docs, lit(1))
    val bySource = kept.groupBy(col("source")).count().collect()
      .map(r => r.getAs[String]("source") -> r.getAs[Long]("count")).toMap
    // rate 1.0 keeps every doc (md5 fraction is always < 1); others shrink
    assert(bySource("src2") == 10L)
    assert(bySource.getOrElse("src0", 0L) < 40L)
    // decisions are hash-derived, not random: reruns select the same set
    val ids1 = kept.select(col("doc_id")).collect().map(_.getLong(0)).toSet
    val ids2 = TextOps.remixSources(docs, lit(1))
      .select(col("doc_id")).collect().map(_.getLong(0)).toSet
    assert(ids1 == ids2)
  }
}

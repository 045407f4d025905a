package graft

import org.apache.spark.sql.functions._
import graft.ops.Similarity

/** Pins the embedding-classifier and eigen-projection operators on
  * planted geometry: kNN majority votes with deterministic ties, and
  * the power-iteration projection recovering a planted dominant axis. */
class KnnPcaSpec extends SparkSpec {
  import spark.implicits._

  private def emb(rows: (Long, Seq[Float], Int)*) =
    rows.toDF("vec_id", "embedding", "label")

  test("knnClassify: planted clusters classify correctly with k=3") {
    val df = emb(
      (1L, Seq(0.0f, 0.0f), 0), (2L, Seq(0.1f, 0.0f), 0), (3L, Seq(0.0f, 0.1f), 0),
      (4L, Seq(1.0f, 1.0f), 1), (5L, Seq(0.9f, 1.0f), 1), (6L, Seq(1.0f, 0.9f), 1),
      (10L, Seq(0.05f, 0.05f), 0), (11L, Seq(0.95f, 0.95f), 1))
    val got = Similarity.knnClassify(df, col("vec_id") >= 10, k = 3)
      .collect().map(r => (r.getLong(0), r.getInt(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSet == Set((10L, 0, 3L, true), (11L, 1, 3L, true)))
  }

  test("knnClassify: vote ties break to the smaller label") {
    // k=2: one neighbor from each cluster at identical distance
    val df = emb(
      (1L, Seq(1.0f, 0.0f), 5), (2L, Seq(-1.0f, 0.0f), 3),
      (10L, Seq(0.0f, 0.0f), 5))
    val got = Similarity.knnClassify(df, col("vec_id") >= 10, k = 2).collect()
    assert(got.length == 1)
    assert(got.head.getInt(2) == 3, "1-1 vote must go to the smaller label")
  }

  test("pcaPowerProjection orders vectors along the planted dominant axis") {
    val df = Seq(
      (1L, Seq(1.0f, 0.0f)), (2L, Seq(2.0f, 0.0f)),
      (3L, Seq(-1.0f, 0.05f)), (4L, Seq(3.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val got = Similarity.pcaPowerProjection(df, rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // x is the dominant component: projections must order as x does
    assert(got(3L) < got(1L) && got(1L) < got(2L) && got(2L) < got(4L))
    // and the x-aligned vectors project proportionally (1 : 2 : 3)
    assert(got(2L) == 2L * got(1L) && got(4L) == 3L * got(1L))
  }

  test("mmrRerank: diversity overrides pure relevance (hand trajectory)") {
    // query (1,0); a=(.95,.30) most relevant; a'=(.94,.34) near-dup of a;
    // b=(.80,-.60) diverse. Pure relevance top-2 = {a, a'}; MMR rank-2
    // must be b: score(a')=2·940e9-995e9=885e9 < score(b)=2·800e9-580e9=1020e9
    val df = Seq(
      (0L, Seq(1.0f, 0.0f), 0), (1L, Seq(0.95f, 0.30f), 0),
      (2L, Seq(0.94f, 0.34f), 0), (3L, Seq(0.80f, -0.60f), 0))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.mmrRerank(df, queryId = 0L, poolSize = 10, k = 3)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(3)))
    assert(got.toSeq == Seq(
      (1, 1L, 1900000000000L),
      (2, 3L, 1020000000000L),
      (3, 2L, 885000000000L)))
  }

  test("pcaPowerProjection is deterministic across runs") {
    val df = graft.sources.Tables.embeddings(spark, sfDir)
    val a = Similarity.pcaPowerProjection(df, 2).orderBy("vec_id").collect().toSeq
    val b = Similarity.pcaPowerProjection(df, 2).orderBy("vec_id").collect().toSeq
    assert(a == b && a.nonEmpty)
  }

  test("rag serve capstone: dense ranks, pool provenance, RRF re-derives, top pick maximizes rel") {
    val rows = Similarity.q166RagServe.run(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getInt(2), r.getInt(3),
        r.getDouble(4), r.getLong(5), r.getLong(6)))
    assert(rows.map(_._1).toSeq == (1 to 5), "served ranks must be dense 1..5")
    assert(rows.map(_._2).distinct.length == 5, "no doc served twice")
    rows.foreach { case (rank, _, lex, sem, rrf, rel, score) =>
      // pool provenance: at least one leg ranked the doc in its top-20
      assert((lex >= 1 && lex <= 20) || (sem >= 1 && sem <= 20),
        s"rank-$rank doc came from neither leg")
      // the emitted fused score re-derives from the emitted leg ranks
      val expect = (if (lex > 0) 1.0 / (60 + lex) else 0.0) +
        (if (sem > 0) 1.0 / (60 + sem) else 0.0)
      assert(rrf == math.round(expect * 1e6) / 1e6.toDouble, s"rrf $rrf != $expect")
      // MMR invariant: score = 2*rel - maxsim <= 2*rel
      if (rank > 1) assert(score <= 2 * rel)
    }
    // the first pick is pure relevance: max rel in the pool, and its
    // score is exactly 2*rel
    assert(rows.head._7 == 2 * rows.head._6)
    assert(rows.head._6 == rows.map(_._6).max)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.ops.Classifier

/** Batch-perceptron classifier (q127): planted separable data converges,
  * training is bit-deterministic, and the contract face is consistent. */
class PerceptronSpec extends SparkSpec {

  private def mkDocs(rows: Seq[(Long, String, String)]) = {
    val s = spark
    import s.implicits._
    rows.toDF("doc_id", "text", "lang")
  }

  test("linearly separable planted data trains to zero errors") {
    // positives speak 'alpha beta', negatives 'gamma delta' — disjoint
    // vocabulary, so some hash bucket separates them
    val docs = mkDocs((0L until 20L).map { i =>
      if (i % 2 == 0) (i, "alpha beta alpha beta alpha", "en")
      else (i, "gamma delta gamma delta gamma", "de")
    })
    val feats = Classifier.hashedFeatures(docs)
    val labels = docs.select(col("doc_id"),
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
    val w = Classifier.perceptronTrain(feats, labels, rounds = 10)
    val scored = Classifier.perceptronScore(feats, w).join(labels, "doc_id").collect()
    scored.foreach { r =>
      assert(r.getAs[Long]("y") * r.getAs[Long]("margin") > 0,
        s"doc ${r.getAs[Long]("doc_id")} misclassified after convergence")
    }
  }

  test("training is bit-deterministic: two runs produce identical weights") {
    val docs = mkDocs(Seq(
      (1L, "a b c d e", "en"), (2L, "f g h i j", "de"),
      (3L, "a b x y z", "en"), (4L, "f g q r s", "fr")))
    val feats = Classifier.hashedFeatures(docs)
    val labels = docs.select(col("doc_id"),
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
    def weights() = Classifier.perceptronTrain(feats, labels, rounds = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
    assert(weights() == weights())
  }

  test("bias feature rides every doc at the bias dim with count 1") {
    val docs = mkDocs(Seq((1L, "w1 w2", "en"), (2L, "w3", "de")))
    val f = Classifier.hashedFeatures(docs).collect()
    val bias = f.filter(_.getAs[Long]("dim") == Classifier.Dims.toLong)
    assert(bias.length == 2 && bias.forall(_.getAs[Long]("cnt") == 1L))
    f.foreach(r => assert(r.getAs[Long]("dim") <= Classifier.Dims.toLong))
  }

  test("contract face: pred agrees with margin sign and learning moved weights") {
    val rows = Classifier.q127Perceptron.run(spark, sfDir).collect()
    assert(rows.length == 500)
    rows.foreach { r =>
      val pred = r.getAs[Long]("pred")
      val margin = r.getAs[Long]("margin")
      assert(pred == (if (margin > 0) 1L else -1L))
      assert(math.abs(r.getAs[Long]("y")) == 1L)
    }
    assert(rows.exists(_.getAs[Long]("margin") != 0L), "training must move weights")
  }

  test("calibration deciles re-derive from the served margins; top decile dominates the bottom") {
    import graft.ops.Classifier
    val served = Classifier.q127Perceptron.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = Classifier.q182Calibration.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.map(_._1).toSeq == (1L to 10L))
    assert(got.map(_._2).sum == served.length.toLong)
    // driver NTILE: sort by (margin, doc_id), split into 10 near-equal runs
    val sorted = served.sortBy { case (id, _, m) => (m, id) }
    val n = sorted.length
    val deciles = (0 until 10).map { d =>
      val lo = d * n / 10 + math.min(d, n % 10)
      val hi = (d + 1) * n / 10 + math.min(d + 1, n % 10)
      sorted.slice(lo, hi)
    }
    got.foreach { case (d, cnt, nPos, rate, acc, meanM) =>
      val grp = deciles(d.toInt - 1)
      assert(cnt == grp.length.toLong, s"decile $d: n $cnt != ${grp.length}")
      val wantPos = grp.count(_._2 == 1L).toLong
      assert(nPos == wantPos, s"decile $d: n_pos $nPos != $wantPos")
      assert(rate == wantPos * 1000000L / grp.length)
      val wantAcc = grp.count { case (_, y, m) => (m > 0) == (y == 1L) }.toLong
      assert(acc == wantAcc * 1000000L / grp.length)
      assert(meanM == math.floor(grp.map(_._3).sum.toDouble / grp.length).toLong)
    }
    // an informative classifier concentrates positives in high-margin deciles
    assert(got.last._4 > got.head._4,
      s"top-decile pos rate ${got.last._4} must beat bottom ${got.head._4}")
  }

  test("conformal: tau re-derives as the exact order statistic and test coverage honors the guarantee") {
    import graft.ops.Classifier
    val served = Classifier.q127Perceptron.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val got = Classifier.q193Conformal.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getBoolean(4), r.getBoolean(5), r.getLong(6)))
    assert(got.nonEmpty)
    // tau from the calibration split, driver-side
    val cal = served.filter(_._1 % 2 == 0)
      .map { case (id, y, m) => (id, -y * m) }
      .sortBy { case (id, s) => (s, id) }
    val k = (9 * (cal.length + 1) + 9) / 10
    val tau = cal(k - 1)._2
    got.foreach { case (id, y, m, inPos, inNeg, covered, setSize) =>
      assert(id % 2 == 1, "only test-split docs are emitted")
      assert(inPos == (-m <= tau), s"doc $id in_set_pos")
      assert(inNeg == (m <= tau), s"doc $id in_set_neg")
      assert(covered == (if (y == 1L) inPos else inNeg))
      assert(setSize == (if (inPos) 1 else 0) + (if (inNeg) 1 else 0))
    }
    // the distribution-free guarantee: >= ~90% coverage (finite-sample slack)
    val coverage = got.count(_._6).toDouble / got.length
    assert(coverage >= 0.85, s"conformal coverage $coverage below the guarantee band")
    // the sets are informative: not everything is a 2-label set
    assert(got.exists(_._7 == 1L), "some prediction set must be a singleton")
  }

  test("persisted task weights equal a fresh retrain (read-state == retrain)") {
    val docs = graft.sources.Tables.documents(spark, sfDir)
    val feats = Classifier.hashedFeatures(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val labels = docs.select(col("doc_id"),
      when(col("lang") === "en", 1L).otherwise(-1L).as("y"))
    val fresh = Classifier.perceptronTrain(feats, labels, rounds = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val stored = Classifier.trainedTaskWeights(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    feats.unpersist()
    assert(stored == fresh, "published weight state must be bit-identical to retraining")
  }
}

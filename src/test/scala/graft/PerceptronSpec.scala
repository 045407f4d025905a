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
}

package graft

import graft.ops.{Analytics, Dedup, StreamingOps}
import graft.sources.Tables

/** Cross-query invariants: independent queries over the same fixtures must
  * agree with each other (a second correctness net on top of the DuckDB
  * oracle — this one catches errors that would corrupt BOTH engines the
  * same way, e.g. a wrong filter constant). */
class ConsistencySpec extends SparkSpec {

  test("q10 rollup grand total equals q01's sum over groups") {
    val q01 = Analytics.q01PricingSummary.run(spark, sfDir).collect()
    val grand = Analytics.q10Rollup.run(spark, sfDir).collect()
      .find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    assert(grand.getAs[Long]("n") == q01.map(_.getAs[Long]("count_order")).sum)
    val sumPrice = q01.map(_.getAs[Double]("sum_base_price")).sum
    assert(math.abs(grand.getAs[Double]("sum_price") - sumPrice) < 1e-6)
  }

  test("q11 cube grand total equals the orders row count") {
    val grand = Analytics.q11Cube.run(spark, sfDir).collect()
      .find(r => r.getString(0) == "ALL" && r.getString(1) == "ALL").get
    assert(grand.getAs[Long]("n") == Tables.orders(spark, sfDir).count())
  }

  test("semi and anti join partition the orders universe on their predicate") {
    val anti = Analytics.q07AntiJoin.run(spark, sfDir).count()
    val withLines = Tables.orders(spark, sfDir)
      .join(Tables.lineitem(spark, sfDir).select("l_orderkey").distinct(),
        org.apache.spark.sql.functions.col("o_orderkey") ===
          org.apache.spark.sql.functions.col("l_orderkey"), "left_semi").count()
    assert(anti + withLines == Tables.orders(spark, sfDir).count())
  }

  test("q09 exact distinct equals q48's exact column") {
    val a = Analytics.q09DistinctUsers.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    val b = Analytics.q48ApproxDistinct.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("exact_users")).toMap
    assert(a == b)
  }

  test("q50 bag identity: intersectAll + exceptAll partition the 1995 bag") {
    val rows = Analytics.q50SetOpsAll.run(spark, sfDir).collect()
    val nInt = rows.count(_.getString(0) == "int")
    val nExc = rows.count(_.getString(0) == "exc")
    val a = Tables.orders(spark, sfDir).filter(
      "o_orderdate >= timestamp'1995-01-01' and o_orderdate < timestamp'1996-01-01'").count()
    assert(nInt + nExc == a)
  }

  test("sliding windows contain tumbling windows five times over") {
    val tumbling = StreamingOps.q40EventsTumbling.run(spark, sfDir).collect()
      .map(_.getAs[Long]("n")).sum
    val sliding = StreamingOps.q49EventsSliding.run(spark, sfDir).collect()
      .map(_.getAs[Long]("n")).sum
    assert(sliding == 5 * tumbling)
  }

  test("as-of join output is one row per purchase") {
    val purchases = Tables.events(spark, sfDir).filter("event_type = 'purchase'").count()
    assert(graft.ops.Temporal.q46AsofJoin.run(spark, sfDir).count() == purchases)
  }

  test("q58 grouping sets agree with q10's rollup margins") {
    val gs = Analytics.q58GroupingSets.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getAs[Double]("sum_price"), r.getAs[Long]("n"))).toMap
    val rollup = Analytics.q10Rollup.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> (r.getAs[Double]("sum_price"), r.getAs[Long]("n"))).toMap
    // per-returnflag rows and the grand total appear in both shapes
    rollup.filter { case ((_, ls), _) => ls == "ALL" }.foreach { case (k, v) =>
      assert(gs(k) == v, s"margin $k differs between GROUPING SETS and ROLLUP")
    }
    // per-linestatus margins sum to the grand total
    val statusRows = gs.filter { case ((rf, ls), _) => rf == "ALL" && ls != "ALL" }
    assert(statusRows.values.map(_._2).sum == gs(("ALL", "ALL"))._2)
  }

  test("q59 exact stats agree with Spark's streaming stddev/corr within fp tolerance") {
    val exact = Analytics.q59ExactStats.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getAs[Double]("std_qty"), r.getAs[Double]("corr_qp"))).toMap
    val builtin = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg(
        org.apache.spark.sql.functions.stddev_samp(org.apache.spark.sql.functions.col("l_quantity")).as("sd"),
        org.apache.spark.sql.functions.corr("l_quantity", "l_extendedprice").as("cr"))
      .collect().map(r => r.getString(0) -> (r.getAs[Double]("sd"), r.getAs[Double]("cr"))).toMap
    exact.foreach { case (k, (sd, cr)) =>
      assert(math.abs(sd - builtin(k)._1) < 1e-6 * math.max(1.0, sd.abs))
      assert(math.abs(cr - builtin(k)._2) < 1e-6)
    }
  }

  test("q60 exact percentiles bracket between min/max and are monotone") {
    Analytics.q60Percentiles.run(spark, sfDir).collect().foreach { r =>
      val p50 = r.getAs[Double]("p50_price"); val p95 = r.getAs[Double]("p95_price")
      assert(p50 <= p95, s"${r.getString(0)}: p50 $p50 > p95 $p95")
      assert(p50 > 0 && p95 > 0)
    }
  }

  test("q57 UDAF weighted mean equals the Decimals-built ratio") {
    import org.apache.spark.sql.functions.col
    import graft.functions.Decimals._
    val udafRes = Analytics.q57WeightedMean.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("wavg_discount")).toMap
    val direct = Tables.lineitem(spark, sfDir)
      .groupBy("l_returnflag")
      .agg((dsum(rate(col("l_discount")) * qty(col("l_quantity"))) /
        dsum(qty(col("l_quantity")))).as("wm"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("wm")).toMap
    udafRes.foreach { case (k, v) => assert(v == direct(k), s"$k: $v vs ${direct(k)}") }
  }

  test("q44a structural columns equal q44's full feature output") {
    val rows = graft.ops.Multimodal.q44MultimodalFeatures.run(spark, sfDir).collect()
    rows.foreach(r => assert(r.getAs[Boolean]("within_bound"),
      s"doc ${r.getAs[Long]("doc_id")}: the emitted structural verdict must hold"))
    val full = rows
      .map(r => r.getAs[Long]("doc_id") -> (r.getAs[Int]("n_bytes"), r.getAs[Float]("f_len"))).toMap
    graft.ops.Multimodal.q44aMultimodalStruct.run(spark, sfDir).collect().foreach { r =>
      assert(full(r.getAs[Long]("doc_id")) == (r.getAs[Int]("n_bytes"), r.getAs[Float]("f_len")))
    }
  }

  test("q62 split proportions are ~80/10/10 and sum to the corpus") {
    val rows = graft.ops.TextOps.q62TrainSplit.run(spark, sfDir).collect()
    val bySplit = rows.groupBy(_.getString(1)).view.mapValues(_.map(_.getAs[Long]("n")).sum).toMap
    val total = bySplit.values.sum
    assert(total == Tables.documents(spark, sfDir).count())
    val trainFrac = bySplit("train").toDouble / total
    assert(math.abs(trainFrac - 0.8) < 0.05, s"train fraction $trainFrac")
    // deterministic: a second evaluation produces the identical assignment
    val again = graft.ops.TextOps.q62TrainSplit.run(spark, sfDir).collect()
    assert(rows.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("q34 identical-signature pairs are contained in q78's hamming<=2 pairs") {
    // q78 demonstrates 16-bit saturation on the doc_id % 5 = 0 corpus
    // slice; containment holds for pairs fully inside that slice
    val exact = graft.ops.Dedup.q34SimhashPairs.run(spark, sfDir)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1)))
      .filter(p => p._1 % 5 == 0 && p._2 % 5 == 0).toSet
    val ham = graft.ops.Dedup.q78SimhashHamming.run(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val hamSet = ham.map(t => (t._1, t._2)).toSet
    assert(exact.subsetOf(hamSet), "hamming 0 is within hamming <= 2")
    assert(ham.forall(_._3 <= 2))
    assert(ham.filter(t => exact((t._1, t._2))).forall(_._3 == 0))
  }

  test("q79 capstone agrees with its component queries") {
    val cap = graft.ops.TextOps.q79CurationPipeline.run(spark, sfDir).collect()
    val quality = graft.ops.TextOps.q25QualityScore.run(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getDouble(5)).toMap
    val split = graft.ops.TextOps.q62TrainSplit.run(spark, sfDir) // per-(lang,split) counts
    // every capstone row passed the quality threshold with q25's exact score
    cap.foreach { r =>
      val doc = r.getLong(0)
      assert(quality(doc) == r.getDouble(3), s"doc $doc quality differs from q25")
      assert(r.getDouble(3) > 0.3)
    }
    // split labels are q62's pure function of doc_id — recompute and compare
    val buckets = cap.map { r =>
      val md5hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"split:${r.getLong(0)}".getBytes("UTF-8"))
        .take(2).map("%02x".format(_)).mkString
      val b = Integer.parseInt(md5hex, 16)
      val expected = if (b < 52429) "train" else if (b < 58982) "val" else "test"
      expected == r.getString(4)
    }
    assert(buckets.forall(identity))
    assert(split.collect().nonEmpty)
  }

  test("minhash signature similarity upper-bounds verified jaccard pairs") {
    // every verified pair (jaccard > 0.7) must agree on most signature components
    val sigs = Dedup.q33Simhash.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("simhash")).toMap
    val verified = Dedup.q32NeardupVerified.run(spark, sfDir).collect()
    verified.foreach { r =>
      val (a, b) = (r.getLong(0), r.getLong(1))
      val hamming = java.lang.Long.bitCount(sigs(a) ^ sigs(b))
      assert(hamming <= 4, s"near-dup pair ($a,$b) has simhash hamming $hamming")
    }
  }

  test("q93 merged HLL sketches estimate exact distinct users within 5%") {
    val approx = Analytics.q93HllMerge.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_users")).toMap
    val exact = Analytics.q09DistinctUsers.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_users")).toMap
    assert(approx.keySet == exact.keySet)
    exact.foreach { case (k, e) =>
      assert(math.abs(approx(k).toDouble - e) / e < 0.05,
        s"$k: approx ${approx(k)} vs exact $e")
    }
    Analytics.q93HllMerge.run(spark, sfDir).collect().foreach { r =>
      assert(r.getAs[Long]("exact_users") == exact(r.getString(0)) &&
        r.getAs[Boolean]("within_bound"),
        s"${r.getString(0)}: emitted exact twin + verdict must agree with q09")
    }
  }

  test("q98 revenue shares sum to 1 within each region") {
    Analytics.q98RevenueShare.run(spark, sfDir).collect()
      .groupBy(_.getString(0)).foreach { case (r, rows) =>
        val tot = rows.map(_.getAs[Double]("share")).sum
        assert(math.abs(tot - 1.0) < 1e-9, s"$r shares sum to $tot")
      }
  }

  test("q95 funnel steps are monotonically non-increasing") {
    val r = graft.ops.Temporal.q95Funnel.run(spark, sfDir).collect().head
    val (v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2))
    assert(v >= c && c >= p, s"funnel must narrow: $v >= $c >= $p")
    assert(v > 0, "fixture must contain view events")
  }

  test("q96 retention: offset-0 cohort sizes cover every user exactly once") {
    val rows = graft.ops.Temporal.q96RetentionCohorts.run(spark, sfDir).collect()
    val day0 = rows.filter(_.getAs[Int]("day_offset") == 0).map(_.getAs[Long]("n_users")).sum
    val users = Tables.events(spark, sfDir).select("user_id").distinct().count()
    assert(day0 == users, "every user is active on their own cohort day")
  }

  test("q90 SCD-2: one current row per customer; closed/open versions chain") {
    val rows = Analytics.q90Scd2Upsert.run(spark, sfDir).collect()
    val byCust = rows.groupBy(_.getLong(0))
    assert(byCust.size.toLong == Tables.customer(spark, sfDir).count())
    byCust.values.foreach { vs =>
      assert(vs.count(_.getInt(4) == 1) == 1, "exactly one current version")
      if (vs.length == 2) {
        val closed = vs.find(_.getInt(4) == 0).get
        val open = vs.find(_.getInt(4) == 1).get
        assert(closed.getAs[Any](3) == open.getAs[Any](2),
          "old version must close exactly where the new one opens")
        assert(open.getString(1) == "PRIORITY")
      } else assert(vs.length == 1)
    }
  }

  test("q100 shard packing: totals agree with q21; shards fill to budget") {
    val rows = graft.ops.TextOps.q100ShardPacking.run(spark, sfDir).collect()
    val totalTokens = rows.map(_.getAs[Long]("n_tokens")).sum
    val q21Total = graft.ops.TextOps.q21TextStats.run(spark, sfDir).collect()
      .map(_.getAs[Long]("total_tokens")).sum
    assert(totalTokens == q21Total, "every token is packed exactly once")
    val budget = 50000L
    val maxDoc = rows.map(_.getAs[Long]("n_tokens")).max
    val byShard = rows.groupBy(_.getAs[Long]("shard_id"))
    val lastShard = byShard.keys.max
    byShard.foreach { case (sid, docs) =>
      val tokens = docs.map(_.getAs[Long]("n_tokens")).sum
      // a shard closes only when a doc crosses its boundary: every shard
      // but the last holds at least the budget minus one straddling doc
      if (sid != lastShard)
        assert(tokens >= budget - maxDoc && tokens <= budget + maxDoc,
          s"shard $sid holds $tokens tokens vs budget $budget (max doc $maxDoc)")
    }
    // shard ids are contiguous from 0 and monotone in doc_id order
    assert(byShard.keys.min == 0 && byShard.size == lastShard + 1)
    val inOrder = rows.sortBy(_.getAs[Long]("doc_id")).map(_.getAs[Long]("shard_id"))
    assert(inOrder.zip(inOrder.tail).forall { case (a, b) => a <= b })
  }

  test("q109 transition probabilities sum to 1 within each source type") {
    val rows = graft.ops.Temporal.q109TransitionMatrix.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[String]("event_type")).foreach { case (t, rs) =>
      val total = rs.map(_.getAs[Double]("p")).sum
      assert(math.abs(total - 1.0) < 1e-9, s"'$t' rows sum to $total")
    }
  }

  test("q110 expected counts preserve the observed margins") {
    val rows = graft.ops.TextOps.q110Contingency.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    // per-row expected sums equal per-row observed sums (margin identity)
    rows.groupBy(_.getAs[String]("lang")).foreach { case (l, rs) =>
      val obs = rs.map(_.getAs[Long]("obs")).sum.toDouble
      val exp = rs.map(_.getAs[Double]("expected")).sum
      // cells absent from a row (obs=0) are not emitted, so expected can
      // undershoot the margin; it must never exceed it
      assert(exp <= obs + 1e-6, s"lang '$l': expected $exp > observed $obs")
    }
    rows.foreach(r => assert(r.getAs[Double]("chi2_contrib") >= 0.0))
  }

  test("q105 cosine similarities are in (0, 1] and consistent with counts") {
    val rows = Analytics.q105CopurchaseSimilarity.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val cos = r.getAs[Double]("cosine")
      assert(cos > 0.0 && cos <= 1.0 + 1e-12, s"cosine out of range: $cos")
      assert(r.getAs[Long]("n_ab") >= 2, "min-support must hold")
    }
  }

  test("q111 wide simhash: reported hammings match a pure-Scala reimplementation") {
    // independent implementation of the 60-bit signature (md5 per word
    // occurrence, per-bit votes, sign pack) — a cross-implementation
    // oracle for the custom SQL arithmetic
    def sig(text: String): Long = {
      val votes = new Array[Int](60)
      text.split(" ", -1).foreach { w =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(w.getBytes("UTF-8")).map("%02x".format(_)).mkString
        for (p <- 0 until 60) {
          val nib = Integer.parseInt(hex.charAt(p / 4).toString, 16)
          votes(p) += 2 * ((nib >> (3 - p % 4)) & 1) - 1
        }
      }
      (0 until 60).map(p => if (votes(p) > 0) 1L << p else 0L).sum
    }
    val texts = Tables.documents(spark, sfDir).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("text")).toMap
    val wide = Dedup.q111SimhashWide.run(spark, sfDir).collect()
    assert(wide.nonEmpty)
    wide.foreach { r =>
      val (a, b, h) = (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"), r.getAs[Int]("hamming"))
      assert(a < b && h >= 0 && h <= 3)
      val expected = java.lang.Long.bitCount(sig(texts(a)) ^ sig(texts(b)))
      assert(h == expected, s"pair ($a,$b): engine hamming $h != reimpl $expected")
    }
  }

  test("q108 near-dup decisions appear in q32's verified pair set") {
    val inc = Dedup.q108IncrementalDedup.run(spark, sfDir).collect()
    assert(inc.nonEmpty && inc.forall(_.getAs[Long]("doc_id") % 10 == 0))
    val vp = Dedup.q32NeardupVerified.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b"))).toSet
    inc.filter(_.getAs[String]("status") == "near_dup").foreach { r =>
      val (d, m) = (r.getAs[Long]("doc_id"), r.getAs[Long]("match_id"))
      assert(vp.contains((math.min(d, m), math.max(d, m))),
        s"batch doc $d matched $m but the pair is not q32-verified")
    }
    inc.filter(_.getAs[String]("status") == "unique")
      .foreach(r => assert(r.isNullAt(r.fieldIndex("match_id"))))
  }

  test("q104 gap-fill covers the full span grid and preserves totals") {
    val rows = Analytics.q104GapFill.run(spark, sfDir).collect()
    val types = rows.map(_.getAs[String]("event_type")).distinct
    val days = rows.map(_.getAs[java.sql.Date]("day").toString).distinct
    assert(rows.length == types.length * days.length,
      "every (type, day) cell of the scaffold must appear exactly once")
    val filled = rows.map(_.getAs[Long]("n_events")).sum
    val total = Tables.events(spark, sfDir).count()
    assert(filled == total, "zero-filling must not change the event total")
    // (the sf0.001 fixture is dense — every cell occupied — so zero
    // cells are not asserted; grid completeness + total preservation
    // are the invariants that hold at every SF)
  }

  test("q103 outliers are exactly the >3-sigma tail of their type") {
    val rows = Analytics.q103Outliers.run(spark, sfDir).collect()
    assert(rows.forall(_.getAs[Double]("z_score") > 3.0))
    // every flagged event must sit above its type's mean by construction
    rows.foreach(r => assert(r.getAs[Double]("value2") > 0.0))
  }

  test("q99 TF-IDF term counts agree with q64's term-frequency entries") {
    val tfidf = graft.ops.TextOps.q99Tfidf.run(spark, sfDir).collect()
    // q64 keeps only terms with count >= 3 (map_filter) — compare on that slice
    val q64 = graft.ops.TextOps.q64TermFreqMap.run(spark, sfDir).collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("word")) -> r.getAs[Long]("cnt"))
      .toMap
    assert(tfidf.nonEmpty)
    val overlapping = tfidf.filter(_.getAs[Long]("tf") >= 3)
    assert(overlapping.nonEmpty, "fixture should surface some tf>=3 top terms")
    overlapping.foreach { r =>
      val (doc, word, tf) =
        (r.getAs[Long]("doc_id"), r.getAs[String]("word"), r.getAs[Long]("tf"))
      assert(q64.get((doc, word)).contains(tf),
        s"doc $doc word '$word' tf=$tf must match q64's count")
    }
  }

  test("q192 decay scores re-derive from raw events with weekly halvings") {
    import graft.ops.Temporal
    import graft.sources.Tables
    val got = Temporal.q192DecayScores.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.nonEmpty)
    val ev = Tables.events(spark, sfDir)
      .select(org.apache.spark.sql.functions.col("user_id"),
        org.apache.spark.sql.functions.col("ts").cast("date").as("d"))
      .collect().map(r => r.getLong(0) -> r.getDate(1).toLocalDate)
    val ref = ev.map(_._2).max
    val byUser = ev.groupBy(_._1)
    got.foreach { case (uid, n, decayed) =>
      val days = byUser(uid).map(_._2)
      assert(n == days.length.toLong)
      val want = days.map { d =>
        val age = java.time.temporal.ChronoUnit.DAYS.between(d, ref)
        1000000L / (1L << (age / 7))
      }.sum
      assert(decayed == want, s"user $uid: decayed $decayed != $want")
      assert(decayed <= n * 1000000L)
    }
  }
}

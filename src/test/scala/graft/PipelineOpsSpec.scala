package graft

import org.apache.spark.sql.functions._

import graft.ops.{Analytics, Layout, Multimodal, TextOps}
import graft.sources.Tables

/** Targeted proofs for the round-6 pipeline-ops wave (q326–q333): each
  * face is already hash-gated against DuckDB; these tests pin the
  * SEMANTIC claims the hashes alone don't state — shift robustness,
  * planted-defect recovery, delta-rule equality with a from-scratch
  * recompute, and the structural invariants of each output. */
class PipelineOpsSpec extends SparkSpec {

  test("winnowing: the synthesized shifted re-ingests are caught with high containment") {
    val rows = TextOps.q326Winnowing.run(spark, sfDir).collect()
    assert(rows.nonEmpty, "winnowing must surface the planted shifted copies")
    rows.foreach { r =>
      val (nShared, fa, fb, cont) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nShared >= 2 && nShared <= math.min(fa, fb))
      assert(cont > 0.0 && cont <= 1.0)
    }
    // a 2-token prefix shifts every shingle position; winnowing's
    // window-local selection must still share most interior minima
    val reingest = rows.filter(r => r.getLong(1) == r.getLong(0) + 3000000L)
    assert(reingest.nonEmpty, "every %31 doc with >= 8 tokens reappears shifted")
    assert(reingest.exists(_.getDouble(5) >= 0.5),
      "shifted copies must retain at least half their fingerprints")
  }

  test("mojibake audit recovers exactly the planted defect classes") {
    val docs = Tables.documents(spark, sfDir).select(col("doc_id")).collect().map(_.getLong(0))
    val got = TextOps.q327MojibakeAudit.run(spark, sfDir).collect()
    def tot(i: Int) = got.map(_.getLong(i)).sum
    assert(tot(1) == docs.length, "n_docs must cover the corpus")
    assert(tot(2) == docs.count(_ % 17 == 0), "replacement-char set = the %17 class")
    assert(tot(3) == docs.count(_ % 19 == 0), "control-char set = the %19 class")
    assert(tot(4) == docs.count(_ % 13 == 0), "mojibake set = the %13 class")
    assert(tot(5) == docs.count(_ % 23 == 0), "nbsp set = the %23 class")
    assert(tot(6) == docs.count(d => d % 13 == 0 || d % 17 == 0 || d % 19 == 0 || d % 23 == 0),
      "dirty = the union of the planted classes, nothing else")
  }

  test("rbo: exact dyadic scaling invariants hold per query") {
    val rows = TextOps.q333Rbo.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val fullAgreement = 2520L * 1023L // ov_d = d for all d: 2520 * sum 2^(10-d)
    rows.foreach { r =>
      val (nc, scaled, rbo) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(scaled >= 0 && scaled <= fullAgreement)
      assert((nc == 0) == (scaled == 0), "zero overlap iff zero score")
      assert(rbo == scaled.toDouble / 2580480.0, "the emitted double is the one exact division")
    }
  }

  test("postings varint audit: compression never exceeds raw and frequent terms compress hardest") {
    val rows = Layout.q328PostingsVarint.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (terms, posts, raw, vb, frac) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(terms >= 1 && posts >= terms)
      assert(raw == posts * 8 && vb >= posts && vb <= raw)
      assert(frac > 0.0 && frac <= 1.0)
    }
    // the inverse-frequency law: the highest-df class beats the lowest
    val byClass = rows.map(r => r.getLong(0) -> r.getDouble(5)).sortBy(_._1)
    if (byClass.length >= 2)
      assert(byClass.last._2 <= byClass.head._2,
        "dense postings (small gaps) must compress at least as hard as sparse ones")
  }

  test("partition skew planner: slots partition the fact exactly") {
    val rows = Layout.q329PartitionSkew.run(spark, sfDir).collect()
    assert(rows.map(_.getLong(0)).toSeq == (0L until 32L),
      "all 32 slots must appear in order")
    val totalRows = rows.map(_.getLong(1)).sum
    assert(totalRows == Tables.lineitem(spark, sfDir).count(),
      "slot loads must sum to the fact row count")
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1), "n_keys <= n_rows")
      assert(r.getLong(3) <= r.getLong(1), "max_key_rows <= n_rows")
    }
  }

  test("scene segments: counts are consistent and frames cover every payload") {
    val rows = Multimodal.q330SceneSegments.run(spark, sfDir).collect()
    val expectedFrames = Tables.documents(spark, sfDir)
      .select(expr("CAST(CEIL(length(text) / 256.0) AS BIGINT)").as("nf"))
      .agg(sum(col("nf"))).collect()(0).getLong(0)
    assert(rows.map(_.getLong(1)).sum == expectedFrames,
      "every 256-byte chunk of every payload is a frame")
    rows.foreach { r =>
      val (nf, ns, mx) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(ns >= 1 && ns <= nf, "between one scene and one per frame")
      assert(mx >= 1 && mx <= nf)
      if (nf == 1) assert(ns == 1)
    }
  }

  test("vad segments: speech windows and segments nest correctly") {
    val rows = Multimodal.q331VadSegments.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nw, nsp, nseg, mx, frac) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(nsp <= nw && nseg <= nsp && mx <= nsp)
      assert((nsp == 0) == (nseg == 0))
      assert(frac == nsp.toDouble / nw)
      // strict above-own-mean rule: a track can never be all speech
      assert(nsp < nw || nw == 0)
    }
    assert(rows.exists(_.getLong(3) > 0), "the fixture has energy contrast somewhere")
  }

  test("hill tail index: adaptive k, positive alpha, and k+1-st count below the top-k") {
    val rows = TextOps.q334HillTail.run(spark, sfDir).collect()
    assert(rows.nonEmpty, "every fixture language has >= 11 distinct words")
    rows.foreach { r =>
      val (k, xk1, alpha) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(k >= 10 && k <= 100)
      assert(xk1 >= 1)
      assert(alpha > 0.0, "a heavy-tailed word distribution has a positive tail index")
    }
  }

  test("pii scan recovers exactly the planted classes and Luhn splits shaped from valid") {
    val ids = Tables.documents(spark, sfDir).select(col("doc_id")).collect().map(_.getLong(0))
    val got = graft.ops.Contracts.q335PiiScan.run(spark, sfDir).collect()
    def tot(i: Int) = got.map(_.getLong(i)).sum
    assert(tot(1) == ids.length)
    assert(tot(2) == ids.count(_ % 11 == 0), "emails = the %11 class")
    assert(tot(3) == ids.count(_ % 29 == 0), "phones = the %29 class")
    assert(tot(4) == ids.count(d => d % 37 == 0 || d % 41 == 0),
      "16-digit runs = the %37 (valid) plus %41 (corrupted) classes")
    assert(tot(5) == ids.count(_ % 37 == 0),
      "only the minted class Luhn-verifies; the bumped digits must all fail")
  }

  test("join-size estimators: exact has zero error and the histogram beats naive") {
    val rows = Layout.q336JoinEstimate.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val (exEst, exact, exErr) = rows("exact")
    assert(exEst == exact && exErr == 0)
    val naive = rows("naive_uniform")
    val hist = rows("hash_histogram_32")
    assert(naive._1 <= exact && hist._1 <= exact,
      "uniform-within-group estimates lower-bound sum of squares (Cauchy-Schwarz)")
    assert(hist._3 <= naive._3,
      "column statistics must not make the estimate worse")
  }

  test("bloom fpr: measured rate is sane and theory matches the closed form") {
    val r = Layout.q337BloomFpr.run(spark, sfDir).collect()(0)
    val (nMem, nBits, nProbes, nFp) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nBits <= math.min(4096L, 2 * nMem))
    assert(nFp <= nProbes)
    assert(r.getLong(4) == nFp * 1000000L / nProbes)
    val theory = math.pow(1.0 - math.exp(-2.0 * nMem / 4096.0), 2)
    assert(math.abs(r.getDouble(5) - theory) < 1e-6)
    // the filter must actually filter: FPR well below 1
    assert(nFp * 2 < nProbes, s"fpr ${nFp.toDouble / nProbes} is uselessly high")
  }

  test("psi drift: hash-split A/A over the same source stays near zero") {
    val rows = TextOps.q338PsiDrift.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) == 10, "all ten bins in the grid")
      val psi = r.getDouble(2)
      assert(psi >= 0.0, "PSI is a sum of (p-q)ln(p/q) terms, each nonnegative")
      // the 0.1/0.25 action bands assume production n; at the 25-docs-
      // per-source unit fixture sampling noise alone reaches ~0.4, so
      // pin only finiteness and a generous sanity ceiling here (the A/A
      // claim is meaningful at the driver SFs, not at n=25)
      assert(!psi.isNaN && !psi.isInfinite && psi < 3.0, s"degenerate PSI: $psi")
    }
  }

  test("blocking quality: canonical blocking reaches full recall, raw blocking provably loses pairs") {
    val rows = graft.ops.Dedup.q339BlockingQuality.run(spark, sfDir).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    val canon = rows("canon_first_token")
    val raw = rows("raw_first_token")
    assert(canon._3 == canon._2 && canon._4 == 1000000L,
      "canonical-key blocking catches every canonical-dup pair by construction")
    assert(raw._3 < raw._2, "raw blocking must lose the planted UPPER pairs")
    assert(canon._5 > 900000L && raw._5 > 900000L,
      "both schemes still cut >90% of the all-pairs volume")
  }

  test("harmonic centrality: bounded by reach and consistent with per-seed BFS") {
    val rows = graft.ops.Graph.q340HarmonicCentrality.run(spark, sfDir).collect()
    assert(rows.length == 10, "the q263 seed slice is 10 seeds")
    rows.foreach { r =>
      val (nReached, h) = (r.getLong(1), r.getLong(2))
      assert(nReached >= 1)
      // each reached node contributes (0, 1e6] micro-units
      assert(h > (nReached - 1) * 250000L && h <= nReached * 1000000L,
        s"harmonic $h out of bounds for reach $nReached at 4 hops")
    }
  }

  test("watermark lateness: only the planted straggler class can be late") {
    val rows = graft.ops.Temporal.q341WatermarkLateness.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val nStragglers = Tables.events(spark, sfDir)
      .filter(col("event_id") % 7 === 0).count()
    val totalLate = rows.map(_.getLong(2)).sum
    assert(totalLate > 0, "the planted %7 delays must register as lateness")
    assert(totalLate <= nStragglers,
      "a non-delayed event only ever follows earlier-timestamped arrivals")
    rows.foreach { r =>
      val (n, late, micro, mx, p99) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(late <= n && micro == late * 1000000L / n)
      assert(p99 <= mx)
    }
  }

  test("bottom-k sample: exactly k per stratum, reproducible, and uniform-without-replacement") {
    val rows = TextOps.q342BottomkSample.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val perLang = rows.groupBy(_._1)
    perLang.foreach { case (lang, xs) =>
      assert(xs.length == 20, s"$lang must contribute exactly k docs")
      assert(xs.map(_._2).sorted.toSeq == (1L to 20L), "ranks are dense 1..k")
      assert(xs.map(_._3).distinct.length == 20, "without replacement")
    }
    // reproducibility: a second run is bit-identical (pure function of ids)
    val again = TextOps.q342BottomkSample.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("correlated zone maps: the clustered layout skips, the scattered layout cannot") {
    val rows = Layout.q343CorrelatedZonemap.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(3), r.getLong(4), r.getLong(6)))).toMap
    (1L to 5L).foreach { k =>
      val (sortSkip, sortMicro, sel) = rows(("shipdate_clustered", k))
      val (hashSkip, hashMicro, _) = rows(("hash_scattered", k))
      assert(sortSkip >= hashSkip,
        s"cut $k: clustering must never skip less than scattering")
      // the sorted layout's skip fraction approaches 1 - selectivity
      assert(sortMicro + sel >= 800000L,
        s"cut $k: clustered skip ($sortMicro) + selectivity ($sel) must approach 1e6")
      assert(hashMicro <= 100000L,
        s"cut $k: a hash-scattered layout has almost no transferable zone power ($hashMicro)")
    }
  }

  test("cdc compaction: live fingerprints equal the full-replay q287 derivation") {
    val q287 = Analytics.q287CdcApply.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    val rows = Analytics.q344CdcCompaction.run(spark, sfDir).collect()
    rows.foreach { r =>
      val st = r.getString(0)
      val (nLog, nComp, nLive, nTomb) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nComp == nLive + nTomb && nComp <= nLog)
      assert(r.getLong(5) == nComp * 1000000L / nLog)
      val (wantLive, wantFp) = q287(st)
      assert(nLive == wantLive, s"$st: compacted live count must match the full replay")
      assert(r.getLong(6) == wantFp, s"$st: compaction must preserve the live key fingerprint")
    }
  }

  test("encoding advisor: statistics are consistent and recommendations follow the ladder") {
    val rows = Layout.q345EncodingAdvisor.run(spark, sfDir).collect()
    assert(rows.length == 6)
    val byCol = rows.map(r => r.getString(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getString(6)))).toMap
    byCol.foreach { case (c, (n, ndv, runs, avgRun, mono, enc)) =>
      assert(ndv <= n && runs <= n && runs >= ndv / 2, s"$c stats degenerate")
      assert(avgRun == n * 1000000L / runs)
      // recommendation must match its own published inputs
      val expect =
        if (avgRun > 4000000L) "rle"
        else if (ndv * 100 <= n) "dict"
        else if (mono >= 990000L) "delta"
        else "plain"
      assert(enc == expect, s"$c: $enc vs $expect from its own stats")
    }
    // the insert-order key is sorted by construction: delta or rle
    assert(byCol("l_orderkey")._6 == "delta" || byCol("l_orderkey")._6 == "rle")
    // 3-value flags are dictionary columns at any realistic size
    assert(byCol("l_returnflag")._2 <= 3 && byCol("l_returnflag")._6 == "dict")
  }

  test("entropy rate: per-state entropy bounded by ln(out_degree), stationary mass conserved") {
    val rows = graft.ops.Temporal.q346EntropyRate.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    var piSum = 0L
    rows.foreach { r =>
      val (pi, outDeg, hi, contrib) =
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))
      piSum += pi
      assert(hi >= 0.0 && hi <= math.log(outDeg.toDouble) + 1e-9,
        s"uniform over $outDeg successors maximizes H: $hi")
      assert(math.abs(contrib - pi / 1e6 * hi) < 1e-5)
    }
    // exact-integer power iteration: each of the 4 rounds loses up to
    // alphabet micro to the update floors PLUS alphabet micro per state
    // to the kernel's own row-normalization floor (Σ p_ij <= 1e6), so
    // the documented bound is rounds * alphabet * (alphabet + 1)
    assert(piSum > 1000000L - 4 * 5 * 6 && piSum <= 1000000L,
      s"stationary mass $piSum must conserve up to the documented floor leak")
  }

  test("dirichlet QL: ranks are dense per query and scores decrease down the ranking") {
    val rows = TextOps.q348DirichletQl.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (q, xs) =>
      val sorted = xs.sortBy(_._3)
      assert(sorted.map(_._3).toSeq == (1 to sorted.length), s"query $q ranks not dense")
      assert(sorted.map(_._4).toSeq == sorted.map(_._4).sortBy(-_).toSeq,
        s"query $q scores must not increase down the ranking")
      assert(!sorted.map(_._2).contains(q), "a query never retrieves itself")
    }
  }

  test("adamic-adar: predictions are non-edges with common neighbors, weighted sanely") {
    val rows = graft.ops.Graph.q349LinkPrediction.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty && rows.length <= 20)
    rows.foreach { case (a, b, nc, aa) =>
      assert(a < b && nc >= 1)
      // each common neighbor has degree >= 2, so its weight is in
      // (0, 1/ln 2]; the sum is bounded by n_common / ln 2
      assert(aa > 0.0 && aa <= nc / math.log(2.0) + 1e-6)
    }
    val scores = rows.map(_._4)
    assert(scores.toSeq == scores.sortBy(-_).toSeq, "emitted in score order")
  }

  test("kmv set algebra: estimates bracket reality and degenerate-k falls back to exact") {
    val r = Layout.q350KmvSetAlgebra.run(spark, sfDir).collect()(0)
    val (kk, nb, uEst, exU, iEst, exI) = (r.getLong(0), r.getLong(1), r.getDouble(2),
      r.getLong(3), r.getDouble(4), r.getLong(5))
    assert(nb <= kk)
    if (kk < 64) {
      // the fixture's audiences are small: the sketch IS the set
      assert(uEst == exU.toDouble, "under-filled sketch must report exactly")
      assert(iEst == exI.toDouble)
    } else {
      assert(math.abs(uEst - exU) / exU < 0.5, s"union estimate $uEst vs $exU")
      assert(math.abs(iEst - exI) <= math.max(exI.toDouble, 1.0) * 1.0 + uEst / 8,
        s"intersection estimate $iEst vs $exI")
    }
  }

  test("char-ngram langid: the trained model is diagonally dominant on held-out docs") {
    val rows = TextOps.q351CharngramLangid.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val total = rows.map(_._3).sum
    val correct = rows.filter(r => r._1 == r._2).map(_._3).sum
    assert(total == Tables.documents(spark, sfDir).filter(col("doc_id") % 2 === 1).count(),
      "every held-out doc gets exactly one prediction")
    // 5 balanced classes: chance is 20%; a trained trigram model must
    // do far better on a synthetic per-language vocabulary
    assert(correct * 10 > total * 7, s"accuracy ${correct.toDouble / total} too low for a trained model")
    rows.groupBy(_._1).foreach { case (lang, xs) =>
      val diag = xs.filter(_._2 == lang).map(_._3).sum
      assert(diag == xs.map(_._3).max, s"$lang: the diagonal must be the row mode")
    }
  }

  test("storage scorecard: member audits survive composition with sane headline values") {
    val m = graft.ops.Contracts.q352StorageScorecard.run(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(m.keySet == Set("bloom_fpr_micro", "encoded_columns", "join_stats_value_micro",
      "postings_compressed_micro", "skew_max_over_avg_micro", "zonemap_clustering_gap_micro"))
    assert(m("bloom_fpr_micro") >= 0 && m("bloom_fpr_micro") < 500000,
      "the filter must actually filter")
    assert(m("encoded_columns") >= 1 && m("encoded_columns") <= 6)
    assert(m("join_stats_value_micro") >= 0, "histogram stats never increase the error")
    assert(m("postings_compressed_micro") > 0 && m("postings_compressed_micro") <= 1000000)
    assert(m("skew_max_over_avg_micro") >= 1000000, "max slot load >= the average by definition")
    assert(m("zonemap_clustering_gap_micro") > 0, "clustering must buy transferable skipping")
  }

  test("topic segments: bounds hold and the self-calibrated cut fires somewhere") {
    val rows = TextOps.q353TopicSegments.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, nb, ns, rate) =>
      assert(nb >= 2, "single-block docs are below segmentation granularity and omitted")
      assert(ns >= 1 && ns <= nb, "between one segment and one per block")
      assert(rate == ns * 1000000L / nb)
    }
    // a median-calibrated threshold cuts roughly half the boundaries
    // somewhere in the corpus — all-1 or all-max would mean the
    // comparison degenerated
    assert(rows.exists(_._3 > 1), "some document must segment")
    assert(rows.exists(r => r._3 < r._2), "no document may split at every boundary")
  }

  test("forecast backtest: MASE components are consistent and the grid covers the span") {
    val rows = graft.ops.Temporal.q354ForecastBacktest.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nTrain, nTest, sae, sad) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nTest == 10, "the holdout is the last 10 calendar days")
      assert(nTrain >= 7, "a weekly seasonal naive needs at least one season of training")
      assert(sae >= 0 && sad >= 0)
      if (sad > 0)
        assert(r.getLong(5) == sae * nTrain * 1000000L / (nTest * sad))
    }
  }

  test("cross-validation: folds partition the corpus and the pooled row sums them") {
    val n = Tables.documents(spark, sfDir).count()
    val rows = graft.ops.Classifier.q355CrossValidation.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val folds = rows.filter(_._1 >= 0)
    val pooled = rows.find(_._1 == -1L).get
    assert(folds.length == 5)
    folds.foreach { case (_, nTrain, nEval, nCorr, acc) =>
      assert(nTrain + nEval == n, "train + eval is the whole corpus per fold")
      assert(nCorr <= nEval && acc == nCorr * 1000000L / nEval)
    }
    assert(folds.map(_._3).sum == n, "the five eval folds partition the corpus")
    assert(pooled._3 == n && pooled._4 == folds.map(_._4).sum)
    // y = +1 iff lang = 'en' (1 of 5 balanced classes): always-predict
    // -1 scores ~0.8; the trained model must at least clear coin-flip
    // territory on held-out data for the protocol to mean anything
    assert(pooled._5 > 500000L, s"pooled held-out accuracy ${pooled._5} collapsed")
  }

  test("runs test: counts are consistent and the statistic centers") {
    val rows = graft.ops.Temporal.q356RunsTest.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (np, nn, runs, exp) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))
      assert(runs >= 1 && runs <= np + nn, "runs bounded by the sign count")
      assert(runs >= (if (np.min(nn) > 0) 2L else 1L) || np == 0 || nn == 0)
      assert(math.abs(exp - (1.0 + 2.0 * np * nn / (np + nn))) < 1e-6)
      assert(math.abs(r.getDouble(5)) < 6.0,
        "a |z| beyond 6 on 30 days means the arithmetic broke, not the data")
    }
  }

  test("hash-width audit: collisions fall with width and match the grouped recount") {
    val rows = Layout.q357HashWidthAudit.run(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    assert(rows.map(_._1).toSeq == Seq(4L, 6L, 8L, 12L))
    val n = rows.head._2
    rows.foreach { case (_, nk, pairs, ck, expct) =>
      assert(nk == n)
      assert(ck <= n && (pairs == 0) == (ck == 0))
      assert(expct >= 0.0)
    }
    // monotone: a wider prefix can only merge fewer keys
    val ps = rows.map(_._3)
    assert(ps.zip(ps.tail).forall { case (a, b) => a >= b },
      s"collisions must not increase with width: ${ps.toSeq}")
    // the 12-hex width (~2^48 space) must be collision-free at fixture scale
    assert(rows.last._3 == 0, "12 hex chars must not collide on thousands of keys")
  }

  test("delta-join MV equals the from-scratch join recompute") {
    val direct = Tables.orders(spark, sfDir)
      .join(Tables.customer(spark, sfDir),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_nationkey"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_rows"),
        sum(expr("CAST(FLOOR(o_totalprice * 100) AS BIGINT)")).as("sum_cents"),
        expr("bit_xor(CAST(conv(substring(md5(CAST(o_orderkey AS STRING)), 1, 15), 16, 10) AS BIGINT))")
          .as("key_fp"))
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    val got = Analytics.q332DeltaJoinMv.run(spark, sfDir)
      .collect().map(r => (r.getInt(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(got == direct,
      "the delta rule must reproduce the full join's counts, cents, and key fingerprints")
  }

  test("q362: z-order touches no more files than partkey-major on tight 2-D rectangles, and zone maps never lie") {
    val rows = Layout.q362ZorderSkipping.run(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(5)))).toMap // (layout, query) -> (files_read, rows_matched)
    // zone maps are conservative: a query with matching rows must touch >= 1 file
    rows.foreach { case ((l, q), (files, matched)) =>
      if (matched > 0) assert(files >= 1, s"$l q$q: rows matched but no file read")
    }
    // the advisor's point, on the TIGHT square rectangles (1 and 2):
    // interleaved bits bound BOTH coordinates per file, partkey-major
    // bounds only one — z-order must never read more files
    for (q <- Seq(1L, 2L); if rows.contains(("z_order", q)) && rows.contains(("partkey_major", q)))
      assert(rows(("z_order", q))._1 <= rows(("partkey_major", q))._1,
        s"q$q: z-order read ${rows(("z_order", q))._1} files vs partkey-major ${rows(("partkey_major", q))._1}")
  }

  test("q363: the chained estimate inherits step-1 error — never more accurate than the anchored form's input") {
    val rows = Layout.q363JoinChainEstimate.run(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))).toMap
    val (e1, a1c, act1, err1c, err1a) = rows(1L)
    assert(e1 == a1c && err1c == err1a, "step 1 has nothing to inherit: chained = anchored")
    assert(act1 > 0 && rows(2L)._3 > 0, "both chain steps must produce rows on this fixture")
    // the compounding direction: chained step-2 is the same formula as
    // anchored but fed the step-1 ESTIMATE instead of its truth, so the
    // two relate exactly as their inputs do (monotone integer formula)
    val (e2c, e2a, _, _, _) = rows(2L)
    assert((e1 >= act1) == (e2c >= e2a) || e2c == e2a,
      "the chained estimate must inherit the step-1 error's direction")
  }

  test("q367: capture-recapture estimate is at least the observed union and coverage is a proper fraction") {
    val r = graft.ops.Dedup.q367CaptureRecapture.run(spark, sfDir).collect()(0)
    val (na, nb, m, u) = (r.getAs[Long]("n_a"), r.getAs[Long]("n_b"),
      r.getAs[Long]("n_both"), r.getAs[Long]("n_union"))
    assert(na > 0 && nb > 0 && m > 0, "both detectors must fire and overlap on the planted near-dups")
    assert(m <= math.min(na, nb) && u <= na + nb && u >= math.max(na, nb))
    val est = r.getAs[Long]("est_total")
    // Chapman's estimate can only fall below the union when the
    // detectors overlap almost completely — then est_missed floors at 0
    assert(r.getAs[Long]("est_missed") == math.max(0L, est - u))
    assert(r.getAs[Long]("coverage_micro") <= 1000000L ||
      est < u, "coverage beyond 1.0 only when overlap saturates the estimator")
  }

  test("q365: prorated revenue conserves exactly — every booked cent is recognized once") {
    val recognized = graft.ops.Temporal.q365RevenueProration.run(spark, sfDir)
      .agg(sum(col("recognized_cents"))).collect()(0).getLong(0)
    val booked = Tables.lineitem(spark, sfDir)
      .agg(sum(expr("CAST(FLOOR(l_extendedprice * 100) AS BIGINT)"))).collect()(0).getLong(0)
    assert(recognized == booked,
      s"largest-remainder slices must sum back to the booked cents: $recognized vs $booked")
  }

  test("q366: Friedman rank sums conserve n*k*(k+1)/2 and the statistic is non-negative") {
    val rows = graft.ops.Temporal.q366FriedmanTest.run(spark, sfDir).collect()
    val k = rows.length
    val n = rows.head.getAs[Long]("n_days")
    assert(rows.forall(_.getAs[Long]("n_days") == n), "every type covers the same day blocks")
    val total = rows.map(_.getAs[Long]("rank_sum")).sum
    assert(total == n * k.toLong * (k + 1) / 2,
      s"within-day ranks 1..k must conserve: $total vs ${n * k.toLong * (k + 1) / 2}")
    assert(rows.head.getAs[Double]("chi2_f") >= 0.0)
  }

  test("q371: Welch screen covers the corpus, t matches the gap's sign, degenerate variances go NULL not NaN") {
    val rows = graft.ops.TextOps.q371WelchScreen.run(spark, sfDir).collect()
    val corpus = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus,
      "every document belongs to exactly one screened source (n >= 2 holds for all fixture sources)")
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("t_welch"))) {
        val t = r.getAs[Double]("t_welch")
        assert(!t.isNaN && !t.isInfinite, "NaN/Inf must never reach the contract")
        assert(t.sign == r.getAs[Double]("diff_chars").sign || t == 0.0)
        val df = r.getAs[Double]("df_welch")
        assert(df >= 1.0 && df < corpus.toDouble, s"Welch df out of range: $df")
      }
    }
  }

  test("q372: RAKE phrases are stopword-free, scores positive, single-word phrase scores equal deg*1e6/freq") {
    val rows = graft.ops.TextOps.q372RakeKeyphrases.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    val stops = Set("the", "a", "an", "of", "to", "and", "in", "is", "on", "for")
    rows.foreach { r =>
      val words = r.getAs[String]("phrase").split(" ")
      assert(words.nonEmpty && words.forall(w => !stops.contains(w)),
        s"candidate phrase contains a stopword: ${r.getAs[String]("phrase")}")
      assert(r.getAs[Long]("n_words") == words.length)
      assert(r.getAs[Long]("score_micro") > 0)
      assert(r.getAs[Long]("n_occurrences") >= 1)
    }
    // phrase scores sum member word scores, so a phrase can never
    // outscore a longer phrase that contains it plus positive words —
    // spot the monotonicity on the top rows
    val top = rows.head
    assert(top.getAs[Long]("score_micro") >= rows.last.getAs[Long]("score_micro"))
  }

  test("q374: quantization recall is a fraction of k=10 and covers every sampled query") {
    val rows = graft.ops.Similarity.q374QuantizationRecall.run(spark, sfDir).collect()
    val nq = Tables.embeddings(spark, sfDir).filter(col("vec_id") % 97 === 0).count()
    assert(rows.length == nq, "one row per sampled query")
    rows.foreach { r =>
      val ov = r.getAs[Long]("n_overlap")
      assert(ov >= 0 && ov <= 10)
      assert(r.getAs[Long]("recall_micro") == ov * 100000L)
    }
  }

  test("q375: CEM matches a subset of the treated and both gaps are finite cents") {
    val r = graft.ops.Analytics.q375CemAtt.run(spark, sfDir).collect()(0)
    assert(r.getAs[Long]("n_treated_matched") <= r.getAs[Long]("n_treated_total"))
    assert(r.getAs[Long]("n_strata_matched") >= 1)
    assert(!r.getAs[Double]("att_cents").isNaN && !r.getAs[Double]("naive_cents").isNaN)
  }

  test("q376: aspect batches cover every image once and batch ids are dense per bucket") {
    val rows = graft.ops.Multimodal.q376AspectBatching.run(spark, sfDir).collect()
    val corpus = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_images")).sum == corpus,
      "every image lands in exactly one (bucket, batch)")
    val buckets = Set(500L, 750L, 1000L, 1333L, 2000L)
    rows.foreach(r => assert(buckets.contains(r.getAs[Long]("bucket_milli"))))
    rows.groupBy(_.getAs[Long]("bucket_milli")).foreach { case (b, rs) =>
      val ids = rs.map(_.getAs[Long]("batch_id")).sorted.toSeq
      assert(ids == ids.indices.map(_.toLong),
        s"bucket $b batch ids must be dense from 0: ${ids.mkString(",")}")
    }
  }

  test("q377: AUC identities — 2U bounded by 2*npos*nneg, Gini consistent with AUC") {
    val r = graft.ops.Classifier.q377AucEval.run(spark, sfDir).collect()(0)
    val (np, nn, u2) = (r.getAs[Long]("n_pos"), r.getAs[Long]("n_neg"), r.getAs[Long]("u_times2"))
    assert(u2 >= 0 && u2 <= 2 * np * nn, "U must be a pair fraction")
    val auc = r.getAs[Long]("auc_micro")
    assert(auc >= 0 && auc <= 1000000)
    val gini = r.getAs[Long]("gini_micro")
    assert(math.abs(gini - (2 * auc - 1000000)) <= 1,
      "Gini = 2*AUC - 1 up to one integer-division ulp")
  }

  test("q379: hub removal can only shrink the giant; universe drops by exactly the removed hubs") {
    val rows = graft.ops.Dedup.q379Percolation.run(spark, sfDir).collect()
      .map(r => r.getAs[String]("phase") -> r).toMap
    val (before, after) = (rows("before"), rows("after"))
    assert(after.getAs[Long]("n_nodes") == before.getAs[Long]("n_nodes") - 5)
    assert(after.getAs[Long]("giant_size") <= before.getAs[Long]("giant_size"))
    assert(before.getAs[Long]("second_size") <= before.getAs[Long]("giant_size"))
    assert(after.getAs[Long]("second_size") <= after.getAs[Long]("giant_size"))
  }

  test("q380: the data map partitions the corpus and confidence agrees with the bucket") {
    val rows = graft.ops.Classifier.q380DataMap.run(spark, sfDir).collect()
    val corpus = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus)
    rows.foreach { r =>
      val ncr = r.getAs[Long]("n_correct_rounds")
      assert(ncr >= 0 && ncr <= 3)
      // every round correct forces a positive summed confidence; never
      // correct forces it non-positive (margins of the wrong sign)
      if (ncr == 3) assert(r.getAs[Long]("conf_total") > 0)
      if (ncr == 0) assert(r.getAs[Long]("conf_total") <= 0)
    }
  }

  test("q381: the stump's split beats or ties the unsplit baseline and sides cover the corpus") {
    val r = graft.ops.Classifier.q381DecisionStump.run(spark, sfDir).collect()(0)
    val corpus = Tables.documents(spark, sfDir).count()
    assert(r.getAs[Long]("n_left") + r.getAs[Long]("n_right") == corpus)
    assert(r.getAs[Long]("gain_micro") >= 0, "argmin split can never be worse than no split")
    Seq("gini_left_micro", "gini_right_micro", "gini_base_micro").foreach { c =>
      val g = r.getAs[Long](c)
      assert(g >= 0 && g <= 500000, s"$c out of the binary-Gini range: $g")
    }
  }

  test("q385: the Simpson screen covers every customer once and the overall row never self-flips") {
    val rows = graft.ops.Analytics.q385SimpsonsFlip.run(spark, sfDir).collect()
    val overall = rows.filter(_.getAs[Long]("stratum") == -1L)
    assert(overall.length == 1 && overall.head.getAs[Long]("flipped") == 0)
    val strata = rows.filter(_.getAs[Long]("stratum") >= 0)
    assert(strata.map(_.getAs[Long]("n")).sum == overall.head.getAs[Long]("n"))
    rows.foreach { r =>
      val sign = r.getAs[Long]("sign")
      assert(sign == -1 || sign == 0 || sign == 1)
      // the covariance is one DOUBLE expression over the exact BIGINT
      // moments (r8 overflow fix) and is REPORTED in rounded giga-units
      // (r9, ADVICE: the raw ~2.5e18 double relied on bit-identical
      // IEEE sequences across engines); sign reads the unrounded value,
      // so a sub-5e8 covariance may carry sign ±1 with cov_giga = 0
      val giga = r.getAs[Double]("cov_giga")
      if (giga != 0.0) assert(sign == math.signum(giga).toLong)
      if (r.getAs[Long]("flipped") == 1)
        assert(sign != 0 && sign != overall.head.getAs[Long]("sign"))
    }
  }

  test("q383: burn rates are consistent with their own counts and paging needs both windows") {
    val rows = graft.ops.Temporal.q383SloBurn.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (tot, err) = (r.getAs[Long]("n_total"), r.getAs[Long]("n_err"))
      assert(err <= tot)
      assert(r.getAs[Long]("burn1_micro") == err * 100000000L / math.max(1L, tot))
      val page = r.getAs[Long]("page")
      if (page == 1) {
        assert(r.getAs[Long]("burn1_micro") >= 14400000L)
        assert(r.getAs[Long]("burn6_micro") >= 6000000L)
      }
    }
    // hour axis is gap-free
    val hours = rows.map(_.getAs[Long]("hour_idx")).sorted
    assert(hours.last - hours.head + 1 == hours.length)
  }

  test("q384: weighted kappa rewards near-misses relative to nominal kappa under adjacent-grade noise") {
    val cells = graft.ops.Classifier.q384WeightedKappa.run(spark, sfDir).collect()
    assert(cells.length == 9)
    val kw = cells.head.getAs[Double]("kappa_w")
    assert(cells.forall(_.getAs[Double]("kappa_w") == kw), "kappa_w is a shared scalar")
    assert(kw > -1.0 && kw <= 1.0)
    val nominal = graft.ops.Classifier.q203AnnotatorKappa.run(spark, sfDir)
      .collect().head.getAs[Double]("kappa")
    // the q203 noise model redraws rater b UNIFORMLY, so disagreements
    // are not concentrated at adjacent grades — the two statistics must
    // still be in the same quadrant (both well above chance here)
    assert(kw > 0.0 && nominal > 0.0)
  }

  test("q388: W1 drift is non-negative, bounded by the bucket span, and covers every source") {
    val rows = graft.ops.TextOps.q388WassersteinDrift.run(spark, sfDir).collect()
    val corpus = Tables.documents(spark, sfDir).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus)
    val buckets = Tables.documents(spark, sfDir)
      .select(expr("n_chars DIV 50")).distinct().count()
    rows.foreach { r =>
      val w1 = r.getAs[Long]("w1_micro")
      // each bucket contributes |CDF gap| <= 1e6, so W1 <= buckets * 1e6
      assert(w1 >= 0 && w1 <= buckets * 1000000L,
        s"${r.getAs[String]("source")}: W1 $w1 outside [0, ${buckets}e6]")
    }
  }

  test("q389: the SS ledger balances exactly — cells + error = total, error non-negative") {
    val r = graft.ops.TextOps.q389TwowayAnova.run(spark, sfDir).collect()(0)
    val (ssS, ssL, ssI) = (r.getAs[Long]("ss_source"), r.getAs[Long]("ss_lang"),
      r.getAs[Long]("ss_interaction"))
    val (ssC, ssE, ssT) = (ssS + ssL + ssI, r.getAs[Long]("ss_error"), r.getAs[Long]("ss_total"))
    assert(ssC + ssE == ssT, "SS_cells + SS_error must equal SS_total exactly (integer ledger)")
    assert(ssE >= 0, "per-cell q >= s^2//n makes the error SS non-negative")
    Seq("f_source", "f_lang", "f_interaction").foreach { c =>
      val f = r.getAs[Double](c)
      assert(!f.isNaN && !f.isInfinite, s"$c must be finite on the fixture")
    }
    assert(r.getAs[Long]("n_cells") <= r.getAs[Long]("n_sources") * r.getAs[Long]("n_langs"))
  }

  test("q390: looks accumulate monotonically and crossing flags agree with their boundaries") {
    val rows = graft.ops.Analytics.q390SequentialTest.run(spark, sfDir).collect()
    assert(rows.length == 5)
    val ns = rows.map(r => r.getAs[Long]("n1") + r.getAs[Long]("n0"))
    assert(ns.sliding(2).forall(p => p(0) <= p(1)), "cumulative looks can only grow")
    rows.foreach { r =>
      if (!r.isNullAt(r.fieldIndex("z"))) {
        val z = math.abs(r.getAs[Double]("z"))
        assert((r.getAs[Long]("crossed_pocock") == 1) == (z >= 2.413))
        assert((r.getAs[Long]("crossed_naive") == 1) == (z >= 1.96))
        // Pocock is strictly more conservative than the fixed test
        if (r.getAs[Long]("crossed_pocock") == 1) assert(r.getAs[Long]("crossed_naive") == 1)
      }
    }
  }

  test("q392: per-day chi2 is non-negative, flags match the critical value, days cover the span") {
    val rows = graft.ops.Temporal.q392EventMixDrift.run(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val chi2 = r.getAs[Double]("chi2")
      assert(!chi2.isNaN && chi2 >= 0.0)
      assert((r.getAs[Long]("drifted") == 1) == (chi2 >= 9.488))
    }
    val days = rows.map(_.getAs[Long]("day_idx"))
    assert(days.distinct.length == days.length, "one row per observed day")
  }

  test("q391: OLS identities — R2 in [0,1], t = slope/se, positive spread") {
    val r = graft.ops.Temporal.q391OlsTrend.run(spark, sfDir).collect()(0)
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0)
    val (b, se, t) = (r.getAs[Double]("slope_cents_per_day"),
      r.getAs[Double]("se_slope"), r.getAs[Double]("t_slope"))
    assert(se > 0.0)
    assert(math.abs(t - b / se) < 1e-9, "t must be slope/se exactly")
  }

  test("q382: the fitted 0.9-line is a grid slope with non-negative pinball loss") {
    val r = graft.ops.Temporal.q382QuantileRegression.run(spark, sfDir).collect()(0)
    val slope = r.getAs[Long]("slope_cents_per_day")
    assert(slope % 50 == 0 && slope >= -500 && slope <= 500, "winner must come from the grid")
    assert(r.getAs[Long]("pinball_deci") >= 0)
  }
}

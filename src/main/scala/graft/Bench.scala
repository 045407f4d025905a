package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Per-round benchmark: times every SparkEntry query at the driver's SF.
  *
  * Each query is forced through the `noop` datasource (not `count()`):
  * noop consumes every row and every column downstream of the plan, so
  * Catalyst cannot prune away expression-heavy projections the way it can
  * under a count-only terminal — the timing covers the real work.
  *
  * Noise control (r4 verdict item: the driver's BENCH_r04 ran ~40% hot
  * vs the same code on idle hardware):
  *   1. every query runs at least twice and the reported time is the
  *      min; a query whose two FASTEST times still disagree by >30%
  *      re-runs (up to SPARK_GRAFT_BENCH_MAX_RUNS, default 4) until the
  *      min is corroborated — bursty load costs extra runs only where
  *      it actually hit, idle runs pay nothing;
  *   2. a fixed full-width CPU probe is timed before and after the
  *      sweep and recorded as probe_sec/probe_post_sec — sustained
  *      external load shows up there, so an inflated round artifact is
  *      distinguishable from a real regression without local
  *      re-measurement (BASELINE.md pins the idle probe value);
  *   3. (rev 8) every min is also checked against the PREVIOUS round's
  *      committed artifact (BENCH_PRIOR.json) — a >2x jump on a
  *      methodology-identical rerun earns one sweep-end recheck, and
  *      anything still >2x lands in the "suspect" list instead of
  *      being silently trusted (r7's artifact carried two phantom 2-4x
  *      spikes on unchanged code that solo re-measures reversed).
  * Caches are cleared between runs, so every run repeats the full
  * scan+shuffle; the min only dodges scheduler/load spikes.
  *
  * Durability (rev 9 — the r8 driver bench died on its wall-clock
  * timeout with rc 124 and NO artifact, because everything was written
  * only at sweep end):
  *   1. the artifact file is rewritten INCREMENTALLY after every
  *      query, carrying `"truncated":true` until the sweep completes —
  *      a kill at any point leaves a parseable partial artifact;
  *   2. a JVM shutdown hook emits the current compact JSON line to
  *      stdout and rewrites the file — SIGTERM (what `timeout` sends)
  *      runs hooks, so even the stdout tail carries per-query data;
  *   3. a compact snapshot line is also printed every 50 queries, so a
  *      SIGKILL (no hooks) still leaves parseable lines in the tail;
  *   4. a wall-clock budget (SPARK_GRAFT_BENCH_BUDGET_S, default 1200 s
  *      measured from JVM start, settle phase included) degrades the
  *      sweep instead of letting the driver kill it: past the budget,
  *      queries run ONCE (no corroboration loop) and the requeue +
  *      cross-round recheck phases are skipped; past 1.15x the budget
  *      the sweep stops and the artifact lists the rest in
  *      `"skipped":[...]`. Degraded figures are still labeled: the
  *      artifact records `degraded_after` (how many queries ran at full
  *      methodology) so a reader knows which tail to distrust;
  *   5. persisted trained state (walk corpora, BPE, IVF centroids,
  *      postings, perceptron weights, SCC labels, …) is PRE-WARMED
  *      untimed before the sweep — the r8 in-sweep cold builds (q393
  *      12.2 s / q394 7.3 s first runs) paid state construction inside
  *      the timed window; min-of-runs already discarded them from the
  *      figures, but the wall clock still paid, and both timed runs
  *      being warm is what lets the 30% corroboration succeed without
  *      extra runs.
  *
  * Output contract (the driver tails decorated sbt stdout, which can
  * truncate a long line mid-JSON — r2's BENCH had "parsed": null):
  *   1. the full JSON line goes to stderr first, then stdout;
  *   2. the LAST stdout line is a compact variant (total + top-10 slowest
  *      queries, well under tail-truncation size) with the same schema;
  *   3. the full JSON is also written to `SPARK_GRAFT_BENCH_OUT`
  *      (default `bench_out.json`).
  */
object Bench {
  /** Queries whose FIRST run builds fingerprint-keyed persisted state
    * ([[graft.sources.ParquetState]]); run once untimed before the
    * sweep so every timed run serves from state. One name per state
    * family (the cheapest face that triggers the build); a stale entry
    * here is harmless — it just warms a normal query. */
  private val stateBuilders = Seq(
    "q370_walk_corpus",      // co-purchase edges + DeepWalk corpus (feeds q393/q395)
    "q394_node2vec_walks",   // biased walk corpus
    "q153_label_prop",       // LPA labels (feeds q373)
    "q358_cycle_fixpoint",   // SCC labels (feeds q364)
    "q132_bpe_train",        // BPE merge trajectory (feeds q144/q220)
    "q397_bpe_holdout",      // held-out (2%-sample) BPE trajectory
    "q136_bm25",             // postings index (feeds the retrieval stack)
    "q175_phrase_search",    // positional index
    "q119_kmeans_train",     // IVF centroids (feeds q120/q122/q374)
    "q123_corpus_build",     // eval-set decontamination Bloom
    "q149_corpus_card",      // second Bloom consumer (same key, shared)
    "q351_charngram_langid", // trained trigram model
    "q355_cross_validation", // 5-fold perceptron weights
    "q127_perceptron",       // served task weights
    "q380_data_map",         // perceptron trajectory
    "q298_ops_scorecard")    // ops scorecard sheet

  def main(args: Array[String]): Unit = {
    val tJvm0 = System.nanoTime()
    def elapsedS: Double = (System.nanoTime() - tJvm0) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt.max(1)
    val budgetS = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_S", "1200").toDouble
    val hardStopS = budgetS * 1.15
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC") // parity with Verify
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen/scheduler warmup on synthetic data so the first timed
    // query doesn't absorb session initialization (no fixture data is
    // touched or cached here)
    spark.range(1L << 20).selectExpr("count(distinct id % 1000)").collect()
    // load sentinel: a fixed CPU-bound probe at full executor width.
    // Its idle time is pinned in BASELINE.md; a loaded machine inflates
    // it proportionally, which makes a hot round artifact self-evident.
    def loadProbe(): Double = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      spark.range(0, (1L << 21) * cpus.toLong, 1, cpus.toInt)
        .selectExpr("sum(pmod(xxhash64(id), 1024))").collect()
      (System.nanoTime() - t0) / 1e9
    }.min
    // SPARK_GRAFT_BENCH_ONLY=q74,q78 limits the run to queries whose name
    // contains any listed token — a local profiling aid; the driver never
    // sets it, so round artifacts always cover the full contract.
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .filter(_.nonEmpty)
    val selected = only match {
      case Some(toks) => SparkEntry.queries.filter { case (n, _) => toks.exists(n.contains) }
      case None => SparkEntry.queries
    }
    val maxRuns = sys.env.getOrElse("SPARK_GRAFT_BENCH_MAX_RUNS", "4").toInt.max(runs)
    // pre-sweep settle: a machine still winding down (the driver's own
    // verify pass, a previous JVM exiting) inflates the first minutes of
    // the sweep — r6 opened at probe 0.253 vs the 0.08–0.15 idle pin.
    // Probe, and while it reads hot, wait 30 s and re-probe (bounded
    // budget); the artifact records the wait count, so a round that
    // STILL opened hot is documented rather than silent. Settle time
    // counts against the wall budget: a round that spent its clock
    // settling degrades gracefully instead of getting killed mid-sweep.
    val settleLimit = sys.env.getOrElse("SPARK_GRAFT_BENCH_SETTLE_TRIES", "6").toInt
    var settleWaits = 0
    var probePre = loadProbe()
    while (probePre > 0.15 && settleWaits < settleLimit && elapsedS < budgetS * 0.25) {
      System.err.println(f"[bench] probe ${probePre}%.3f s > 0.15 idle pin — settling 30 s " +
        s"(${settleWaits + 1}/$settleLimit)")
      Thread.sleep(30000)
      settleWaits += 1
      probePre = loadProbe()
    }
    def once(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable => System.err.println(s"[bench] $name failed: ${e.getMessage}") }
      // queries that persist multi-consumer intermediates (dedup family)
      // must not leave them pinned — for memory, for self-contained
      // timings regardless of run order, and so run 2 re-does the I/O
      spark.catalog.clearCache()
      (System.nanoTime() - t0) / 1e9
    }
    def f3(v: Double) = String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))
    def queriesJson(qs: Iterable[(String, Double)]): String =
      // Locale.ROOT: the default-locale interpolator writes "1,234" under
      // comma-decimal locales, which is invalid JSON
      qs.map { case (k, v) => "\"" + k + "\":" + f3(v) }.mkString("{", ",", "}")

    // pre-warm the persisted-state builders (rev 9): untimed, and only
    // while the budget is comfortable — on a box that burned its clock
    // settling, cold builds land in run 1 and min-of-runs absorbs them
    // exactly as rev 8 did
    var warmed = 0
    for ((name, fn) <- selected if stateBuilders.contains(name) && elapsedS < budgetS * 0.4) {
      val t = once(name, fn)
      warmed += 1
      System.err.println(s"[bench] warm $name: ${f3(t)}")
    }

    // ---- incremental artifact plumbing (rev 9) ----
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    @volatile var snapshotFull: String = ""
    @volatile var snapshotCompact: String = ""
    def writeArtifact(json: String): Unit =
      try Files.writeString(Paths.get(out), json + "\n")
      catch { case e: Throwable => System.err.println(s"[bench] could not write $out: ${e.getMessage}") }
    // SIGTERM (what the driver's `timeout` sends) runs shutdown hooks:
    // flush the last snapshot to both the file and stdout so a killed
    // sweep still yields a parseable artifact and a parseable tail line
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      if (!done.get && snapshotFull.nonEmpty) {
        writeArtifact(snapshotFull)
        println(snapshotCompact)
        System.out.flush()
      }
    }))

    // the min is only trusted once a second run lands within 30% of it:
    // a load burst that hit one run costs one more run, an idle sweep
    // pays nothing extra
    def corroborated(times: Seq[Double]): Boolean = {
      val s = times.sorted
      s.length >= 2 && s(1) <= s(0) * 1.3
    }
    // kept as ORDERED collections throughout: a Map would scramble the
    // artifact's query order and make cross-round textual diffs of
    // BENCH_rN.json useless
    val partial = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    val skipped = scala.collection.mutable.ArrayBuffer.empty[String]
    def partialJson(trunc: Boolean, extra: String = ""): String = {
      val total = if (partial.nonEmpty) partial.values.sum else 0.0
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${queriesJson(partial)},""" +
        s""""sf":"$sfDir","bench_rev":9,"runs_per_query":$runs,"truncated":$trunc,""" +
        s""""n_done":${partial.size},"n_selected":${selected.size},"warmed":$warmed,""" +
        s""""settle_waits":$settleWaits,"probe_sec":${f3(probePre)}$extra}"""
    }
    def compactOf(full: Boolean): String = {
      val top10 = partial.toSeq.sortBy(-_._2).take(10)
      val total = if (partial.nonEmpty) partial.values.sum else 0.0
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${queriesJson(top10)},""" +
        s""""sf":"$sfDir","bench_rev":9,"n_queries":${partial.size},"n_selected":${selected.size},""" +
        s""""truncated":${!full},"warmed":$warmed,"settle_waits":$settleWaits,""" +
        s""""probe_sec":${f3(probePre)},"full_out":"$out"}"""
    }
    var degradedAfter = -1 // first index where 1-run mode activated (−1 = never)
    // predictive degrade (refined after two driver-conditions
    // rehearsals: waiting until the budget was SPENT left 155/394
    // queries skipped at the hard stop — a 1-run figure for every
    // query beats full methodology for 40% of them — and a STICKY
    // trigger fired at query 4 off the cold-JIT first runs and never
    // recovered): run a query at 1 run when the remaining queries'
    // single-run reserve no longer fits the budget, re-deciding PER
    // QUERY — avgRun starts inflated by JIT warmup and decays as warm
    // runs accumulate, so early degrades self-correct and the sweep
    // still covers the whole contract before the clock dies.
    var runWall = 0.0
    var runCount = 0
    def avgRun = if (runCount == 0) 1.0 else runWall / runCount
    var nSingleRun = 0
    val singleRun = scala.collection.mutable.Set.empty[String]
    val firstPass = selected.toSeq.zipWithIndex.flatMap { case ((name, fn), i) =>
      if (elapsedS > hardStopS) { skipped += name; None }
      else {
        val reserve = (selected.size - i - 1) * avgRun
        val degraded = elapsedS > budgetS ||
          elapsedS + reserve + 2.2 * avgRun > budgetS
        if (degraded) {
          nSingleRun += 1
          singleRun += name
          if (degradedAfter < 0) {
            degradedAfter = i
            System.err.println(f"[bench] wall budget $budgetS%.0f s minus ${reserve}%.0f s " +
              s"single-run reserve first reached at $i/${selected.size} — per-query 1-run mode")
          }
        }
        def timed(): Double = {
          val t = once(name, fn)
          runWall += t; runCount += 1
          t
        }
        val times = scala.collection.mutable.ArrayBuffer(timed())
        if (!degraded) {
          while (times.length < runs) times += timed()
          while (!corroborated(times.toSeq) && times.length < maxRuns)
            times += timed()
        }
        // per-run breakdown to stderr: shows warm-vs-cold effects (e.g. a
        // first run that builds persisted state) that the min hides
        System.err.println(s"[bench] $name runs: " + times.map(f3).mkString(", "))
        partial(name) = times.min
        snapshotFull = partialJson(trunc = true)
        snapshotCompact = compactOf(full = false)
        writeArtifact(snapshotFull)
        // a SIGKILL leaves no hook — drop a parseable snapshot line in
        // the stdout tail every 50 queries
        if ((i + 1) % 50 == 0) { println(snapshotCompact); System.out.flush() }
        Some((name, fn, times.toSeq))
      }
    }
    // RE-QUEUE, don't re-run adjacently: a load burst longer than one
    // query's whole run window owns ALL of its adjacent runs, and no
    // corroboration policy can see that from inside the window (r5:
    // q03's 3.77 s artifact re-measured at 0.80 s on a quiet box). A
    // query that exhausted its budget uncorroborated gets two fresh
    // runs at sweep end — minutes later, when the burst has moved on —
    // and reports the min over all runs. Skipped past the wall budget.
    val requeued = firstPass.map { case (name, fn, times) =>
      val all =
        if (corroborated(times) || times.length < 2 || elapsedS > budgetS) times
        else {
          val retry = Seq.fill(2)(once(name, fn))
          System.err.println(s"[bench] $name requeued runs: " + retry.map(f3).mkString(", "))
          times ++ retry
        }
      partial(name) = all.min
      (name, fn, all.min)
    }
    // CROSS-ROUND corroboration (bench_rev 8; the r7 verdict's fix for
    // the q207/q234 phantom spikes): within-sweep agreement can't see a
    // burst that owned a query's ENTIRE run window, but the previous
    // round's artifact can. Any query whose min exceeds its prior-round
    // figure by >2x on UNCHANGED methodology gets one more sweep-end
    // run; whatever still exceeds 2x is listed in "suspect":[...] so a
    // reader chases it with a solo re-measure instead of trusting it.
    // Skipped entirely past the wall budget.
    val priorPath = sys.env.getOrElse("SPARK_GRAFT_BENCH_PRIOR", "BENCH_PRIOR.json")
    val prior: Map[String, Double] =
      try {
        // anchor the parse to the artifact's flat "queries":{...} object
        // (ADVICE r8: a whole-file regex would also bind q-named keys
        // from any future nested map, last-match-wins)
        val txt = Files.readString(Paths.get(priorPath))
        val i = txt.indexOf("\"queries\"")
        val start = txt.indexOf('{', i)
        val end = txt.indexOf('}', start)
        val obj = if (i < 0 || start < 0 || end < 0) "" else txt.substring(start, end + 1)
        val qNum = """"(q\d+[^"]*)"\s*:\s*([0-9.]+)""".r
        qNum.findAllMatchIn(obj).map(m => m.group(1) -> m.group(2).toDouble).toMap
      } catch { case _: Throwable => Map.empty }
    val crossChecked = requeued.map { case (name, fn, best) =>
      prior.get(name) match {
        case Some(p) if p > 0 && best > p * 2 && elapsedS < budgetS =>
          val again = once(name, fn)
          System.err.println(f"[bench] $name cross-round recheck: $again%.3f " +
            f"(min was $best%.3f, prior $p%.3f)")
          partial(name) = math.min(best, again)
          (name, math.min(best, again), p)
        case _ => (name, best, prior.getOrElse(name, 0.0))
      }
    }
    // single-run figures are pre-declared lower-confidence (n_single_run
    // labels them); flagging them against min-of-runs priors would flood
    // the suspect list with methodology artifacts, so suspects are only
    // drawn from full-methodology queries
    val suspects = crossChecked.collect {
      case (name, best, p) if p > 0 && best > p * 2 && !singleRun.contains(name) => name
    }
    val results = crossChecked.map { case (name, best, _) => name -> best }
    val probePost = loadProbe()
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0
    // bench_rev: timing methodology version (3 = min-of-two runs + q78
    // corpus slice; 4 = 32g default heap; 5 = corroborated-min re-runs +
    // load probe; 6 = uncorroborated queries re-queued at sweep end;
    // 7 = pre-sweep settle loop until the probe reads idle;
    // 8 = cross-round >2x recheck + suspect list + per-era split;
    // 9 = incremental artifact + shutdown hook + wall budget + state
    // pre-warm) — cross-round deltas are only comparable at equal rev
    // per-era decomposition, so the number comparable to the r3
    // baseline (the r4-era s/q) rides the artifact instead of being
    // re-derived from BASELINE.md each round; eras follow the rounds'
    // query-number ranges
    def era(name: String): String = {
      val n = name.drop(1).takeWhile(_.isDigit)
      if (!name.startsWith("q") || n.isEmpty) "ref"
      else n.toInt match {
        case v if v <= 124 => "r4"
        case v if v <= 318 => "r5"
        case v if v <= 357 => "r6"
        case v if v <= 392 => "r7"
        case v if v <= 395 => "r8"
        case _ => "r9"
      }
    }
    val eras = results.groupBy { case (n, _) => era(n) }.toSeq.sortBy(_._1)
      .map { case (e, qs) =>
        val sec = qs.map(_._2).sum
        s""""$e":{"n":${qs.size},"sec":${f3(sec)},"sec_per_q":${f3(sec / qs.size)}}"""
      }.mkString("{", ",", "}")
    val suspectJson = suspects.map("\"" + _ + "\"").mkString("[", ",", "]")
    val skippedJson = skipped.map("\"" + _ + "\"").mkString("[", ",", "]")
    val probes = s""""probe_sec":${f3(probePre)},"probe_post_sec":${f3(probePost)},"settle_waits":$settleWaits"""
    val trunc = skipped.nonEmpty
    val extras = s""""eras":$eras,"suspect":$suspectJson,"skipped":$skippedJson,""" +
      s""""truncated":$trunc,"degraded_after":$degradedAfter,"n_single_run":$nSingleRun,""" +
      s""""warmed":$warmed,"wall_sec":${f3(elapsedS)}"""
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":${queriesJson(results)},"sf":"$sfDir","bench_rev":9,"runs_per_query":$runs,$probes,$extras}"""
    val top10 = results.sortBy(-_._2).take(10)
    val compact = s"""{"metric":"total","value":$total,"unit":"sec","queries":${queriesJson(top10)},"sf":"$sfDir","n_queries":${results.size},"runs_per_query":$runs,"bench_rev":9,$probes,$extras,"full_out":"$out"}"""
    System.err.println(json)
    System.err.flush()
    println(json)
    writeArtifact(json)
    done.set(true)
    spark.stop()
    // last stdout line before sbt's [success] footer — short enough to
    // survive any tail truncation the driver applies
    println(compact)
    System.out.flush()
  }
}

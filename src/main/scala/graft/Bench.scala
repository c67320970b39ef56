package graft

import org.apache.spark.sql.SparkSession

/**
 * Benchmark main (driver contract): one JSON line with per-query seconds on
 * SPARK_GRAFT_SF_DIR, plus the north-rule evidence — extraction throughput
 * (turns/sec) at two parallelism levels (local[N/4] vs local[N], the
 * sandbox stand-in for N vs 4N executors) and the scaling efficiency.
 */
object Bench {

  private def session(cpus: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  final case class PinnedResult(bestSec: Double, ceilingOps: Double, ceilingSmallOps: Double,
                                engineOps: Double, engineSmallOps: Double,
                                membwGbps: Double, membwSmallGbps: Double)

  /** Run [[ScalingRunner]] in a child JVM pinned to `cpus` CPUs (taskset):
    * the honest N-core-executor emulation — see ScalingRunner scaladoc.
    * Returns best extraction seconds + the machine-ceiling ops/s at that
    * thread count. Identical JVM config (ParallelGC, large young gen — the
    * right collector for this allocation-heavy batch shape) at both levels,
    * per the "same job, two parallelism levels" rule. */
  private def pinnedRun(cpus: Int, n: Long, reps: Int, ceilSmall: Int = 0): PinnedResult = {
    val javaHome = System.getProperty("java.home")
    val cp = System.getProperty("java.class.path")
    val addOpens = Seq(
      "java.base/java.lang", "java.base/java.lang.invoke", "java.base/java.lang.reflect",
      "java.base/java.io", "java.base/java.net", "java.base/java.nio", "java.base/java.util",
      "java.base/java.util.concurrent", "java.base/java.util.concurrent.atomic",
      "java.base/sun.nio.ch", "java.base/sun.nio.cs", "java.base/sun.security.action",
      "java.base/sun.util.calendar").flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
    val totalGb = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean].getTotalMemorySize / (1L << 30)
    val (xmx, xmn) = if (totalGb >= 64) ("24g", "16g") else ("8g", "5g")
    val javaCmd = Seq(s"$javaHome/bin/java") ++ addOpens ++ Seq(
      "-XX:+UseParallelGC", s"-Xmx$xmx", s"-Xmn$xmn",
      "-Dspark.ui.enabled=false", "-cp", cp,
      "graft.ScalingRunner", cpus.toString, n.toString, reps.toString, ceilSmall.toString)
    val cmd =
      if (new java.io.File("/usr/bin/taskset").exists())
        Seq("/usr/bin/taskset", "-c", s"0-${cpus - 1}") ++ javaCmd
      else javaCmd
    val pb = new ProcessBuilder(cmd: _*)
    pb.redirectErrorStream(true)
    val proc = pb.start()
    val out = new String(proc.getInputStream.readAllBytes(),
      java.nio.charset.StandardCharsets.UTF_8)
    proc.waitFor()
    val best = "best_sec=([0-9.]+)".r.findFirstMatchIn(out).map(_.group(1).toDouble)
      .getOrElse(throw new RuntimeException(s"scaling child failed:\n${out.takeRight(2000)}"))
    def grab(tag: String): Double =
      (tag + " cpus=\\d+ ops_per_sec=([0-9.]+)").r
        .findFirstMatchIn(out).map(_.group(1).toDouble).getOrElse(0.0)
    def grabBw(tag: String): Double =
      (tag + " cpus=\\d+ gbps=([0-9.]+)").r
        .findFirstMatchIn(out).map(_.group(1).toDouble).getOrElse(0.0)
    PinnedResult(best, grab("CEILING_RESULT"), grab("CEILING_SMALL"),
      grab("ENGINE_RESULT"), grab("ENGINE_SMALL"),
      grabBw("MEMBW_RESULT"), grabBw("MEMBW_SMALL"))
  }

  /** Deterministic allocation rate of the per-turn engine (ThreadMXBean —
    * robust to host CPU jitter, unlike wall time): the input for the
    * memory-bandwidth ceiling analysis in BASELINE.md.
    *
    * 20k warmup iterations (a 2k warmup left the loop below the final JIT
    * tier in noisy driver windows and read ~25% high — the round-4
    * 58k-vs-73k artifact discrepancy), then the MINIMUM of 3 measured
    * passes: allocation is deterministic per turn, so any excess in a
    * pass is residual compilation/profiling noise and the minimum is the
    * true rate. */
  private def allocBytesPerTurn(): Double = {
    val texts = (0L until 2000L).map(id => graft.io.Transcripts.payload(42L, id)).toArray
    val mx = java.lang.management.ManagementFactory.getThreadMXBean
      .asInstanceOf[com.sun.management.ThreadMXBean]
    var i = 0
    while (i < 20000) { graft.core.Engine.parseTurn("c", 0, texts(i % texts.length)); i += 1 }
    val n = 4000
    val passes = (0 until 3).map { _ =>
      val a0 = mx.getCurrentThreadAllocatedBytes
      var j = 0
      while (j < n) { graft.core.Engine.parseTurn("c", 0, texts(j % texts.length)); j += 1 }
      (mx.getCurrentThreadAllocatedBytes - a0).toDouble / n
    }
    passes.min
  }

  /** True median (average of the middle two on even counts — an even
    * round set's upper-middle element flattered degraded windows). */
  private def median(xs: Seq[Double]): Double =
    if (xs.isEmpty) 0.0
    else {
      val s = xs.sorted
      if (s.length % 2 == 1) s(s.length / 2)
      else (s(s.length / 2 - 1) + s(s.length / 2)) / 2.0
    }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)
    val nTurns = math.max(2000L, (sf * 1000000).toLong) // sf0.1 -> 100k turns

    // -- scaling evidence: same input, CPU-pinned N/4- vs N-core JVMs.
    // The sandbox VM's CPU delivery jitters +-30% between runs, so run two
    // interleaved rounds per config and keep the best (least-interference)
    // sample of each.
    val small = math.max(1, cpus / 4)
    // size the scaling workload to keep a small-config rep under ~15s even
    // when the driver grants few cores (~800 turns/sec/core incl. overhead
    // at very low core counts)
    val scalingTurns = math.min(nTurns, 10000L * small)
    // low-core configs are slow per rep — shrink the protocol to stay
    // within the driver's time budget
    val reps = 3
    // interleaved rounds at high core counts: the host's CPU delivery can
    // degrade for whole minutes at a time, which best-of-reps inside one
    // window cannot defend against — more widely-spaced rounds can (the
    // best-of-rounds and median statistics both get more robust per
    // round). ODD count: the median is then a real round's paired sample,
    // and one collapsed round can neither flatter nor sink the headline.
    val nRounds = if (cpus >= 16) 5 else 1
    val rounds = (1 to nRounds).map { _ =>
      (pinnedRun(small, scalingTurns, reps), pinnedRun(cpus, scalingTurns, reps, ceilSmall = small))
    }
    val rSmall = rounds.map(_._1).minBy(_.bestSec)
    val rBig = rounds.map(_._2).minBy(_.bestSec)
    val thrSmall = scalingTurns / rSmall.bestSec
    val thrBig = scalingTurns / rBig.bestSec
    val factor = cpus.toDouble / small
    // >1 means the small-config sample was degraded by host noise; clamp
    val efficiency = math.min(1.0, thrBig / (thrSmall * factor))
    // single-box thread-scaling ceiling for string work (see ScalingRunner):
    // the cluster-predictive number is efficiency normalized by it
    // both ceiling samples come from the BIG pinned JVM (same warm JIT);
    // a thread-scaling "efficiency" above 1.0 is measurement noise -> clamp
    val ceilSmallOps = rounds.map(_._2.ceilingSmallOps).max
    val ceilBig = rounds.map(_._2.ceilingOps).max
    val ceilingEff =
      if (ceilSmallOps > 0 && ceilBig > 0)
        math.min(1.0, ceilBig / (ceilSmallOps * factor))
      else 1.0
    // the REPRESENTATIVE ceiling: the identical per-turn engine in plain
    // threads (no Spark) measured back-to-back in the big pinned JVM —
    // the box's physical thread-scaling for this exact computation
    val engSmallOps = rounds.map(_._2.engineSmallOps).max
    val engBig = rounds.map(_._2.engineOps).max
    val engineEff =
      if (engSmallOps > 0 && engBig > 0)
        math.min(1.0, engBig / (engSmallOps * factor))
      else ceilingEff
    // cap at 1.0: on noisy runs the extraction can out-scale the microbench
    val normalizedEff = math.min(1.0, efficiency / engineEff)

    val spark = session(cpus)
    // cap-drop observability (graft.skew.CapMetrics): per-site dropped
    // keys/rows from every KeyCaps guard that fired during the benched
    // queries — surfaced in the JSON line so silent truncation is visible
    val caps = graft.skew.CapMetrics.register(spark)

    // -- per-query timings on the sf dir ---------------------------------
    val benchQueries = Seq(
      "q02_parse_number", "q05_regex_extract", "q06_dedup_firstwins",
      "q07_group_stats", "q10_topk", "q11_fuzzy_topk", "q12_dedup_exact",
      "q15_token_counts", "q17_sessionize", "q18_extract_turns",
      "q19_extract_items", "q21_minhash_candidates", "q22_simhash_candidates",
      "q24_ann_topk", "q25_ann_lsh", "q26_multimodal_meta", "q30_ann_ivf", "q34_lsh_dedup",
      "q35_distinctive_terms", "q37_contamination", "q38_boilerplate",
      "q39_asof_join", "q40_range_join", "q41_blocked_match",
      "q43_repetition", "q44_corpus_filter", "q45_stratified_sample",
      "q46_pack_sequences", "q47_quantize_int8", "q48_source_filter",
      "q49_session_window", "q50_contamination_bloom", "q51_dup_spans",
      "q52_cluster_best", "q53_lexical_commonness", "q54_vocab_topk",
      "q55_source_mix", "q56_semdedup_pairs", "q57_corpus_chain",
      "q58_incremental_dedup", "q59_semdedup_keep",
      "q60_semdedup_incremental", "q61_remove_dup_spans", "q62_bpe_pairs",
      "q63_pack_whole", "q64_strip_boiler_turns", "q65_length_profile",
      "q66_conv_integrity", "q67_global_shuffle", "q68_hash_classifier",
      "q69_truncate_context", "q70_chunk_docs", "q71_conv_dedup",
      "q72_agent_loops", "q73_repair_order", "q74_preference_pairs",
      "q75_temperature_sample", "q76_dup_flow_matrix", "q77_curriculum",
      "q78_transcript_chain", "q79_kmv_sketch", "q80_tool_transitions",
      "q81_bottomk_sample", "q82_centroid_sim", "q83_epoch_repeats",
      "q84_bottomk_per_group", "q85_oov_audit")
    val all = SparkEntry.queries
    // warmup: run every benched query once against the smallest sf dir —
    // same plans, so codegen + JIT are hot and first-query JVM warmup is
    // not billed to whichever query runs first (round-1 bench billed ~7s
    // of warmup to q02)
    val warmDir = {
      val small = sfDir.replaceAll("sf[0-9.]+", "sf0.001")
      if (new java.io.File(small).isDirectory) small else sfDir
    }
    benchQueries.foreach { name =>
      all.get(name).foreach { fn =>
        try fn(spark, warmDir).write.format("noop").mode("overwrite").save()
        catch { case _: Throwable => () }
      }
    }
    caps.clear() // only the timed sf-dir runs count
    val results = benchQueries.flatMap { name =>
      all.get(name).map { fn =>
        val sec = try time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        catch { case _: Throwable => -1.0 }
        name -> sec
      }
    }
    org.apache.spark.sql.graftbridge.Bridge.waitListenerBus(spark)
    val capDropsJson = graft.skew.CapMetrics.toJson(caps.snapshot())
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    // per-round (widely-spaced window) PAIRED samples: each round carries
    // its own raw Spark efficiency, its own engine-thread ceiling and its
    // own normalized ratio, all measured within minutes of each other —
    // the evidence that the normalized number is stable across host-
    // delivery drift, not a lucky pairing of a fast raw window with a
    // slow ceiling window (dividing best-of-rounds raw by max-of-rounds
    // ceiling systematically understates it).
    val roundsJson = rounds.map { case (rs, rb) =>
      val rawEff = math.min(1.0,
        (scalingTurns / rb.bestSec) / ((scalingTurns / rs.bestSec) * factor))
      val engEffR =
        if (rb.engineSmallOps > 0 && rb.engineOps > 0)
          math.min(1.0, rb.engineOps / (rb.engineSmallOps * factor))
        else 0.0
      val normR = if (engEffR > 0) math.min(1.0, rawEff / engEffR) else 0.0
      f"""{"raw_eff":$rawEff%.3f,"engine_eff":$engEffR%.3f,"norm_eff":$normR%.3f,""" +
        f""""engine_small_ops":${rb.engineSmallOps}%.0f,"engine_big_ops":${rb.engineOps}%.0f,""" +
        f""""membw_small_gbps":${rb.membwSmallGbps}%.2f,"membw_big_gbps":${rb.membwGbps}%.2f}"""
    }.mkString("[", ",", "]")
    val rawPerRound = rounds.map { case (rs, rb) =>
      math.min(1.0, (scalingTurns / rb.bestSec) / ((scalingTurns / rs.bestSec) * factor))
    }
    val rawMedian = median(rawPerRound)
    val normPerRound = rounds.map { case (rs, rb) =>
      val rawEff = math.min(1.0,
        (scalingTurns / rb.bestSec) / ((scalingTurns / rs.bestSec) * factor))
      if (rb.engineSmallOps > 0 && rb.engineOps > 0)
        math.min(1.0, rawEff / math.min(1.0, rb.engineOps / (rb.engineSmallOps * factor)))
      else 0.0
    }.filter(_ > 0)
    val normMedian = median(normPerRound)
    // memory-bus saturation evidence: a pure streaming-read loop's
    // aggregate GB/s at small vs big thread counts — if it stops growing,
    // the socket is the bottleneck, not the engine or Spark
    val bwSmall = rounds.map(_._2.membwSmallGbps).max
    val bwBig = rounds.map(_._2.membwGbps).max
    val bwScaling = if (bwSmall > 0) math.min(1.0, bwBig / (bwSmall * factor)) else 0.0
    val allocPerTurn = allocBytesPerTurn()
    // allocation bandwidth demanded at the big config if it scaled
    // perfectly: throughput * bytes/turn (young-gen copying roughly
    // doubles the true bus traffic) — compare with a single socket's
    // practical memory bandwidth in BASELINE.md
    val allocGbps = thrBig * allocPerTurn / 1e9
    // HEADLINE fields are the per-round PAIRED medians (each round's raw
    // efficiency and its normalized ratio are measured within the same
    // minutes-wide host window): BASELINE.md's defended statistic. The
    // former mixed-window values (best-of-rounds raw over max-of-rounds
    // ceiling) systematically understate a clean result when one round
    // collapses — kept as *_legacy for continuity with BENCH_r01-r03.
    val scaling =
      f"""{"cores_small":$small,"cores_big":$cpus,"turns":$scalingTurns,""" +
      f""""sec_small":${rSmall.bestSec}%.3f,"sec_big":${rBig.bestSec}%.3f,""" +
      f""""turns_per_sec_small":$thrSmall%.1f,"turns_per_sec_big":$thrBig%.1f,""" +
      f""""efficiency":$rawMedian%.3f,""" +
      f""""efficiency_legacy":$efficiency%.3f,""" +
      f""""machine_ceiling_efficiency":$ceilingEff%.3f,""" +
      f""""engine_thread_efficiency":$engineEff%.3f,""" +
      f""""rounds":$roundsJson,""" +
      f""""raw_eff_median":$rawMedian%.3f,""" +
      f""""norm_eff_median":$normMedian%.3f,""" +
      f""""membw_small_gbps":$bwSmall%.2f,"membw_big_gbps":$bwBig%.2f,""" +
      f""""membw_scaling":$bwScaling%.3f,""" +
      f""""alloc_bytes_per_turn":$allocPerTurn%.0f,""" +
      f""""alloc_gb_per_sec_at_big":$allocGbps%.2f,""" +
      f""""efficiency_vs_ceiling":$normMedian%.3f,""" +
      f""""efficiency_vs_ceiling_legacy":$normalizedEff%.3f}"""
    val totalS = f"$total%.3f"
    val thrS = f"$thrBig%.1f"
    println(s"""{"metric":"total","value":$totalS,"unit":"sec","queries":$qs,"sf":"$sfDir","turns_per_sec":$thrS,"cap_drops":$capDropsJson,"scaling":$scaling}""")
    spark.stop()
  }
}

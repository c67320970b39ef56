package graft

import org.apache.spark.sql.SparkSession

/**
 * Query-only benchmark (guide §1.4 noop-sink isolation): the SAME query
 * list, warmup protocol (one pass per query against sf0.001), session
 * config and noop-sink timing as the frozen [[Bench]], WITHOUT the pinned
 * scaling/allocation rounds — for fast optimization iterations. Extra
 * diagnostics per query: Spark job count (per-job driver overhead was the
 * dominant cost of the chain queries at bench scale).
 */
object BenchExtra {

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

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = session(cpus)
    val benchQueries: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq(
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
    def nJobs(): Int = spark.sparkContext.statusTracker.getJobIdsForGroup(null).length
    val results = benchQueries.flatMap { name =>
      all.get(name).map { fn =>
        val j0 = nJobs()
        val t0 = System.nanoTime()
        val sec = try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        } catch { case _: Throwable => -1.0 }
        (name, sec, nJobs() - j0)
      }
    }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val js = results.map { case (k, _, j) => "\"" + k + "\":" + j }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(f"""{"metric":"queries_only","value":$total%.3f,"unit":"sec","queries":$qs,"jobs":$js,"sf":"$sfDir"}""")
    spark.stop()
  }
}

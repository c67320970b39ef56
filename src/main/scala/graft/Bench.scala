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

  /** Count-based full materialization of the extraction over n synthetic
    * turns, generated with `cpus*3` input partitions so both runs see the
    * same data with proportional task counts. */
  private def extractionRun(spark: SparkSession, n: Long, cpus: Int): Double = {
    val turns = graft.io.Transcripts.generate(spark, n, partitions = cpus * 3).toDF()
    time(Pipeline.extractTurns(turns).toDF()
      .selectExpr("sum(best_count)", "sum(length(extracted_text))").collect())
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val sf = "sf([0-9.]+)".r.findFirstMatchIn(sfDir).map(_.group(1).toDouble).getOrElse(0.1)
    val nTurns = math.max(2000L, (sf * 1000000).toLong) // sf0.1 -> 100k turns

    // -- scaling evidence: same input, N/4 vs N cores --------------------
    val small = math.max(1, cpus / 4)
    val sSmall = session(small)
    extractionRun(sSmall, math.min(nTurns, 20000L), small) // warmup JIT
    val tSmall = extractionRun(sSmall, nTurns, small)
    sSmall.stop()

    val spark = session(cpus)
    extractionRun(spark, math.min(nTurns, 20000L), cpus) // warmup
    val tBig = extractionRun(spark, nTurns, cpus)
    val thrSmall = nTurns / tSmall
    val thrBig = nTurns / tBig
    val efficiency = thrBig / (thrSmall * (cpus.toDouble / small))

    // -- per-query timings on the sf dir ---------------------------------
    val benchQueries = Seq(
      "q02_parse_number", "q05_regex_extract", "q06_dedup_firstwins",
      "q07_group_stats", "q10_topk", "q11_fuzzy_topk", "q12_dedup_exact",
      "q15_token_counts", "q17_sessionize", "q18_extract_turns",
      "q19_extract_items", "q21_minhash_candidates", "q22_simhash_candidates",
      "q24_ann_topk", "q26_multimodal_meta")
    val all = SparkEntry.queries
    val results = benchQueries.flatMap { name =>
      all.get(name).map { fn =>
        val sec = try time(fn(spark, sfDir).write.format("noop").mode("overwrite").save())
        catch { case _: Throwable => -1.0 }
        name -> sec
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val scaling =
      f"""{"cores_small":$small,"cores_big":$cpus,"turns":$nTurns,""" +
      f""""sec_small":$tSmall%.3f,"sec_big":$tBig%.3f,""" +
      f""""turns_per_sec_small":$thrSmall%.1f,"turns_per_sec_big":$thrBig%.1f,""" +
      f""""efficiency":$efficiency%.3f}"""
    val totalS = f"$total%.3f"
    val thrS = f"$thrBig%.1f"
    println(s"""{"metric":"total","value":$totalS,"unit":"sec","queries":$qs,"sf":"$sfDir","turns_per_sec":$thrS,"scaling":$scaling}""")
    spark.stop()
  }
}

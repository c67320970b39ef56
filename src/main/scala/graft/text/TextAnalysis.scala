package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines:
 * language ID (stopword-marker heuristic), quality scoring, token counting,
 * document fingerprinting. All pure column expressions (whole-stage
 * codegen'd, no UDFs) so they pushdown/prune and scale map-only.
 */
object TextAnalysis {

  /** Marker stopwords per language (tiny n-gram heuristic — deterministic,
    * SQL-expressible; accuracy is not the point, parity is). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " of ", " and "),
    "de" -> Seq(" der ", " und ", " die "),
    "fr" -> Seq(" le ", " la ", " et "),
    "es" -> Seq(" el ", " los ", " y "))

  private def hitCount(textCol: Column, markers: Seq[String]): Column =
    markers.map(m => when(instr(textCol, m) > 0, 1).otherwise(0))
      .reduce(_ + _).cast("long")

  /** Language-ID: argmax of marker hits, first-wins tie-break in
    * (en, de, fr, es) order, 'und' when all zero. */
  def langId(df: DataFrame, textCol: String = "text"): DataFrame = {
    val withCounts = langMarkers.foldLeft(df) { case (d, (lang, markers)) =>
      d.withColumn(s"hits_$lang", hitCount(concat(lit(" "), lower(col(textCol)), lit(" ")), markers))
    }
    // explicit first-wins argmax chain (en > others, then de, fr, es)
    val pred =
      when(col("hits_en") >= col("hits_de") && col("hits_en") >= col("hits_fr") &&
        col("hits_en") >= col("hits_es") && col("hits_en") > 0, "en")
      .when(col("hits_de") >= col("hits_fr") && col("hits_de") >= col("hits_es") &&
        col("hits_de") > 0, "de")
      .when(col("hits_fr") >= col("hits_es") && col("hits_fr") > 0, "fr")
      .when(col("hits_es") > 0, "es")
      .otherwise("und")
    withCounts.withColumn("pred_lang", pred)
  }

  /** Quality scoring: length, word stats, stopword ratio, alpha ratio.
    * Single-division doubles -> bit-deterministic across engines. */
  def qualityScore(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val words = size(split(trim(t), "\\s+")).cast("long")
    df.withColumn("n_chars", length(t).cast("long"))
      .withColumn("n_words", words)
      .withColumn("avg_word_len",
        (length(translate(trim(t), " ", "")).cast("double") / words.cast("double")))
      .withColumn("stopword_hits",
        Seq(" the ", " a ", " of ").map(m => when(instr(concat(lit(" "), lower(t), lit(" ")), m) > 0, 1).otherwise(0))
          .reduce(_ + _).cast("long"))
      .withColumn("is_quality",
        col("n_words") >= 20 && col("avg_word_len") >= 2.0 && col("avg_word_len") <= 12.0)
  }

  /** Token counting: whitespace tokens + regex word tokens (BPE-ish
    * lower-alnum runs). */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.withColumn("ws_tokens", size(split(trim(t), "\\s+")).cast("long"))
      .withColumn("word_tokens",
        size(filter(split(lower(t), "[^a-z0-9]+"), x => x =!= "")).cast("long"))
  }

  /** Deterministic hash-based sampling: keep a row iff the first byte of
    * md5(id) falls under the rate — seed-free, engine-portable (md5 is
    * identical everywhere), stable under re-runs and resharding. The
    * training-data downsampling primitive (optionally stratified by any
    * column simply by choosing per-stratum rates). */
  def deterministicSample(df: DataFrame, idCol: String, keepOutOf256: Int): DataFrame = {
    // lexicographic compare on the fixed-width lowercase hex prefix ==
    // numeric compare ('0'-'9' < 'a'-'f'), portable across engines
    val bound = f"$keepOutOf256%02x"
    df.where(substring(md5(col(idCol).cast("string")), 1, 2) < bound)
  }

  /** Fingerprinting: md5 of the normalized text + an 8-hex-char bucket. */
  def fingerprint(df: DataFrame, textCol: String = "text"): DataFrame = {
    val norm = lower(trim(regexp_replace(col(textCol), "\\s+", " ")))
    df.withColumn("fp", md5(norm))
      .withColumn("fp_bucket", substring(md5(norm), 1, 8))
      .withColumn("norm_len", length(norm).cast("long"))
  }
}

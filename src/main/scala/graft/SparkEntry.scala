package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.expr.functions.parse_number

/**
 * Driver contract (see SURVEY.md §7): one `queries` entry per implemented
 * operator family, with a DuckDB-equivalent `oracleSql` wherever the
 * operator is SQL-expressible; engine-level operators (the 7-parser turn
 * extraction, WRatio matching, MinHash/SimHash whose hash functions are
 * engine-specific) are rows-only entries backed by ScalaTest golden specs.
 */
object SparkEntry {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** sf scale factor parsed from the dir name (sf0.01 -> 0.01). */
  private def sfOf(dir: String): Double =
    "sf([0-9.]+)".r.findFirstMatchIn(dir).map(_.group(1).toDouble).getOrElse(0.01)

  /** Flagship: full 7-parser extraction over deterministic synthetic
    * transcripts at sf=0.001 scale; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val turns = graft.io.Transcripts.generateDF(spark, 1000L)
    Pipeline.extractItems(turns)
  }

  // ---- P1: number parsing (custom Catalyst expression) --------------------
  private def qParseNumber(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val sRu = concat(col("l_orderkey").cast("string"), lit(","),
      lpad((col("l_suppkey") * 7 % 100).cast("string"), 2, "0"))
    val sGrouped = concat((col("l_orderkey") % 10).cast("string"), lit(" "),
      lpad((col("l_partkey") % 1000).cast("string"), 3, "0"), lit(",5"))
    val sUs = concat((col("l_orderkey") % 100).cast("string"), lit(","),
      lpad((col("l_partkey") % 1000).cast("string"), 3, "0"), lit(".25"))
    val sNoise = concat(lit("цена "), (col("l_suppkey") % 100).cast("string"), lit(" руб"))
    val sJunk = lit("абв")
    li.select(col("l_orderkey"), col("l_linenumber"),
        parse_number(sRu).as("p_ru"),
        parse_number(sGrouped).as("p_grouped"),
        parse_number(sUs).as("p_us"),
        parse_number(sNoise).as("p_noise"),
        parse_number(sJunk).as("p_junk"))
  }

  private val oParseNumber =
    """WITH raw AS (
      |  SELECT l_orderkey, l_linenumber,
      |    l_orderkey::VARCHAR || ',' || lpad(((l_suppkey*7) % 100)::VARCHAR, 2, '0') AS s_ru,
      |    (l_orderkey % 10)::VARCHAR || ' ' || lpad((l_partkey % 1000)::VARCHAR, 3, '0') || ',5' AS s_grouped,
      |    (l_orderkey % 100)::VARCHAR || ',' || lpad((l_partkey % 1000)::VARCHAR, 3, '0') || '.25' AS s_us,
      |    'цена ' || (l_suppkey % 100)::VARCHAR || ' руб' AS s_noise,
      |    'абв' AS s_junk
      |  FROM lineitem)
      |SELECT l_orderkey, l_linenumber,
      |  pnum(s_ru) AS p_ru, pnum(s_grouped) AS p_grouped, pnum(s_us) AS p_us,
      |  pnum(s_noise) AS p_noise, pnum(s_junk) AS p_junk
      |FROM raw""".stripMargin

  /** The P1 algorithm spelled out in DuckDB SQL, used as a macro body. */
  private val pnumMacro =
    """CREATE OR REPLACE MACRO pnum(s) AS (
      |  WITH c1 AS (SELECT regexp_replace(trim(s), '[^0-9.,\s-]', '', 'g') AS c),
      |  c2 AS (SELECT CASE
      |      WHEN contains(c, ',') AND contains(c, '.') THEN replace(c, ',', '')
      |      WHEN contains(c, ',') AND len(string_split(c, ',')) = 2
      |           AND len(string_split(c, ',')[2]) <= 2 THEN replace(c, ',', '.')
      |      WHEN contains(c, ',') THEN replace(c, ',', '')
      |      ELSE c END AS d FROM c1)
      |  SELECT try_cast(replace(d, ' ', '') AS DOUBLE) FROM c2)""".stripMargin

  // ---- T1: line explode with stable line_idx ------------------------------
  private def qLineExplode(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " data ")).as(Seq("line_idx", "line")))
      .select(col("doc_id"), col("line_idx").cast("long").as("line_idx"), col("line"))

  private val oLineExplode =
    """WITH l AS (SELECT doc_id, string_split(text, ' data ') AS arr FROM documents)
      |SELECT doc_id, i - 1 AS line_idx, arr[i] AS line
      |FROM l, unnest(generate_series(1, len(arr))) AS g(i)""".stripMargin

  // ---- F6: line prefilters -------------------------------------------------
  private def qLineFilters(spark: SparkSession, dir: String): DataFrame =
    qLineExplode(spark, dir)
      .where(length(col("line")) >= 10 &&
        col("line").rlike("[a-z]") && !col("line").rlike("^[0-9\\s.,]+$"))
      .select(col("doc_id"), col("line_idx"), length(col("line")).cast("long").as("line_len"))

  private val oLineFilters =
    """WITH l AS (SELECT doc_id, string_split(text, ' data ') AS arr FROM documents),
      |e AS (SELECT doc_id, i - 1 AS line_idx, arr[i] AS line
      |      FROM l, unnest(generate_series(1, len(arr))) AS g(i))
      |SELECT doc_id, line_idx, len(line)::BIGINT AS line_len FROM e
      |WHERE len(line) >= 10 AND regexp_matches(line, '[a-z]')
      |  AND NOT regexp_matches(line, '^[0-9\s.,]+$')""".stripMargin

  // ---- R1: regex item extraction over constructed invoice lines -----------
  private def qRegexExtract(spark: SparkSession, dir: String): DataFrame = {
    val p = t(spark, dir, "part")
    val line = concat(col("p_name"), lit("  "), col("p_size").cast("string"),
      lit(" шт  "), col("p_retailprice").cast("string"), lit(" руб"))
    val pat = "^(.+?)\\s+([0-9]+) шт\\s+([0-9.]+) руб$"
    p.select(col("p_partkey"),
        regexp_extract(line, pat, 1).as("name"),
        regexp_extract(line, pat, 2).cast("long").as("qty"),
        regexp_extract(line, pat, 3).cast("double").as("price"))
      .withColumn("total", col("qty") * col("price"))
  }

  private val oRegexExtract =
    """WITH l AS (SELECT p_partkey,
      |  p_name || '  ' || p_size::VARCHAR || ' шт  ' || p_retailprice::VARCHAR || ' руб' AS line
      |  FROM part)
      |SELECT p_partkey,
      |  regexp_extract(line, '^(.+?)\s+([0-9]+) шт\s+([0-9.]+) руб$', 1) AS name,
      |  regexp_extract(line, '^(.+?)\s+([0-9]+) шт\s+([0-9.]+) руб$', 2)::BIGINT AS qty,
      |  regexp_extract(line, '^(.+?)\s+([0-9]+) шт\s+([0-9.]+) руб$', 3)::DOUBLE AS price,
      |  regexp_extract(line, '^(.+?)\s+([0-9]+) шт\s+([0-9.]+) руб$', 2)::BIGINT *
      |    regexp_extract(line, '^(.+?)\s+([0-9]+) шт\s+([0-9.]+) руб$', 3)::DOUBLE AS total
      |FROM l""".stripMargin

  // ---- A1: first-occurrence-wins dedup window -----------------------------
  private def qDedupFirstWins(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_partkey", "l_quantity")
      .orderBy("l_orderkey", "l_linenumber")
    t(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(w))
      .where(col("rn") === 1)
      .select(col("l_partkey"), col("l_quantity"), col("l_orderkey"), col("l_linenumber"))
  }

  private val oDedupFirstWins =
    """SELECT l_partkey, l_quantity, l_orderkey, l_linenumber FROM (
      |  SELECT l_partkey, l_quantity, l_orderkey, l_linenumber,
      |    row_number() OVER (PARTITION BY l_partkey, l_quantity
      |                       ORDER BY l_orderkey, l_linenumber) AS rn
      |  FROM lineitem) WHERE rn = 1""".stripMargin

  // ---- A2: per-group stats -------------------------------------------------
  private def qGroupStats(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .groupBy("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"),
        sum("l_quantity").as("sum_qty"),
        min("l_extendedprice").as("min_price"),
        max("l_extendedprice").as("max_price"),
        countDistinct("l_partkey").as("n_parts"))

  private val oGroupStats =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty,
      |  min(l_extendedprice) AS min_price, max(l_extendedprice) AS max_price,
      |  count(DISTINCT l_partkey) AS n_parts
      |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin

  // ---- A3: deterministic argmax (best-of selection shape) -----------------
  private def qBestArgmax(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_returnflag")
      .orderBy(desc("l_quantity"), desc("l_suppkey"), desc("l_orderkey"), desc("l_linenumber"))
    t(spark, dir, "lineitem")
      .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .select("l_returnflag", "l_quantity", "l_suppkey", "l_orderkey", "l_linenumber")
  }

  private val oBestArgmax =
    """SELECT l_returnflag, l_quantity, l_suppkey, l_orderkey, l_linenumber FROM (
      |  SELECT *, row_number() OVER (PARTITION BY l_returnflag
      |    ORDER BY l_quantity DESC, l_suppkey DESC, l_orderkey DESC, l_linenumber DESC) AS rn
      |  FROM lineitem) WHERE rn = 1""".stripMargin

  // ---- A4: doc-type keyword scores ----------------------------------------
  private def qDoctypeScores(spark: SparkSession, dir: String): DataFrame = {
    def hit(word: String): Column = (instr(col("text"), word) > 0).cast("int")
    val c1 = hit("spark"); val c2 = hit("join"); val c3 = hit("stream"); val c4 = hit("vector")
    val total = (c1 + c2 + c3 + c4).cast("double")
    t(spark, dir, "documents").select(col("doc_id"),
      (c1 + c2 + c3 + c4).cast("long").as("hits"),
      when(total > 0, c1 / total).otherwise(0.0).as("score_spark"),
      when(total > 0, c2 / total).otherwise(0.0).as("score_join"),
      when(total > 0, c3 / total).otherwise(0.0).as("score_stream"),
      when(total > 0, c4 / total).otherwise(0.0).as("score_vector"))
  }

  private val oDoctypeScores =
    """WITH h AS (SELECT doc_id,
      |  contains(text,'spark')::INT AS c1, contains(text,'join')::INT AS c2,
      |  contains(text,'stream')::INT AS c3, contains(text,'vector')::INT AS c4
      |  FROM documents)
      |SELECT doc_id, (c1+c2+c3+c4)::BIGINT AS hits,
      |  CASE WHEN c1+c2+c3+c4 > 0 THEN c1 / (c1+c2+c3+c4)::DOUBLE ELSE 0.0 END AS score_spark,
      |  CASE WHEN c1+c2+c3+c4 > 0 THEN c2 / (c1+c2+c3+c4)::DOUBLE ELSE 0.0 END AS score_join,
      |  CASE WHEN c1+c2+c3+c4 > 0 THEN c3 / (c1+c2+c3+c4)::DOUBLE ELSE 0.0 END AS score_stream,
      |  CASE WHEN c1+c2+c3+c4 > 0 THEN c4 / (c1+c2+c3+c4)::DOUBLE ELSE 0.0 END AS score_vector
      |FROM h""".stripMargin

  // ---- O2: per-key top-k ---------------------------------------------------
  private def qTopK(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey").orderBy(desc("l_extendedprice"), asc("l_linenumber"))
    t(spark, dir, "lineitem")
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select("l_orderkey", "rank", "l_linenumber", "l_extendedprice")
  }

  private val oTopK =
    """SELECT l_orderkey, rank, l_linenumber, l_extendedprice FROM (
      |  SELECT l_orderkey, l_linenumber, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_orderkey
      |      ORDER BY l_extendedprice DESC, l_linenumber) AS rank
      |  FROM lineitem) WHERE rank <= 3""".stripMargin

  // ---- J1 (oracle variant): levenshtein-ratio top-3 similarity join -------
  private val candidateProducts: Seq[(Int, String)] = Seq(
    1 -> "small widget", 2 -> "large bolt", 3 -> "economy gadget",
    4 -> "standard fitting", 5 -> "promo anodized tube", 6 -> "cold rolled steel")

  private def qFuzzyTopK(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cands = candidateProducts.toDF("cand_id", "cand_name")
    val la = lower(col("p_name")); val lb = lower(col("cand_name"))
    val score = lit(100.0) * (lit(1.0) - levenshtein(la, lb).cast("double") /
      greatest(length(la), length(lb)).cast("double"))
    val w = Window.partitionBy("p_partkey").orderBy(desc("score"), asc("cand_id"))
    t(spark, dir, "part").select("p_partkey", "p_name")
      .crossJoin(broadcast(cands))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3 && col("score") >= 40.0)
      .withColumn("is_auto", col("score") >= 90.0)
      .select("p_partkey", "rank", "cand_id", "score", "is_auto")
  }

  private val oFuzzyTopK =
    """WITH cands(cand_id, cand_name) AS (VALUES
      |  (1,'small widget'), (2,'large bolt'), (3,'economy gadget'),
      |  (4,'standard fitting'), (5,'promo anodized tube'), (6,'cold rolled steel')),
      |scored AS (
      |  SELECT p_partkey, cand_id,
      |    100.0 * (1.0 - levenshtein(lower(p_name), lower(cand_name)) /
      |      greatest(len(lower(p_name)), len(lower(cand_name)))::DOUBLE) AS score
      |  FROM part, cands),
      |ranked AS (SELECT *, row_number() OVER (PARTITION BY p_partkey
      |    ORDER BY score DESC, cand_id) AS rank FROM scored)
      |SELECT p_partkey, rank, cand_id, score, score >= 90.0 AS is_auto
      |FROM ranked WHERE rank <= 3 AND score >= 40.0""".stripMargin

  // ---- dedup: exact --------------------------------------------------------
  private def qDedupExact(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.exact(t(spark, dir, "documents"), "doc_id", "text")

  private val oDedupExact =
    """SELECT md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS norm_hash,
      |  min(doc_id) AS keeper, count(*) AS n_docs
      |FROM documents GROUP BY 1""".stripMargin

  // ---- dedup: exact n-gram jaccard (bounded pair range) -------------------
  private def qNgramJaccard(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.ngramJaccard(t(spark, dir, "documents"), "doc_id", "text",
      k = 3, maxId = 120L, threshold = 0.02)

  // ---- dedup: near-dup clusters (connected components over pairs) ---------
  private def qDedupClusters(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.dedupClusters(
      graft.dedup.Dedup.ngramJaccard(t(spark, dir, "documents"), "doc_id", "text",
        k = 3, maxId = 120L, threshold = 0.02).select("id_a", "id_b"))

  private val oDedupClusters =
    """WITH RECURSIVE toks AS (
      |  SELECT doc_id AS id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS tk
      |  FROM documents WHERE doc_id < 120),
      |sh AS (
      |  SELECT id, list_distinct([array_to_string(tk[i:i+2], ' ')
      |    FOR i IN range(1, greatest(len(tk) - 2, 0) + 1)]) AS s
      |  FROM toks),
      |pairs AS (
      |  SELECT a.id AS id_a, b.id AS id_b
      |  FROM sh a, sh b WHERE a.id < b.id
      |    AND len(list_intersect(a.s, b.s)) /
      |        (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::DOUBLE > 0.02),
      |edges AS (SELECT id_a AS u, id_b AS v FROM pairs
      |          UNION ALL SELECT id_b, id_a FROM pairs),
      |reach(u, v) AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u)
      |SELECT u AS doc_id, least(u, min(v)) AS cluster_id FROM reach GROUP BY u""".stripMargin

  // ---- text analysis -------------------------------------------------------
  private def qLangId(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.langId(t(spark, dir, "documents"))
      .select("doc_id", "hits_en", "hits_de", "hits_fr", "hits_es", "pred_lang")

  private val oLangId =
    """WITH h AS (SELECT doc_id,
      |  (contains(' '||lower(text)||' ',' the ')::INT + contains(' '||lower(text)||' ',' of ')::INT
      |    + contains(' '||lower(text)||' ',' and ')::INT)::BIGINT AS hits_en,
      |  (contains(' '||lower(text)||' ',' der ')::INT + contains(' '||lower(text)||' ',' und ')::INT
      |    + contains(' '||lower(text)||' ',' die ')::INT)::BIGINT AS hits_de,
      |  (contains(' '||lower(text)||' ',' le ')::INT + contains(' '||lower(text)||' ',' la ')::INT
      |    + contains(' '||lower(text)||' ',' et ')::INT)::BIGINT AS hits_fr,
      |  (contains(' '||lower(text)||' ',' el ')::INT + contains(' '||lower(text)||' ',' los ')::INT
      |    + contains(' '||lower(text)||' ',' y ')::INT)::BIGINT AS hits_es
      | FROM documents)
      |SELECT doc_id, hits_en, hits_de, hits_fr, hits_es,
      |  CASE WHEN hits_en >= hits_de AND hits_en >= hits_fr AND hits_en >= hits_es AND hits_en > 0 THEN 'en'
      |       WHEN hits_de >= hits_fr AND hits_de >= hits_es AND hits_de > 0 THEN 'de'
      |       WHEN hits_fr >= hits_es AND hits_fr > 0 THEN 'fr'
      |       WHEN hits_es > 0 THEN 'es'
      |       ELSE 'und' END AS pred_lang
      |FROM h""".stripMargin

  private def qQuality(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.qualityScore(t(spark, dir, "documents"))
      .select("doc_id", "n_chars", "n_words", "avg_word_len", "stopword_hits", "is_quality")

  private val oQuality =
    """WITH q AS (SELECT doc_id,
      |  len(text)::BIGINT AS n_chars,
      |  len(string_split_regex(trim(text), '\s+'))::BIGINT AS n_words,
      |  len(replace(trim(text), ' ', ''))::DOUBLE /
      |    len(string_split_regex(trim(text), '\s+'))::DOUBLE AS avg_word_len,
      |  (contains(' '||lower(text)||' ', ' the ')::INT +
      |   contains(' '||lower(text)||' ', ' a ')::INT +
      |   contains(' '||lower(text)||' ', ' of ')::INT)::BIGINT AS stopword_hits
      | FROM documents)
      |SELECT doc_id, n_chars, n_words, avg_word_len, stopword_hits,
      |  n_words >= 20 AND avg_word_len >= 2.0 AND avg_word_len <= 12.0 AS is_quality
      |FROM q""".stripMargin

  private def qSample(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.deterministicSample(
      t(spark, dir, "documents").select("doc_id", "lang", "n_chars"), "doc_id", 64)

  private val oSample =
    """SELECT doc_id, lang, n_chars FROM documents
      |WHERE substr(md5(doc_id::VARCHAR), 1, 2) < '40'""".stripMargin

  private def qTokenCounts(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.tokenCounts(t(spark, dir, "documents"))
      .select("doc_id", "ws_tokens", "word_tokens")

  private val oTokenCounts =
    """SELECT doc_id,
      |  len(string_split_regex(trim(text), '\s+'))::BIGINT AS ws_tokens,
      |  len(list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != ''))::BIGINT AS word_tokens
      |FROM documents""".stripMargin

  private def qFingerprint(spark: SparkSession, dir: String): DataFrame =
    graft.text.TextAnalysis.fingerprint(t(spark, dir, "documents"))
      .select("doc_id", "fp", "fp_bucket", "norm_len")

  private val oFingerprint =
    """SELECT doc_id,
      |  md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))) AS fp,
      |  substr(md5(lower(trim(regexp_replace(text, '\s+', ' ', 'g')))), 1, 8) AS fp_bucket,
      |  len(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))))::BIGINT AS norm_len
      |FROM documents""".stripMargin

  // ---- S4/S5: text-layer metrics ------------------------------------------
  private def qTextMetrics(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "documents").select(col("doc_id"),
      length(col("text")).cast("long").as("len_chars"),
      (length(trim(col("text"))) >= 20).as("has_text"),
      (length(col("text")) < 100).as("needs_fallback"))

  private val oTextMetrics =
    """SELECT doc_id, len(text)::BIGINT AS len_chars,
      |  len(trim(text)) >= 20 AS has_text, len(text) < 100 AS needs_fallback
      |FROM documents""".stripMargin

  // ---- events: sessionization (stateful shape, window-based) --------------
  private def qSessionize(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val us = unix_micros(col("ts").cast("timestamp")) // events.ts is TIMESTAMP_NTZ; session tz is UTC
    t(spark, dir, "events")
      .withColumn("prev_us", lag(us, 1).over(w))
      .withColumn("new_session",
        (col("prev_us").isNull || (us - col("prev_us")) > 1800L * 1000000L).cast("int"))
      .groupBy("user_id")
      .agg(sum("new_session").cast("long").as("n_sessions"), count(lit(1)).as("n_events"))
  }

  private val oSessionize =
    """WITH s AS (SELECT user_id, ts, event_id,
      |    lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      |  FROM events)
      |SELECT user_id,
      |  sum(CASE WHEN prev_us IS NULL OR epoch_us(ts) - prev_us > 1800000000 THEN 1 ELSE 0 END)::BIGINT AS n_sessions,
      |  count(*) AS n_events
      |FROM s GROUP BY user_id""".stripMargin

  // ---- relational coverage beyond the reference ---------------------------
  // broadcast dim join + aggregation (the J3 cache shape on TPC-H tables)
  private def qJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = t(spark, dir, "lineitem")
    val p = t(spark, dir, "part").select("p_partkey", "p_brand")
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "l_returnflag")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))
  }

  private val oJoinAgg =
    """SELECT p_brand, l_returnflag, count(*) AS cnt, sum(l_quantity) AS sum_qty
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |GROUP BY p_brand, l_returnflag""".stripMargin

  // grouping sets / rollup (integer-exact aggregates)
  private def qRollup(spark: SparkSession, dir: String): DataFrame =
    t(spark, dir, "lineitem")
      .rollup("l_returnflag", "l_linestatus")
      .agg(count(lit(1)).as("cnt"), sum("l_quantity").as("sum_qty"))

  private val oRollup =
    """SELECT l_returnflag, l_linestatus, count(*) AS cnt, sum(l_quantity) AS sum_qty
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  // running window (per-key ordered cumulative sum over integer-valued qty)
  private def qRunningSum(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("l_orderkey").orderBy("l_linenumber")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(spark, dir, "lineitem")
      .where(col("l_orderkey") < 500)
      .select(col("l_orderkey"), col("l_linenumber"),
        sum("l_quantity").over(w).as("running_qty"))
  }

  private val oRunningSum =
    """SELECT l_orderkey, l_linenumber,
      |  sum(l_quantity) OVER (PARTITION BY l_orderkey ORDER BY l_linenumber
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_qty
      |FROM lineitem WHERE l_orderkey < 500""".stripMargin

  // ---- engine-level, rows-only entries ------------------------------------
  private def nTurns(dir: String): Long = math.max(500L, (sfOf(dir) * 100000).toLong)

  private def qExtractTurns(spark: SparkSession, dir: String): DataFrame =
    Pipeline.extractTurns(graft.io.Transcripts.generateDF(spark, nTurns(dir))).toDF()
      .select("conv_id", "turn_idx", "n_chars", "n_tables", "doc_type",
        "best_parser", "best_count", "best_total_cost", "extracted_text")

  private def qExtractItems(spark: SparkSession, dir: String): DataFrame =
    Pipeline.extractItems(graft.io.Transcripts.generateDF(spark, nTurns(dir)))

  private def qWratioMatch(spark: SparkSession, dir: String): DataFrame = {
    val products = graft.io.Transcripts.productsDim(spark)
    val items = qExtractItems(spark, dir).select("conv_id", "turn_idx", "item_idx", "name")
    graft.matching.Matching.topMatches(items, products, Seq("conv_id", "turn_idx", "item_idx"))
  }

  private def qMinhashCandidates(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.minhashCandidates(t(spark, dir, "documents"), "doc_id", "text")

  private def qSimhashCandidates(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.simhashCandidates(t(spark, dir, "documents"), "doc_id", "text")

  private def qEmbedNearDup(spark: SparkSession, dir: String): DataFrame =
    graft.dedup.Dedup.embeddingNearDup(t(spark, dir, "embeddings"), "vec_id", "embedding",
      maxId = 200L, threshold = 0.32) // synthetic vectors: max pairwise cosine ~0.44

  private def qAnnTopK(spark: SparkSession, dir: String): DataFrame =
    graft.ann.Similarity.bruteForceTopK(t(spark, dir, "embeddings"), "vec_id", "embedding",
      nQueries = 10, k = 5)

  private def qAnnIvf(spark: SparkSession, dir: String): DataFrame =
    graft.ann.Similarity.ivfTopK(t(spark, dir, "embeddings"), "vec_id", "embedding",
      dim = 64, nQueries = 10, topK = 5, k = 16, nProbe = 4)

  private def qAnnLsh(spark: SparkSession, dir: String): DataFrame =
    graft.ann.Similarity.lshNearPairs(t(spark, dir, "embeddings"), "vec_id", "embedding",
      dim = 64, nPlanes = 6, threshold = 0.3)

  private def qMultimodalMeta(spark: SparkSession, dir: String): DataFrame = {
    val media = graft.mm.Multimodal.synthesizeMedia(t(spark, dir, "documents"), "doc_id", "text")
    graft.mm.Multimodal.extractMeta(media).toDF()
  }

  // -------------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_text_metrics" -> (qTextMetrics _),
    "q02_parse_number" -> (qParseNumber _),
    "q03_line_explode" -> (qLineExplode _),
    "q04_line_filters" -> (qLineFilters _),
    "q05_regex_extract" -> (qRegexExtract _),
    "q06_dedup_firstwins" -> (qDedupFirstWins _),
    "q07_group_stats" -> (qGroupStats _),
    "q08_best_argmax" -> (qBestArgmax _),
    "q09_doctype_scores" -> (qDoctypeScores _),
    "q10_topk" -> (qTopK _),
    "q11_fuzzy_topk" -> (qFuzzyTopK _),
    "q12_dedup_exact" -> (qDedupExact _),
    "q13_ngram_jaccard" -> (qNgramJaccard _),
    "q14_lang_id" -> (qLangId _),
    "q15_token_counts" -> (qTokenCounts _),
    "q16_fingerprint" -> (qFingerprint _),
    "q17_sessionize" -> (qSessionize _),
    "q18_extract_turns" -> (qExtractTurns _),
    "q19_extract_items" -> (qExtractItems _),
    "q20_wratio_match" -> (qWratioMatch _),
    "q21_minhash_candidates" -> (qMinhashCandidates _),
    "q22_simhash_candidates" -> (qSimhashCandidates _),
    "q23_embed_neardup" -> (qEmbedNearDup _),
    "q24_ann_topk" -> (qAnnTopK _),
    "q25_ann_lsh" -> (qAnnLsh _),
    "q26_multimodal_meta" -> (qMultimodalMeta _),
    "q27_join_agg" -> (qJoinAgg _),
    "q30_ann_ivf" -> (qAnnIvf _),
    "q31_dedup_clusters" -> (qDedupClusters _),
    "q32_quality_score" -> (qQuality _),
    "q33_det_sample" -> (qSample _),
    "q28_rollup" -> (qRollup _),
    "q29_running_sum" -> (qRunningSum _))

  def oracleSql: Map[String, String] = Map(
    "q01_text_metrics" -> oTextMetrics,
    "q02_parse_number" -> (pnumMacro + ";\n" + oParseNumber),
    "q03_line_explode" -> oLineExplode,
    "q04_line_filters" -> oLineFilters,
    "q05_regex_extract" -> oRegexExtract,
    "q06_dedup_firstwins" -> oDedupFirstWins,
    "q07_group_stats" -> oGroupStats,
    "q08_best_argmax" -> oBestArgmax,
    "q09_doctype_scores" -> oDoctypeScores,
    "q10_topk" -> oTopK,
    "q11_fuzzy_topk" -> oFuzzyTopK,
    "q12_dedup_exact" -> oDedupExact,
    "q13_ngram_jaccard" -> oNgramJaccardFull,
    "q14_lang_id" -> oLangId,
    "q15_token_counts" -> oTokenCounts,
    "q16_fingerprint" -> oFingerprint,
    "q17_sessionize" -> oSessionize,
    "q27_join_agg" -> oJoinAgg,
    "q28_rollup" -> oRollup,
    "q29_running_sum" -> oRunningSum,
    "q31_dedup_clusters" -> oDedupClusters,
    "q32_quality_score" -> oQuality,
    "q33_det_sample" -> oSample)

  /** n-gram jaccard oracle: shingles built identically (token 3-grams over
    * lowercase alnum tokens, distinct). */
  private val oNgramJaccardFull =
    """WITH toks AS (
      |  SELECT doc_id AS id,
      |    list_filter(string_split_regex(lower(text), '[^a-z0-9]+'), x -> x != '') AS tk
      |  FROM documents WHERE doc_id < 120),
      |sh AS (
      |  SELECT id, list_distinct([array_to_string(tk[i:i+2], ' ')
      |    FOR i IN range(1, greatest(len(tk) - 2, 0) + 1)]) AS s
      |  FROM toks),
      |pairs AS (
      |  SELECT a.id AS id_a, b.id AS id_b,
      |    len(list_intersect(a.s, b.s))::BIGINT AS inter,
      |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))::BIGINT AS uni
      |  FROM sh a, sh b WHERE a.id < b.id)
      |SELECT id_a, id_b, inter, uni, inter / uni::DOUBLE AS jaccard
      |FROM pairs WHERE inter / uni::DOUBLE > 0.02""".stripMargin
}

package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Corpus-level deduplication operators for training-data pipelines:
 * exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.
 *
 * Scale design (100 TB): every variant is shuffle-minimal —
 *  - exact: one hash-keyed groupBy (map-side combine);
 *  - MinHash/LSH: signatures computed map-side (deterministic polynomial
 *    hashes, no UDF state), candidates via band-bucket self-join keyed on
 *    (band, bucket) — only colliding docs shuffle, never the corpus square;
 *  - SimHash: 64-bit signature map-side, bucket-join on rotated prefixes;
 *  - n-gram Jaccard: exact verify step applied ONLY to LSH candidates
 *    (or a bounded id range for the oracle query);
 *  - embedding cosine: LSH on random-hyperplane signs, brute-force only
 *    within buckets.
 */
object Dedup {

  /** Exact dedup on normalized text: keep the smallest doc id per hash. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val norm = lower(trim(regexp_replace(col(textCol), "\\s+", " ")))
    df.withColumn("norm_hash", md5(norm))
      .groupBy("norm_hash")
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("n_docs"))
  }

  /** Lowercase alnum tokens. */
  def tokens(textCol: Column): Column =
    filter(split(lower(textCol), "[^a-z0-9]+"), x => x =!= "")

  /** Word k-shingles as strings ("a b c"); fewer than k tokens -> empty. */
  def shingles(textCol: Column, k: Int): Column = {
    val toks = tokens(textCol)
    array_distinct(
      when(size(toks) >= k,
        transform(sequence(lit(1), size(toks) - k + 1),
          i => concat_ws(" ", slice(toks, i, lit(k)))))
      .otherwise(array().cast("array<string>")))
  }

  /** Deterministic 64-bit polynomial hash of a string, seeded — the SAME
    * function everywhere (Scala + column expr via hash over concat). Uses
    * Spark's xxhash64 (stable across versions/platforms). */
  def shingleHash(s: Column, seed: Int): Column = xxhash64(lit(seed), s)

  /**
   * MinHash signatures: for each of `numHashes` seeds, min over shingle
   * hashes — computed entirely with higher-order functions (codegen'd).
   * Output: idCol, sig: array<long> of length numHashes.
   */
  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, numHashes: Int = 32): DataFrame =
    df.select(col(idCol), shingles(col(textCol), k).as("shingles"))
      .where(size(col("shingles")) > 0)
      .withColumn("sig", transform(sequence(lit(0), lit(numHashes - 1)),
        seed => array_min(transform(col("shingles"), s => xxhash64(seed, s)))))
      .select(col(idCol), col("sig"))

  /**
   * MinHash-LSH candidate pairs: band the signature (`bands` x `rowsPerBand`),
   * bucket-join on (band, hash(band rows)), emit distinct (a < b) pairs.
   */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, bands: Int = 8, rowsPerBand: Int = 4): DataFrame = {
    val numHashes = bands * rowsPerBand
    val sigs = minhashSignatures(df, idCol, textCol, k, numHashes)
    val banded = sigs.select(col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(concat_ws(",", slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    a.join(b, Seq("band", "bucket"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b").distinct()
  }

  /** Exact n-gram Jaccard similarity for given pairs (verify step), or for
    * a bounded id cross-product when `pairs` is None (oracle query). */
  def ngramJaccard(df: DataFrame, idCol: String, textCol: String, k: Int = 3,
                   maxId: Long = 100L, threshold: Double = 0.2): DataFrame = {
    val sh = df.where(col(idCol) < maxId)
      .select(col(idCol).as("id"), shingles(col(textCol), k).as("sh"))
    val a = sh.select(col("id").as("id_a"), col("sh").as("sh_a"))
    val b = sh.select(col("id").as("id_b"), col("sh").as("sh_b"))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("long"))
      .withColumn("uni",
        (size(col("sh_a")) + size(col("sh_b")) - size(array_intersect(col("sh_a"), col("sh_b")))).cast("long"))
      .withColumn("jaccard", col("inter").cast("double") / col("uni").cast("double"))
      .where(col("jaccard") > threshold)
      .select("id_a", "id_b", "inter", "uni", "jaccard")
  }

  /** SimHash 64-bit signature: sign-sum of per-token hashes, bit by bit —
    * pure column expressions. */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val hashes = transform(toks, t => xxhash64(t))
    val sig = (0 until 64).map { bit =>
      // sum over tokens of +1/-1 for this bit, then take the sign bit
      val bitSum = aggregate(hashes, lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    df.select(col(idCol), sig.as("simhash"))
  }

  /** Hamming-near pairs via 4x16-bit block bucketing (any pair within
    * hamming distance 3 shares at least one exact block). */
  def simhashCandidates(df: DataFrame, idCol: String, textCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val sigs = simhash(df, idCol, textCol)
    val blocks = sigs.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(b =>
        shiftright(col("simhash"), b * 16).bitwiseAND(lit(0xffffL))): _*))
        .as(Seq("block", "block_val")))
    val a = blocks.select(col("block"), col("block_val"),
      col(idCol).as("id_a"), col("simhash").as("sig_a"))
    val b = blocks.select(col("block"), col("block_val"),
      col(idCol).as("id_b"), col("simhash").as("sig_b"))
    a.join(b, Seq("block", "block_val")).where(col("id_a") < col("id_b"))
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .where(col("hamming") <= maxHamming)
      .select("id_a", "id_b", "hamming").distinct()
  }

  /** Embedding cosine near-duplicates over a bounded id range (brute-force
    * verify shape; the scale path buckets by hyperplane LSH first —
    * see graft.ann.Similarity). */
  def embeddingNearDup(emb: DataFrame, idCol: String, vecCol: String,
                       maxId: Long = 200L, threshold: Double = 0.93): DataFrame = {
    val v = emb.where(col(idCol) < maxId)
      .select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    val a = v.select(col("id").as("id_a"), col("v").as("v_a"))
    val b = v.select(col("id").as("id_b"), col("v").as("v_b"))
    val dot = aggregate(zip_with(col("v_a"), col("v_b"), (x, y) => x * y), lit(0.0), _ + _)
    val na = sqrt(aggregate(transform(col("v_a"), x => x * x), lit(0.0), _ + _))
    val nb = sqrt(aggregate(transform(col("v_b"), x => x * x), lit(0.0), _ + _))
    a.crossJoin(b).where(col("id_a") < col("id_b"))
      .withColumn("cosine", dot / (na * nb))
      .where(col("cosine") > threshold)
      .select("id_a", "id_b", "cosine")
  }

  /** First-wins dedup window (A1 at corpus level): one row per key, winner =
    * lowest (orderCols). */
  def firstWins(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }
}

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

  /** Word k-shingles as strings ("a b c"); fewer than k tokens -> empty.
    *
    * Built with arrays_zip over k shifted slices, NOT transform over an
    * index sequence: a lambda body re-evaluates every non-lambda
    * subexpression per element, which would make shingling O(tokens^2);
    * zip arguments are evaluated once. */
  def shingles(textCol: Column, k: Int): Column = {
    val toks = tokens(textCol)
    val n = size(toks)
    val zipped = arrays_zip((0 until k).map(j => slice(toks, lit(j + 1), n - (k - 1))): _*)
    val joined = transform(zipped,
      s => concat_ws(" ", (0 until k).map(j => s.getField(j.toString)): _*))
    array_distinct(when(n >= k, joined).otherwise(array().cast("array<string>")))
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
  /** Per-doc base shingle hashes, materialized behind a cache barrier:
    * CollapseProject would otherwise inline the whole shingling pipeline
    * into every one of the numHashes signature lambdas (numHashes x
    * recompute). At cluster scale the equivalent barrier is writing the
    * signature table out once (it is tiny relative to the corpus). */
  def shingleHashes(df: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    df.select(col(idCol), shingles(col(textCol), k).as("sh"))
      .where(size(col("sh")) > 0)
      .select(col(idCol), transform(col("sh"), s => xxhash64(s)).as("base"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  def minhashSignatures(df: DataFrame, idCol: String, textCol: String,
                        k: Int = 3, numHashes: Int = 32): DataFrame =
    // each shingle STRING is hashed once; the numHashes families mix the
    // 8-byte base hash (xxhash64 over a long) — O(8) per (shingle, family)
    shingleHashes(df, idCol, textCol, k)
      .select(col(idCol), transform(sequence(lit(0), lit(numHashes - 1)),
        seed => array_min(transform(col("base"), h => xxhash64(seed, h)))).as("sig"))

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
      // both sides of the self-join read this — persist so the signature
      // computation (the expensive part) runs once, not twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
    * pure column expressions. Token hashes are materialized behind a cache
    * barrier first; otherwise the 64 per-bit aggregates would each re-run
    * tokenization + string hashing (64x recompute via CollapseProject). */
  def simhash(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val hashed = df
      .select(col(idCol), transform(tokens(col(textCol)), t => xxhash64(t)).as("th"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sig = (0 until 64).map { bit =>
      // sum over tokens of +1/-1 for this bit, then take the sign bit
      val bitSum = aggregate(col("th"), lit(0L),
        (acc, h) => acc + when(shiftright(h, bit).bitwiseAND(lit(1L)) === 1L, 1L).otherwise(-1L))
      when(bitSum > 0, shiftleft(lit(1L), bit)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    hashed.select(col(idCol), sig.as("simhash"))
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

  /**
   * Near-duplicate clusters: connected components over candidate pairs,
   * labeled by the component's minimum id. Iterative min-label propagation
   * (large-star style): converges in O(log diameter) rounds; the driver
   * loop checks a change count per round, which at corpus scale would be a
   * fixed iteration budget + convergence metric instead. Deterministic.
   */
  def dedupClusters(pairs: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("id_a").as("u"), col("id_b").as("v"))
      .union(pairs.select(col("id_b").as("u"), col("id_a").as("v")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var labels = edges.groupBy("u").agg(min(col("v")).as("mn"))
      .select(col("u").as("id"), least(col("u"), col("mn")).as("label"))
    var changed = 1L
    var rounds = 0
    while (changed > 0 && rounds < 20) {
      val nbrMin = edges
        .join(labels.withColumnRenamed("id", "v").withColumnRenamed("label", "vlabel"), Seq("v"))
        .groupBy("u").agg(min(col("vlabel")).as("nbr_label"))
      val next = labels
        .join(nbrMin.withColumnRenamed("u", "id"), Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nbr_label"), col("label"))).as("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      changed = next.join(labels.withColumnRenamed("label", "old"), Seq("id"))
        .where(col("label") < col("old")).count()
      labels = next
      rounds += 1
    }
    labels.select(col("id").as("doc_id"), col("label").as("cluster_id"))
  }

  /** First-wins dedup window (A1 at corpus level): one row per key, winner =
    * lowest (orderCols). */
  def firstWins(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols.map(col): _*)
    df.withColumn("rn", row_number().over(w)).where(col("rn") === 1).drop("rn")
  }
}

package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over an embedding column (Array[Float]).
 *
 * Baseline: brute-force cosine top-k (exact; query side broadcast).
 * Scale path: sign-LSH (random hyperplanes derived deterministically from
 * xxhash64 — no Random, resumable) bucketing so only same-bucket pairs are
 * scored; at 10^12 rows the bucket join replaces the corpus cross-product.
 */
object Similarity {

  /** Cosine between two array<double> columns via codegen'd HOFs. */
  def cosine(a: Column, b: Column): Column = {
    val dot = aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), _ + _)
    val na = sqrt(aggregate(transform(a, x => x * x), lit(0.0), _ + _))
    val nb = sqrt(aggregate(transform(b, x => x * x), lit(0.0), _ + _))
    dot / (na * nb)
  }

  /**
   * Brute-force top-k: for each query vector (id in [0, nQueries)), the k
   * nearest corpus vectors by cosine (excluding self), deterministic
   * tie-break on neighbor id. Query side is tiny -> broadcast; corpus side
   * streams, final per-query top-k is a keyed window (skew-free: nQueries
   * keys x corpus candidates).
   */
  def bruteForceTopK(emb: DataFrame, idCol: String, vecCol: String,
                     nQueries: Int, k: Int): DataFrame = {
    val corpus = emb.select(col(idCol).as("nbr_id"), col(vecCol).cast("array<double>").as("nbr_v"))
    val queries = emb.where(col(idCol) < nQueries)
      .select(col(idCol).as("query_id"), col(vecCol).cast("array<double>").as("q_v"))
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("nbr_id"))
    corpus.crossJoin(broadcast(queries))
      .where(col("query_id") =!= col("nbr_id"))
      .withColumn("cosine", cosine(col("q_v"), col("nbr_v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= k)
      .select("query_id", "rank", "nbr_id", "cosine")
  }

  /** Deterministic pseudo-random hyperplane component for (plane p, dim d):
    * xxhash64 mapped to [-1, 1). */
  private def planeComponent(p: Int, d: Column): Column =
    (xxhash64(lit(p), d).cast("double") / lit(Long.MaxValue.toDouble))

  /** Sign-LSH bucket id from `nPlanes` hyperplanes (bit per plane). */
  def lshBucket(vecCol: Column, dim: Int, nPlanes: Int): Column =
    (0 until nPlanes).map { p =>
      val dot = aggregate(
        zip_with(vecCol, sequence(lit(0), lit(dim - 1)),
          (x, i) => x * planeComponent(p, i)),
        lit(0.0), _ + _)
      when(dot >= 0, shiftleft(lit(1L), p)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))

  /**
   * IVF (inverted-file) index: deterministic coarse quantizer — centroids
   * are evenly-strided corpus vectors refined by one Lloyd step (means of
   * assigned vectors, computed declaratively) — plus inverted lists keyed
   * by nearest centroid. A query probes only the `nProbe` nearest
   * centroids' lists, so at corpus scale the scored candidate set is
   * ~nProbe/k of the corpus instead of all of it. Fully deterministic:
   * no random init, ties broken by id.
   */
  def ivfAssignments(emb: DataFrame, idCol: String, vecCol: String,
                     k: Int, dim: Int): (DataFrame, DataFrame) = {
    val spark = emb.sparkSession
    val v = emb.select(col(idCol).cast("long").as("id"), col(vecCol).cast("array<double>").as("v"))
    val n = v.count()
    val stride = math.max(1L, n / k)
    // deterministic seed centroids: every stride-th vector by id order
    val seeds = v.where(pmod(col("id"), lit(stride)) === 0)
      .orderBy("id").limit(k)
      .select(col("id").as("centroid_id"), col("v").as("c"))
    def assignTo(cent: DataFrame): DataFrame = {
      val w = Window.partitionBy("id").orderBy(desc("cos"), asc("centroid_id"))
      v.crossJoin(broadcast(cent))
        .withColumn("cos", cosine(col("v"), col("c")))
        .withColumn("rn", row_number().over(w)).where(col("rn") === 1)
        .select(col("id"), col("v"), col("centroid_id"))
    }
    val first = assignTo(seeds)
    // one Lloyd refinement: per-centroid per-dimension mean
    val refined = first
      .select(col("centroid_id"), posexplode(col("v")).as(Seq("d", "x")))
      .groupBy("centroid_id", "d").agg(avg("x").as("m"))
      .groupBy("centroid_id")
      .agg(transform(array_sort(collect_list(struct(col("d"), col("m")))),
        s => s.getField("m")).as("c"))
    val assignments = assignTo(refined)
    (assignments, refined)
  }

  /** IVF search: per query, probe the nProbe nearest centroids' lists. */
  def ivfTopK(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
              nQueries: Int, topK: Int, k: Int = 16, nProbe: Int = 4): DataFrame = {
    val (assignments, centroids) = ivfAssignments(emb, idCol, vecCol, k, dim)
    val queries = emb.where(col(idCol) < nQueries)
      .select(col(idCol).cast("long").as("query_id"), col(vecCol).cast("array<double>").as("q_v"))
    val wc = Window.partitionBy("query_id").orderBy(desc("ccos"), asc("centroid_id"))
    val probes = queries.crossJoin(broadcast(centroids))
      .withColumn("ccos", cosine(col("q_v"), col("c")))
      .withColumn("crn", row_number().over(wc)).where(col("crn") <= nProbe)
      .select("query_id", "q_v", "centroid_id")
    val w = Window.partitionBy("query_id").orderBy(desc("cosine"), asc("id"))
    probes.join(assignments, Seq("centroid_id"))
      .where(col("query_id") =!= col("id"))
      .withColumn("cosine", cosine(col("q_v"), col("v")))
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= topK)
      .select(col("query_id"), col("rank"), col("id").as("nbr_id"), col("cosine"))
  }

  /** LSH-bucketed near-neighbor pairs: cosine computed only within buckets. */
  def lshNearPairs(emb: DataFrame, idCol: String, vecCol: String, dim: Int,
                   nPlanes: Int = 12, threshold: Double = 0.9): DataFrame = {
    val v = emb.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("bucket", lshBucket(col("v"), dim, nPlanes))
    val a = v.select(col("bucket"), col("id").as("id_a"), col("v").as("v_a"))
    val b = v.select(col("bucket"), col("id").as("id_b"), col("v").as("v_b"))
    a.join(b, Seq("bucket")).where(col("id_a") < col("id_b"))
      .withColumn("cosine", cosine(col("v_a"), col("v_b")))
      .where(col("cosine") > threshold)
      .select("id_a", "id_b", "cosine").distinct()
  }
}

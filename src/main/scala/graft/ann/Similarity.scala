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

package graft.skew

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Skew-proof per-key cardinality guards for the candidate-generation and
 * frequency-cap operators (MinHash/SimHash/sign-LSH buckets, contamination
 * df caps, duplicated-span gram counts).
 *
 * Why not `count().over(Window.partitionBy(key))`: a window count gets NO
 * partial aggregation and no AQE skew splitting — every row of a hot key
 * is serialized through ONE count task before the filter can drop it
 * (spill bounds memory, not wall-clock). A `groupBy(key).count` has a
 * map-side partial_count, so a key holding 30% of a 100 TB corpus
 * collapses to one row per map partition before its Exchange; the
 * resulting key-count table is then applied either as a broadcast
 * anti-join (bounded over-cap key sets — a degenerate key's rows are
 * dropped MAP-SIDE and never enter any keyed exchange) or as a semi-join
 * (unbounded kept sets — AQE can skew-split a sort-merge semi-join,
 * unlike a window).
 *
 * The trade: the guarded input is computed twice (once to count keys,
 * once to filter) — pure map-side work that parallelizes perfectly,
 * bought back many times over by never serializing a degenerate key
 * through a single task. Callers whose input is already materialized
 * (localCheckpoint) pay nothing.
 *
 * Keys must be NON-NULL (join, not window, semantics on nulls) — every
 * call site keys on md5/hash-derived or concat-derived columns, which
 * never are.
 */
object KeyCaps {

  /**
   * Drop every row whose key occurs more than `maxCount` times. The
   * over-cap key set is BOUNDED by construction — at most
   * |rows| / maxCount keys can exceed the cap — so it broadcasts, and the
   * anti-join filters map-side: a billion-row degenerate key never
   * crosses an exchange at all.
   */
  def dropOverCapKeys(df: DataFrame, keyCols: Seq[String], maxCount: Long): DataFrame = {
    val keys = keyCols.map(col)
    val hot = df.groupBy(keys: _*).agg(count(lit(1)).as("__keycap_n"))
      .where(col("__keycap_n") > maxCount)
      .select(keys: _*)
    df.join(broadcast(hot), keyCols, "left_anti")
  }

  /**
   * Keep only rows whose key occurs at least `minCount` times. Both the
   * kept and dropped key sets are unbounded here (e.g. duplicated vs
   * unique k-grams), so neither side broadcasts — a plain semi-join
   * against the combinable key counts, which AQE skew-splits if one kept
   * key dominates.
   */
  def keepKeysWithCountAtLeast(df: DataFrame, keyCols: Seq[String], minCount: Long): DataFrame = {
    val keys = keyCols.map(col)
    val ok = df.groupBy(keys: _*).agg(count(lit(1)).as("__keycap_n"))
      .where(col("__keycap_n") >= minCount)
      .select(keys: _*)
    df.join(ok, keyCols, "left_semi")
  }
}

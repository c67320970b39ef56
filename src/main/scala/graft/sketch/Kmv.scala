package graft.sketch

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/**
 * Mergeable KMV (k-minimum-values) distinct-count sketch (q79): the
 * bounded-state cardinality estimator (Bar-Yossef et al. 2002 /
 * Beyer et al. SIGMOD'07) — keep the k smallest distinct hash values
 * per group; if fewer than k distinct hashes exist the count is exact,
 * otherwise estimate (k-1) * H / kth_min where H is the hash range.
 *
 * Why this shape at 100 TB: exact count-distinct shuffles every
 * distinct value; the KMV buffer is O(k) per group, PARTIAL-AGGREGATES
 * map-side (each task reduces its rows into a k-bounded sorted array,
 * the exchange carries only per-group sketches) and merges
 * associatively — the classic mergeable-summary contract. Implemented
 * as a typed [[Aggregator]] (ObjectHashAggregate with partial merge),
 * the custom-aggregate tier of the extension ladder.
 *
 * DETERMINISTIC, unlike probabilistic HLL implementations: the hash is
 * a 40-bit md5 prefix, so the sketch, the kth value and the estimate
 * are bit-reproducible and ORACLE-CHECKABLE — the estimate divides
 * exact integers as IEEE doubles, identical across engines.
 */
object Kmv {

  /** Hash range: 40-bit md5 prefix, the same integer-gate convention as
    * the sampling operators. */
  val HashRange: Long = 1L << 40

  /** 40-bit hash column for KMV input (seed-free, engine-portable). */
  def hash40(id: Column): Column =
    conv(substring(md5(concat(lit("kmv:"), id.cast("string"))), 1, 10), 16, 10)
      .cast("long")

  /** Typed mergeable aggregator: k smallest DISTINCT values as a sorted
    * array. Buffer is a sorted Array[Long] of size <= k; reduce is a
    * binary-search insert; merge is a sorted-merge truncated at k. */
  final class KmvAgg(k: Int) extends Aggregator[Long, Array[Long], Array[Long]] {
    require(k > 0, s"k must be positive: $k")

    override def zero: Array[Long] = Array.emptyLongArray

    private def insert(buf: Array[Long], h: Long): Array[Long] = {
      val pos = java.util.Arrays.binarySearch(buf, h)
      if (pos >= 0) buf // already present
      else {
        val ins = -pos - 1
        if (buf.length < k) {
          val out = new Array[Long](buf.length + 1)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, buf.length - ins)
          out
        } else if (ins < k) { // displaces the current max
          val out = new Array[Long](k)
          System.arraycopy(buf, 0, out, 0, ins)
          out(ins) = h
          System.arraycopy(buf, ins, out, ins + 1, k - ins - 1)
          out
        } else buf
      }
    }

    override def reduce(buf: Array[Long], h: Long): Array[Long] = insert(buf, h)

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      // sorted two-pointer merge, distinct, truncated at k
      val out = new Array[Long](math.min(a.length + b.length, k))
      var i = 0; var j = 0; var n = 0
      while (n < k && (i < a.length || j < b.length)) {
        val v =
          if (j >= b.length || (i < a.length && a(i) <= b(j))) { val x = a(i); i += 1; x }
          else { val x = b(j); j += 1; x }
        if (n == 0 || out(n - 1) != v) { out(n) = v; n += 1 }
      }
      if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    }

    override def finish(buf: Array[Long]): Array[Long] = buf

    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Array[Long]] = bufferEncoder
  }

  /**
   * Per-group distinct-count sketch over `hash40(idCol)`. Output:
   * (group, n_sketch, kth_hash, est_distinct) — exact below k distinct,
   * (k-1) * HashRange / kth above (IEEE double division of exact
   * integers, engine-identical).
   */
  def distinctSketch(df: DataFrame, idCol: String, groupCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val agg = new KmvAgg(k).toColumn.name("sketch")
    df.select(col(groupCol).cast("string").as("grp"), hash40(col(idCol)).as("h"))
      .as[(String, Long)]
      .groupByKey(_._1)
      .mapValues(_._2)
      .agg(agg)
      .toDF("grp", "sketch")
      .select(col("grp").as(groupCol),
        size(col("sketch")).cast("long").as("n_sketch"),
        array_max(col("sketch")).as("kth_hash"),
        when(size(col("sketch")) < k, size(col("sketch")).cast("double"))
          .otherwise(lit((k - 1).toDouble * HashRange) / array_max(col("sketch")).cast("double"))
          .as("est_distinct"))
  }
}

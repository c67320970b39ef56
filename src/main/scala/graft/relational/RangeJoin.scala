package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Banded sliding-interval join: all right rows with
 * left.ts - window < right.ts <= left.ts for the same key.
 *
 * A naive formulation is a range-condition join — Spark plans it as a
 * (broadcast) nested loop, quadratic per key. The banded formulation maps
 * each timestamp to a band of the window size, replicates each RIGHT row
 * into its own band and the next (exactly 2 copies — a right row can only
 * serve left rows in those two bands), equi-joins on (key, band), and
 * applies the exact interval predicate to prune band slack. One ordinary
 * shuffle join, 2x replication, no row explosion; each qualifying pair
 * appears exactly once (the left row's band is unique).
 */
object RangeJoin {

  def intervalJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                   windowUs: Long, rightPayload: Seq[String],
                   prefix: String = "r_"): DataFrame = {
    val l = left.withColumn("__band", floor(unix_micros(col(tsCol)) / windowUs))
    val rBase = right.select(
      (col(keyCol) +: col(tsCol).as("__rts") +: rightPayload.map(c => col(c).as(prefix + c))): _*)
    val rBand = floor(unix_micros(col("__rts")) / windowUs)
    val r = rBase.withColumn("__band", explode(array(rBand, rBand + 1)))
    val diff = unix_micros(col(tsCol)) - unix_micros(col("__rts"))
    l.join(r, Seq(keyCol, "__band"))
      .where(diff.between(0, windowUs - 1))
      .drop("__band")
  }
}

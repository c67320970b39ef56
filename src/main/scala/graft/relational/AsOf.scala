package graft.relational

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * As-of join: for each left row, attach the LATEST right row with
 * right.ts <= left.ts and the same key — the time-series join Spark has no
 * native operator for (a range-condition join explodes to a
 * nested-loop/range join; "latest before" is not expressible as an
 * equi-join).
 *
 * Implementation is the scalable union-window formulation: tag both sides,
 * unionByName, ONE key-partitioned window ordered by (ts, side) with
 * last(_, ignoreNulls) carrying right payloads forward, filter back to
 * left rows. A single shuffle on the key and a linear scan per key — at
 * 10^12 rows this is one exchange, no row explosion, and skewed keys are
 * no worse than any keyed window (salt upstream if a single key dominates).
 *
 * Right rows sort BEFORE left rows at equal ts (side 0 < 1), giving
 * inclusive `<=` semantics — the same convention as DuckDB's ASOF JOIN
 * (which oracles this operator) and pandas merge_asof. Ties among right
 * rows with identical (key, ts) are resolved arbitrarily; deduplicate the
 * right side first if that can occur.
 */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               payloadCols: Seq[String], asofPrefix: String = "asof_"): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select(
      (Seq(col(keyCol), col(tsCol)) ++ payloadCols.map(c => col(c).as(s"__r_$c"))
        :+ lit(0).as("__side")): _*)
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = payloadCols.foldLeft(u) { (d, c) =>
      d.withColumn(asofPrefix + c, last(col(s"__r_$c"), ignoreNulls = true).over(w))
    }
    withAsof.where(col("__side") === 1)
      .drop("__side")
      .drop(payloadCols.map(c => s"__r_$c"): _*)
  }
}

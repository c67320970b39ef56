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
 *
 * Payloads are carried as ONE non-null struct per right row (never as
 * per-column last(_, ignoreNulls) calls): a null payload VALUE in the true
 * as-of row must be returned as null, not skipped in favor of an older
 * row's non-null value, and all payload columns must come from the SAME
 * right row. The struct wrapper is non-null whenever the right row exists,
 * so ignoreNulls only skips left rows.
 */
object AsOf {

  def asofJoin(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
               payloadCols: Seq[String], asofPrefix: String = "asof_"): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    val r = right.select(col(keyCol), col(tsCol),
      struct(payloadCols.map(col): _*).as("__r"), lit(0).as("__side"))
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = u.withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    payloadCols.foldLeft(withAsof) { (d, c) =>
        d.withColumn(asofPrefix + c, col("__asof").getField(c))
      }
      .where(col("__side") === 1)
      .drop("__side", "__r", "__asof")
  }

  /**
   * Skew-hardened variant: a single hot key no longer serializes into one
   * window partition. Rows are pre-bucketed by coarse time range
   * (`bucketWidthUs` microseconds of `tsCol`), the window runs per
   * (key, bucket) — parallel across a hot key's buckets — and each bucket
   * receives a carry-in row: the latest right row from ALL earlier buckets,
   * computed on the tiny per-(key, bucket) summary table, so the local
   * window still sees the correct "latest before the bucket" state.
   * Output is identical to [[asofJoin]] (asserted by SparkSpec).
   */
  def asofJoinSalted(left: DataFrame, right: DataFrame, keyCol: String, tsCol: String,
                     payloadCols: Seq[String], bucketWidthUs: Long,
                     asofPrefix: String = "asof_"): DataFrame = {
    val bucket = floor(unix_micros(col(tsCol)) / bucketWidthUs).cast("long")
    val l = left.withColumn("__side", lit(1)).withColumn("__bucket", bucket)
    val r = right.select(col(keyCol), col(tsCol),
      struct(payloadCols.map(col): _*).as("__r"), lit(0).as("__side"))
      .withColumn("__bucket", bucket)

    // latest right row per (key, bucket) — ties among identical (key, ts)
    // resolved arbitrarily, same contract as asofJoin
    val perBucketLast = r
      .groupBy(col(keyCol), col("__bucket"))
      .agg(max_by(struct(col(tsCol).as("ts"), col("__r").as("r")), col(tsCol)).as("lastr"))
    // carry-in for every bucket that contains a left row: the latest
    // right summary from buckets STRICTLY before (same-bucket right rows
    // are already in the local window). rangeBetween(-inf, -1) over the
    // numeric bucket gives exactly bucket' <= b-1.
    val leftBuckets = l.select(col(keyCol), col("__bucket")).distinct()
      .withColumn("__tag", lit(1))
    val carrySrc = perBucketLast.select(col(keyCol), col("__bucket"),
      col("lastr"), lit(0).as("__tag"))
      .unionByName(leftBuckets.withColumn("lastr",
        lit(null).cast(perBucketLast.schema("lastr").dataType)))
    val wCarry = Window.partitionBy(keyCol).orderBy(col("__bucket"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val carries = carrySrc
      .withColumn("__carry", last(col("lastr"), ignoreNulls = true).over(wCarry))
      .where(col("__tag") === 1 && col("__carry").isNotNull)
      .select(col(keyCol), col("__bucket"),
        col("__carry.ts").as(tsCol), col("__carry.r").as("__r"),
        lit(-1).as("__side")) // sorts before everything in the bucket

    // carry ts comes from an earlier bucket, so it is strictly below every
    // ts in this bucket — plain (ts, side) ordering already sorts it first
    val u = l.unionByName(r, allowMissingColumns = true)
      .unionByName(carries, allowMissingColumns = true)
    val w = Window.partitionBy(col(keyCol), col("__bucket"))
      .orderBy(col(tsCol), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val withAsof = u.withColumn("__asof", last(col("__r"), ignoreNulls = true).over(w))
    payloadCols.foldLeft(withAsof) { (d, c) =>
        d.withColumn(asofPrefix + c, col("__asof").getField(c))
      }
      .where(col("__side") === 1)
      .drop("__side", "__bucket", "__r", "__asof")
  }
}

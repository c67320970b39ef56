package graft.ann

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Embedding compression for large-scale vector corpora: symmetric int8
 * scalar quantization (per-vector max-abs scale, codes in [-127, 127]) —
 * the standard 4x shrink applied before shipping embeddings into an ANN
 * index or a training shard (cf. faiss `SQ8` / product-quantization
 * preprocessing).
 *
 * Pure map-side column expressions (codegen'd HOFs, zero shuffle, zero
 * UDFs): at 100 TB this runs as a projection inside the scan stage. The
 * max-abs fold is order-independent (greatest), the code math is single
 * division + explicit half-up rounding (`floor(x/scale + 0.5)`), so the
 * DuckDB oracle replicates every value bit-for-bit.
 */
object Quantize {

  /** Quantize `vecCol` (array<float>) to int8 codes + per-vector scale,
    * with audit columns: saturated-code count, exact code sum, and an md5
    * digest of the code array (scalar, engine-portable compare). */
  def int8(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val v = col(vecCol)
    val amax = aggregate(v, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double"))))
    val scaleCol = when(col("__amax") > 0.0, col("__amax") / 127.0).otherwise(1.0)
    val codes = transform(v, x =>
      floor(x.cast("double") / col("scale") + lit(0.5)).cast("int"))
    df.withColumn("__amax", amax)
      .withColumn("scale", scaleCol)
      .withColumn("codes", codes)
      .withColumn("n_sat", size(filter(col("codes"), c => abs(c) === 127)).cast("long"))
      .withColumn("code_sum", aggregate(col("codes"), lit(0L), (acc, c) => acc + c.cast("long")))
      .withColumn("code_md5",
        md5(concat_ws(",", transform(col("codes"), _.cast("string")))))
      .drop("__amax")
  }

  /** Dequantize back to array<double> (codes * scale) plus the max
    * absolute reconstruction error vs the original vector — the quality
    * audit a pipeline runs on a sample before committing to int8. */
  def dequantError(df: DataFrame, vecCol: String = "embedding"): DataFrame = {
    val q = int8(df, vecCol)
    q.withColumn("max_abs_err",
      aggregate(
        zip_with(col(vecCol), col("codes"),
          (x, c) => abs(x.cast("double") - c.cast("double") * col("scale"))),
        lit(0.0), (acc, e) => greatest(acc, e)))
  }
}

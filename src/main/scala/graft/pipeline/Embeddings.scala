package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-column transforms for vector corpora: int8 scalar
  * quantization (the storage/bandwidth workhorse of large-scale vector
  * search — 4× smaller than float32 with ~no recall loss at rerank).
  *
  * Everything is a pure narrow map over `array<float>` — no UDFs, no
  * shuffle; at 100 TB these are scan-side rewrites that fuse with the
  * reading stage. Determinism contract with the DuckDB oracle
  * ([[Oracles]]): the max-abs reduction is order-independent (max is
  * exact in any order, unlike a float sum), the scale is ONE IEEE
  * division of that max, and codes round half-away-from-zero — the
  * rounding both Spark's `round` (HALF_UP on BigDecimal) and DuckDB's
  * `round` implement. No float accumulations cross rows or elements
  * except exact-integer code sums.
  */
object Embeddings {

  /** Quantization range of a signed int8 symmetric quantizer. */
  val Int8Max = 127.0d

  /** Per-element |x| as double (float→double cast is exact). */
  private def absChain(e: Column): Column =
    aggregate(e, lit(0.0d), (acc, x) => greatest(acc, abs(x.cast("double"))))

  /** Symmetric per-vector int8 quantization: amax = max |xᵢ|,
    * scale = amax / 127, codeᵢ = round(xᵢ · 127 / amax) ∈ [−127, 127].
    * The all-zero vector (amax = 0) quantizes to all-zero codes with
    * scale 0 — no division ever sees a zero denominator. `code_l1`
    * (Σ|codeᵢ|, an exact integer) rides along as the reconstruction
    * checksum: it pins the whole code vector against the oracle without
    * comparing 64 columns. Dequantization is codeᵢ · scale. */
  def quantizeInt8(df: DataFrame, idCol: String = "vec_id",
      embCol: String = "embedding"): DataFrame = {
    val withAmax = df
      .select(col(s"`$idCol`"), col(s"`$embCol`").as("__e"))
      .withColumn("amax", absChain(col("__e")))
    withAmax
      .withColumn("scale", col("amax") / Int8Max)
      .withColumn("codes",
        when(col("amax") === 0.0d,
          transform(col("__e"), _ => lit(0)))
          .otherwise(transform(col("__e"), x =>
            round(x.cast("double") * Int8Max / col("amax"), 0).cast("int"))))
      .withColumn("code_l1",
        aggregate(col("codes"), lit(0L), (acc, c) => acc + abs(c).cast("long")))
      .select(col(s"`$idCol`"), col("amax"), col("scale"), col("codes"), col("code_l1"))
  }
}

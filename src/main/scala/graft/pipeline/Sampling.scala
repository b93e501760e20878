package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic stratified sampling: keep each row with a per-stratum
  * rate (e.g. downsample web text to 10%, keep all books), where
  * membership is a pure function of (id, salt) — the same stability
  * argument as [[Splits]]: `rand()`-based sampling re-draws membership
  * whenever partitioning changes, silently changing the corpus between
  * pipeline versions; hash-gated sampling is reproducible on any
  * cluster layout and composes with incremental ingest (previously
  * sampled rows never flip). A pure narrow map — no shuffle.
  *
  * Gate: the first four hex chars of sha-256(id|salt) — a 65,536-cell
  * grid compared LEXICALLY against a per-stratum boundary (lowercase hex
  * order == numeric order in every engine; boundaries quantize rates to
  * ~0.0015%). Strata not named in `rates` keep everything (rate 1.0).
  */
object Sampling {

  val DefaultSalt = "graft-sample"

  /** The lexical gate boundary for a rate: the 4-hex-char cell index
    * `floor(rate · 65536)`, shared verbatim with the oracle SQL. */
  def hexBound(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate out of [0,1]: $rate")
    f"${math.min((rate * 65536).toLong, 65535L)}%04x"
  }

  private[pipeline] def gateCol(idCol: String, salt: String): Column =
    substring(sha2(concat(col(s"`$idCol`").cast("string"), lit("|" + salt)), 256), 1, 4)

  /** Rows surviving the per-stratum gate, with the gate cell surfaced as
    * `gate` for auditability. A rate of exactly 1.0 keeps every row of
    * the stratum (no boundary comparison — 'ffff' would drop cell ffff). */
  def stratified(df: DataFrame, idCol: String, strataCol: String,
      rates: Map[String, Double], salt: String = DefaultSalt): DataFrame = {
    val gate = gateCol(idCol, salt)
    val keep = rates.toSeq.sortBy(_._1).foldRight(lit(true): Column) {
      case ((stratum, rate), els) =>
        when(col(s"`$strataCol`") === stratum,
          if (rate >= 1.0) lit(true) else gate < lit(hexBound(rate))).otherwise(els)
    }
    df.withColumn("gate", gate).filter(keep)
  }
}

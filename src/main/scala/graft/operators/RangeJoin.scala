package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Banded range join: pairs (l, r) with equal keys and
  * `r.ts − l.ts ∈ [lo, hi]` — the "events within a window after a
  * trigger" join (attribution windows, co-occurrence within a horizon,
  * sensor alignment).
  *
  * Scale formulation: Spark plans a raw inequality join as
  * key-equi-join + per-key-group filter, which degenerates to a per-key
  * cross product when keys are coarse (or a broadcast-nested-loop with
  * no keys at all). Bucketing restores an equi-join: with bin width
  * `W = hi − lo`, a left row's window [ts+lo, ts+hi] overlaps at most
  * TWO right bins (floor((ts+lo)/W) and floor((ts+hi)/W)), so the left
  * side explodes to ≤ 2 rows, both sides equi-join on (keys, bin) — a
  * plain shuffled hash join whose bucket fan-out is bounded by data
  * density, never |L|·|R| — and the exact `[lo, hi]` predicate filters
  * inside the join. Each true pair is emitted exactly once: the right
  * row's bin is a single value and the left row's candidate bins are
  * distinct, so no post-join dedup is needed.
  */
object RangeJoin {

  /** @param keys    equality keys joined alongside the time band
    * @param tsCol   integer-typed event-time column, same name both sides
    *                (the testdata events table surfaces ts as epoch nanos)
    * @param lo, hi  inclusive bounds on r.ts − l.ts (lo ≤ hi)
    * @param rightPayload right columns attached to each pair
    * @param outPrefix    prefix for the attached right columns
    */
  def band(left: DataFrame, right: DataFrame, keys: Seq[String], tsCol: String,
      lo: Long, hi: Long, rightPayload: Seq[String],
      outPrefix: String = "r_"): DataFrame = {
    require(lo <= hi, s"empty band: lo ($lo) > hi ($hi)")
    val w = math.max(hi - lo, 1L)
    def q(c: String): Column = col(s"`$c`")

    // Floor division on possibly-negative longs in exact integer arithmetic:
    // x − pmod(x, w) is the greatest multiple of w ≤ x, and `div` then
    // divides it exactly. A double-based floor(x/w) would misbin timestamps
    // beyond 2^53 (epoch nanos), silently dropping boundary pairs.
    def fdiv(e: String): String = s"((($e) - pmod(($e), ${w}L)) div ${w}L)"

    val lBins = left
      .withColumn("__bin_lo", expr(fdiv(s"`$tsCol` + ${lo}L")))
      .withColumn("__bin_hi", expr(fdiv(s"`$tsCol` + ${hi}L")))
      .withColumn("__bin", explode(sequence(col("__bin_lo"), col("__bin_hi"))))
      .drop("__bin_lo", "__bin_hi")
    val rBins = right
      .select((keys.map(q) :+ q(tsCol).as("__rts") :+
        expr(fdiv(s"`$tsCol`")).as("__bin")) ++
        rightPayload.map(c => q(c).as(s"$outPrefix$c")): _*)

    lBins.join(rBins, keys :+ "__bin")
      .filter(col("__rts") - q(tsCol) >= lo && col("__rts") - q(tsCol) <= hi)
      .drop("__bin", "__rts")
  }
}

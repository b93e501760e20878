package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Overlap join over keyed interval sets — the temporal-intersection
  * primitive (concurrent sessions, colliding maintenance windows,
  * double-booked resources). Distinct from [[RangeJoin]]: there a POINT
  * probes a fixed band around another point; here two VARIABLE-length
  * intervals must intersect, so neither side reduces to a point.
  *
  * Scale shape: each interval explodes to the ⌈span/binWidth⌉+1 bins it
  * covers; candidates come from an equi-join on (keys, bin) — never a
  * per-key product. A pair spanning several shared bins is emitted
  * exactly once: only from the bin containing the overlap's start
  * (`bin == fdiv(greatest(lo_a, lo_b))` — the standard dedup condition,
  * cheaper than a distinct over the pair stream). Bin arithmetic is
  * integer floor division (x − pmod(x, w)) div w, exact at any epoch
  * magnitude — a double floor would misbin past 2^53 (same hazard
  * documented at RangeJoin.fdiv).
  *
  * Pick `binWidth` ≈ the typical interval span: wide enough that an
  * interval covers O(1) bins, narrow enough that a bin holds O(1)
  * intervals per key. A degenerate (key, bin) bucket would still emit
  * O(n²) candidate pairs — `maxPerBin` is the guard: buckets holding
  * more intervals than the cap are dropped WHOLE before the join (the
  * same drop-the-block contract as `Fuzzy.blockedPairs` — candidates
  * from a capped bucket are sacrificed, never silently truncated
  * mid-bucket, so the result stays a deterministic function of the
  * input). The size check costs one extra keyed aggregation and is only
  * planned when a cap is actually set.
  */
object IntervalJoin {

  /** Overlapping pairs within one keyed interval set. Input: one row per
    * interval (`idCol`, inclusive `[loCol, hiCol]` longs, plus `keys`).
    * Output: `keys ++ (id_a, id_b, overlap)` with `id_a < id_b`,
    * `overlap = least(hi) − greatest(lo)` (0 = touching endpoints).
    * `maxPerBin` caps the per-(key, bin) interval count (see object
    * doc); the default never drops. */
  def selfOverlaps(df: DataFrame, keys: Seq[String], idCol: String,
      loCol: String, hiCol: String, binWidth: Long,
      maxPerBin: Long = Long.MaxValue): DataFrame = {
    require(binWidth > 0, s"non-positive binWidth: $binWidth")
    require(maxPerBin > 0, s"non-positive maxPerBin: $maxPerBin")
    def q(c: String): Column = col(s"`$c`")
    def fdiv(e: String): Column = expr(s"((($e) - pmod(($e), ${binWidth}L)) div ${binWidth}L)")

    val exploded = df.select((keys.map(q) :+ q(idCol).as("__id") :+
      q(loCol).cast("long").as("__lo") :+ q(hiCol).cast("long").as("__hi")): _*)
      .withColumn("__bin", explode(sequence(fdiv("__lo"), fdiv("__hi"))))
    val iv =
      if (maxPerBin == Long.MaxValue) exploded
      else {
        val keep = exploded.groupBy((keys.map(q) :+ col("__bin")): _*)
          .agg(count(lit(1)).as("__n")).where(col("__n") <= maxPerBin)
          .drop("__n")
        exploded.join(keep, keys :+ "__bin")
      }
    val a = iv.select((keys.map(q) :+ col("__bin") :+ col("__id").as("id_a") :+
      col("__lo").as("__lo_a") :+ col("__hi").as("__hi_a")): _*)
    val b = iv.select((keys.map(c => q(c).as(s"__k_$c")) :+ col("__bin").as("__bin_b") :+
      col("__id").as("id_b") :+ col("__lo").as("__lo_b") :+ col("__hi").as("__hi_b")): _*)

    val joinCond = keys.map(c => q(c) === col(s"`__k_$c`"))
      .foldLeft(col("__bin") === col("__bin_b"))(_ && _) &&
      col("id_a") < col("id_b") &&
      col("__lo_a") <= col("__hi_b") && col("__lo_b") <= col("__hi_a")
    a.join(b, joinCond)
      // emit once: only from the bin where the overlap starts
      .where(col("__bin") === fdiv("greatest(__lo_a, __lo_b)"))
      .select((keys.map(q) :+ col("id_a") :+ col("id_b") :+
        (least(col("__hi_a"), col("__hi_b")) -
          greatest(col("__lo_a"), col("__lo_b"))).as("overlap")): _*)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Regular time-grid densification with last-observation-carried-forward
  * — the time-series resampling primitive (sensor/metric streams into
  * fixed ticks, feature snapshots for sequence models, SLA dashboards
  * that must show the silent days).
  *
  * Input: at most one row per (key, tick) — pre-aggregate first. Output:
  * exactly one row per key per integer tick in the key's observed
  * [min, max] span, with each value column carried forward across the
  * introduced gap rows and an `is_gap` flag marking synthesized rows.
  *
  * Scale shape: the span aggregate is one map-side-combinable shuffle
  * producing ONE row per key; the grid is a narrow per-row `sequence`
  * explode of that row (rows emitted = span length — bounded by
  * span/tick-width per key, never by the observation count); the
  * observations re-join on (key, tick) and the LOCF window partitions by
  * key. No step is all-pairs and no state exceeds one key's span on one
  * executor. Callers pick the tick width by pre-dividing the clock —
  * integer division, so a 100 TB event table densified to days moves one
  * row per (key, day), not per event.
  */
object GapFill {

  /** Fill `df` (one row per (`keyCol`, `tickCol`), integer ticks) to the
    * full per-key tick range, carrying `valueCols` forward.
    *
    * `maxSpan` guards the grid explode: a key whose observed span
    * exceeds it (one sensor with a 1970 timestamp glitch next to
    * today's data would synthesize half a century of ticks) is dropped
    * WHOLE from the output rather than detonating the stage — the
    * filter runs on the one-row-per-key span aggregate, so the guard is
    * free. Pick a coarser tick for legitimately long spans. */
  def locf(df: DataFrame, keyCol: String, tickCol: String,
      valueCols: Seq[String], maxSpan: Long = Long.MaxValue): DataFrame = {
    require(valueCols.nonEmpty, "no value columns to carry")
    def q(c: String): Column = col(s"`$c`")
    val joined = dense(df, keyCol, tickCol, maxSpan)
    val w = Window.partitionBy(q(keyCol)).orderBy(q(tickCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isGap = col("__obs").isNull.as("is_gap")
    val carried = valueCols.map(c => last(q(c), ignoreNulls = true).over(w).as(c))
    joined.select(q(keyCol) +: q(tickCol) +: carried :+ isGap: _*)
  }

  /** Fill like [[locf]] but LINEARLY INTERPOLATE `valueCol` across each
    * gap instead of carrying the last value: a synthesized tick between
    * observations (pt, pv) and (nt, nv) gets
    * `pv + (nv - pv) * (t - pt) / (nt - pt)` — the resampling mode for
    * continuous signals (sensor readings, prices) where a step function
    * misstates the trajectory. Null-VALUED observations anchor nothing:
    * interpolation bridges straight across them (their row still emits,
    * interpolated, with `is_gap = false`). Ticks with no non-null
    * anchor on one side (possible only via null-valued edge
    * observations) stay null.
    *
    * Same scale shape as [[locf]] plus one descending window pass over
    * the same key partitioning (one exchange, two sorts — the nearest
    * as-of formulation): the (tick, value) anchors travel as structs,
    * so each gap row's arithmetic sees exactly one prior and one later
    * anchor, never a join. The division is the only IEEE step, applied
    * once per output row in a fixed expression order, so results are
    * engine-reproducible. */
  def interpolate(df: DataFrame, keyCol: String, tickCol: String,
      valueCol: String, maxSpan: Long = Long.MaxValue): DataFrame = {
    def q(c: String): Column = col(s"`$c`")
    val joined = dense(df, keyCol, tickCol, maxSpan)
    val wAsc = Window.partitionBy(q(keyCol)).orderBy(q(tickCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDesc = Window.partitionBy(q(keyCol)).orderBy(q(tickCol).desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val anchor = when(q(valueCol).isNotNull,
      struct(q(tickCol).as("t"), q(valueCol).as("v")))
    val withAnchors = joined
      .withColumn("__p", last(anchor, ignoreNulls = true).over(wAsc))
      .withColumn("__n", last(anchor, ignoreNulls = true).over(wDesc))
    val pt = col("__p").getField("t"); val pv = col("__p").getField("v")
    val nt = col("__n").getField("t"); val nv = col("__n").getField("v")
    val interp = when(col("__p").isNull || col("__n").isNull, lit(null))
      .when(nt === pt, pv) // an observed anchor row: exact, no 0/0
      .otherwise(pv + (nv - pv) * (q(tickCol) - pt).cast("double") /
        (nt - pt).cast("double"))
    withAnchors.select(q(keyCol), q(tickCol), interp.as(valueCol),
      col("__obs").isNull.as("is_gap"))
  }

  /** One row per key per tick in the key's observed span: the span
    * aggregate, the `maxSpan` guard, the grid explode, and the re-join
    * against the observations (`__obs` marks real rows — an
    * observed-but-NULL value is still "observed"; is_gap means the ROW
    * was synthesized). */
  private def dense(df: DataFrame, keyCol: String, tickCol: String,
      maxSpan: Long): DataFrame = {
    require(maxSpan > 0, s"non-positive maxSpan: $maxSpan")
    def q(c: String): Column = col(s"`$c`")
    // try_subtract: a key mixing extreme negative and positive ticks
    // would wrap __hi - __lo negative and sneak past the guard; the
    // try_ variant yields null on overflow, and null <= maxSpan is
    // null, so the pathological key is dropped like any oversized one.
    // Boundary: span == maxSpan is KEPT — only spans EXCEEDING the cap
    // are dropped (matching the locf scaladoc).
    val span = df.groupBy(q(keyCol))
      .agg(min(q(tickCol)).as("__lo"), max(q(tickCol)).as("__hi"))
      .where(call_function("try_subtract", col("__hi"), col("__lo")) <= maxSpan)
    val grid = span.select(q(keyCol),
      explode(sequence(col("__lo"), col("__hi"))).as(tickCol))
    grid.join(df.withColumn("__obs", lit(true)), Seq(keyCol, tickCol), "left")
  }
}

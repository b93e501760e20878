package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch sessionization: group each key's events into sessions separated
  * by idle gaps longer than `gapTicks` — the batch counterpart of
  * [[graft.streaming.Streams.sessionize]] (same gap semantics, computed
  * over data at rest instead of a stream).
  *
  * Formulation: the classic two-window gaps-and-islands — a boundary
  * flag where the gap to the previous event exceeds the threshold, a
  * running sum of boundaries as the session index, then one aggregation
  * per (key, session). Cost is ONE shuffle on the key; both windows and
  * the aggregation share it (same partitioning, no second exchange).
  * Session ids are per-key dense indexes (0, 1, 2…) — deterministic and
  * join-stable across engines, unlike global ids. */
object Sessionize {

  /** @param tsCol integer event-time column (testdata: epoch nanos)
    * @param gapTicks sessions split when ts − prev_ts > gapTicks
    * @param valueCol numeric column summed per session */
  def byGap(events: DataFrame, keyCol: String, tsCol: String, gapTicks: Long,
      valueCol: String): DataFrame = {
    require(gapTicks > 0, s"gap must be positive, got $gapTicks")
    def q(c: String): Column = col(s"`$c`")
    val byTs = Window.partitionBy(q(keyCol)).orderBy(q(tsCol).asc)
    val boundary = when(
      q(tsCol) - lag(q(tsCol), 1).over(byTs) > gapTicks, 1L).otherwise(0L)
    events
      .withColumn("__sess",
        sum(boundary).over(byTs.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(q(keyCol), col("__sess").as("session_idx"))
      .agg(
        count(lit(1)).as("n_events"),
        (max(q(tsCol)) - min(q(tsCol))).as("duration"),
        // exact decimal accumulation: a double sum is partial-order
        // dependent and could not hash-match a sequential oracle
        sum(q(valueCol).cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("total_value"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Windowed ordered funnel (the ClickHouse `windowFunnel` / product-
  * analytics conversion primitive): per key, the deepest prefix of an
  * ordered step sequence (view → click → purchase, …) completed inside
  * `windowSize` ticks of the chain's FIRST step. The chain rule is
  * EARLIEST CONTINUATION: from each step-1 event, the next step is the
  * earliest same-key event of the next type at ts ≥ the current chain
  * time (inclusive, matching [[AsofJoin.forward]]); a continuation
  * landing beyond first-step-ts + window kills the chain. Every step-1
  * event starts its own chain; the key's depth is the max over chains.
  * Deterministic: a pure function of (key, ts, type) — the greedy chain
  * uses only timestamps, so engines agree without tie policy.
  *
  * Scale shape: NO inequality join anywhere (the naive formulation is a
  * per-key event cross product). Each step is one [[AsofJoin.forward]]
  * pass — a tagged union + ONE window over the key partitioning — so an
  * S-step funnel costs S−1 key exchanges over frames that only shrink
  * (dead chains exit the join before each round). State per key is its
  * own events, the natural partition.
  */
object Funnel {

  /** Per-key funnel depth: one row (key, depth ∈ [1, steps.size]) for
    * every key with at least one step-1 event. `steps` are the ordered
    * `typeCol` values; `windowSize` is in `tsCol` units. */
  def windowFunnel(events: DataFrame, keyCol: String, tsCol: String,
      typeCol: String, steps: Seq[String], windowSize: Long): DataFrame = {
    require(steps.size >= 2, s"a funnel needs at least 2 steps, got ${steps.size}")
    require(windowSize > 0, s"windowSize must be positive, got $windowSize")
    def q(c: String) = col(s"`$c`")
    val byType = steps.map(s =>
      events.filter(q(typeCol) === s).select(q(keyCol), q(tsCol)))

    // chain frame: (key, __t0 = first-step ts, tsCol = current chain
    // time [null = chain dead], __depth)
    var cur = byType.head.select(q(keyCol), q(tsCol).as("__t0"),
      q(tsCol), lit(1).as("__depth"))
    for (i <- 1 until steps.size) {
      val alive = cur.filter(q(tsCol).isNotNull)
      val dead = cur.filter(q(tsCol).isNull)
      // payload = the right ts itself; the tiebreak is immaterial (the
      // chain consumes only the ts, and ties share it) so ts serves
      val joined = AsofJoin.forward(alive, byType(i), Seq(keyCol), tsCol,
        rightPayload = Seq(tsCol), rightTieBreak = tsCol, outPrefix = "__next_")
      val nextT = when(col(s"__next_$tsCol") <= col("__t0") + windowSize,
        col(s"__next_$tsCol"))
      cur = joined
        .withColumn("__depth", col("__depth") + when(nextT.isNotNull, 1).otherwise(0))
        .select(q(keyCol), col("__t0"), nextT.as(tsCol), col("__depth"))
        .unionByName(dead)
    }
    cur.groupBy(q(keyCol)).agg(max(col("__depth")).as("depth"))
  }
}

package graft.operators

import graft.SparkTestBase

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(lo: Long, hi: Long,
      left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)]): Set[(Long, Long)] = {
    // (id, user_id, ts) both sides
    val l = left.toDF("lid", "user_id", "ts")
    val r = right.toDF("user_id", "ts", "rid")
    RangeJoin.band(l, r, Seq("user_id"), "ts", lo, hi, Seq("rid"))
      .select("lid", "r_rid").collect().map(x => (x.getLong(0), x.getLong(1))).toSet
  }

  test("band keeps exactly the pairs with r.ts − l.ts in [lo, hi]") {
    val got = pairs(1, 100,
      left = Seq((1L, 7L, 1000L)),
      right = Seq(
        (7L, 1000L, 10L),  // delta 0: below lo
        (7L, 1001L, 11L),  // delta 1: lo edge, kept
        (7L, 1100L, 12L),  // delta 100: hi edge, kept
        (7L, 1101L, 13L),  // delta 101: past hi
        (8L, 1050L, 14L))) // wrong user
    assert(got === Set((1L, 11L), (1L, 12L)))
  }

  test("each matching pair is emitted exactly once despite the two-bin explode") {
    // window wider than one bin width: right rows land in both candidate bins
    val left = Seq((1L, 7L, 0L))
    val right = (1L to 50L).map(i => (7L, i * 3, 100L + i))
    val got = pairs(1, 150, left, right)
    assert(got.size === 50)
    assert(got === right.map(r => (1L, r._3)).toSet)
  }

  test("negative lo looks backward in time") {
    val got = pairs(-100, -1,
      left = Seq((1L, 7L, 1000L)),
      right = Seq((7L, 900L, 10L), (7L, 999L, 11L), (7L, 1000L, 12L), (7L, 899L, 13L)))
    assert(got === Set((1L, 10L), (1L, 11L)))
  }

  test("bins stay exact past 2^53 (epoch-nano timestamps)") {
    // A double mantissa has 52 bits: near 1.7e18 its ulp is 256, so the old
    // floor(x/w)-via-double binning could shift a boundary row into a bin
    // the left side never exploded to, silently dropping a true pair.
    // Sweep odd bases (never representable as doubles at this magnitude)
    // with deltas at both band edges and just outside them.
    val base = 1_723_500_000_000_000_001L // odd, ≈ 2^60.6
    val offsets = Seq(0L, 255L, 256L, 257L, 4095L, 4097L)
    val left = offsets.zipWithIndex.map { case (o, i) => (i.toLong, 100L + i, base + o) }
    val right = left.flatMap { case (lid, uid, ts) =>
      Seq((uid, ts + 1, lid * 10 + 1),   // lo edge: kept
          (uid, ts + 100, lid * 10 + 2), // hi edge: kept
          (uid, ts, lid * 10 + 3),       // delta 0: dropped
          (uid, ts + 101, lid * 10 + 4)) // past hi: dropped
    }
    val got = pairs(1, 100, left, right)
    val want = left.flatMap { case (lid, _, _) =>
      Seq((lid, lid * 10 + 1), (lid, lid * 10 + 2)) }.toSet
    assert(got === want)
  }

  test("plan is an equi-join on (keys, bin), not a nested-loop product") {
    val l = Seq((1L, 7L, 1000L)).toDF("lid", "user_id", "ts")
    val r = Seq((7L, 1001L, 10L)).toDF("user_id", "ts", "rid")
    val df = RangeJoin.band(l, r, Seq("user_id"), "ts", 1, 100, Seq("rid"))
    val physical = df.queryExecution.executedPlan.toString
    assert(!physical.contains("BroadcastNestedLoopJoin") && !physical.contains("CartesianProduct"),
      s"range join degenerated to a product:\n$physical")
  }
}

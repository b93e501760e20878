package graft.operators

import graft.SparkTestBase

class GapFillSpec extends SparkTestBase {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Option[Double], Boolean)] =
    df.collect().map(r => (r.getLong(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3))).toSeq.sorted

  test("holes are synthesized, flagged, and carry the last observation") {
    val obs = Seq((1L, 1L, 10.0), (1L, 4L, 40.0)).toDF("k", "t", "v")
    assert(rows(GapFill.locf(obs, "k", "t", Seq("v"))) === Seq(
      (1L, 1L, Some(10.0), false),
      (1L, 2L, Some(10.0), true),
      (1L, 3L, Some(10.0), true),
      (1L, 4L, Some(40.0), false)))
  }

  test("keys keep independent spans; a single-tick key emits one row") {
    val obs = Seq((1L, 5L, 1.0), (1L, 7L, 2.0), (2L, 100L, 9.0)).toDF("k", "t", "v")
    assert(rows(GapFill.locf(obs, "k", "t", Seq("v"))) === Seq(
      (1L, 5L, Some(1.0), false),
      (1L, 6L, Some(1.0), true),
      (1L, 7L, Some(2.0), false),
      (2L, 100L, Some(9.0), false)))
  }

  test("an observed NULL is not a gap; the carry skips it") {
    val obs = Seq((1L, 1L, Some(5.0)), (1L, 2L, None), (1L, 3L, Some(7.0)))
      .toDF("k", "t", "v")
    assert(rows(GapFill.locf(obs, "k", "t", Seq("v"))) === Seq(
      (1L, 1L, Some(5.0), false),
      (1L, 2L, Some(5.0), false), // observed row: not a gap, value carried
      (1L, 3L, Some(7.0), false)))
  }

  test("multiple value columns carry independently") {
    val obs = Seq((1L, 1L, Some(1.0), None: Option[Double]),
      (1L, 3L, None: Option[Double], Some(9.0))).toDF("k", "t", "v1", "v2")
    val out = GapFill.locf(obs, "k", "t", Seq("v1", "v2")).collect()
      .map(r => (r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)),
        if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toSeq.sortBy(_._1)
    assert(out === Seq(
      (1L, Some(1.0), None),        // v2 has nothing to carry yet
      (2L, Some(1.0), None),
      (3L, Some(1.0), Some(9.0)))) // v1 carried across the observed row
  }

  test("plan: no cartesian — grid join and carry stay keyed") {
    val obs = Seq((1L, 1L, 1.0)).toDF("k", "t", "v")
    val plan = GapFill.locf(obs, "k", "t", Seq("v")).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("maxSpan: a glitch key spanning an epoch is dropped whole, others fill normally") {
    // key 1: sane 3-tick span; key 2: one 1970-glitch observation makes
    // the span ~10^9 ticks -- uncapped this would explode a billion rows
    val obs = Seq((1L, 1L, 1.0), (1L, 3L, 3.0),
      (2L, 0L, 9.0), (2L, 1000000000L, 9.9)).toDF("k", "t", "v")
    val out = GapFill.locf(obs, "k", "t", Seq("v"), maxSpan = 1000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(out.map(_._1).toSet === Set(1L))        // glitch key excluded whole
    assert(out.map(_._2).sorted === Seq(1L, 2L, 3L)) // sane key fully densified
  }

  test("maxSpan boundary: span == maxSpan is kept, span == maxSpan + 1 dropped") {
    val obs = Seq((1L, 0L, 1.0), (1L, 10L, 2.0),   // span exactly 10
      (2L, 0L, 3.0), (2L, 11L, 4.0)).toDF("k", "t", "v") // span 11
    val out = GapFill.locf(obs, "k", "t", Seq("v"), maxSpan = 10L)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(1L))
  }

  test("maxSpan: Long-overflow span (min near Long.Min, max near Long.Max) is dropped, not wrapped past the guard") {
    val obs = Seq((1L, Long.MinValue + 5, 1.0), (1L, Long.MaxValue - 5, 2.0),
      (2L, 1L, 3.0), (2L, 3L, 4.0)).toDF("k", "t", "v")
    val out = GapFill.locf(obs, "k", "t", Seq("v"), maxSpan = 1000L)
      .collect().map(_.getLong(0)).toSet
    assert(out === Set(2L)) // the wrapping key must NOT explode the grid
  }

  test("interpolate: gap rows land on the straight line, observed rows stay exact") {
    // observations (0, 10.0) and (4, 30.0): ticks 1..3 -> 15, 20, 25
    val obs = Seq((1L, 0L, 10.0), (1L, 4L, 30.0)).toDF("k", "t", "v")
    val out = GapFill.interpolate(obs, "k", "t", "v")
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out === Map(
      0L -> (10.0, false), 1L -> (15.0, true), 2L -> (20.0, true),
      3L -> (25.0, true), 4L -> (30.0, false)))
  }

  test("interpolate bridges straight across a null-valued observation") {
    // the tick-2 row is OBSERVED but null-valued: it must emit with the
    // interpolated value (20.0) and is_gap = false
    val obs = Seq((1L, 0L, Some(10.0)), (1L, 2L, None), (1L, 4L, Some(30.0)))
      .toDF("k", "t", "v")
    val out = GapFill.interpolate(obs, "k", "t", "v")
      .collect().map(r => r.getLong(1) -> (r.getDouble(2), r.getBoolean(3))).toMap
    assert(out(2L) === ((20.0, false)))
    assert(out(1L) === ((15.0, true)) && out(3L) === ((25.0, true)))
  }

  test("interpolate honors the shared maxSpan guard: the glitch key drops whole") {
    val obs = Seq((1L, 0L, 10.0), (1L, 2L, 30.0),
      (2L, 0L, 9.0), (2L, 1000000000L, 9.9)).toDF("k", "t", "v")
    val out = GapFill.interpolate(obs, "k", "t", "v", maxSpan = 100L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.map(_._1).toSet === Set(1L))
    assert(out.sortBy(_._2).map(_._3).toSeq === Seq(10.0, 20.0, 30.0))
  }

  test("interpolate: a null-valued EDGE observation leaves its side null") {
    val obs = Seq((1L, 0L, None), (1L, 2L, Some(8.0)), (1L, 3L, Some(9.0)))
      .toDF("k", "t", "v")
    val rows = GapFill.interpolate(obs, "k", "t", "v").collect()
      .map(r => r.getLong(1) -> (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(rows(0L) === None && rows(1L) === None)
    assert(rows(2L) === Some(8.0) && rows(3L) === Some(9.0))
  }
}

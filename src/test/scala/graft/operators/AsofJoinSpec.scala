package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def run(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long, Double)]) = {
    // left: (event_id, user_id, ts); right: (user_id, ts, event_id, value)
    val l = left.toDF("event_id", "user_id", "ts")
    val r = right.toDF("user_id", "ts", "event_id", "value")
    AsofJoin.backward(l, r, Seq("user_id"), "ts", Seq("event_id", "value"), "event_id")
      .select("event_id", "asof_event_id", "asof_value")
      .collect().map(row => (row.getLong(0),
        if (row.isNullAt(1)) None else Some(row.getLong(1)),
        if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toSet
  }

  test("backward as-of picks the latest right row at-or-before each left ts") {
    val got = run(
      left = Seq((1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 50L)),
      right = Seq((7L, 60L, 10L, 1.5), (7L, 150L, 11L, 2.5)))
    assert(got === Set(
      (1L, Some(10L), Some(1.5)), // ts=100 sees the ts=60 purchase
      (2L, Some(11L), Some(2.5)), // ts=200 sees the ts=150 purchase
      (3L, None, None)))          // ts=50 precedes every purchase
  }

  test("a right row at exactly the left ts is visible (inclusive)") {
    val got = run(left = Seq((1L, 7L, 100L)), right = Seq((7L, 100L, 10L, 9.0)))
    assert(got === Set((1L, Some(10L), Some(9.0))))
  }

  test("ties on right ts break by the greatest tiebreak column") {
    val got = run(
      left = Seq((1L, 7L, 100L)),
      right = Seq((7L, 90L, 10L, 1.0), (7L, 90L, 12L, 2.0), (7L, 90L, 11L, 3.0)))
    assert(got === Set((1L, Some(12L), Some(2.0))))
  }

  test("a null field in the matched right row stays null — no backfill from older rows") {
    // right rows: (ts=5, value=9.0) then (ts=10, value=NULL); a left row
    // at ts=20 matches the ts=10 row and must surface ITS null value,
    // not the older row's 9.0
    val l = Seq((1L, 7L, 20L)).toDF("event_id", "user_id", "ts")
    val r = Seq(
      (7L, 5L, 10L, java.lang.Double.valueOf(9.0)),
      (7L, 10L, 11L, null.asInstanceOf[java.lang.Double]))
      .toDF("user_id", "ts", "event_id", "value")
    val row = AsofJoin.backward(l, r, Seq("user_id"), "ts", Seq("event_id", "value"), "event_id")
      .select("asof_event_id", "asof_value").collect().head
    assert(row.getLong(0) === 11L)
    assert(row.isNullAt(1), s"null payload backfilled from an older right row: $row")
  }

  test("keys partition the timeline: no cross-user leakage") {
    val got = run(
      left = Seq((1L, 7L, 100L), (2L, 8L, 100L)),
      right = Seq((7L, 50L, 10L, 1.0)))
    assert(got === Set((1L, Some(10L), Some(1.0)), (2L, None, None)))
  }

  private def runFwd(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long, Double)]) = {
    val l = left.toDF("event_id", "user_id", "ts")
    val r = right.toDF("user_id", "ts", "event_id", "value")
    AsofJoin.forward(l, r, Seq("user_id"), "ts", Seq("event_id", "value"), "event_id")
      .select("event_id", "asof_event_id", "asof_value")
      .collect().map(row => (row.getLong(0),
        if (row.isNullAt(1)) None else Some(row.getLong(1)),
        if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toSet
  }

  test("forward as-of picks the earliest right row at-or-after each left ts") {
    val got = runFwd(
      left = Seq((1L, 7L, 100L), (2L, 7L, 200L), (3L, 7L, 300L)),
      right = Seq((7L, 150L, 10L, 1.5), (7L, 250L, 11L, 2.5)))
    assert(got === Set(
      (1L, Some(10L), Some(1.5)), // ts=100 → next purchase at 150
      (2L, Some(11L), Some(2.5)), // ts=200 → next purchase at 250
      (3L, None, None)))          // ts=300 follows every purchase
  }

  test("forward: a right row at exactly the left ts is visible (inclusive)") {
    val got = runFwd(left = Seq((1L, 7L, 100L)), right = Seq((7L, 100L, 10L, 9.0)))
    assert(got === Set((1L, Some(10L), Some(9.0))))
  }

  test("forward: ties on right ts break by the SMALLEST tiebreak column") {
    val got = runFwd(
      left = Seq((1L, 7L, 100L)),
      right = Seq((7L, 110L, 12L, 2.0), (7L, 110L, 10L, 1.0), (7L, 110L, 11L, 3.0)))
    assert(got === Set((1L, Some(10L), Some(1.0))))
  }

  test("forward: keys partition the timeline") {
    val got = runFwd(
      left = Seq((1L, 7L, 100L), (2L, 8L, 100L)),
      right = Seq((7L, 150L, 10L, 1.0)))
    assert(got === Set((1L, Some(10L), Some(1.0)), (2L, None, None)))
  }

  test("forward plan has no join node — one window over the union") {
    val l = Seq((1L, 7L, 100L)).toDF("event_id", "user_id", "ts")
    val r = Seq((7L, 150L, 10L, 1.0)).toDF("user_id", "ts", "event_id", "value")
    val plan = AsofJoin.forward(l, r, Seq("user_id"), "ts", Seq("event_id", "value"), "event_id")
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, s"expected a join-free plan, got:\n$plan")
  }

  test("plan has no join node — one window over the union") {
    val l = Seq((1L, 7L, 100L)).toDF("event_id", "user_id", "ts")
    val r = Seq((7L, 50L, 10L, 1.0)).toDF("user_id", "ts", "event_id", "value")
    val plan = AsofJoin.backward(l, r, Seq("user_id"), "ts", Seq("event_id", "value"), "event_id")
      .queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, s"expected a join-free plan, got:\n$plan")
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty)
  }

  private def runNearest(left: Seq[(Long, Long, Long)],
      right: Seq[(Long, Long, Long, Double)]) = {
    val l = left.toDF("event_id", "user_id", "ts")
    val r = right.toDF("user_id", "ts", "event_id", "value")
    AsofJoin.nearest(l, r, Seq("user_id"), "ts", Seq("event_id", "value"), "event_id")
      .select("event_id", "asof_event_id")
      .collect().map(row => (row.getLong(0),
        if (row.isNullAt(1)) None else Some(row.getLong(1)))).toSet
  }

  test("nearest picks the smaller delta from either direction") {
    val got = runNearest(
      left = Seq((1L, 7L, 100L), (2L, 7L, 190L)),
      right = Seq((7L, 60L, 10L, 1.0), (7L, 150L, 11L, 2.0)))
    // ts=100: backward delta 40 < forward delta 50 -> the ts=60 row;
    // ts=190: backward delta 40 and nothing forward -> the ts=150 row
    assert(got === Set((1L, Some(10L)), (2L, Some(11L))))
  }

  test("nearest resolves an exact distance tie backward") {
    val got = runNearest(
      left = Seq((1L, 7L, 100L)),
      right = Seq((7L, 80L, 10L, 1.0), (7L, 120L, 11L, 2.0)))
    assert(got === Set((1L, Some(10L))))
  }

  test("nearest falls forward when nothing precedes, and stays null when nothing matches") {
    val got = runNearest(
      left = Seq((1L, 7L, 10L), (2L, 8L, 10L)),
      right = Seq((7L, 500L, 10L, 1.0)))
    assert(got === Set((1L, Some(10L)), (2L, None)))
  }

  test("nearest: a right row at exactly the left ts wins from both directions (delta 0)") {
    val got = runNearest(
      left = Seq((1L, 7L, 100L)),
      right = Seq((7L, 99L, 10L, 1.0), (7L, 100L, 11L, 2.0)))
    assert(got === Set((1L, Some(11L))))
  }

  test("nearest is join-free: one exchange feeding two window sorts") {
    val l = Seq((1L, 7L, 100L)).toDF("event_id", "user_id", "ts")
    val r = Seq((7L, 60L, 10L, 1.0)).toDF("user_id", "ts", "event_id", "value")
    val df = AsofJoin.nearest(l, r, Seq("user_id"), "ts",
      Seq("event_id", "value"), "event_id")
    val plan = df.queryExecution.optimizedPlan
    val joins = plan.collect { case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    assert(joins.isEmpty, s"expected a join-free plan, got:\n$plan")
    val exchanges = df.queryExecution.executedPlan.toString()
      .linesIterator.count(_.contains("Exchange hashpartitioning"))
    assert(exchanges == 1, s"expected ONE key shuffle shared by both windows, got $exchanges")
  }
}

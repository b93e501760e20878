package graft.operators

import graft.SparkTestBase

class SessionizeSpec extends SparkTestBase {
  import spark.implicits._

  test("gaps split sessions; stats aggregate per (key, session)") {
    val events = Seq(
      // user 1: burst [0, 10, 20], idle, burst [100, 105]
      (1L, 0L, 1.0), (1L, 10L, 2.0), (1L, 20L, 3.0),
      (1L, 100L, 4.0), (1L, 105L, 5.0),
      // user 2: single event
      (2L, 50L, 9.0)).toDF("user_id", "ts", "value")
    val got = Sessionize.byGap(events, "user_id", "ts", gapTicks = 30L, "value")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(got === Set(
      (1L, 0L, 3L, 20L, 6.0),  // first burst: 3 events over 20 ticks
      (1L, 1L, 2L, 5L, 9.0),   // second burst
      (2L, 0L, 1L, 0L, 9.0)))  // singleton session
  }

  test("a gap of exactly the threshold does NOT split (strict >)") {
    val events = Seq((1L, 0L, 1.0), (1L, 30L, 2.0)).toDF("user_id", "ts", "value")
    val got = Sessionize.byGap(events, "user_id", "ts", gapTicks = 30L, "value").collect()
    assert(got.length === 1 && got.head.getLong(2) === 2L)
  }

  test("one shuffle: windows and aggregation share the key partitioning") {
    val events = Seq((1L, 0L, 1.0), (1L, 100L, 2.0), (2L, 5L, 3.0)).toDF("user_id", "ts", "value")
    val plan = Sessionize.byGap(events, "user_id", "ts", 30L, "value")
      .queryExecution.executedPlan.toString
    val exchanges = plan.split("Exchange", -1).length - 1
    assert(exchanges <= 1, s"sessionization should shuffle once, got $exchanges:\n$plan")
  }
}

package graft.operators

import graft.SparkTestBase

class FunnelSpec extends SparkTestBase {
  import spark.implicits._

  private val Steps = Seq("view", "click", "buy")

  private def depths(rows: Seq[(Long, Long, String)], window: Long): Map[Long, Int] =
    Funnel.windowFunnel(rows.toDF("k", "t", "ty"), "k", "t", "ty", Steps, window)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap

  test("complete in-window chain reaches full depth; stalls stop where they stall") {
    val rows = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "buy"),  // full chain
      (2L, 10L, "view"), (2L, 20L, "click"),                    // no buy → 2
      (3L, 10L, "view"),                                        // view only → 1
      (4L, 10L, "click"), (4L, 20L, "buy"))                     // no view → no row
    val d = depths(rows, window = 100L)
    assert(d === Map(1L -> 3, 2L -> 2, 3L -> 1))
  }

  test("the window is anchored at the FIRST step, not the previous one") {
    // click at t0+40 is inside; buy at t0+90 is within 60 of the click
    // but beyond window 80 of the view → depth 2
    val rows = Seq((1L, 10L, "view"), (1L, 50L, "click"), (1L, 100L, "buy"))
    assert(depths(rows, window = 80L) === Map(1L -> 2))
    assert(depths(rows, window = 100L) === Map(1L -> 3))
  }

  test("steps must be ordered: a buy BEFORE the click does not count") {
    val rows = Seq((1L, 10L, "view"), (1L, 30L, "click"), (1L, 20L, "buy"))
    assert(depths(rows, window = 100L) === Map(1L -> 2))
  }

  test("greedy earliest continuation: the first click is taken even when a later one would chain further") {
    // earliest click (t=20) has no buy within reach of t0+window when
    // chained? no — chain time only gates the NEXT step's search start;
    // the window bound is global. Pin the contract: buy search starts at
    // the EARLIEST click, so a buy between the two clicks still counts.
    val rows = Seq(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 25L, "buy"), (1L, 60L, "click"))
    assert(depths(rows, window = 100L) === Map(1L -> 3))
    // but a buy BEFORE the earliest click (and after no click) is unseen
    val rows2 = Seq(
      (2L, 10L, "view"), (2L, 30L, "click"), (2L, 25L, "buy"))
    assert(depths(rows2, window = 100L) === Map(2L -> 2))
  }

  test("several chains per key: the max depth wins") {
    // first view's chain stalls (no click within window); the second
    // view starts a fresh window that completes
    val rows = Seq(
      (1L, 10L, "view"), (1L, 500L, "view"), (1L, 510L, "click"), (1L, 520L, "buy"))
    assert(depths(rows, window = 50L) === Map(1L -> 3))
  }

  test("equal timestamps chain inclusively (ts >= chain time)") {
    val rows = Seq((1L, 10L, "view"), (1L, 10L, "click"), (1L, 10L, "buy"))
    assert(depths(rows, window = 1L) === Map(1L -> 3))
  }

  test("fewer than two steps is refused") {
    intercept[IllegalArgumentException] {
      Funnel.windowFunnel(Seq((1L, 1L, "a")).toDF("k", "t", "ty"),
        "k", "t", "ty", Seq("a"), 10L)
    }
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Semantics of the integer-exact series reducers ([[Series]]); the
  * testdata-scale behavior is pinned by the DuckDB oracle rows
  * (`ts_cusum_changepoint`, `ts_lttb_downsample`). */
class SeriesSpec extends SparkTestBase {
  import spark.implicits._

  test("cusum finds the planted level shift, ties to the earliest x") {
    // key "a": 4 days at 10 then 4 days at 30 — the shift is after day 4,
    // so |D_k| peaks at k=4: D_4 = 8*40 - 4*160 = -320
    val a = (1L to 4L).map(d => ("a", d, 10L)) ++ (5L to 8L).map(d => ("a", d, 30L))
    // key "b": constant series — D_k = n*k*c - k*n*c = 0 for every k,
    // ties broken to the EARLIEST day
    val b = (1L to 5L).map(d => ("b", d, 7L))
    val m = Series.cusumChangepoint((a ++ b).toDF("event_type", "day", "y"))
      .collect().map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(m("a") == ((4L, 320L, 8L)))
    assert(m("b") == ((1L, 0L, 5L)))
  }

  test("lttb keeps endpoints, picks the largest-triangle point per bucket") {
    // 8 interior days with one spike; 2 buckets over days 1..8 inside
    // endpoints 0 and 9. Flat y=10 except a spike y=50 at day 3 —
    // bucket 0 must pick the spike; bucket 1 (flat) ties to earliest x.
    val pts = Seq((0L, 10L)) ++ (1L to 8L).map(d => (d, if (d == 3) 50L else 10L)) ++ Seq((9L, 10L))
    val r = Series.lttbDownsample(pts.toDF("day", "y"), buckets = 2)
      .collect().map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    assert(r(-1L) == ((0L, 10L, 0L))) // endpoints always kept, score 0
    assert(r(2L) == ((9L, 10L, 0L)))
    assert(r(0L)._1 == 3L && r(0L)._2 == 50L) // the spike wins bucket 0
    assert(r(1L)._1 == 5L) // flat bucket: area decays with x → first day wins
    assert(r.size == 4)
  }

  test("lttb bucket assignment is the exact integer partition of the interior") {
    // interior days 1..8, 2 buckets → days 1-4 in bucket 0, 5-8 in bucket 1
    // via (day - 1) * 2 div 8; both engines integer-divide identically
    val days = (0L to 9L).map(d => (d, 10L))
    val sel = Series.lttbDownsample(days.toDF("day", "y"), buckets = 2).collect()
    assert(sel.length == 4) // 2 buckets + 2 endpoints, no empties here
  }
}

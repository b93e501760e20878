package graft.pipeline

import graft.SparkTestBase

class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("KMV estimate lands within 10% of the exact distinct count") {
    // 5000 distinct ids, each duplicated — duplicates must not bias the
    // estimate (same value → same hash → one k-minima slot)
    val df = (1 to 5000).flatMap(i => Seq(i, i)).toDF("v")
    val row = Sketches.kmvDistinct(df, "v", k = 1024).collect().head
    val est = row.getDouble(2)
    assert(row.getLong(0) === 1024L)
    assert(math.abs(est - 5000.0) / 5000.0 < 0.10, s"estimate $est vs 5000")
  }

  test("fewer distinct values than k: the sketch IS the exact count") {
    val df = (1 to 37).flatMap(i => Seq(i, i, i)).toDF("v")
    val row = Sketches.kmvDistinct(df, "v", k = 1024).collect().head
    assert(row.getLong(0) === 37L)
    assert(row.getDouble(2) === 37.0)
  }

  test("plan: top-k heaps after a combinable distinct — no global sort") {
    // k strictly below the input's maxRows, otherwise Catalyst (correctly)
    // elides the limit entirely and the TakeOrdered never appears
    val plan = Sketches.kmvDistinct((1 to 100).toDF("v"), "v", k = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan)
    assert(!plan.contains("SortExec"), plan)
  }

  test("per-group KMV: exact below k, estimated above, deterministic") {
    // group a: 30 distinct (below k=16? no -- above); group b: 5 distinct (below k)
    val df = ((1 to 500).map(i => ("a", s"av$i")) ++ (1 to 5).map(i => ("b", s"bv$i")))
      .toDF("g", "v")
    val rows = Sketches.kmvDistinctByGroup(df, "g", "v", k = 64).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    assert(rows("b") === ((5L, 5.0)))                     // exact: fewer than k
    assert(rows("a")._1 === 64L)
    assert(math.abs(rows("a")._2 - 500.0) / 500.0 < 0.30) // (k-1)/U estimate
    val again = Sketches.kmvDistinctByGroup(df, "g", "v", k = 64).collect()
      .map(r => r.getString(0) -> r.getDouble(3)).toMap
    assert(again("a") === rows("a")._2 && again("b") === rows("b")._2)
  }
}

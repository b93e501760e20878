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
}

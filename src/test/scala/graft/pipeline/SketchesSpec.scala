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

  test("overlap: a union under k reports EXACT union/Jaccard/intersection") {
    // |A|=30, |B|=25, |A∩B|=15, |A∪B|=40 < k=64 -> all figures exact
    val a = (1 to 30).map(i => s"v$i").toDF("v")
    val b = (16 to 40).map(i => s"v$i").toDF("v")
    val r = Sketches.kmvOverlap(a, "v", b, "v", k = 64).collect()(0)
    assert(r.getLong(0) === 40L && r.getLong(2) === 15L)
    assert(r.getDouble(3) === 40.0)          // est_union exact
    assert(r.getDouble(4) === 15.0 / 40.0)   // jaccard exact
    assert(r.getDouble(5) === 15.0 / 40.0 * 40.0)
  }

  test("overlap is symmetric and estimates within the k-bound above k") {
    val a = (1 to 800).map(i => s"x$i").toDF("v")
    val b = (401 to 1200).map(i => s"x$i").toDF("v")
    // truth: union 1200, intersection 400, jaccard 1/3
    val ab = Sketches.kmvOverlap(a, "v", b, "v", k = 128).collect()(0)
    val ba = Sketches.kmvOverlap(b, "v", a, "v", k = 128).collect()(0)
    assert(ab.getDouble(3) === ba.getDouble(3)) // same union sketch either way
    assert(ab.getDouble(4) === ba.getDouble(4))
    assert(math.abs(ab.getDouble(3) - 1200.0) / 1200.0 < 0.30)
    assert(math.abs(ab.getDouble(4) - 1.0 / 3.0) < 0.15)
  }

  test("overlap: disjoint sets report zero intersection whatever k") {
    val a = (1 to 50).map(i => s"a$i").toDF("v")
    val b = (1 to 50).map(i => s"b$i").toDF("v")
    val r = Sketches.kmvOverlap(a, "v", b, "v", k = 32).collect()(0)
    assert(r.getLong(2) === 0L && r.getDouble(4) === 0.0 && r.getDouble(5) === 0.0)
  }

  test("rollup: merged per-group sketches EQUAL the direct global sketch") {
    // values spread over 10 groups with heavy cross-group overlap — the
    // merged minima must reproduce the direct sketch bit-for-bit (the
    // losslessness claim), including kth and the double estimate
    val df = (1 to 2000).map(i => (i % 10, s"v${i % 700}")).toDF("g", "v")
    val rolled = Sketches.kmvRollup(df, "g", "v", k = 64).collect()(0)
    val direct = Sketches.kmvDistinct(df, "v", k = 64).collect()(0)
    assert(rolled.getLong(0) === 10L) // n_groups
    assert(rolled.getLong(1) === direct.getLong(0))   // k
    assert(rolled.getLong(2) === direct.getLong(1))   // kth
    assert(rolled.getDouble(3) === direct.getDouble(2)) // estimate
  }

  test("rollup: union under k is exact even when spread across groups") {
    val df = (1 to 40).map(i => (i % 4, s"v$i")).toDF("g", "v")
    val r = Sketches.kmvRollup(df, "g", "v", k = 64).collect()(0)
    assert(r.getLong(1) === 40L && r.getDouble(3) === 40.0)
  }
}

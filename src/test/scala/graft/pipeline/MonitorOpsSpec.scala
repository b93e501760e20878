package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the late-round-10 monitoring/maintenance operators:
  * distribution-drift chi-square, retention planning, composed image
  * dedup, and semantic eval-set decontamination. */
class MonitorOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("driftChi2: identical distributions read 0, a shifted source reads the hand value") {
    // bucket edges are 128,256,...,4096(+8192 top); values 100 and 200
    // land in buckets 128 and 256
    val base = Seq.fill(8)(100L) ++ Seq.fill(8)(200L)
    val rows =
      base.map(("a", _)) ++ base.map(("b", _)) ++
        (Seq.fill(12)(100L) ++ Seq.fill(4)(200L)).map(("c", _))
    val out = Profile.driftChi2(rows.toDF("source", "v"), "source", col("v"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.size == 3)
    assert(out("a")._1 == 16L && out("b")._1 == 16L && out("c")._1 == 16L)
    // global histogram: b128 = 8+8+12 = 28, b256 = 8+8+4 = 20, N = 48.
    // e128 = 28*16/48 = 9.333..., e256 = 20*16/48 = 6.666...
    // a and b: chi2 = (8-e128)^2/e128 + (8-e256)^2/e256
    val e1 = 28.0 * 16 / 48; val e2 = 20.0 * 16 / 48
    val same = math.rint(((8 - e1) * (8 - e1) / e1 + (8 - e2) * (8 - e2) / e2) * 10000) / 10000
    val shifted = math.rint(((12 - e1) * (12 - e1) / e1 + (4 - e2) * (4 - e2) / e2) * 10000) / 10000
    assert(out("a")._2 == same && out("b")._2 == same)
    assert(out("c")._2 == shifted && shifted > same)
  }

  test("driftChi2: an empty global bucket contributes zero, never NaN") {
    val out = Profile.driftChi2(Seq(("a", 1L), ("b", 1L)).toDF("source", "v"),
        "source", col("v"))
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // one bucket occupied by everything: per-source o == e exactly
    assert(out("a") == 0.0 && out("b") == 0.0)
  }

  test("retentionPlan: expired / straddling / kept partition the inventory, sums by hand") {
    val files = Seq(
      // (group, file, min_ts, max_ts, bytes)
      ("t1", "f1", 0L, 50L, 100L),    // expired (max < 100)
      ("t1", "f2", 10L, 99L, 200L),   // expired
      ("t1", "f3", 60L, 150L, 400L),  // straddles the cutoff
      ("t1", "f4", 100L, 200L, 800L), // kept (min >= cutoff)
      ("t2", "f5", 120L, 130L, 32L),  // kept
    ).toDF("tbl", "file", "min_ts", "max_ts", "bytes")
    val out = graft.operators.Layout.retentionPlan(files, "tbl", "max_ts", "min_ts", "bytes", 100L)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))).toMap
    assert(out("t1") == ((2L, 300L, 1L, 400L, 1L, 800L)))
    assert(out("t2") == ((0L, 0L, 0L, 0L, 1L, 32L)))
  }

  test("retentionPlan: a file ending exactly at the cutoff is NOT expired (max_ts < cutoff)") {
    val files = Seq(("t", "f", 0L, 100L, 1L)).toDF("g", "file", "mn", "mx", "b")
    val r = graft.operators.Layout.retentionPlan(files, "g", "mx", "mn", "b", 100L).collect()(0)
    // max_ts == cutoff may still hold a live record at the boundary:
    // it straddles (min < cutoff <= max), never silently retires
    assert(r.getLong(1) == 0L && r.getLong(3) == 1L && r.getLong(5) == 0L)
  }

  test("imageDedup: same pixel seed collapses to the earliest keeper, canonical flags agree") {
    // doc_id % PixelSeeds selects the pattern: 0 and 40 share seed 0,
    // 1 and 41 share seed 1, 5 is alone
    val docs = Seq(0L, 1L, 5L, 40L, 41L).toDF("doc_id")
    val out = graft.pipeline.MultiModal.imageDedup(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out.size == 5)
    assert(out(0L) == ((0L, true)) && out(40L) == ((0L, false)))
    assert(out(1L) == ((1L, true)) && out(41L) == ((1L, false)))
    assert(out(5L) == ((5L, true)))
  }

  test("semanticContamination: a paraphrase-close corpus vector is flagged with its closest bench item") {
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(Ann.Dim)(0.0f); parts.foreach { case (i, x) => a(i) = x }; a
    }
    val vecs = Seq(
      (0L, v(0 -> 1.0f)),               // bench item 0 / cell anchor
      (1L, v(1 -> 1.0f)),               // bench item 1 / cell anchor
      (10L, v(0 -> 0.99f, 1 -> 0.01f)), // near-copy of bench 0: flagged
      (11L, v(1 -> 0.9f, 0 -> 0.1f)),   // near-copy of bench 1: flagged
      (12L, v(2 -> 1.0f, 0 -> 0.05f)),  // ~orthogonal: below tau, clean
    ).toDF("vec_id", "embedding")
    val out = Ann.semanticContamination(vecs, benchSize = 2, numCentroids = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out.contains(10L) && out(10L)._2 == 0L && out(10L)._3 > 0.9)
    assert(out.contains(11L) && out(11L)._2 == 1L)
    assert(!out.contains(12L), "sub-threshold similarity must stay clean")
    assert(!out.contains(0L) && !out.contains(1L), "bench items never flag themselves")
  }
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Planted known-answer fixture for [[Ann.ivfIncremental]] (the
  * FIXTURES.md §4 discipline: the oracle SQL shares the coarse-chain
  * and quantized-sum generators with the operator, so a planted input
  * with a HAND-derived answer is the independent check).
  *
  * Construction: base = two exact clusters {v1, v2, v1, v2} (ids 0-3),
  * coordinates multiples of 1/4 so every floor-quantized mean is EXACT
  * — Lloyd is a fixpoint (seeds v1, v2 stay put through every round,
  * cells 0 and 1). New batch: id 4 = v1 exactly (lands in cell 0,
  * leaves its mean untouched → drift² = 0), id 5 = v2 except dim 1
  * moved from −0.5 to −0.25 (lands in cell 1 — dist² 0.0625 vs ≈63.56
  * to v1). Cell 1's post-batch dim-1 mean is
  * (2·(−0.5) + (−0.25))/3 = −5/12, so drift² = (−5/12 − (−0.5))² =
  * (1/12)² = 0.0069444… → 0.0069 at the oracle's 4-decimal rounding
  * (quantized sums: (2·floor(−0.5·Q) + floor(−0.25·Q))/3/Q is the same
  * −5/12 because both coordinates quantize exactly). With τ = 0.005
  * the two cells read retrain = 0 and 1 — both flag paths on paper. */
class AnnIncrementalSpec extends SparkTestBase {
  import spark.implicits._

  test("planted two-cluster base + two-vector batch: assignments, drift², flags by hand") {
    val v1 = Array.fill(Ann.Dim)(0.5f)
    val v2 = Array.fill(Ann.Dim)(-0.5f)
    val w = v2.clone(); w(0) = -0.25f // dim 1 (1-indexed) shifted by 1/4
    val emb = Seq(
      0L -> v1, 1L -> v2, 2L -> v1, 3L -> v2, // base (split = 4)
      4L -> v1, 5L -> w                       // the new batch
    ).toDF("vec_id", "embedding")
    val got = Ann.ivfIncremental(emb, split = 4L, numCentroids = 2, tau = 0.005)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == Set(
      (4L, 0L, 0.0, 0),      // at the centroid: no displacement
      (5L, 1L, 0.0069, 1)),  // (1/12)² on one dim, over τ
      s"got $got")
  }

  test("an empty-drift batch flags nothing: new vectors AT both centroids") {
    val v1 = Array.fill(Ann.Dim)(0.25f)
    val v2 = Array.fill(Ann.Dim)(-0.75f)
    val emb = Seq(
      0L -> v1, 1L -> v2, 2L -> v1, 3L -> v2,
      4L -> v1, 5L -> v2
    ).toDF("vec_id", "embedding")
    val got = Ann.ivfIncremental(emb, split = 4L, numCentroids = 2, tau = 0.005)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSet
    assert(got == Set((4L, 0L, 0.0, 0), (5L, 1L, 0.0, 0)), s"got $got")
  }
}

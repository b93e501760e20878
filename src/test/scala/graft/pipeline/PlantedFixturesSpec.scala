package graft.pipeline

import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Planted known-answer fixtures for SINGLE-SOURCED oracle families — the
  * benford/dict-estimate lesson (commit 3c7c047): when the Spark
  * expression and the DuckDB SQL are generated from the same fold or
  * constant table, both engines can agree on the same wrong number and
  * the hash check certifies the bug. Each test here asserts an invariant
  * or value derived INDEPENDENTLY of the shared generator logic — a bit
  * loop instead of the magic masks, an algebraic law instead of the hash
  * constants — so a shared fold inversion cannot hide.
  *
  * The family → fixture index lives in FIXTURES.md §4. */
class PlantedFixturesSpec extends SparkTestBase {
  import spark.implicits._

  // ---- z-order spread/interleave (Layout.spreadBits ↔ Layout.spreadSql
  //      share the magic-mask table verbatim) ----

  /** Independent reference: place bit i of x at position 2i, one bit at a
    * time — no masks shared with the implementation. */
  private def spreadRef(x: Long): Long = {
    var out = 0L
    var i = 0
    while (i < 31) { out |= ((x >> i) & 1L) << (2 * i); i += 1 }
    out
  }

  test("zorder: magic-mask spread equals the bit-by-bit reference on hand values and edges") {
    import graft.operators.Layout
    val samples = Seq(0L, 1L, 2L, 3L, 5L, 0xAAAAAAAL, 0x55555555L & 0x7FFFFFFFL,
      0x7FFFFFFFL, 12345L, 987654321L)
    val got = samples.toDF("x")
      .select(col("x"), Layout.spreadBits(col("x")).as("s")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for (x <- samples)
      assert(got(x) == spreadRef(x), s"spreadBits($x) = ${got(x)}, want ${spreadRef(x)}")
  }

  test("zorder: zkey interleaves a on even bits, b on odd — hand-checked values") {
    import graft.operators.Layout
    val cases = Seq((0L, 0L), (1L, 0L), (0L, 1L), (3L, 5L), (0x7FFFFFFFL, 0L),
      (12345L, 67890L))
    val got = cases.toDF("a", "b")
      .select(col("a"), col("b"), Layout.zkey(col("a"), col("b")).as("z")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for ((a, b) <- cases) {
      val want = spreadRef(a) | (spreadRef(b) << 1)
      assert(got((a, b)) == want, s"zkey($a,$b) = ${got((a, b))}, want $want")
    }
    // spot values a reader can verify on paper: z(1,0)=1, z(0,1)=2,
    // z(3,5) = interleave(11₂, 101₂) = 100111₂ = 39
    assert(got((1L, 0L)) == 1L && got((0L, 1L)) == 2L && got((3L, 5L)) == 39L)
  }

  // ---- MinHash signature arithmetic (Dedup.minhashA/B constants are
  //      shared verbatim with the oracle SQL) ----

  test("minhash: the union law — sig(A ∪ B) is the slot-wise min, so equal-set docs band identically") {
    // Independent invariant of ANY correct MinHash (Broder '97): each slot
    // is a min over per-element permuted hashes, so slots of a union are
    // the element-wise min of the parts' slots, and set equality ⇒
    // signature equality ⇒ ALL bands collide. A fold/sign error in the
    // permutation arithmetic breaks min-composition and this law with it.
    val a = Seq(1L, 2L, 3L).map(0L -> _)
    val b = Seq(3L, 4L).map(1L -> _)
    val union = (Seq(1L, 2L, 3L) ++ Seq(4L)).map(2L -> _)
    val dupOfA = Seq(3L, 1L, 2L).map(3L -> _) // same set, different order
    val cfg = Dedup.LshConfig()
    val out = Dedup.bandSignaturesFromHashedRows(
      (a ++ b ++ union ++ dupOfA).toDF("doc_id", "shingle"), "doc_id", cfg)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    // same set ⇒ identical band vector (order independence + determinism)
    assert(out(0L) == out(3L), "equal shingle sets must produce identical signatures")
    // the union's slots are mins of the parts' slots ⇒ every union band
    // is a function of the parts; verify via the slot-level law on a
    // fresh numHashes=numBands=4 geometry where each band IS one slot
    val slotCfg = Dedup.LshConfig(numHashes = 4, numBands = 4, rowsPerBand = 1)
    val slots = Dedup.bandSignaturesFromHashedRows(
      (a ++ b ++ union).toDF("doc_id", "shingle"), "doc_id", slotCfg)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1).map(_.toString)).toMap
    // with one slot per band, band hash equality ⇔ slot equality; the
    // union's slot must equal ONE of the parts' slots (it is their min)
    for (i <- 0 until 4)
      assert(slots(2L)(i) == slots(0L)(i) || slots(2L)(i) == slots(1L)(i),
        s"slot $i of the union is neither part's slot — min law broken")
  }

  test("minhash: a subset can never band-collide better than the set itself (containment sanity)") {
    // Jaccard({1},{1,...,50}) = 0.02 — with 4 bands × 3 rows the collision
    // probability is ≈ 4·0.02³ ≈ 3e-5; assert the tiny subset does NOT
    // collide while an identical copy collides on every band.
    val small = Seq(0L -> 1L)
    val big = (1L to 50L).map(1L -> _)
    val copy = (1L to 50L).map(2L -> _)
    val cfg = Dedup.LshConfig()
    val cand = Dedup.minhashCandidates(
      Dedup.bandSignaturesFromHashedRows((small ++ big ++ copy).toDF("doc_id", "shingle"),
        "doc_id", cfg), "doc_id", cfg.numBands)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cand.contains((1L, 2L)), "identical sets must collide on every band")
    assert(!cand.contains((0L, 1L)) && !cand.contains((0L, 2L)),
      "a 2%-Jaccard subset banding with its superset means the permutation arithmetic is degenerate")
  }

  // ---- contrastive triplet mining (shared dot-chain + window order) ----

  test("triplets: planted geometry — the duplicate is the positive, the orthogonal-ish vector the negative") {
    // anchor 0 = e1; vec 10 = e1 (exact duplicate, sim 1.0 → positive);
    // vec 11 = e1 rotated slightly (sim ≈ 0.9999 — INSIDE the margin
    // band, must be skipped); vec 12 = e2 (sim 0 → the hard negative is
    // the best sub-margin candidate, here the only one)
    val dim = Ann.Dim
    def unit(axis: Int): Array[Float] = {
      val a = Array.fill(dim)(0f); a(axis) = 1f; a
    }
    val nearDup = { val a = unit(0); a(1) = 0.01f; a }
    val rows = Seq(
      (0L, unit(0)), (10L, unit(0)), (11L, nearDup), (12L, unit(1)))
    val out = Ann.contrastiveTriplets(
      rows.toDF("vec_id", "embedding"), numQueries = 1).collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getLong(0) == 0L && r.getLong(1) == 10L && r.getDouble(2) == 1.0,
      s"positive wrong: $r")
    assert(r.getLong(3) == 12L && r.getDouble(4) == 0.0,
      s"negative must skip the in-margin near-dup and take the orthogonal vector: $r")
  }

  // ---- KMV estimator branches (shared k-th-order-statistic formula) ----

  test("kmv: estimate is scale-monotone — more distinct values never lowers the estimate below k") {
    // Independent invariant: below k the sketch IS exact (pinned in
    // SketchesSpec); above k the k-th minimum decreases monotonically with
    // more distinct values, so the estimate (k−1)/x_k must be
    // non-decreasing as the set grows. An inverted estimator branch
    // (k/x_{k-1}, off-by-one in the order statistic) breaks monotonicity
    // on nested sets long before it drifts outside the ±10% accuracy band.
    val small = (1L to 500L).map(i => s"v$i").toDF("k")
    val big = (1L to 5000L).map(i => s"v$i").toDF("k")
    def est(df: org.apache.spark.sql.DataFrame): Double =
      Sketches.kmvDistinct(df, "k", k = 256).collect().head.getDouble(2)
    val (eSmall, eBig) = (est(small), est(big))
    assert(eSmall <= eBig, s"nested sets: estimate($eSmall) > estimate($eBig)")
    assert(eBig >= 4000 && eBig <= 6000, s"5000-distinct estimate off: $eBig")
  }

  test("kmv: the fold law — min_k(min_k(A) ∪ min_k(B)) = min_k(A ∪ B), overlap included") {
    // The algebraic identity the streaming_kmv_distinct row rides: the
    // k-minima set is a semilattice fold, so per-batch sketches merged
    // through state must equal the one-shot sketch BIT-FOR-BIT — k, kth,
    // and estimate. Overlapping halves exercise the dedup in the merge.
    val k = 16
    val a = (1 to 300).map(i => s"v$i")
    val b = (200 to 500).map(i => s"v$i")
    def mins(xs: Seq[String]) = xs.toDF("x")
      .select(Sketches.kmvHash("x").as("hv")).distinct()
      .orderBy(col("hv")).limit(k)
    val folded = Sketches.kmvEstimateFromMins(
      mins(a).unionByName(mins(b)).distinct().orderBy(col("hv")).limit(k), k)
      .collect().head
    val oneShot = Sketches.kmvDistinct((a ++ b).toDF("x"), "x", k)
      .collect().head
    assert(folded === oneShot,
      s"fold diverged from one-shot: $folded vs $oneShot")
  }

  test("quantile gate: per-part gated samples union to the one-shot sample (the streamed fold)") {
    // The streaming_quantile law: the Bernoulli gate is a pure function
    // of row identity, so gating two disjoint halves and unioning equals
    // gating the whole — estimate AND sample size, bit-for-bit.
    val rows = (1L to 2000L).map(i => (i, i * 3 % 997))
    val (a, b) = rows.splitAt(900)
    def gated(xs: Seq[(Long, Long)]) = xs.toDF("id", "v")
      .where(Sketches.quantileGate(col("id")) < Sketches.quantileBound(0.2))
      .select(col("v"))
    val folded = Sketches.quantileEstimate(
      gated(a).unionByName(gated(b)), col("v"), q = 0.5).collect().head
    val oneShot = Sketches.sampledQuantile(rows.toDF("id", "v"),
      col("id"), col("v"), q = 0.5, rate = 0.2).collect().head
    assert(folded === oneShot, s"fold diverged: $folded vs $oneShot")
    assert(folded.getLong(1) > 100, s"gate admitted too few rows: $folded")
  }
}

package graft.operators

import graft.SparkTestBase

class KCoreSpec extends SparkTestBase {
  import spark.implicits._

  test("many-round peel keeps checkpoint storage bounded (round r−1 released)") {
    // A 20-vertex path at k=2 peels its endpoints one layer per round —
    // 8 rounds all run. Without explicit release, each round leaves two
    // persisted cut RDDs (edges + degrees) alive until GC; with the
    // release discipline only the final answer and the last edge cut
    // may remain registered.
    val sc = spark.sparkContext
    val edges = (1 until 20).map(i => (i.toLong, i + 1L)).toDF("doc_a", "doc_b")
    val before = sc.getPersistentRDDs.size
    val (res, rounds) = KCore.peelWithRounds(edges, "doc_a", "doc_b", k = 2, rounds = 8)
    res.count()
    assert(rounds == 8, s"expected all 8 rounds to run, got $rounds")
    val leaked = sc.getPersistentRDDs.size - before
    assert(leaked <= 3, s"8 rounds left $leaked persisted RDDs (expected <= 3)")
  }

  test("peeling cascades: a pendant path dies even though its root starts at degree 2") {
    // K4 {1,2,3,4} plus a tail 4–5–6. Round 1 drops 6 (deg 1) and 5
    // (deg 2 < 3); round 2 re-degrees: the K4 is intact at 3 each.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (5L, 6L)).toDF("doc_a", "doc_b")
    val r = KCore.peel(edges, k = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
  }

  test("survivor degrees are the FINAL subgraph's, not the input's") {
    // K4 where vertex 4 also feeds a triangle 4–5, 4–6, 5–6: 5 and 6
    // peel at k=3 (deg 2), so 4's surviving degree drops 5 -> 3.
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L), (4L, 6L), (5L, 6L)).toDF("doc_a", "doc_b")
    val r = KCore.peel(edges, k = 3).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(4L) == 3L)
    assert(!r.contains(5L) && !r.contains(6L))
  }

  test("bounded rounds: a long pendant chain outlasts a short peel") {
    // Triangle {1,2,3} with a chain 3–4–5–6–7 at k=2: each round peels
    // exactly one chain tip, so rounds=2 still holds 4 and 5 while the
    // full 4-round peel reduces to the triangle alone.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 4L), (4L, 5L),
      (5L, 6L), (6L, 7L)).toDF("doc_a", "doc_b")
    val short = KCore.peel(edges, k = 2, rounds = 2).collect()
      .map(_.getLong(0)).toSet
    assert(short == Set(1L, 2L, 3L, 4L, 5L))
    // 4 rounds strips the chain but still reports 3's degree WITH the
    // 3–4 stub (check-time degree); round 5 re-degrees the bare triangle
    val full = KCore.peel(edges, k = 2, rounds = 5).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(full == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("k above the max degree empties the graph without error") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    assert(KCore.peel(edges, k = 5).count() == 0)
  }
}

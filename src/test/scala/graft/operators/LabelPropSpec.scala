package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LabelPropSpec extends SparkTestBase {
  import spark.implicits._

  test("two bridged triangles split into two communities (one component)") {
    // hand-iterated: l3 = {1,2,3}→1 and {4,5,6}→3 despite the 3–4 bridge
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L), (4L, 6L),
      (5L, 6L), (3L, 4L)).toDF("doc_a", "doc_b")
    val verts = (1L to 6L).map(Tuple1(_)).toDF("part")
    val r = LabelProp.labels(verts, edges, "part").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L).forall(r(_) == 1L))
    assert(Seq(4L, 5L, 6L).forall(r(_) == 3L))
    // components would merge everything — LPA must not
    val comp = Components.labels(verts, edges, "part").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(comp.values.toSet.size == 1)
  }

  test("isolated vertices keep their own label; determinism across runs") {
    val edges = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val verts = Seq(1L, 2L, 9L).map(Tuple1(_)).toDF("part")
    val r = LabelProp.labels(verts, edges, "part").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r(9L) == 9L)
    // a bare pair OSCILLATES under synchronous updates (the known
    // bipartite two-cycle of sync LPA): after 3 rounds 1 holds 2's
    // label and vice versa — deterministic, and exactly what the
    // fixed-round bulk-synchronous contract specifies
    assert(r(1L) == 2L && r(2L) == 1L)
    val again = LabelProp.labels(verts, edges, "part").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(again == r)
  }

  test("labelsStable restricts its domain to `vertices` — edge endpoints outside it never enter the output or the fixpoint probe") {
    // endpoints 7 and 8 appear only in edges; the fixed-round path
    // excludes them via its nodes left-join, and labelsStable must match
    // (its domain pin: a vertex outside `vertices` has no self vote, so
    // its __old is null and the row is dropped). Before the pin, 7/8
    // entered the output with __old = null, voted in later rounds, and —
    // because null never compares as "changed" — could let the early
    // exit fire on a round that had just grown the labeling.
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 7L), (7L, 8L))
      .toDF("doc_a", "doc_b")
    val verts = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("part")
    val (df, roundsRun) = LabelProp.labelsStableWithRounds(verts, edges, "part", rounds = 8)
    val r = df.collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(r.keySet == Set(1L, 2L, 3L),
      s"output domain must equal `vertices`; got ${r.keySet}")
    // the triangle self-stabilizes to min label 1 and the run converges
    assert(r.values.toSet == Set(1L))
    assert(roundsRun <= 8)
    // fixed-round path agrees on the domain (regression pin: the two
    // public entry points share one contract)
    val fixed = LabelProp.labels(verts, edges, "part").collect()
      .map(_.getLong(0)).toSet
    assert(fixed == Set(1L, 2L, 3L))
  }

  test("rounds parameter: one round adopts the min neighbor label directly") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val verts = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("part")
    val r1 = LabelProp.labels(verts, edges, "part", rounds = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // round 1: all neighbor-label counts are 1 -> min neighbor label wins
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }
}

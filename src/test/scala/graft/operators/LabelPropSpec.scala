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

  test("rounds parameter: one round adopts the min neighbor label directly") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val verts = Seq(1L, 2L, 3L).map(Tuple1(_)).toDF("part")
    val r1 = LabelProp.labels(verts, edges, "part", rounds = 1).collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    // round 1: all neighbor-label counts are 1 -> min neighbor label wins
    assert(r1 == Map(1L -> 2L, 2L -> 1L, 3L -> 2L))
  }
}

package graft.operators

import graft.SparkTestBase

/** Hand-checked Newman modularity ([[Modularity]]); testdata-scale
  * behavior is pinned by the `graph_modularity` oracle row. */
class ModularitySpec extends SparkTestBase {
  import spark.implicits._

  // two triangles bridged by one edge: m = 7, L_A = L_B = 3,
  // D_A = D_B = 7 → Q·4m² = 2·14·6 − (49+49) = 70, Q = 70/196
  private val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L),
    (4L, 5L), (4L, 6L), (5L, 6L), (3L, 4L)).toDF("src", "dst")

  test("modularity of the natural two-community split is 70/196") {
    val labels = Seq((1L, "a"), (2L, "a"), (3L, "a"),
      (4L, "b"), (5L, "b"), (6L, "b")).toDF("node", "label")
    val r = Modularity.score(edges, labels).collect()(0)
    assert(r.getLong(0) == 2L)   // n_groups
    assert(r.getLong(1) == 7L)   // m_edges from Σdc/2
    assert(r.getLong(2) == 70L)  // q_num
    assert(r.getDouble(3) == math.rint(70.0 / 196.0 * 1e6) / 1e6)
  }

  test("the everything-in-one-community split scores exactly zero") {
    // L = m and D = 2m → Q·4m² = 2·2m·m − 4m² = 0: "no better than
    // the degree-preserving random graph", the Newman null case
    val labels = (1L to 6L).map(n => (n, "all")).toDF("node", "label")
    val r = Modularity.score(edges, labels).collect()(0)
    assert(r.getLong(2) == 0L && r.getDouble(3) == 0.0)
  }

  test("splitting a triangle across communities scores below the natural cut") {
    val labels = Seq((1L, "a"), (2L, "a"), (3L, "b"),
      (4L, "b"), (5L, "b"), (6L, "b")).toDF("node", "label")
    val r = Modularity.score(edges, labels).collect()(0)
    assert(r.getLong(2) < 70L)
  }
}

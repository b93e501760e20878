package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}

/** Distributed connected components by large-star / small-star
  * alternation (Kiveris et al., "Connected Components in MapReduce and
  * Beyond", COSN 2014) — the scale-path component labeler.
  *
  * Why not plain min-label propagation: propagation needs one round per
  * unit of component DIAMETER (a 10⁶-node chain is 10⁶ rounds — the
  * sf0.1 co-order subgraph already needs 59). The star alternation
  * contracts paths doubly-exponentially: each round is the same two
  * shuffle primitives (groupBy-min over neighborhoods + an equi-join
  * back to the edge list) but converges in O(log² n) rounds on any
  * topology — hub, chain, or clique — with the edge list never growing
  * (large-star emits one edge per input edge, small-star at most one
  * per edge plus one per node).
  *
  * Round shape (all DataFrame ops, no driver-side graph state):
  *  - large-star: every node u links its LARGER neighbors to
  *    m(u) = min(Γ(u) ∪ u);
  *  - small-star: every node u links its smaller-or-equal neighborhood
  *    (and itself) to its minimum.
  * The edge set is re-canonicalized (a < b, loops dropped, distinct)
  * after each step; a fixpoint (edge set unchanged — checked exactly
  * via count + anti-join emptiness, never a checksum) is a forest of
  * stars centered at each component's minimum id, from which labels
  * are one groupBy-min. Each round cuts its lineage through
  * [[Checkpoints.cut]] so the iterative plan stays one round deep.
  * Fault tolerance: `localCheckpoint` by default (blocks die with
  * their executor — correct at local[32]); SPARK_GRAFT_CHECKPOINT_DIR
  * flips every cut to reliable `checkpoint` (the 1000-executor switch,
  * exercised by ReliableCheckpointSpec and the local-cluster run).
  */
object Components {

  /** Component label (smallest reachable id) for every node in `nodes`.
    * `pairs` columns `aCol`/`bCol` are the undirected edge endpoints —
    * any orientation, duplicates and self-loops tolerated. Nodes with
    * no edge label themselves. Output: (idCol, cluster_id).
    * Throws if `maxIter` alternation rounds fail to reach the fixpoint
    * (truncated contraction would silently mislabel). */
  def labels(nodes: DataFrame, pairs: DataFrame, idCol: String,
      aCol: String = "doc_a", bCol: String = "doc_b",
      maxIter: Int = 30): DataFrame = {
    val canon0 = canon(pairs.select(col(s"`$aCol`").as("x"), col(s"`$bCol`").as("y")))
    var edges = Checkpoints.cut(canon0)
    var edgeCount = edges.count()
    var iter = 0
    var converged = edgeCount == 0
    while (!converged && iter < maxIter) {
      val next = Checkpoints.cut(canon(smallStar(largeStar(edges))))
      val nextCount = next.count()
      // exact fixpoint probe: same cardinality + no edge outside the old
      // set ⇒ equal sets (both sides are distinct canonical pairs); the
      // old cardinality is carried from the previous round, not recounted
      converged = nextCount == edgeCount &&
        next.join(edges, Seq("a", "b"), "left_anti").isEmpty
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"star alternation did not converge in $maxIter rounds")
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
    val lbl = sym.groupBy(col("u"))
      .agg(least(col("u"), F.min(col("v"))).as("cluster_id"))
    nodes.select(col(s"`$idCol`")).distinct()
      .join(lbl.withColumnRenamed("u", idCol), Seq(idCol), "left_outer")
      .select(col(s"`$idCol`"),
        coalesce(col("cluster_id"), col(s"`$idCol`")).as("cluster_id"))
  }

  /** a < b, loops dropped, distinct — the canonical undirected form. */
  private def canon(xy: DataFrame): DataFrame =
    xy.filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"), greatest(col("x"), col("y")).as("b"))
      .distinct()

  /** Large-star over canonical edges: for each node u, link every
    * neighbor v > u to m(u) = min(Γ(u) ∪ u). Each canonical edge is
    * emitted exactly once (from its smaller endpoint's neighborhood). */
  private def largeStar(edges: DataFrame): DataFrame = {
    val sym = edges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(edges.select(col("b").as("u"), col("a").as("v")))
    val m = sym.groupBy(col("u")).agg(least(col("u"), F.min(col("v"))).as("m"))
    sym.join(m, "u").filter(col("v") > col("u"))
      .select(col("v").as("x"), col("m").as("y"))
  }

  /** Small-star: for each node u with smaller neighbors, link each of
    * them — and u itself — to the minimum of that lower neighborhood. */
  private def smallStar(xy: DataFrame): DataFrame = {
    val canonEdges = canon(xy)
    val sym = canonEdges.select(col("a").as("u"), col("b").as("v"))
      .unionAll(canonEdges.select(col("b").as("u"), col("a").as("v")))
    val low = sym.filter(col("v") < col("u"))
    val m = low.groupBy(col("u")).agg(F.min(col("v")).as("m"))
    low.join(m, "u")
      .select(col("v").as("x"), col("m").as("y"))
      .unionAll(m.select(col("u").as("x"), col("m").as("y")))
  }
}

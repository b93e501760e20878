package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-truss peeling (Cohen '08): each round computes every
  * edge's triangle SUPPORT (how many triangles contain it) in the
  * surviving subgraph and drops edges with support < k−2 — dropping an
  * edge breaks its triangles, so peeling cascades. The k-truss is the
  * EDGE-cohesion sibling of [[KCore]]'s vertex degrees (every k-truss
  * edge lies in a (k−1)-core, but not vice versa): communities, spam
  * rings, and mutual-friend cores are truss-shaped, because support
  * counts CLOSED structure where degree counts any contact. As in
  * KCore, the round count is FIXED — the result is the round-R
  * snapshot, equal to the true k-truss when the cascade depth ≤ R, and
  * replayable by the oracle's unrolled CTE chain either way.
  *
  * Scale shape per round: one triangle ENUMERATION over the current
  * edge list — the [[Triangles.count]] degree-ordered wedge join,
  * O(E^1.5)-bounded under any hub skew, emitting each triangle once as
  * a (src, v, w) row (the oracle enumerates by id-order instead;
  * support is orientation-independent, so the SETS agree) — then a
  * 3-edges-per-triangle explode and one map-side-combinable count per
  * 16-byte edge key. The edge list only ever SHRINKS; round results
  * persist under the PageRank materialize-then-release discipline. */
object Truss {
  /** Fixed peel rounds (oracle-pinned default). */
  val Rounds = 3

  private def ordLess(d1: org.apache.spark.sql.Column, v1: org.apache.spark.sql.Column,
      d2: org.apache.spark.sql.Column, v2: org.apache.spark.sql.Column) =
    d1 < d2 || (d1 === d2 && v1 < v2)

  /** Each triangle of the canonical edge set once, as (src, v, w) rows
    * (degree-ordered orientation: src is the (deg, id)-smallest corner
    * of its wedge, ord(v) < ord(w)). */
  private def triangles(edges: DataFrame): DataFrame = {
    val deg = edges.select(col("a").as("v")).unionAll(edges.select(col("b").as("v")))
      .groupBy(col("v")).agg(count(lit(1)).as("deg"))
    val withDeg = edges
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val directed = withDeg.select(
      when(ordLess(col("da"), col("a"), col("db"), col("b")), col("a")).otherwise(col("b")).as("src"),
      when(ordLess(col("da"), col("a"), col("db"), col("b")), col("b")).otherwise(col("a")).as("dst"),
      when(ordLess(col("da"), col("a"), col("db"), col("b")), col("db")).otherwise(col("da")).as("ddst"))
    val e1 = directed.select(col("src"), col("dst").as("v"), col("ddst").as("dv"))
    val e2 = directed.select(col("src"), col("dst").as("w"), col("ddst").as("dw"))
    e1.join(e2.hint("shuffle_hash"), Seq("src"))
      .filter(ordLess(col("dv"), col("v"), col("dw"), col("w")))
      .join(directed.select(col("src").as("v"), col("dst").as("w")).hint("shuffle_hash"),
        Seq("v", "w"), "left_semi")
      .select(col("src"), col("v"), col("w"))
  }

  /** Surviving edges of `rounds` peel rounds at threshold `k`, with the
    * support that passed the final check. `edges` are undirected
    * canonical pairs (srcCol < dstCol, deduped by the caller).
    *
    * RUN-TO-CONVERGENCE semantics: `rounds` is still the BOUND, but the
    * loop EXITS EARLY once a round drops no edge. Survivor edge sets
    * only ever SHRINK (support never recovers), so an unchanged survivor
    * COUNT means an unchanged edge set, identical triangles next round,
    * and identical support values — the exit can never change the result
    * the oracle pins. The probe is one `count()` over the frame the
    * round just checkpointed (materialized blocks — no recompute).
    * Fault tolerance: cuts go through [[Checkpoints.cut]] —
    * `localCheckpoint` by default (blocks die with their executor;
    * correct at local[32]); SPARK_GRAFT_CHECKPOINT_DIR flips them to
    * reliable `checkpoint` (same plan-truncation semantics, replicated
    * storage — exercised by ReliableCheckpointSpec and the
    * local-cluster run). */
  def peel(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
      k: Int = 4, rounds: Int = Rounds): DataFrame =
    peelWithRounds(edges, srcCol, dstCol, k, rounds)._1

  /** [[peel]] plus the number of rounds actually executed (exit at
    * fixpoint+1 — the round that proves stability counts). */
  def peelWithRounds(edges: DataFrame, srcCol: String = "a", dstCol: String = "b",
      k: Int = 4, rounds: Int = Rounds): (DataFrame, Int) = {
    require(k >= 3, s"k-truss needs k >= 3 (k-2 >= 1 triangles per edge): $k")
    require(rounds >= 1, s"need at least one round: $rounds")
    // Checkpoints.cut (lazy local checkpoint; the fixpoint probe each
    // round materializes it — see Checkpoints' materialize-before-release
    // discipline), not persist: one round's plan references
    // the previous round's frame ~12 times (degree join ×2, orientation
    // ×3 arms, closure), so UNCUT lineage grows ~12^r — the optimizer
    // and codegen choke on the plan tree long before any data is big
    // (measured: rounds=3 OOMs an 8 GB driver on a 1230-edge graph).
    // Checkpointing truncates the logical plan to the materialized
    // blocks, making every round's plan constant-size — the iterative-
    // operator analogue of Engine.boundedDist's chain bound.
    var e = Checkpoints.cut(
      edges.select(col(s"`$srcCol`").as("a"), col(s"`$dstCol`").as("b")))
    var sup: DataFrame = null
    var prevSurvivors = -1L
    var roundsRun = 0
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      r += 1
      val tri = triangles(e)
      // the 3 canonical edges of each triangle, one count per edge key;
      // support >= k-2 survivors ARE the next round's edge list (an
      // edge in no triangle has support 0 < 1 <= k-2 and is gone)
      sup = tri.select(explode(array(
          struct(least(col("src"), col("v")).as("a"), greatest(col("src"), col("v")).as("b")),
          struct(least(col("src"), col("w")).as("a"), greatest(col("src"), col("w")).as("b")),
          struct(least(col("v"), col("w")).as("a"), greatest(col("v"), col("w")).as("b")))).as("e"))
        .select(col("e.a").as("a"), col("e.b").as("b"))
        .groupBy(col("a"), col("b")).agg(count(lit(1)).as("support"))
        .filter(col("support") >= k - 2)
      sup = Checkpoints.cut(sup)
      val survivors = sup.count() // over the cut's materialized blocks
      stable = survivors == prevSurvivors
      prevSurvivors = survivors
      if (r < rounds && !stable) e = sup.select(col("a"), col("b"))
      roundsRun = r
    }
    (sup, roundsRun)
  }
}

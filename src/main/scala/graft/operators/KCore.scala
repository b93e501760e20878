package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded k-core peeling (Seidman '83 cores; the bulk-synchronous
  * peel of Montresor et al. '13): each round computes every vertex's
  * degree in the SURVIVING subgraph and drops vertices below k —
  * dropping a vertex lowers its neighbors' degrees, so peeling
  * cascades. The round count is FIXED (not run-to-convergence): the
  * result is the round-R snapshot, which equals the true k-core
  * whenever the cascade depth is ≤ R and is replayable by the oracle's
  * unrolled CTE chain either way (a convergence loop would make the
  * row count data-dependent and the oracle unwritable). Vertices with
  * zero surviving edges drop out of the degree table entirely, which
  * is the correct peel for any k ≥ 1.
  *
  * Scale shape per round: one map-side-combinable degree count over
  * the current edge list (edge rows are two longs — degree shuffles
  * ship ids, never adjacency) and two left-semi joins shrinking the
  * edge list to surviving endpoints. The edge list only ever SHRINKS,
  * so per-round cost is monotone non-increasing; each round's survivor
  * set is a vertex-id table small enough to broadcast long before the
  * edge list is. Round results persist under the PageRank cache
  * discipline (materialize, then release the previous round). */
object KCore {
  /** Fixed peel rounds (oracle-pinned default). */
  val Rounds = 3

  /** Survivors of `rounds` peel rounds at threshold `k`, with the
    * degree that passed the final check. `edges` are undirected
    * canonical pairs (srcCol < dstCol, deduped by the caller).
    *
    * RUN-TO-CONVERGENCE semantics: `rounds` is still the BOUND, but the
    * loop EXITS EARLY once a round drops no vertex. The probe is FREE —
    * it compares the survivor count the round ALREADY materializes
    * (`deg.count()`) against the previous round's: survivor sets only
    * ever SHRINK (a dropped vertex's degree can never recover), so equal
    * count ⇒ equal set ⇒ the next round's edge list, degree table, and
    * values are all identical — the exit can never change the result the
    * oracle pins, it only stops paying for confirmed stability. Rounds
    * cut through [[Checkpoints.cut]] — lazy localCheckpoint by default,
    * the reliable-dir switch for executor-churn deployments. */
  def peel(edges: DataFrame, srcCol: String = "doc_a",
      dstCol: String = "doc_b", k: Int = 3, rounds: Int = Rounds): DataFrame =
    peelWithRounds(edges, srcCol, dstCol, k, rounds)._1

  /** [[peel]] plus the number of rounds actually executed (the round
    * that proves stability counts — exit at fixpoint+1; ConvergenceSpec
    * asserts the early exit fires exactly there). */
  def peelWithRounds(edges: DataFrame, srcCol: String = "doc_a",
      dstCol: String = "doc_b", k: Int = 3, rounds: Int = Rounds): (DataFrame, Int) = {
    require(k >= 1, s"need a positive core threshold: $k")
    require(rounds >= 1, s"need at least one round: $rounds")
    // cut, not persist: a persisted round caches blocks but its
    // ANALYZED plan still stacks the prior lineage, and each round
    // references the previous edge list three times (degree union ×2,
    // semi-join probe) — the tree grows ~3^r and Catalyst reprocesses
    // it per action (the Truss 12^r lesson). The lazy cut truncates
    // each round to one LogicalRDD; the probe counts materialize it
    // (blocks reaped by the ContextCleaner on dereference).
    var e = Checkpoints.cut(
      edges.select(col(s"`$srcCol`").as("a"), col(s"`$dstCol`").as("b")))
    var deg: DataFrame = null
    var prevDeg: DataFrame = null
    var prevSurvivors = -1L
    var roundsRun = 0
    var r = 0
    var stable = false
    while (r < rounds && !stable) {
      r += 1
      val prevE = e
      // cut + materialize the degree table ONCE per round: both semi
      // joins below read the blocks instead of re-running the aggregate
      // (and the final round's table IS the answer)
      deg = Checkpoints.cut(
        prevE.select(col("a").as("v")).unionAll(prevE.select(col("b").as("v")))
          .groupBy(col("v")).agg(count(lit(1)).as("degree"))
          .filter(col("degree") >= k))
      val survivors = deg.count() // the materialization IS the probe
      stable = survivors == prevSurvivors
      prevSurvivors = survivors
      // the last round only checks — nobody consumes a further-shrunk
      // edge list, so don't build one
      if (r < rounds && !stable) {
        e = Checkpoints.cut(prevE
          .join(deg.select(col("v").as("__sa")), col("a") === col("__sa"), "left_semi")
          .join(deg.select(col("v").as("__sb")), col("b") === col("__sb"), "left_semi"))
        e.count() // materialize the round's cut
        // round r−1's blocks are dead the moment round r materializes:
        // free them NOW instead of waiting for the ContextCleaner
        // (bounded storage across arbitrarily many rounds — guide §5)
        Checkpoints.release(prevE)
        if (prevDeg ne null) Checkpoints.release(prevDeg)
        prevDeg = deg
      }
      roundsRun = r
    }
    // the final round's deg IS the answer; its predecessor is dead
    if (prevDeg ne null) Checkpoints.release(prevDeg)
    (deg.select(col("v"), col("degree").as("core_degree")), roundsRun)
  }
}

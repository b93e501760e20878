package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Synchronous label propagation (Raghavan et al. '07, deterministic
  * variant): every vertex starts as its own label; each round it adopts
  * the most frequent label among its neighbors, ties broken by the
  * SMALLEST label (the paper breaks ties randomly — the min tie-break
  * makes the fixed round count replayable by the oracle's unrolled CTE
  * chain). Isolated vertices keep their label. Communities emerge as
  * label plateaus; unlike connected components, dense cores absorb
  * their periphery while sparse bridges do not flip whole components.
  *
  * Scale shape per round: one hash join of the (persisted) symmetric
  * edge list against the current label table (labels are longs — the
  * join ships ids, never adjacency), one map-side-combinable
  * (vertex, label) count, and one per-vertex top-1 window whose
  * partitions are each vertex's DISTINCT neighbor-label set, never its
  * degree. Round count is fixed (not run-to-convergence) — the
  * bulk-synchronous contract that keeps cost linear and the answer
  * engine-independent. Known property of the synchronous variant:
  * bipartite structures (e.g. a bare edge) oscillate with period 2
  * rather than converge — deterministic, spec-pinned, and the reason
  * asynchronous LPA exists; consumers wanting a fixpoint should read
  * labels as the round-R snapshot they are. */
object LabelProp {
  /** Fixed synchronous rounds (oracle-pinned default). */
  val Rounds = 3

  /** Rounds for [[labelsStable]] — measured rounds-to-fixpoint on the
    * shipped co-order graphs is 3 (sf0.001) and 4 (sf0.01); 5 carries
    * margin (ConvergenceSpec re-measures every run). */
  val StableRounds = 5

  /** Community label per vertex after `rounds` synchronous updates.
    * `edges` are undirected pairs (srcCol, dstCol); both orientations
    * are derived here.
    *
    * CONTRACT: `rounds` is a BOUND — and for THIS rule (pure
    * most-frequent-NEIGHBOR label, no self-vote) it must be: measured on
    * the shipped co-order graphs, the labels never reach a fixpoint
    * (99/134 vertices still flip between rounds 3 and 4 at sf0.001, no
    * stability within 11 rounds, not even period-2) — the well-known
    * synchronous-LPA oscillation (Raghavan et al. '07 §3 adopt
    * asynchronous updates for exactly this reason). The shipped row is
    * the round-R phase, certified as such by the oracle's identical
    * unroll. Callers wanting a CONVERGED community structure use
    * [[labelsStable]]. */
  def labels(vertices: DataFrame, edges: DataFrame, vertexCol: String,
      srcCol: String = "doc_a", dstCol: String = "doc_b",
      rounds: Int = Rounds): DataFrame =
    labelsImpl(vertices, edges, vertexCol, srcCol, dstCol, rounds, selfVote = false)._1

  /** [[labels]] with a SELF-VOTE: the vertex's current label joins the
    * neighbor tally with one vote — the standard damping that removes
    * boundary flapping. Measured on the shipped graphs this reaches a
    * true fixpoint in 3–4 rounds (ConvergenceSpec pins
    * [[StableRounds]] covers it), where the undamped rule never
    * stabilizes. Same cost shape per round: the self votes are a
    * union-all of the current label table, no extra join.
    *
    * RUN-TO-CONVERGENCE semantics: `rounds` is still the BOUND, but the
    * loop EXITS EARLY once a round changes no label — rounds past the
    * fixpoint are identity by definition (the vote tally of a stable
    * labeling reproduces it), so the early exit can never change the
    * result the oracle pins; it only stops paying for confirmed
    * stability. The changed-label count rides the round's own
    * materialization pass (a join of two frames the round already
    * computed), so the probe is free. */
  def labelsStable(vertices: DataFrame, edges: DataFrame, vertexCol: String,
      srcCol: String = "doc_a", dstCol: String = "doc_b",
      rounds: Int = StableRounds): DataFrame =
    labelsStableWithRounds(vertices, edges, vertexCol, srcCol, dstCol, rounds)._1

  /** [[labelsStable]] plus the number of rounds actually executed (the
    * round that proves stability counts — exit at fixpoint+1).
    * ConvergenceSpec asserts the early exit fires exactly there. */
  def labelsStableWithRounds(vertices: DataFrame, edges: DataFrame, vertexCol: String,
      srcCol: String = "doc_a", dstCol: String = "doc_b",
      rounds: Int = StableRounds): (DataFrame, Int) =
    labelsImpl(vertices, edges, vertexCol, srcCol, dstCol, rounds, selfVote = true)

  private def labelsImpl(vertices: DataFrame, edges: DataFrame, vertexCol: String,
      srcCol: String, dstCol: String, rounds: Int,
      selfVote: Boolean): (DataFrame, Int) = {
    require(rounds >= 1, s"need at least one round: $rounds")
    import org.apache.spark.sql.expressions.Window
    val nodes = vertices.select(col(s"`$vertexCol`").as("v")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // persisted PRE-PARTITIONED on the per-round join key (guide §2.4:
    // operations keyed the same way share one exchange): every round
    // joins sym on `v`, and a cache that already carries
    // hashpartitioning(v) satisfies the join's distribution requirement
    // — the label table (nodes-sized) is the only side re-exchanged per
    // round, never the edge list (the big frame at every scale)
    val sym = edges.select(col(s"`$srcCol`").as("u"), col(s"`$dstCol`").as("v"))
      .union(edges.select(col(s"`$dstCol`").as("u"), col(s"`$srcCol`").as("v")))
      .distinct()
      .repartition(col("v"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    var lab = nodes.withColumn("label", col("v"))
    var prevCut: DataFrame = null
    var roundsRun = 0
    var stable = false
    var r = 0
    while (r < rounds && !stable) {
      r += 1
      val prev = lab
      val nbrVotes = sym
        .join(prev.select(col("v").as("__nv"), col("label")), col("v") === col("__nv"))
        .select(col("u"), col("label"))
      val next =
        if (selfVote) {
          // the self vote is TAGGED through the tally, so the vertex's
          // previous label comes back out of the same aggregation that
          // elects the new one: keep the rn=1 row (winner) and the
          // has-self row (the old label — with a self vote every vertex
          // has one), then one groupBy(u) that the window's own
          // hash-partitioning already satisfies (no extra shuffle, and
          // no per-vertex join at all — cheaper than the fixed-round
          // path's nodes join). The fixpoint probe below is then free.
          val votes = nbrVotes.withColumn("__self", lit(0))
            .unionAll(prev.select(col("v").as("u"), col("label")).withColumn("__self", lit(1)))
          val cnt = votes.groupBy(col("u"), col("label"))
            .agg(count(lit(1)).as("c"), max(col("__self")).as("__has_self"))
          val w = Window.partitionBy(col("u")).orderBy(col("c").desc, col("label"))
          cnt.withColumn("rn", row_number().over(w))
            .filter(col("rn") === 1 || col("__has_self") === 1)
            .groupBy(col("u"))
            .agg(max(when(col("rn") === 1, col("label"))).as("label"),
              max(when(col("__has_self") === 1, col("label"))).as("__old"))
            // domain pin: every vertex IN the domain has a self vote, so
            // __old is null exactly for edge endpoints absent from
            // `vertices` — dropping them keeps the output domain equal to
            // the fixed-round path's (which left-joins against nodes)
            // without any extra join, and keeps the fixpoint probe sound
            // (a null __old row would compare as null and silently never
            // count as changed)
            .filter(col("__old").isNotNull)
            .select(col("u").as("v"), col("label"), col("__old"))
        } else {
          val cnt = nbrVotes.groupBy(col("u"), col("label")).agg(count(lit(1)).as("c"))
          val w = Window.partitionBy(col("u")).orderBy(col("c").desc, col("label"))
          val top = cnt.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
            .select(col("u").as("v"), col("label").as("__new"))
          nodes.join(top, Seq("v"), "left")
            .select(col("v"), coalesce(col("__new"), col("v")).as("label"))
        }
      // cut, not persist: a persisted round caches its BLOCKS but its
      // analyzed plan still stacks the whole prior lineage, and each
      // round references the previous one 2-3 times — by round 5 the
      // logical tree measured ~13,000 Exchange nodes / 11 MB rendered,
      // and Catalyst reprocessed it per action (the Truss 12^r lesson).
      // The lazy cut truncates to one LogicalRDD per round; the probe
      // count below materializes it (blocks reaped by the
      // ContextCleaner when the round's RDD is dereferenced)
      val persisted = Checkpoints.cut(next)
      if (selfVote) {
        // materialization doubles as the fixpoint probe: 0 changed ⇒
        // every later round is identity — exit without touching the
        // result the oracle pins
        // null-safe: with the domain pin __old is never null, but a
        // null must read as "changed", never as "stable"
        stable = persisted.filter(!(col("label") <=> col("__old"))).count() == 0L
      } else {
        persisted.count() // materialize the round's cut
      }
      // round r−1's blocks are dead once round r is materialized: free
      // them NOW instead of waiting for the ContextCleaner (bounded
      // storage across arbitrarily many rounds — guide §5)
      if (prevCut ne null) Checkpoints.release(prevCut)
      prevCut = persisted
      lab = persisted.select(col("v"), col("label"))
      roundsRun = r
    }
    // the loop's result is materialized — the build-side caches must not
    // outlive the call (the PageRank cache discipline: hundreds of
    // queries share one session); the final round's cache backs the
    // returned frame, the same contract as before
    sym.unpersist()
    nodes.unpersist()
    (lab.select(col("v").as(vertexCol), col("label").as("community")), roundsRun)
  }
}

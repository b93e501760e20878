package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Convergence evidence for the FIXED-ROUND graph peels (Truss.Rounds =
  * KCore.Rounds = LabelProp.Rounds = 3): the shipped rounds-R results are
  * correct as pinned (the oracle unrolls the same R), but a user asking
  * for "the k-truss" gets the round-R approximation silently whenever the
  * cascade runs deeper. This spec MEASURES rounds-to-fixpoint on the
  * exact graph the oracle rows process (the thresholded lineitem
  * co-order graph of `graph_kcore`/`graph_ktruss`/`graph_label_prop`,
  * sf0.001) and pins that R = 3 covers it — if the testdata generator
  * ever changes the graph's shape enough to need a deeper cascade, this
  * fails loudly instead of the oracle silently certifying a shallower
  * answer.
  *
  * Contract documented here once for all three peel APIs: `rounds` is a
  * BOUND, not a convergence guarantee — callers needing the true
  * fixpoint raise `rounds` until two consecutive values agree (what
  * [[fixpointRounds]] does), exactly like the reference's bounded
  * enumeration surfaces bounds to the caller. */
class ConvergenceSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  private def haveData = new java.io.File(s"$sfDir/lineitem.parquet").exists()

  /** The shipped co-order graph (same construction as the oracle rows). */
  private lazy val pairs: DataFrame = {
    val lp = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val l1 = lp.select(col("ok"), col("p").as("s1"))
    val l2 = lp.select(col("ok").as("ok2"), col("p").as("s2"))
    l1.join(l2, col("ok") === col("ok2") && col("s1") < col("s2"))
      .select(col("s1").as("a"), col("s2").as("b")).distinct()
      .localCheckpoint()
  }

  /** Smallest r with peel(r) == peel(r+1) (canonicalized row sets),
    * failing past maxRounds. */
  private def fixpointRounds(peel: Int => DataFrame, maxRounds: Int): Int = {
    def canon(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet
    var prev = canon(peel(1))
    for (r <- 2 to maxRounds) {
      val cur = canon(peel(r))
      if (cur == prev) return r - 1
      prev = cur
    }
    fail(s"no fixpoint within $maxRounds rounds")
  }

  test("k-core peel reaches its fixpoint within the shipped Rounds = 3 on the shipped graph") {
    assume(haveData, s"$sfDir not present")
    val r = fixpointRounds(
      n => KCore.peel(pairs, srcCol = "a", dstCol = "b", k = 3, rounds = n), maxRounds = 8)
    assert(r <= KCore.Rounds,
      s"k-core needs $r rounds to converge on the shipped graph but ships Rounds = ${KCore.Rounds} — " +
        "raise Rounds (and the oracle's unroll) or re-adjudicate the bound")
  }

  test("k-truss peel reaches its fixpoint within the shipped Rounds = 3 on the shipped graph") {
    assume(haveData, s"$sfDir not present")
    val r = fixpointRounds(
      n => Truss.peel(pairs, srcCol = "a", dstCol = "b", k = 4, rounds = n), maxRounds = 8)
    assert(r <= Truss.Rounds,
      s"k-truss needs $r rounds to converge on the shipped graph but ships Rounds = ${Truss.Rounds}")
  }

  test("k-core and k-truss EARLY-EXIT at their measured fixpoints (run-to-convergence, results unchanged)") {
    assume(haveData, s"$sfDir not present")
    // k-core: with a generous bound the loop must stop within one round
    // of the fixpoint (the probe compares consecutive survivor COUNTS,
    // which can detect stability one round before full output equality
    // does — exit at f or f+1, never later), and the early-exited result
    // IS the fixpoint peel
    val fCore = fixpointRounds(
      n => KCore.peel(pairs, srcCol = "a", dstCol = "b", k = 3, rounds = n), maxRounds = 8)
    val (core, coreRounds) = KCore.peelWithRounds(pairs, "a", "b", k = 3, rounds = 8)
    assert(coreRounds <= fCore + 1 && coreRounds < 8,
      s"k-core ran $coreRounds rounds; fixpoint is $fCore (expected exit by ${fCore + 1})")
    val coreFix = KCore.peel(pairs, "a", "b", k = 3, rounds = fCore)
      .collect().map(_.toSeq).toSet
    assert(core.collect().map(_.toSeq).toSet == coreFix,
      "early-exited k-core diverged from the fixpoint peel")

    val fTruss = fixpointRounds(
      n => Truss.peel(pairs, srcCol = "a", dstCol = "b", k = 4, rounds = n), maxRounds = 8)
    val (truss, trussRounds) = Truss.peelWithRounds(pairs, "a", "b", k = 4, rounds = 8)
    assert(trussRounds <= fTruss + 1 && trussRounds < 8,
      s"k-truss ran $trussRounds rounds; fixpoint is $fTruss (expected exit by ${fTruss + 1})")
    val trussFix = Truss.peel(pairs, "a", "b", k = 4, rounds = fTruss)
      .collect().map(_.toSeq).toSet
    assert(truss.collect().map(_.toSeq).toSet == trussFix,
      "early-exited k-truss diverged from the fixpoint peel")
  }

  test("undamped label propagation OSCILLATES on the shipped graph — the documented limitation holds") {
    assume(haveData, s"$sfDir not present")
    // Measured adjudication (LabelProp.labels scaladoc): the pure
    // most-frequent-neighbor rule never stabilizes here (99/134 vertices
    // flip between rounds 3 and 4 at sf0.001; no fixpoint within 11
    // rounds, not even period-2) — synchronous-LPA oscillation, the
    // reason Raghavan et al. '07 adopt asynchronous updates. This pin
    // keeps the doc claim honest: if the testdata changes and the rule
    // starts converging, this fails and the scaladoc gets re-measured.
    val verts = pairs.select(col("a").as("part"))
      .unionAll(pairs.select(col("b").as("part"))).distinct()
    val e = pairs.select(col("a").as("doc_a"), col("b").as("doc_b"))
    def canon(n: Int): Set[Seq[Any]] =
      LabelProp.labels(verts, e, "part", rounds = n).collect().map(_.toSeq).toSet
    assert(canon(LabelProp.Rounds) != canon(LabelProp.Rounds + 1),
      "the undamped rule now converges on the shipped graph — update LabelProp.labels' scaladoc " +
        "and consider retiring the oscillation caveat")
  }

  test("self-vote label propagation reaches a true fixpoint within StableRounds on the shipped graph") {
    assume(haveData, s"$sfDir not present")
    val verts = pairs.select(col("a").as("part"))
      .unionAll(pairs.select(col("b").as("part"))).distinct()
    val e = pairs.select(col("a").as("doc_a"), col("b").as("doc_b"))
    val r = fixpointRounds(
      n => LabelProp.labelsStable(verts, e, "part", rounds = n), maxRounds = 8)
    assert(r <= LabelProp.StableRounds,
      s"labelsStable needs $r rounds on the shipped graph but ships StableRounds = ${LabelProp.StableRounds}")
  }

  test("labelsStable EARLY-EXITS at the measured fixpoint (run-to-convergence, result unchanged)") {
    assume(haveData, s"$sfDir not present")
    val verts = pairs.select(col("a").as("part"))
      .unionAll(pairs.select(col("b").as("part"))).distinct()
    val e = pairs.select(col("a").as("doc_a"), col("b").as("doc_b"))
    val f = fixpointRounds(
      n => LabelProp.labelsStable(verts, e, "part", rounds = n), maxRounds = 8)
    // with a generous bound the loop must stop at f+1 (the round that
    // PROVES stability), not run the bound out ...
    val (df, roundsRun) = LabelProp.labelsStableWithRounds(verts, e, "part", rounds = 8)
    assert(roundsRun == f + 1,
      s"early exit fired after $roundsRun rounds; fixpoint is $f (expected exit at ${f + 1})")
    // ... and the early-exited result IS the fixpoint labeling
    val canonF = LabelProp.labelsStable(verts, e, "part", rounds = f)
      .collect().map(_.toSeq).toSet
    assert(df.collect().map(_.toSeq).toSet == canonF,
      "early-exited labeling diverged from the fixpoint labeling")
  }

  test("labelsStable also converges within StableRounds at sf0.01 — the oracle row's own scale") {
    val dir01 = "/root/testdata/sf0.01"
    assume(new java.io.File(s"$dir01/lineitem.parquet").exists(), s"$dir01 not present")
    val lp = spark.read.parquet(s"$dir01/lineitem.parquet")
      .filter(col("l_quantity") > 45)
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
    val l1 = lp.select(col("ok"), col("p").as("s1"))
    val l2 = lp.select(col("ok").as("ok2"), col("p").as("s2"))
    val p01 = l1.join(l2, col("ok") === col("ok2") && col("s1") < col("s2"))
      .select(col("s1").as("a"), col("s2").as("b")).distinct().localCheckpoint()
    val verts = p01.select(col("a").as("part"))
      .unionAll(p01.select(col("b").as("part"))).distinct()
    val e = p01.select(col("a").as("doc_a"), col("b").as("doc_b"))
    val r = fixpointRounds(
      n => LabelProp.labelsStable(verts, e, "part", rounds = n), maxRounds = 8)
    assert(r <= LabelProp.StableRounds,
      s"labelsStable needs $r rounds at sf0.01 but ships StableRounds = ${LabelProp.StableRounds}")
  }
}

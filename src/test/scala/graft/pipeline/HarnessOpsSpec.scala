package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the second late-round-10 batch: real WAV PCM decode, NDV
  * sketch profile, SimHash recall harness, Jaccard threshold sweep,
  * clustering depth, and k-fold assignment. */
class HarnessOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("wavPcmStats: decoded samples match the generator formula exactly") {
    val docs = Seq(0L, 1L, 7L, 33L).toDF("doc_id") // 33 shares seed 1 with doc 1
    val out = MultiModal.wavPcmStats(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    for (id <- Seq(0L, 1L, 7L, 33L)) {
      val seed = MultiModal.wavSeed(id)
      val n = MultiModal.wavN(seed)
      val samples = (0 until n).map(MultiModal.wavSample(seed, _))
      val expect = (MultiModal.wavRate(seed).toLong, n.toLong,
        samples.map(_.toLong).sum, samples.map(s => math.abs(s.toLong)).max,
        samples.map(s => s.toLong * s).sum)
      assert(out(id) == expect, s"doc $id")
    }
    // same waveform seed => identical stats (the dedup grouping key)
    assert(out(1L) == out(33L))
  }

  test("ndvProfile: exact counts below k, sketch within tolerance above") {
    val df = (0L until 1000L).map(i => (i, (i % 7).toString)).toDF("big", "small")
    val out = Profile.ndvProfile(df, Seq("big", "small"), k = 64).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(3)))).toMap
    // 7 < k: exact
    assert(out("small") == ((7L, 7.0)))
    // 1000 > k: the estimator uses exactly k minima and lands near truth
    assert(out("big")._1 == 64L)
    assert(math.abs(out("big")._2 - 1000.0) / 1000.0 < 0.5,
      s"KMV estimate ${out("big")._2} too far from 1000")
  }

  test("ndvProfile: nulls are not values (all-null column vanishes, mixed column counts non-nulls)") {
    val df = Seq((Some("a"), Option.empty[String]), (Some("a"), None), (None, None))
      .toDF("mixed", "empty")
    val out = Profile.ndvProfile(df, Seq("mixed", "empty")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out("mixed") == 1L)
    assert(!out.contains("empty"), "a column with no values has no distinct-count row")
  }

  test("simhashRecall: exact duplicates are truth pairs the Hamming gate always finds") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"), // exact dup of 1
      (3L, "one two three four five six seven"),
      (4L, "unrelated words entirely different content here"),
    ).toDF("doc_id", "text")
    val r = Dedup.simhashRecall(docs, "doc_id", "text").collect()(0)
    val (nTruth, nHits, recall) = (r.getLong(0), r.getLong(2), r.getDouble(3))
    assert(nTruth == 1L, "only the exact-dup pair clears the Jaccard threshold")
    assert(nHits == 1L && recall == 1.0, "hamming 0 is always within the radius")
  }

  test("jaccardThresholdSweep: deciles and cumulative counts by hand") {
    // identical docs => decile 10; fully distinct shingles never pair
    val docs = Seq(
      (1L, "a b c d e"),     // shingles {abc,bcd,cde}
      (2L, "a b c d e"),     // J(1,2)=1.0 -> decile 10
      (3L, "a b c x y"),     // J(1,3)=1/5 -> decile 2
      (4L, "p q r s t"),     // no shared shingles with anyone
    ).toDF("doc_id", "text")
    val out = Dedup.jaccardThresholdSweep(docs, "doc_id", "text").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2))).sortBy(-_._1)
    // (1,2): J=1.0 -> decile 10; (1,3) and (2,3): J=1/5 -> decile 2;
    // doc 4 shares no shingle and never becomes a candidate
    assert(out.toSeq == Seq((1.0, 1L, 1L), (0.2, 2L, 3L)))
  }

  test("clusterDepth: disjoint reads 1, nested reads n, touching counts as overlap") {
    val files = Seq(
      // disjoint group
      ("dj", 0L, 9L), ("dj", 10L, 19L), ("dj", 20L, 29L),
      // nested group: every interval contains the next
      ("ne", 0L, 100L), ("ne", 10L, 90L), ("ne", 20L, 80L),
      // touching group: max of one == min of the next
      ("to", 0L, 10L), ("to", 10L, 20L),
    ).toDF("g", "mn", "mx")
    val out = graft.operators.Layout.clusterDepth(files, "g", "mn", "mx").collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out("dj") == ((3L, 1L, 1.0)))
    assert(out("ne") == ((3L, 3L, 2.0)))   // depths at opens: 1,2,3
    assert(out("to") == ((2L, 2L, 1.5)))   // the shared point is depth 2
  }

  test("kfold: stable per id, within range, independent of other rows") {
    val a = Splits.kfold(Seq(1L, 2L, 3L, 4L, 5L).toDF("id"), "id", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Splits.kfold(Seq(3L, 5L, 99L).toDF("id"), "id", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    a.values.foreach(f => assert(f >= 0 && f < 5))
    assert(a(3L) == b(3L) && a(5L) == b(5L), "fold is a function of (id, salt) alone")
    // a different salt draws an independent assignment (not a constant shift)
    val c = Splits.kfold((0L until 64L).toDF("id"), "id", k = 5, salt = "other")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val d = Splits.kfold((0L until 64L).toDF("id"), "id", k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert((0L until 64L).exists(i => c(i) != d(i)))
  }
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Round-5 corpus operators: tf-idf term extraction, sliding-window
  * chunking, duplicated-span detection, temperature mixing, sharded
  * shuffle order, and int8 embedding quantization. The cross-engine
  * numerics are pinned by the oracle entries; these pin the operator
  * semantics on controlled fixtures. */
class CorpusOpsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "apple banana apple cherry"),
    (1L, "apple banana banana date"),
    (2L, "unique words only here"),
  ).toDF("doc_id", "text")

  test("tfidf ranks rare terms above common ones within a document") {
    val r = TextPipeline.tfidfTopTerms(docs, "doc_id", "text", topK = 2)
      .collect().map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3), x.getDouble(4)))
    val doc0 = r.filter(_._1 == 0L).sortBy(-_._5)
    // doc 0: cherry tf=1 df=1 → 3.0; apple tf=2 df=2 → 3.0; banana tf=1 df=2 → 1.5
    // top-2 at equal score 3.0 tie-break by token: apple before cherry
    assert(doc0.map(_._2).toSeq == Seq("apple", "cherry") ||
      doc0.map(x => (x._2, x._5)).toSet == Set(("apple", 3.0), ("cherry", 3.0)))
    assert(r.count(_._1 == 0L) == 2 && r.count(_._1 == 1L) == 2)
    // score formula: tf * N / df with N=3
    assert(r.find(x => x._1 == 0L && x._2 == "apple").forall(_._5 == 2.0 * 3 / 2))
  }

  test("chunkTokens covers every token exactly once per stride step, final chunk short") {
    val one = Seq((1L, (1 to 80).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val r = TextPipeline.chunkTokens(one, "doc_id", "text", window = 32, stride = 24)
      .collect().map(x => (x.getLong(1), x.getLong(2), x.getLong(3)))
      .sortBy(_._1)
    // starts: 1, 25, 49 → spans [1,32] [25,56] [49,80]; the arithmetic
    // start 73 is dropped (its predecessor already reached token 80)
    assert(r.map(_._2).toSeq == Seq(1L, 25L, 49L))
    assert(r.map(_._3).toSeq == Seq(32L, 32L, 32L))
    assert(r.map(_._1).toSeq == Seq(1L, 2L, 3L))
    // union of [start, start+n) covers 1..80
    val covered = r.flatMap { case (_, s, n) => s until (s + n) }.toSet
    assert(covered == (1L to 80L).toSet)
  }

  test("chunkTokens drops trailing starts already covered; short docs yield one chunk") {
    // 33 tokens, window 32, stride 24: starts 1, 25; a start at 49 never
    // exists, and start 25's chunk [25,33] adds tokens 33 > 32 → kept
    val d = Seq((1L, (1 to 33).map(_.toString).mkString(" ")), (2L, "a b")).toDF("doc_id", "text")
    val r = TextPipeline.chunkTokens(d, "doc_id", "text", 32, 24).collect()
      .map(x => (x.getLong(0), x.getLong(2), x.getLong(3)))
    assert(r.filter(_._1 == 1L).map(t => (t._2, t._3)).toSet == Set((1L, 32L), (25L, 9L)))
    assert(r.filter(_._1 == 2L).map(t => (t._2, t._3)).toSet == Set((1L, 2L)))
    // 32 tokens exactly: start 25 would re-cover [25,32] with no new
    // tokens (prev end 32 = n) → dropped, single full chunk
    val exact = Seq((3L, (1 to 32).map(_.toString).mkString(" "))).toDF("doc_id", "text")
    val re = TextPipeline.chunkTokens(exact, "doc_id", "text", 32, 24).collect()
    assert(re.length == 1 && re.head.getLong(3) == 32L)
  }

  test("dupNgramSpans finds the planted cross-document span and ignores within-doc-only repeats") {
    val phrase = "one two three four five six"
    val d = Seq(
      (1L, s"intro $phrase tail words here"),
      (2L, s"other start $phrase different end"),
      (3L, s"$phrase $phrase"), // within-doc repeat, also cross-doc
      (4L, "no shared content in this document at all"),
    ).toDF("doc_id", "text")
    val r = Dedup.dupNgramSpans(d, "doc_id", "text", n = 6, topK = 10)
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val planted = r.find(_._1 == md5Hex(phrase))
    assert(planted.exists(p => p._2 == 3L && p._3 == 4L),
      s"expected planted span in 3 docs with 4 occurrences, got $r")
    // every reported span is genuinely cross-document
    assert(r.forall(_._2 >= 2))
  }

  test("exciseDupSpans cuts exactly the shared-span tokens, untouched docs keep their text") {
    val phrase = "one two three four five six"
    val d = Seq(
      (1L, s"alpha $phrase omega"),
      (2L, s"beta $phrase gamma delta"),
      (3L, "entirely unique text with no shared spans at all here"),
      (4L, phrase), // nothing but the shared span → fully excised
    ).toDF("doc_id", "text")
    val r = Dedup.exciseDupSpans(d, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getString(3)))).toMap
    assert(r(1L) == ((8L, 6L, md5Hex("alpha omega"))))
    assert(r(2L) == ((9L, 6L, md5Hex("beta gamma delta"))))
    assert(r(3L) == ((10L, 0L, md5Hex("entirely unique text with no shared spans at all here"))))
    assert(r(4L) == ((6L, 6L, md5Hex(""))))
  }

  private def md5Hex(s: String): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    d.map("%02x".format(_)).mkString
  }

  test("temperatureMix keeps the smallest stratum whole and flattens larger ones toward sqrt") {
    val rows = (1 to 400).map(i => (i.toLong, if (i <= 320) "big" else "small"))
    val d = rows.toDF("doc_id", "lang")
    val r = Sampling.temperatureMix(d, "doc_id", "lang")
    val got = r.groupBy("lang").agg(count(lit(1)).as("n")).collect()
      .map(x => (x.getString(0), x.getLong(1))).toMap
    assert(got("small") == 80L) // rate 1.0: kept whole
    // big: rate sqrt(80/320)=0.5, expectation 160; the 4-hex grid draw
    // should land well within ±5σ (σ≈9)
    assert(got("big") > 115L && got("big") < 205L, s"big stratum kept ${got("big")}")
    // deterministic: a second run keeps the identical row set
    val again = Sampling.temperatureMix(d.repartition(7), "doc_id", "lang")
    assert(r.select("doc_id").collect().map(_.getLong(0)).toSet ==
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("shuffleOrder emits a dense 1..n_shard rank per shard and a stable permutation") {
    val d = (1 to 200).map(_.toLong).toDF("doc_id")
    val r = Splits.shuffleOrder(d, "doc_id", numShards = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.length == 200 && r.map(_._1).toSet.size == 200)
    for ((_, rows) <- r.groupBy(_._2))
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    // stability across partitioning
    val again = Splits.shuffleOrder(d.repartition(13), "doc_id", numShards = 4)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2))).toSet
    assert(again == r.toSet)
    // not the identity order: the permutation actually shuffles
    val inOrder = r.filter(_._2 == r.head._2).sortBy(_._3).map(_._1)
    assert(inOrder != inOrder.sorted)
  }

  test("leakage-safe split: a near-dup cluster never straddles splits") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"), // near-dup of 1
      (3L, "completely unrelated content lives here in this doc"),
      (4L, "the quick brown fox jumps over the lazy dog today"), // exact dup of 1
    ).toDF("doc_id", "text")
    val clusters = Dedup.nearDupClusters(d, "doc_id", "text")
    val split = Splits.hashSplit(clusters, "cluster_id")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"), r.getAs[String]("split")))
    // docs 1, 2, 4 share a cluster → identical split assignment
    val dupSplits = split.filter(x => Set(1L, 2L, 4L).contains(x._1)).map(_._3).toSet
    assert(dupSplits.size == 1, s"near-dup cluster straddles splits: $split")
    // every cluster maps to exactly one split
    for ((_, rows) <- split.groupBy(_._2))
      assert(rows.map(_._3).toSet.size == 1)
  }

  test("quantizeInt8 codes bound by ±127, exact round-trip bound, zero vector safe") {
    val d = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 2.0f)),
      (2L, Array(0.0f, 0.0f, 0.0f, 0.0f)),
      (3L, Array(-3.0f, 1.5f, 0.75f, -0.1f)),
    ).toDF("vec_id", "embedding")
    val r = Embeddings.quantizeInt8(d).collect().map { x =>
      (x.getLong(0), x.getDouble(1), x.getDouble(2), x.getSeq[Int](3), x.getLong(4))
    }
    val byId = r.map(x => x._1 -> x).toMap
    assert(byId(1L)._2 == 2.0 && byId(1L)._3 == 2.0 / 127)
    assert(byId(2L)._4.forall(_ == 0) && byId(2L)._3 == 0.0 && byId(2L)._5 == 0L)
    for ((_, amax, scale, codes, l1) <- r) {
      assert(codes.forall(c => c >= -127 && c <= 127))
      assert(l1 == codes.map(c => math.abs(c).toLong).sum)
      if (amax > 0) assert(math.abs(codes.max) == 127 || math.abs(codes.min) == 127)
    }
    // round-trip: |x − code·scale| ≤ scale/2 (symmetric quantizer bound)
    val orig = Map(1L -> Array(0.5, -1.0, 0.25, 2.0), 3L -> Array(-3.0, 1.5, 0.75, -0.1))
    for ((id, xs) <- orig; (x, c) <- xs.zip(byId(id)._4))
      assert(math.abs(x - c * byId(id)._3) <= byId(id)._3 / 2 + 1e-12)
  }

  test("centroid drift: planted unit shift measured exactly, one-sided labels excluded") {
    val d = Seq(
      // label 0: even-half at origin, odd-half shifted +1 in dim 1
      (0L, Array(0f, 0f, 0f, 0f), 0),
      (2L, Array(0f, 0f, 0f, 0f), 0),
      (1L, Array(1f, 0f, 0f, 0f), 0),
      (3L, Array(1f, 0f, 0f, 0f), 0),
      // label 1: no odd-half member → must be excluded
      (4L, Array(1f, 1f, 1f, 1f), 1),
    ).toDF("vec_id", "embedding", "label")
    val r = Embeddings.centroidDrift(d, dim = 4).collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getLong(2), x.getLong(3)))).toMap
    // drift² = (2^20)² exactly: the +1 shift quantizes to one full scale
    assert(r == Map(0L -> ((2L, 2L, 1048576L * 1048576L))))
  }
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the sixth late-round-10 batch: content-defined chunking,
  * the IVF-restricted kNN graph, and the temporal embargo split. */
class ChunkGraphOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("cdcChunks: boundaries are content-local — an edit re-cuts one chunk only") {
    // 60 shared words; doc 2 prepends one word (the classic shift that
    // breaks fixed-size segmentation)
    val shared = (1 to 60).map(i => s"w$i").mkString(" ")
    val docs = Seq((1L, shared), (2L, "intro " + shared)).toDF("doc_id", "text")
    val out = TextPipeline.cdcChunks(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // content-defined: every chunk fully inside the shared suffix has
    // identical content in both docs, so the duplicated-chunk count is
    // within 1-2 of the chunk count (only the first chunk differs)
    val (n1, d1, _) = out(1L)
    val (n2, d2, _) = out(2L)
    assert(d1 >= n1 - 2, s"doc 1: $d1 of $n1 chunks shared after a 1-word prepend in doc 2")
    assert(d2 >= n2 - 2, s"doc 2: $d2 of $n2 chunks shared")
    assert(d1 > 0, "resynchronization found shared chunks at all")
  }

  test("cdcChunks: short docs are one chunk; chunk counts match a scala replay") {
    val docs = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val out = TextPipeline.cdcChunks(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) == ((1L, 1L)), "below-window doc = single chunk, duplicated across docs")
    assert(out(2L) == ((1L, 1L)))
  }

  test("knnGraph: ranks are dense per vector, exclude self, and respect cell boundaries") {
    val out = Ann.knnGraph(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet"))
    val rows = out.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (v, _, n, _) => v != n }, "no self edges")
    val byVec = rows.groupBy(_._1)
    for ((v, es) <- byVec) {
      val ranks = es.map(_._2).sorted
      assert(ranks.head == 1L && ranks.toList == (1L to ranks.last).toList,
        s"dense ranks for $v")
      assert(ranks.last <= Ann.KnnK)
      // sims non-increasing with rank
      val ordered = es.sortBy(_._2).map(_._4)
      assert(ordered.zip(ordered.tail).forall { case (a, b) => a >= b }, s"sims sorted for $v")
    }
  }

  test("corrMatrix: perfect/anti/zero-variance pairs read their closed forms") {
    val df = (1 to 10).map(i => (i.toDouble, 2.0 * i, -3.0 * i, 7.0))
      .toDF("a", "b", "c", "k")
    val out = Profile.corrMatrix(df, Seq("a", "b", "c", "k")).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    assert(out(("a", "b")).exists(v => math.abs(v - 1.0) < 1e-12))
    assert(out(("a", "c")).exists(v => math.abs(v + 1.0) < 1e-12))
    assert(out(("a", "k")).isEmpty, "constant column -> null, not NaN")
    assert(out.size == 6)
  }

  test("semanticClusters: sizes sum to the corpus and mutual edges only merge") {
    val out = Ann.semanticClusters(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val total = out.map { case (sz, n) => sz * n }.sum
    assert(total == 500L, s"every vector lands in exactly one cluster: $out")
    assert(out.keys.exists(_ >= 2L), "some mutual pair actually merged")
  }

  test("knnRecall: hits bound by truth; recall in (0, 1]") {
    val out = Ann.knnRecall(
      spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")).collect().head
    val (truth, hit, recall) = (out.getLong(0), out.getLong(1), out.getDouble(2))
    assert(truth == Ann.NumQueries.toLong * Ann.KnnK)
    assert(hit >= 1L && hit <= truth)
    assert(recall > 0.0 && recall <= 1.0)
    assert(math.abs(recall - hit.toDouble / truth) < 1e-3)
  }

  test("layout skip stats: z-order reads fewer files than linear on 2D boxes") {
    val rows = graft.SparkEntry.queries("layout_skip_measured")(
      spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getString(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(rows.size == 8, "2 layouts x 4 queries")
    for (((_, _), (nf, nr)) <- rows) { assert(nf == 64L && nr <= nf) }
    val linReads = (1 to 4).map(q => rows(("linear", q.toLong))._2).sum
    val zoReads = (1 to 4).map(q => rows(("zorder", q.toLong))._2).sum
    assert(zoReads < linReads,
      s"z-order skips more across the 2D query set: zorder $zoReads vs linear $linReads")
    // the pk-band query (4) cannot be pruned by the ok-clustered layout
    assert(rows(("linear", 4L))._2 == 64L)
  }

  test("timeEmbargoSplit: gap discipline holds and counts partition the input") {
    val ts = (0L until 100L).map(_ * 10L)
    val df = ts.toDF("t")
    val out = Splits.timeEmbargoSplit(df, col("t"), embargoUs = 50L).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // span 0..990, cutoff = 0 + 990*7/10 = 693; train < 693, test >= 743
    assert(out("train")._1 + out("embargo")._1 + out("test")._1 == 100L)
    assert(out("train")._3 < 693L)
    assert(out("test")._2 >= 743L)
    assert(out("test")._2 - out("train")._3 >= 50L, "embargo gap enforced")
    assert(out("embargo")._2 >= 693L && out("embargo")._3 < 743L)
  }
}

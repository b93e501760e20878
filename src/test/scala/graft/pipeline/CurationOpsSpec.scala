package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the fourth late-round-10 batch: image-quality gate,
  * per-doc corpus novelty, and ER cluster statistics. */
class CurationOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("imageQuality: moments match the generator, flat seeds flag, flags by hand") {
    // seeds 0 and 5 (doc 0, doc 5) are flat by construction; seed 1 is patterned
    val docs = Seq(0L, 1L, 5L).toDF("doc_id")
    val out = MultiModal.imageQuality(docs).collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(3), r.getLong(4), r.getLong(5), r.getBoolean(6), r.getBoolean(7), r.getBoolean(8))))
      .toMap
    for (id <- Seq(0L, 1L, 5L)) {
      val s = MultiModal.pixelSeed(id)
      val w = MultiModal.pixelWidth(s); val h = MultiModal.pixelHeight(s)
      val vals = for (y <- 0 until h; x <- 0 until w) yield MultiModal.qcLuma(s, x, y).toLong
      val n = vals.length.toLong; val sum = vals.sum; val ss = vals.map(v => v * v).sum
      val expect = (n, sum, n * ss - sum * sum,
        n * ss == sum * sum, sum < 64L * n, sum > 192L * n)
      assert(out(id) == expect, s"doc $id")
    }
    // flat seeds read exactly zero variance; seed 0 is also dark (luma 0)
    assert(out(0L)._4 && out(0L)._5)
    assert(out(5L)._4 && !out(5L)._6)
    assert(!out(1L)._4, "the patterned seed is not flat")
  }

  test("imageHistogram: bins replay the generator; sparse, and counts sum to the pixel grid") {
    val docs = Seq(0L, 1L).toDF("doc_id")
    val out = MultiModal.imageHistogram(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (id <- Seq(0L, 1L)) {
      val s = MultiModal.pixelSeed(id)
      val w = MultiModal.pixelWidth(s); val h = MultiModal.pixelHeight(s)
      val expect = (for (y <- 0 until h; x <- 0 until w)
        yield MultiModal.qcLuma(s, x, y) / 16)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = out.collect { case ((d, b), n) if d == id => b.toInt -> n }
      assert(got.toMap == expect.map { case (k, v) => k -> v }, s"doc $id")
      assert(got.values.sum == w.toLong * h)
    }
    // flat seed 0 renders ONE bin; patterned seed 1 renders several
    assert(out.keys.count(_._1 == 0L) == 1)
    assert(out.keys.count(_._1 == 1L) > 4)
  }

  test("noveltyPerDoc: first occurrence wins by id order; short docs report null novelty") {
    val docs = Seq(
      (1L, "a b c d"),    // shingles {abc, bcd}: both first here
      (2L, "a b c x"),    // {abc, bcx}: abc seen in 1 -> novelty 1/2
      (3L, "a b c d"),    // exact dup of 1 -> novelty 0
      (4L, "zz"),         // too short: 0 grams, null novelty
    ).toDF("doc_id", "text")
    val out = Dedup.noveltyPerDoc(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))).toMap
    assert(out(1L) == ((2L, 2L, Some(1.0))))
    assert(out(2L) == ((2L, 1L, Some(0.5))))
    assert(out(3L) == ((2L, 0L, Some(0.0))))
    assert(out(4L) == ((0L, 0L, None)), "gram-less docs stay present with null novelty")
  }

  test("er cluster stats shape: sizes sum to total, singletons included") {
    // hand-built clustering: pairs (a,b), (b,c) -> one 3-cluster; d,e singletons
    val names = Seq("a", "b", "c", "d", "e").toDF("name")
    val pairs = Seq(("a", "b"), ("b", "c")).toDF("doc_a", "doc_b")
    val sizes = Dedup.clustersFromPairs(names, pairs, "name")
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
    val total = sizes.agg(sum(col("sz")).as("__total"))
    val hist = sizes.groupBy(col("sz").as("cluster_size"))
      .agg(count(lit(1)).as("n_clusters"), sum(col("sz")).as("n_records"))
      .crossJoin(broadcast(total))
      .select(col("cluster_size"), col("n_clusters"), col("n_records"),
        round(col("n_records").cast("double") / col("__total").cast("double"), 4).as("pct"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(hist(3L) == ((1L, 3L, 0.6)))
    assert(hist(1L) == ((2L, 2L, 0.4)))
  }
}

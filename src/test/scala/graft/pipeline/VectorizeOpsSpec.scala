package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the third late-round-10 batch: feature hashing, char-Gini,
  * snapshot diff, and degree assortativity. */
class VectorizeOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("hashEmbed: weights are signed occurrence counts; repeated tokens accumulate") {
    val docs = Seq((1L, "x x x"), (2L, "x y"), (3L, "")).toDF("doc_id", "text")
    val out = TextPipeline.hashEmbed(docs, "doc_id", "text", dim = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // token 'x' hashes to one (dim, sign); three occurrences = 3x the weight
    val xEntries = out.filter(_._1._1 == 1L)
    assert(xEntries.size == 1)
    val ((_, xDim), w3) = xEntries.head
    assert(math.abs(w3) == 3L)
    assert(out((2L, xDim)) == w3 / 3, "doc 2 has one 'x': a third of doc 1's weight")
    // whitespace tokenizer quirk: empty text yields one "" token, so
    // doc 3 still contributes a single signed unit (documented parity)
    assert(out.count(_._1._1 == 3L) == 1)
    // dims stay in range
    out.keys.foreach { case (_, d) => assert(d >= 0 && d < 8) }
  }

  test("hashEmbed: opposite-sign collisions cancel instead of inflating") {
    // construct a synthetic check at dim=2: weights are bounded by token
    // count, never amplified (the signed-hash debiasing property)
    val docs = Seq((1L, (1 to 40).map(i => s"tok$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextPipeline.hashEmbed(docs, "doc_id", "text", dim = 2).collect()
    assert(out.map(r => math.abs(r.getLong(2))).sum <= 40L)
  }

  test("charGini: uniform and degenerate distributions read their closed forms") {
    val docs = Seq(
      (1L, "aaaa"),   // one char: gini 0
      (2L, "abcd"),   // 4 uniform: 1 - 4/16 = 0.75
      (3L, "aab"),    // counts 2,1: 1 - 5/9 = 0.4444
    ).toDF("doc_id", "text")
    val out = TextPipeline.charGini(docs, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out(1L) == ((4L, 1L, 0.0)))
    assert(out(2L) == ((4L, 4L, 0.75)))
    assert(out(3L) == ((3L, 2L, 0.4444)))
  }

  test("snapshotDiff: round-trips through applyChangelog, and the diff is minimal") {
    val before = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0))
      .toDF("k", "s", "v")
    val after = Seq((1L, "a", 10.0), (2L, "B", 20.0), (4L, "d", 41.0), (5L, "e", 50.0))
      .toDF("k", "s", "v")
    val diff = graft.sources.Warehouse.snapshotDiff(before, after, "k")
    val ops = diff.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops == Map(2L -> "U", 3L -> "D", 4L -> "U", 5L -> "I"),
      "unchanged key 1 must NOT appear")
    // the extracted changelog reproduces `after` exactly
    val replayed = graft.sources.Warehouse.applyChangelog(before, diff, "k")
    val l = replayed.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val r = after.collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(l == r)
  }

  test("snapshotDiff: null-safe compares (null -> value and value -> null are updates)") {
    val before = Seq((1L, Option.empty[String]), (2L, Some("x"))).toDF("k", "s")
    val after = Seq((1L, Some("y")), (2L, Option.empty[String])).toDF("k", "s")
    val ops = graft.sources.Warehouse.snapshotDiff(before, after, "k").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(ops == Map(1L -> "U", 2L -> "U"))
  }

  test("assortativity: perfect star reads -1, regular ring reads null (zero variance)") {
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L)).toDF("a", "b")
    val s = graft.operators.Triangles.assortativity(star).collect()(0)
    assert(s.getLong(0) == 3L && s.getDouble(1) == -1.0)
    // 4-ring: every node degree 2 — zero degree variance, r undefined
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (1L, 4L)).toDF("a", "b")
    val r = graft.operators.Triangles.assortativity(ring).collect()(0)
    assert(r.getLong(0) == 4L && r.isNullAt(1))
  }
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Independent laws for [[Ann.ivfNprobeTopK]] (the FIXTURES.md §4
  * discipline — the oracle shares the coarse-chain generators, so the
  * checks here hold regardless of any shared constant):
  *
  *  1. PROBE DOMINANCE: widening the probe can only improve the answer
  *     — per query, best-sim(nprobe = 2) ≥ best-sim(nprobe = 1),
  *     because the nprobe = 2 candidate set is a superset.
  *  2. EXHAUSTIVE PROBE = EXACT: with nprobe = nlist every cell is
  *     searched, so the result must equal brute-force cosine top-1
  *     row-for-row — the strongest possible anchor, shared with no
  *     generator (cosineTopK never touches centroids).
  */
class AnnNprobeSpec extends SparkTestBase {

  private val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    .select(col("vec_id"), col("embedding"))

  test("probe dominance: nprobe=2 best sim >= single-probe best sim, per query") {
    val one = Ann.ivfTopK(emb).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val two = Ann.ivfNprobeTopK(emb, nprobe = 2).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(one.keySet == two.keySet)
    val regressed = one.collect { case (q, s1) if two(q) < s1 => (q, s1, two(q)) }
    assert(regressed.isEmpty, s"widening the probe LOST similarity: $regressed")
    // and non-vacuous on this corpus: at least one query actually improves
    assert(one.exists { case (q, s1) => two(q) > s1 },
      "no query improved under nprobe=2 — the dominance check proved nothing here")
  }

  test("exhaustive probe (nprobe = nlist) == brute-force exact top-1") {
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val exhaustive = rows(Ann.ivfNprobeTopK(emb, nprobe = Ann.NumCentroids))
    val brute = rows(Ann.cosineTopK(emb, k = 1))
    assert(exhaustive == brute,
      s"missing=${(brute -- exhaustive).take(3)} extra=${(exhaustive -- brute).take(3)}")
  }
}

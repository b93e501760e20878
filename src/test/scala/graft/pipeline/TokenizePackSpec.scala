package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Structural invariants of [[TextPipeline.tokenizePack]] — the
  * cross-engine hash check is the `pipeline_tokenize_pack` oracle row;
  * this spec pins the packing facts any input must satisfy, at
  * sf0.001. */
class TokenizePackSpec extends SparkTestBase {

  private val sf = "/root/testdata/sf0.001"

  test("packed sequences tile the token tape exactly") {
    val docs = spark.read.parquet(s"$sf/documents.parquet")
    val packed = TextPipeline.tokenizePack(docs, "doc_id", "text").persist()
    try {
      val cap = Packing.Capacity
      val n = packed.count()
      assert(n > 1, "corpus packed into <= 1 sequence — invariants vacuous")
      // every sequence id in [0, n) appears exactly once (the tape has
      // no holes), and all but the last carry exactly `capacity` tokens
      assert(packed.agg(min(col("seq_id")), max(col("seq_id"))).head().toSeq
        == Seq(0L, n - 1))
      val short = packed.filter(col("seq_id") < n - 1 && col("n_tokens") =!= cap).count()
      assert(short == 0, s"$short non-final sequences are not capacity-full")
      assert(packed.filter(col("seq_id") === n - 1)
        .head().getAs[Long]("n_tokens") <= cap)
      // shard is the deterministic residue, docs-per-sequence is sane
      assert(packed.filter(
        col("shard") =!= pmod(col("seq_id"), lit(TextPipeline.PackShards.toLong))).count() == 0)
      assert(packed.filter(col("n_docs") < 1).count() == 0)
      // total token mass equals the corpus's BPE token count (the same
      // trained merges applied per document) — packing loses nothing
      val merges = TextPipeline.bpeTrain(docs, "doc_id", "text")
        .orderBy(col("rank")).collect().map(r => (r.getString(1), r.getString(2))).toSeq
      val total = TextPipeline.bpeApply(docs, "doc_id", "text", merges)
        .agg(sum(col("n_tokens"))).head().getLong(0)
      val packedTotal = packed.agg(sum(col("n_tokens"))).head().getLong(0)
      assert(packedTotal == total,
        s"packed token mass $packedTotal != corpus BPE token mass $total")
    } finally { packed.unpersist(); () }
  }
}

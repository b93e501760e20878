package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Hand-traced pins for [[TextPipeline.bpeApply]] — every rank-order
  * subtlety of classic BPE application traced by hand against the
  * shipped [[TextPipeline.BpeMerges]] table (ranks: 1 t+a, 2 ta+b,
  * 3 s+c, 4 sc+a, 5 sca+n, 6 e+r, 7 q+u, 8 a+n, 9 o+r, 10 or+t,
  * 11 i+n, 12 in+e, 13 t+h, 14 th+e, 15 s+t, 16 v+a). The corpus-scale
  * cross-engine check is the `text_bpe_apply` oracle row; this spec
  * pins the algorithm on words where a wrong implementation visibly
  * diverges. */
class BpeApplySpec extends SparkTestBase {
  import spark.implicits._

  private def tokensOf(text: String): (String, Long) = {
    val r = TextPipeline.bpeApply(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text").head()
    (r.getString(1), r.getLong(2))
  }

  test("composed merge chains resolve through all levels") {
    // scan: s c a n -> sc a n -> sca n -> scan (three chained ranks)
    assert(tokensOf("scan") == ("scan", 1L))
    // the: t h -> th, then th e -> the
    assert(tokensOf("the") == ("the", 1L))
    // table: t a -> ta, ta b -> tab; l e unmerged
    assert(tokensOf("table") == ("tab l e", 3L))
  }

  test("rank priority: an earlier chain consumes symbols a later rank wanted") {
    // scant: the sca-chain (ranks 3-5) fires before (a, n) at rank 8,
    // so 'a' is consumed into scan and the tail t stands alone —
    // an out-of-rank-order implementation yields "sc an t" instead
    assert(tokensOf("scant") == ("scan t", 2L))
    // but (a, n) still fires where no earlier rank claimed the symbols
    assert(tokensOf("an") == ("an", 1L))
    assert(tokensOf("ant") == ("an t", 2L))
  }

  test("merges fire in rank order, not text order") {
    // query: rank 6 (e, r) fires BEFORE rank 7 (q, u) even though q u
    // appears first in the word — both land: qu er y
    assert(tokensOf("query") == ("qu er y", 3L))
    // sort: (o, r) then (or, t): s ort
    assert(tokensOf("sort") == ("s ort", 2L))
    // line: (i, n) then (in, e): l ine
    assert(tokensOf("line") == ("l ine", 2L))
  }

  test("merges never cross word boundaries") {
    // "cat apple": rank 1 is (t, a), and t ends cat exactly where a
    // begins apple — the pair must NOT fuse across the space (neither
    // word has any in-word merge, so any fusion is a boundary leak)
    assert(tokensOf("cat apple") == ("c a t a p p l e", 8L))
    // "scant" as one word fully merges; as "sca nt" the n cannot join
    // the sca across the boundary
    assert(tokensOf("sca nt") == ("sca n t", 3L))
  }

  test("normalization: non-alpha words drop, case folds, whitespace squeezes") {
    assert(tokensOf("The   SCAN don't 42x  an") == ("the scan an", 3L))
    // a document with nothing surviving the alpha filter
    assert(tokensOf("123 !!! 4x2") == ("", 0L))
  }

  test("full-sentence trace") {
    val (toks, n) = tokensOf("The table scan scant query sort line value stream an ant")
    assert(toks == "the tab l e scan scan t qu er y s ort l ine va l u e st r e a m an an t",
      s"got: $toks")
    assert(n == 26L)
  }

  test("bpeTrain: hand-traced training on a two-doc corpus, merge by merge") {
    // corpus: the ×3, cat ×2. Round 1: pairs (t,h):3 (h,e):3 (c,a):2
    // (a,t):2 — cnt-3 tie broken l asc → (h,e). Round 2: (t,he):3 wins.
    // Round 3: "the" is one symbol; cnt-2 tie (a,t) vs (c,a) → (a,t).
    // Round 4: (c,at):2. Round 5: nothing left — early stop, 4 rows of
    // the 8 requested.
    val docs = Seq((1L, "the the cat"), (2L, "the cat")).toDF("doc_id", "text")
    val got = TextPipeline.bpeTrain(docs, "doc_id", "text")
      .collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
      .sortBy(_._1).toSeq
    assert(got == Seq(
      (1, "h", "e", "he", 3L),
      (2, "t", "he", "the", 3L),
      (3, "a", "t", "at", 2L),
      (4, "c", "at", "cat", 2L)), s"got $got")
  }

  test("train → apply round-trip: the learned table re-tokenizes its training words to single tokens") {
    val docs = Seq((1L, "the the cat"), (2L, "the cat")).toDF("doc_id", "text")
    val learned = TextPipeline.bpeTrain(docs, "doc_id", "text")
      .collect().sortBy(_.getInt(0)).map(r => (r.getString(1), r.getString(2))).toSeq
    val applied = TextPipeline.bpeApply(docs, "doc_id", "text", merges = learned)
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(applied == Map(1L -> "the the cat", 2L -> "the cat"))
  }
}

package graft.pipeline

import graft.SparkTestBase

class SegmentDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], segWords: Int = 3,
      minDocs: Long = 2L): Map[Long, (String, Long, Long)] =
    TextPipeline.segmentDedup(docs.toDF("doc_id", "text"), "doc_id", "text",
        segWords, minDocs)
      .collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap

  test("a segment shared by two docs is deleted from BOTH, unique text stays") {
    val docs = Seq(
      1L -> "one two three alpha beta gamma",   // segs: [one two three][alpha beta gamma]
      2L -> "one two three delta echo foxtrot", // shares segment 1 with doc 1
      3L -> "golf hotel india juliet kilo lima")
    val out = run(docs)
    assert(out(1L) === (("alpha beta gamma", 1L, 1L)))
    assert(out(2L) === (("delta echo foxtrot", 1L, 1L)))
    assert(out(3L) === (("golf hotel india juliet kilo lima", 2L, 0L)))
  }

  test("repetition INSIDE one document does not trigger the cross-doc rule") {
    val docs = Seq(1L -> "spam spam spam spam spam spam",
      2L -> "unrelated words here")
    val out = run(docs)
    // both 3-word segments of doc 1 are "spam spam spam" but live in ONE
    // document — distinct-doc count is 1, below minDocs
    assert(out(1L)._3 === 0L)
  }

  test("an all-boilerplate document still emits a row, with empty text") {
    val docs = Seq(
      1L -> "copy right notice",
      2L -> "copy right notice",
      3L -> "original content here copy right notice")
    val out = run(docs)
    assert(out(1L) === (("", 0L, 1L)))
    assert(out(2L) === (("", 0L, 1L)))
    assert(out(3L) === (("original content here", 1L, 1L)))
  }

  test("surviving segments reassemble in original order across a deleted gap") {
    val docs = Seq(
      1L -> "aaa bbb ccc DUP DUP DUP xxx yyy zzz",
      2L -> "DUP DUP DUP other words entirely")
    val out = run(docs)
    assert(out(1L)._1 === "aaa bbb ccc xxx yyy zzz")
  }

  test("trailing short segments participate like full segments") {
    val docs = Seq(1L -> "one two three tail", 2L -> "four five six tail")
    val out = run(docs)
    // the 1-word trailing segment "tail" appears in both docs → deleted
    assert(out(1L) === (("one two three", 1L, 1L)))
    assert(out(2L) === (("four five six", 1L, 1L)))
  }

  test("minDocs below 2 is refused (it would delete every segment)") {
    intercept[IllegalArgumentException] {
      TextPipeline.segmentDedup(Seq((1L, "x")).toDF("doc_id", "text"),
        "doc_id", "text", 3, 1L)
    }
  }
}

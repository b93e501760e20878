package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int): (Long, String) =
    (id, Seq.fill(nTokens)("w").mkString(" "))

  test("offsets are the exact prefix sums of token counts in id order") {
    val df = Seq(doc(1, 10), doc(2, 20), doc(3, 5), doc(4, 100)).toDF("doc_id", "text")
    val got = Packing.pack(df, "doc_id", "text", capacity = 64)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getBoolean(4)))
    assert(got.toSeq === Seq(
      (1L, 10L, 0L, 0L, false),
      (2L, 20L, 10L, 0L, false),
      (3L, 5L, 30L, 0L, false),
      (4L, 100L, 35L, 0L, true))) // 35 % 64 + 100 > 64: straddles
  }

  test("seq_id chunks the token tape every `capacity` tokens") {
    val df = (1L to 100L).map(i => doc(i, 10)).toDF("doc_id", "text")
    val got = Packing.pack(df, "doc_id", "text", capacity = 25)
      .orderBy("doc_id").collect()
    // doc i starts at (i-1)*10; seq = (i-1)*10 / 25
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(2) === (id - 1) * 10, s"offset of doc $id")
      assert(r.getLong(3) === ((id - 1) * 10) / 25, s"seq of doc $id")
      // capacity 25, docs of 10: straddle iff offset % 25 ∈ {20}
      assert(r.getBoolean(4) === ((((id - 1) * 10) % 25) + 10 > 25), s"straddle of doc $id")
    }
  }

  test("offsets are partition-independent: many partitions, same answer") {
    val base = (1L to 500L).map(i => doc(i, (i % 17 + 1).toInt))
    val one = Packing.pack(base.toDF("doc_id", "text").coalesce(1), "doc_id", "text")
    val many = Packing.pack(base.toDF("doc_id", "text").repartition(13), "doc_id", "text")
    assert(one.orderBy("doc_id").collect().toSeq === many.orderBy("doc_id").collect().toSeq)
  }

  test("no global single-partition window: plan windows are keyed by partition id") {
    val df = (1L to 50L).map(i => doc(i, 3)).toDF("doc_id", "text")
    val plan = Packing.pack(df, "doc_id", "text").queryExecution.optimizedPlan
    val windows = plan.collect { case w: org.apache.spark.sql.catalyst.plans.logical.Window => w }
    assert(windows.nonEmpty)
    assert(windows.forall(_.partitionSpec.nonEmpty),
      "found an unpartitioned (single-task) window in the packing plan")
  }
}

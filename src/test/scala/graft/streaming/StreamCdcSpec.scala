package graft.streaming

import graft.SparkTestBase
import graft.sources.Warehouse
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming CDC ingestion parity: a changelog consumed in MICRO-BATCHES
  * through foreachBatch, each batch pre-collapsed (latest change per key)
  * and MERGEd into the running snapshot with [[Warehouse.applyChangelog]],
  * must land on exactly the state a single batch apply of the whole
  * pre-collapsed log produces. This is the production shape for
  * readStream→MERGE warehouse loads (Delta/Iceberg's streaming upsert):
  * the spec pins that batch boundaries are invisible as long as batches
  * respect the log's sequence order — replace-by-key composes. */
class StreamCdcSpec extends SparkTestBase {
  import spark.implicits._

  private def collapseLatest(changes: DataFrame): DataFrame = {
    // latest change per key (the standard pre-collapse window)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("k")).orderBy(col("seq").desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  test("foreachBatch MERGE loop == one-shot batch MERGE of the collapsed log") {
    val base = Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("k", "name", "v")
    // a changelog with inserts, updates, deletes, and multi-entry keys
    // (seq is the log order; later entries supersede)
    val log = Seq(
      (1L, "I", 4L, "d", 40L),   // insert new key
      (2L, "U", 2L, "b2", 21L),  // update existing
      (3L, "D", 3L, null, 0L),   // delete existing
      (4L, "U", 4L, "d2", 41L),  // update the key inserted above
      (5L, "I", 5L, "e", 50L),
      (6L, "D", 5L, null, 0L),   // insert then delete within the log
      (7L, "U", 1L, "a2", 11L),
    )

    // STREAM side: 3 micro-batches in seq order, state maintained by
    // foreachBatch MERGE into an in-memory var (stand-in for a table)
    implicit val sqlCtx = spark.sqlContext
    val stream = MemoryStream[(Long, String, Long, String, Long)]
    var state: DataFrame = base
    val q = stream.toDS()
      .toDF("seq", "op", "k", "name", "v")
      .writeStream
      .outputMode("append")
      .foreachBatch { (b: DataFrame, _: Long) =>
        if (!b.isEmpty) {
          val collapsed = collapseLatest(b).select(col("op"), col("k"), col("name"), col("v"))
          state = Warehouse.applyChangelog(state, collapsed, "k").localCheckpoint()
        }
        ()
      }
      .start()
    try {
      log.grouped(3).foreach { batch => stream.addData(batch); q.processAllAvailable() }
    } finally q.stop()

    // BATCH side: one apply of the whole collapsed log
    val expected = Warehouse.applyChangelog(
      base,
      collapseLatest(log.toDF("seq", "op", "k", "name", "v"))
        .select(col("op"), col("k"), col("name"), col("v")),
      "k")

    def rows(df: DataFrame): Set[(Long, String, Long)] =
      df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    val got = rows(state)
    assert(got == rows(expected), s"streamed state $got")
    // and the truth is what a human reads off the log: 1→a2, 2→b2, 4→d2
    assert(got == Set((1L, "a2", 11L), (2L, "b2", 21L), (4L, "d2", 41L)))
  }
}

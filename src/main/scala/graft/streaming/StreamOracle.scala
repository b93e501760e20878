package graft.streaming

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** The streaming family's ORACLE row: DuckDB cannot observe micro-batches,
  * but it can read what they leave behind — so this drives the
  * watermarked tumbling-window aggregation through the REAL streaming
  * machinery (file source in event-time order, `maxFilesPerTrigger 1` for
  * genuine multi-batch execution, append output mode so only
  * watermark-FINALIZED windows ever emit, `foreachBatch` parquet sink)
  * and returns the final sink table, which the driver hash-checks against
  * the equivalent batch SQL over `events`.
  *
  * Append-mode equivalence is the point being proved: a window [d, d+1day)
  * is emitted exactly once, when the watermark passes its end — so the
  * union of all micro-batch emissions equals the one-shot batch aggregate
  * iff (a) the watermark only advances (chunks staged in event-time
  * order), and (b) a far-future sentinel closes the tail windows (the
  * sentinel's own window can never finalize, and its type is filtered
  * from the sink read regardless).
  *
  * Determinism for the hash check: counts are exact; the value sum runs
  * in DECIMAL(18,2) with one final cast to DOUBLE (the repo-wide float
  * aggregation discipline), and windows align to the epoch in UTC on both
  * engines (Spark tumbling windows align to 1970-01-01T00:00 UTC;
  * `epoch_us(ts) // day * day` is the same floor).
  */
object StreamOracle {

  private val DayUs = 86400000000L

  private def fail(e: String): Nothing = throw new IllegalStateException(e)

  /** Stage the events table as N time-range parquet chunks (+ far-future
    * sentinel) in one directory, written in event-time order so the file
    * source's modification-time ordering advances the watermark
    * monotonically (the StreamDemo staging shape). */
  private def stage(spark: SparkSession, sfDir: String, workDir: String, chunks: Int): String = {
    val in = Paths.get(workDir, "stream_in")
    Files.createDirectories(in)
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select(col("event_id"), col("ts").cast("timestamp").as("ts"),
        col("user_id"), col("event_type"), col("value"))
    val (lo, hi) = {
      val r = ev.agg(min(unix_millis(col("ts"))), max(unix_millis(col("ts")))).head()
      (r.getLong(0), r.getLong(1))
    }
    val width = math.max((hi - lo) / chunks + 1, 1L)
    def writeChunk(df: DataFrame, name: String): Unit = {
      val tmp = Paths.get(workDir, s"tmp_$name")
      df.coalesce(1).write.parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(fail(s"no parquet part written for $name"))
      Files.move(part, in.resolve(s"$name.parquet"), StandardCopyOption.ATOMIC_MOVE)
    }
    for (i <- 0 until chunks) {
      val (a, b) = (lo + i * width, lo + (i + 1) * width)
      writeChunk(ev.filter(unix_millis(col("ts")) >= a && unix_millis(col("ts")) < b), f"chunk$i%02d")
    }
    // sentinel: one far-future row whose watermark advance FINALIZES every
    // real day window; its own window can never close, and its type is
    // filtered from the sink read anyway
    val sentinel = ev.limit(1).select(
      lit(-1L).as("event_id"),
      expr(s"timestamp_millis(${hi + 30L * 24 * 3600 * 1000})").as("ts"),
      lit(-1L).as("user_id"), lit("__flush__").as("event_type"),
      lit(0.0).as("value"))
    writeChunk(sentinel, f"chunk$chunks%02d")
    in.toString
  }

  /** Watermarked daily tumbling-window counts per event type, hash-exact:
    * (window_start_us, event_type, n_events, total_value) with the sum in
    * DECIMAL and the window start as epoch micros (BIGINT travels through
    * the oracle compare; a raw TIMESTAMP column would hinge on printer
    * formats). */
  def windowedDailyExact(events: DataFrame, watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum(col("value").cast(DecimalType(18, 2))).as("__tv"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"),
        col("__tv").cast("double").as("total_value"))

  /** Run the full streaming pipeline (stage → readStream → window agg →
    * foreachBatch parquet sink) to completion and return the sink table.
    * `workDir` must be a caller-owned scratch directory, wiped on entry —
    * checkpoint state from a previous run would make the source skip
    * files. */
  def windowedDaily(spark: SparkSession, sfDir: String, workDir: String): DataFrame = {
    val in = stage(spark, sfDir, workDir, chunks = 4)
    val sink = Paths.get(workDir, "sink").toString
    val src = spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = windowedDailyExact(src)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Paths.get(workDir, "ckpt").toString)
      .foreachBatch { (b: DataFrame, _: Long) =>
        b.write.mode("append").parquet(sink)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(sink).filter(col("event_type") =!= "__flush__")
  }
}

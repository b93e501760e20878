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
    val q = windowedDailyExact(source(spark, in))
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Paths.get(workDir, "ckpt").toString)
      // batch-keyed OVERWRITE partition = idempotent under foreachBatch
      // retries (append would double-write a replayed batch) — the
      // exactly-once sink discipline, not just a test convenience
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/b=$batchId")
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(sink).drop("b").filter(col("event_type") =!= "__flush__")
  }

  private def source(spark: SparkSession, in: String): DataFrame =
    spark.readStream
      .schema("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE")
      .option("maxFilesPerTrigger", 1)
      .parquet(in)

  /** Session gap for [[sessionized]] (the StreamDemo gap). */
  val SessionGapMs: Long = 30L * 60 * 1000

  /** The ORACLE row for CUSTOM STREAMING STATE: event-time sessionization
    * via `flatMapGroupsWithState` (per-user gap splitting + event-time
    * timeout, [[Streams.sessionize]]) driven through the real multi-batch
    * machinery and hash-checked against DuckDB's batch gaps-and-islands
    * SQL. Sessions close by GAP when a later event arrives and by
    * EVENT-TIME TIMEOUT when the sentinel's watermark advance fires the
    * no-data micro-batch — both paths land in the sink, and their union
    * must equal the batch derivation exactly.
    *
    * Output keeps only the integer-exact columns (user, start ms, event
    * count, duration): session BOUNDARIES are pure timestamp arithmetic,
    * identical on both engines, while the state function's sequential
    * double `total` and DuckDB's own summation order could differ in the
    * last ulp (the repo-wide no-raw-double-sums discipline). The sentinel
    * user (−1) never flushes (nothing advances the watermark past it) and
    * is filtered regardless. */
  def sessionized(spark: SparkSession, sfDir: String, workDir: String): DataFrame = {
    import spark.implicits._
    val in = stage(spark, sfDir, workDir, chunks = 4)
    val sink = Paths.get(workDir, "sink").toString
    val q = Streams.sessionize(source(spark, in).as[Streams.Event], SessionGapMs)
      .filter(col("user_id") >= 0)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Paths.get(workDir, "ckpt").toString)
      // batch-keyed OVERWRITE partition: idempotent under retries (see
      // windowedDaily)
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Streams.Session], batchId: Long) =>
        b.write.mode("overwrite").parquet(s"$sink/b=$batchId")
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(sink)
      .select(col("user_id"), col("start_ms"), col("n_events"), col("duration_ms"))
  }

  /** The ORACLE row for STREAMING CDC UPSERT: the event stream read as a
    * keyed changelog — key (user_id, event_type), op = delete when
    * event_id ≡ 7 (mod 10), else upsert — applied batch-by-batch in
    * `foreachBatch` (reduce the micro-batch to its last op per key, then
    * anti-join + union against the previous state version, written as a
    * NEW content-complete state parquet per batch: the storage-cheap
    * MERGE every warehouse sink runs). The FINAL state version must equal
    * DuckDB's one-shot last-writer-wins derivation over the whole
    * changelog — batch boundaries must be invisible.
    *
    * Ordering is total and cross-engine: chunks are staged on disjoint
    * time ranges (later batches strictly later), and within a batch the
    * winner per key is max (ts, event_id) — the same ORDER BY the oracle
    * uses. The payload is a single stored double (never a sum), so bits
    * match exactly. */
  def cdcUpsert(spark: SparkSession, sfDir: String, workDir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val in = stage(spark, sfDir, workDir, chunks = 4)
    var statePath: Option[String] = None
    val q = source(spark, in)
      .writeStream
      .outputMode("append")
      .option("checkpointLocation", Paths.get(workDir, "ckpt").toString)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val w = Window.partitionBy(col("user_id"), col("event_type"))
          .orderBy(col("ts").desc, col("event_id").desc)
        val last = b
          .withColumn("op", when(col("event_id") % 10 === 7, lit("D")).otherwise(lit("U")))
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
        val upserts = last.filter(col("op") === "U")
          .select(col("user_id"), col("event_type"),
            col("event_id").as("last_event_id"), col("value").as("last_value"))
        val touched = last.select(col("user_id"), col("event_type"))
        val merged = statePath match {
          case None => upserts
          case Some(p) =>
            spark.read.parquet(p)
              .join(touched, Seq("user_id", "event_type"), "left_anti")
              .unionByName(upserts)
        }
        val next = Paths.get(workDir, s"state_$batchId").toString
        merged.write.mode("overwrite").parquet(next)
        statePath = Some(next)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(statePath.getOrElse(
      fail("no micro-batch ran — empty source?")))
      .filter(col("user_id") >= 0)
  }

  /** Stage the documents table as `chunks` doc_id-range parquet chunks
    * (ingest order = id order; no sentinel — this family's pipelines are
    * pure foreachBatch state, no watermark to advance). */
  private def stageDocs(spark: SparkSession, sfDir: String, workDir: String,
      chunks: Int): String = {
    val in = Paths.get(workDir, "docs_in")
    Files.createDirectories(in)
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val (lo, hi) = {
      val r = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
      (r.getLong(0), r.getLong(1))
    }
    val width = math.max((hi - lo) / chunks + 1, 1L)
    for (i <- 0 until chunks) {
      val (a, b) = (lo + i * width, lo + (i + 1) * width)
      val tmp = Paths.get(workDir, f"tmp_doc$i%02d")
      docs.filter(col("doc_id") >= a && col("doc_id") < b).coalesce(1)
        .write.parquet(tmp.toString)
      val part = Files.list(tmp).toArray.map(_.asInstanceOf[Path])
        .find(_.getFileName.toString.endsWith(".parquet"))
        .getOrElse(fail(s"no parquet part for chunk $i"))
      Files.move(part, in.resolve(f"doc$i%02d.parquet"), StandardCopyOption.ATOMIC_MOVE)
    }
    in.toString
  }

  /** STREAMING NEAR-DUP ADMISSION against a persistent band index — the
    * ingest-time gate a curation pipeline actually runs: documents
    * arrive in id order across micro-batches; each batch computes its
    * MinHash band signatures (the SAME [[graft.pipeline.Dedup]]
    * generators the batch dedup family uses), counts per document how
    * many of its bands are already claimed — by the index (previous
    * batches) or by a smaller-id document in the same batch — and
    * admits the document iff no band is claimed; then the band index
    * advances (distinct (band, bh) union, versioned parquet — the same
    * MERGE shape as [[cdcUpsert]]).
    *
    * The oracle proves batch boundaries invisible: admitted ⇔ no
    * smaller-id document ANYWHERE shares a band, which DuckDB derives in
    * one shot from the shared band CTEs
    * ([[graft.pipeline.Oracles.dedupStreamingAdmission]]). Documents
    * shorter than the shingle width never band and are absent on both
    * sides (the `dedup_incremental` contract). */
  def nearDupAdmission(spark: SparkSession, sfDir: String, workDir: String): DataFrame = {
    import graft.pipeline.Dedup
    val in = stageDocs(spark, sfDir, workDir, chunks = 4)
    val sink = Paths.get(workDir, "verdicts").toString
    var idxPath: Option[String] = None
    val src = spark.readStream
      .schema("doc_id BIGINT, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(in)
    val q = src.writeStream
      .outputMode("append")
      .option("checkpointLocation", Paths.get(workDir, "ckpt").toString)
      .foreachBatch { (b: DataFrame, batchId: Long) =>
        val long = Dedup.bandRows(
          Dedup.bandSignatures(b, "doc_id", "text"), "doc_id")
        val minb = long.groupBy(col("band"), col("bh")).agg(min(col("doc_id")).as("__min"))
        val withMin = long.join(minb, Seq("band", "bh"))
        val joined = idxPath match {
          case None => withMin.withColumn("__prev", lit(null).cast("int"))
          case Some(p) =>
            withMin.join(spark.read.parquet(p).withColumn("__prev", lit(1)),
              Seq("band", "bh"), "left")
        }
        val verdicts = joined
          .withColumn("__hit", col("__prev").isNotNull || col("doc_id") > col("__min"))
          .groupBy(col("doc_id"))
          .agg(sum(when(col("__hit"), 1L).otherwise(0L)).as("n_hit_bands"))
          .select(col("doc_id"), col("n_hit_bands"),
            when(col("n_hit_bands") === 0, lit(1)).otherwise(lit(0)).as("admitted"))
        // batch-keyed OVERWRITE partition: idempotent under retries
        verdicts.write.mode("overwrite").parquet(s"$sink/b=$batchId")
        val nextIdx = Paths.get(workDir, s"bandidx_$batchId").toString
        val batchKeys = long.select(col("band"), col("bh")).distinct()
        (idxPath match {
          case None    => batchKeys
          case Some(p) => spark.read.parquet(p).unionByName(batchKeys).distinct()
        }).write.mode("overwrite").parquet(nextIdx)
        idxPath = Some(nextIdx)
      }
      .start()
    try q.processAllAvailable() finally q.stop()
    spark.read.parquet(sink).drop("b")
  }

  /** DuckDB half of [[cdcUpsert]]: one-shot last-writer-wins. */
  def cdcUpsertOracle: String =
    """WITH ops AS (SELECT user_id, event_type,
      |        CASE WHEN event_id % 10 = 7 THEN 'D' ELSE 'U' END AS op,
      |        event_id, ts, value FROM events),
      |last AS (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
      |                   ORDER BY epoch_us(ts) DESC, event_id DESC) AS rn
      |         FROM ops)
      |SELECT user_id, event_type, event_id AS last_event_id, value AS last_value
      |FROM last WHERE rn = 1 AND op = 'U'""".stripMargin

  /** DuckDB half of [[sessionized]]: gaps-and-islands over epoch millis. */
  def sessionizedOracle(gapMs: Long): String =
    s"""WITH e AS (SELECT user_id, epoch_us(ts) // 1000 AS t FROM events),
       |s AS (SELECT user_id, t,
       |        CASE WHEN t - lag(t) OVER (PARTITION BY user_id ORDER BY t) > $gapMs
       |             THEN 1 ELSE 0 END AS brk
       |      FROM e),
       |g AS (SELECT user_id, t,
       |        sum(brk) OVER (PARTITION BY user_id ORDER BY t
       |                       ROWS UNBOUNDED PRECEDING) AS sid
       |      FROM s)
       |SELECT user_id, min(t) AS start_ms, count(*) AS n_events,
       |       max(t) - min(t) AS duration_ms
       |FROM g GROUP BY user_id, sid""".stripMargin
}

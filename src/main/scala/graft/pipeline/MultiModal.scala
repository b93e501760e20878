package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to typed metadata, and per-partition
  * batch processors extract features.
  *
  * The Spark-side shape is the real thing — binary columns, a typed
  * metadata struct, partition-batched processing via mapPartitions on a
  * typed Dataset (the JVM analogue of mapInPandas' iterator-of-batches
  * contract), schema declared up front. The DECODE ITSELF IS A STUB: the
  * container ships no image/audio codecs, so [[decodeStub]] parses a
  * deterministic fake header instead of real JPEG/WAV bytes. Swapping in
  * a real codec changes only the function body — the schema,
  * partitioning, and batch shape stay.
  */
object MultiModal {

  final case class Payload(doc_id: Long, payload: Array[Byte])
  final case class Features(doc_id: Long, width: Int, height: Int, n_bytes: Long, kind: String)

  /** Fake container format for tests: magic "GF", u16-BE width, u16-BE
    * height, then the body bytes. */
  def fakeEncode(width: Int, height: Int, body: Array[Byte]): Array[Byte] =
    Array[Byte]('G'.toByte, 'F'.toByte,
      ((width >> 8) & 0xff).toByte, (width & 0xff).toByte,
      ((height >> 8) & 0xff).toByte, (height & 0xff).toByte) ++ body

  /** STUB decode — deterministic fake in place of a real image decoder.
    * Parses the [[fakeEncode]] header; anything without the magic is
    * classified "opaque" with zero dimensions. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, String) =
    if (bytes.length >= 6 && bytes(0) == 'G'.toByte && bytes(1) == 'F'.toByte)
      (((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff),
        ((bytes(4) & 0xff) << 8) | (bytes(5) & 0xff), "gf-image")
    else (0, 0, "opaque")

  /** Feature extraction over binary payloads: one iterator pass per
    * partition (batch shape identical to mapInPandas — decoder state is
    * amortized across the partition, not re-created per row). */
  def extractFeatures(payloads: Dataset[Payload]): Dataset[Features] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      // per-partition decoder init would go here (codec contexts etc.)
      it.map { p =>
        val (w, h, kind) = decodeStub(p.payload)
        Features(p.doc_id, w, h, p.payload.length.toLong, kind)
      }
    }
  }

  /** Fixed-size payload chunking: split each binary payload into
    * `chunkBytes`-byte chunks with per-chunk digests — the unit of
    * chunk-level dedup, resumable transfer, and bounded-memory media
    * processing (a 4 GB video never has to be one task's row).
    *
    * Scale shape: a narrow map + explode — each payload expands to
    * ⌈bytes/chunk⌉ rows with no shuffle; chunk rows carry offsets so any
    * downstream processor can operate chunk-parallel and reassemble by
    * (doc_id, chunk_idx). All byte arithmetic (substr on binary,
    * octet_length, md5) stays inside codegen. */
  def chunkPayloads(docs: DataFrame, chunkBytes: Int = 64): DataFrame = {
    require(chunkBytes > 0, s"chunkBytes must be positive, got $chunkBytes")
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .filter(col("n_bytes") > 0)
      .withColumn("chunk_idx",
        explode(sequence(lit(0L), expr(s"(n_bytes - 1) div $chunkBytes"))))
      .select(
        col("doc_id"),
        col("chunk_idx"),
        expr(s"octet_length(substr(payload, cast(chunk_idx * $chunkBytes + 1 as int), $chunkBytes))")
          .cast("long").as("chunk_bytes"),
        expr(s"md5(substr(payload, cast(chunk_idx * $chunkBytes + 1 as int), $chunkBytes))")
          .as("chunk_md5"))
  }

  /** Documents → binary payload column + typed metadata, exercising the
    * binary path end-to-end on the real testdata (text bytes stand in for
    * media bytes; the plumbing — binary column, octet accounting,
    * content digest — is the product surface). */
  def payloadStats(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("payload"),
      col("source"))
      .select(
        col("doc_id"),
        octet_length(col("payload")).cast("long").as("n_bytes"),
        md5(col("payload")).as("checksum"),
        col("source"))
}

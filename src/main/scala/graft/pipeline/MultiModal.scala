package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to typed metadata, and per-partition
  * batch processors extract features.
  *
  * The Spark-side shape is the real thing — binary columns, a typed
  * metadata struct, partition-batched processing via mapPartitions on a
  * typed Dataset (the JVM analogue of mapInPandas' iterator-of-batches
  * contract), schema declared up front. HEADER decode is real: PNG IHDR
  * / JPEG SOF ([[withImageDims]]) and WAV/RIFF fmt+data
  * ([[withAudioMeta]]) are parsed from the actual bytes. Full-frame
  * PIXEL decode is real too: [[decodeImage]]/[[extractFeatures]] run the
  * JDK's ImageIO codecs (PNG/JPEG/GIF/BMP ship in every JVM), and
  * [[pixelDhashDupes]] perceptually fingerprints ACTUAL decoded luma —
  * oracle-checked against the arithmetic pixel pattern the in-plan PNG
  * generator encodes (PNG is lossless, so decode ≡ generator). A codec
  * the JVM doesn't ship (video frames, audio samples beyond the WAV
  * header walk) would slot into the same mapPartitions contract.
  */
object MultiModal {

  final case class Payload(doc_id: Long, payload: Array[Byte])
  final case class Features(doc_id: Long, width: Int, height: Int, n_bytes: Long, kind: String)

  /** Encode an 8-bit grayscale PNG from a luma function — the in-plan
    * image synthesizer behind [[pixelDhashDupes]] and the decode specs.
    * Deterministic: PNG is lossless and the raster is written
    * sample-for-sample, so `decode(encodeGrayPng(f)) == f` exactly —
    * which is what lets a SQL oracle derive per-pixel truths for images
    * that transit a REAL codec. */
  def encodeGrayPng(width: Int, height: Int, luma: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) { raster.setSample(x, y, 0, luma(x, y) & 0xff); x += 1 }
      y += 1
    }
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  /** Real full-frame pixel decode via the JDK's ImageIO (PNG/JPEG/GIF/BMP
    * readers ship in every JVM — no external codec). Returns the decoded
    * image, or None for payloads no installed reader accepts. */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    // NonFatal, not just IOException: JDK readers throw runtime
    // exceptions (IndexOutOfBounds, NegativeArraySize, ...) on
    // malformed-but-recognized payloads, and a corrupt image must
    // classify opaque, never fail the partition
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case scala.util.control.NonFatal(_) => None }

  /** Feature extraction over binary payloads: one iterator pass per
    * partition (batch shape identical to mapInPandas — decoder state is
    * amortized across the partition, not re-created per row). The decode
    * is REAL (ImageIO full-frame pixel decode); payloads no reader
    * accepts classify as "opaque" with zero dimensions instead of
    * failing the partition. */
  def extractFeatures(payloads: Dataset[Payload]): Dataset[Features] = {
    import payloads.sparkSession.implicits._
    payloads.mapPartitions { it =>
      // per-partition decoder init: keep ImageIO off its disk cache —
      // payloads are already in memory and executor temp dirs may be
      // slow/ephemeral
      javax.imageio.ImageIO.setUseCache(false)
      it.map { p =>
        decodeImage(p.payload) match {
          case Some(img) =>
            Features(p.doc_id, img.getWidth, img.getHeight, p.payload.length.toLong, "image")
          case None =>
            Features(p.doc_id, 0, 0, p.payload.length.toLong, "opaque")
        }
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

  /** Frame sampling over binary payloads — the video-pipeline stub the
    * multimodal surface needs (decode-free byte slicing; [[tiffPages]] is the
    * real-container sibling): treat
    * the payload as fixed-size frames and keep every `stride`-th one,
    * the representative-frame selection a feature extractor downstream
    * consumes. The sampled indices are GENERATED (stepped sequence), not
    * filtered — the explode never materializes skipped frames, so the
    * row multiplier is n_frames/stride, which is the whole point at
    * petabyte video scale. Pure narrow map, no shuffle. */
  def sampleFrames(docs: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(stride >= 1, s"stride must be >= 1, got $stride")
    docs.select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .filter(col("n_bytes") > 0)
      .withColumn("frame_idx",
        explode(sequence(lit(0L), expr(s"(n_bytes - 1) div $frameBytes"), lit(stride.toLong))))
      .select(
        col("doc_id"),
        col("frame_idx"),
        expr(s"octet_length(substr(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes))")
          .cast("long").as("frame_bytes"),
        expr(s"md5(substr(payload, cast(frame_idx * $frameBytes + 1 as int), $frameBytes))")
          .as("frame_md5"))
  }

  // ---------------------------------------------------------------------
  // Real header decode: PNG IHDR / JPEG SOF dimensions by pure byte-parse
  // (no codec dependency — a resolution/aspect gate only needs the
  // header, never the pixels). Everything below is Spark SQL byte
  // arithmetic (substr-on-binary + hex + conv), so the parse stays inside
  // WholeStageCodegen and distributes as a narrow map.
  // ---------------------------------------------------------------------

  /** Big-endian unsigned int read: `len` bytes of `payload` at 1-based
    * offset `pos` (a Column, so data-dependent offsets work). Returns
    * null past end-of-payload (substr comes back short → conv of a
    * truncated hex string would misparse, so the length is checked). */
  private def beUInt(payload: Column, pos: Column, len: Int): Column =
    when(octet_length(payload.substr(pos, lit(len))) === len,
      conv(hex(payload.substr(pos, lit(len))), 16, 10).cast("long"))

  /** PNG signature (8 bytes) — the IHDR chunk that MUST follow it puts
    * width at byte 17 and height at byte 21, both u32 BE. */
  private val PngSig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)
  private val JpegSoi: Array[Byte] = Array(0xff.toByte, 0xd8.toByte)

  /** (format, width, height) columns parsed from a binary payload:
    * `png` via fixed IHDR offsets, `jpeg` via the native
    * [[graft.functions.JpegSofOffset]] segment walk (SOF frame: marker,
    * u16 len, u8 precision, u16 height, u16 width), anything else
    * `opaque` with null dimensions.
    *
    * The walk was originally an UNROLLED when-chain (data-dependent SQL
    * offsets force it): ~3× tree growth per level, ~1.5 s of driver-side
    * analysis per plan build at depth 4. The fused native expression is
    * one loop, so `maxJpegSegments` is a cheap safety bound, not a plan
    * size trade — 16 covers EXIF/XMP-heavy real headers. */
  def withImageDims(df: DataFrame, payloadCol: String,
      maxJpegSegments: Int = 16): DataFrame = {
    val p = col(payloadCol)
    val isPng = p.substr(lit(1), lit(8)) === lit(PngSig)
    val isJpeg = p.substr(lit(1), lit(2)) === lit(JpegSoi)
    graft.functions.JpegSofOffset.register(df.sparkSession)
    val sof = call_function(graft.functions.JpegSofOffset.Name,
      p, lit(maxJpegSegments))
    val fmt = when(isPng, "png").when(isJpeg && sof.isNotNull, "jpeg")
      .otherwise("opaque")
    df.withColumn("format", fmt)
      .withColumn("width",
        when(isPng, beUInt(p, lit(17L), 4))
          .when(isJpeg, beUInt(p, sof + 7, 2)))
      .withColumn("height",
        when(isPng, beUInt(p, lit(21L), 4))
          .when(isJpeg, beUInt(p, sof + 5, 2)))
  }

  /** Resolution/aspect admission gate over parsed dimensions — the
    * filter a multimodal curation pipeline runs BEFORE any decode (drop
    * thumbnails and degenerate aspect ratios header-only). */
  def resolutionKeep(width: Column, height: Column,
      minW: Long = 200, minH: Long = 200, maxAspect: Long = 2): Column =
    coalesce(width >= minW && height >= minH &&
      width <= height * maxAspect && height <= width * maxAspect, lit(false))

  /** Deterministic in-plan image payloads over the documents table:
    * doc_id%4 picks PNG / baseline JPEG (APP0+COM then SOF0) /
    * progressive JPEG (variable APP1 then SOF2) / opaque text bytes, with
    * dimensions derived from (n_chars, doc_id) so an oracle re-derives
    * them arithmetically while Spark must recover them by PARSING. The
    * variable-length COM/APP1 segments make the SOF walk load-bearing —
    * a fixed-offset "parser" fails on them. Pure codegen'd byte assembly
    * (to_binary/concat), no UDF. */
  def syntheticImagePayloads(docs: DataFrame): DataFrame = {
    val w = expr("64 + pmod(n_chars, 1901)")
    val h = expr("64 + pmod(doc_id * 31, 1013)")
    def u16(c: Column): Column = to_binary(lpad(hex(c), 4, "0"), lit("hex"))
    def u32(c: Column): Column = to_binary(lpad(hex(c), 8, "0"), lit("hex"))
    val png = concat(lit(PngSig), expr("X'0000000D'"), lit("IHDR".getBytes("UTF-8")),
      u32(w), u32(h), expr("X'0802000000'"))
    // baseline: SOI, APP0 (JFIF, fixed 16), COM (2 + doc_id%37 + 2), SOF0
    val comBody = expr("pmod(doc_id, 37) + 2")
    val jpeg0 = concat(lit(JpegSoi), expr("X'FFE00010'"),
      encode(rpad(lit("JFIF"), 14, "."), "UTF-8"),
      expr("X'FFFE'"), u16(comBody + 2), encode(expr("repeat('x', pmod(doc_id, 37) + 2)"), "UTF-8"),
      expr("X'FFC00011'"), expr("X'08'"), u16(h), u16(w),
      expr("X'03011100021101031101'"), expr("X'FFD9'"))
    // progressive: SOI, APP1 of data-dependent length, SOF2
    val app1Body = expr("pmod(n_chars, 29) + 4")
    val jpeg2 = concat(lit(JpegSoi), expr("X'FFE1'"), u16(app1Body + 2),
      encode(expr("repeat('e', pmod(n_chars, 29) + 4)"), "UTF-8"),
      expr("X'FFC20011'"), expr("X'08'"), u16(h), u16(w),
      expr("X'03011100021101031101'"), expr("X'FFD9'"))
    docs.select(col("doc_id"), col("n_chars"),
      when(pmod(col("doc_id"), lit(4)) === 0, png)
        .when(pmod(col("doc_id"), lit(4)) === 1, jpeg0)
        .when(pmod(col("doc_id"), lit(4)) === 2, jpeg2)
        .otherwise(encode(col("text"), "UTF-8")).as("payload"))
  }

  /** The `mm_dimensions` query body: synthesize payloads, parse the
    * headers back, apply the resolution gate. */
  def dimensions(docs: DataFrame): DataFrame = {
    val parsed = withImageDims(syntheticImagePayloads(docs), "payload")
    parsed.select(col("doc_id"), col("format"), col("width"), col("height"),
      resolutionKeep(col("width"), col("height")).as("keep"))
  }

  // ---------------------------------------------------------------------
  // Audio header decode: WAV/RIFF `fmt `/`data` chunk metadata by pure
  // byte-parse (sample rate, channels, bit depth; duration from the
  // data-chunk length — a sample-rate/duration admission gate needs the
  // header, never the samples). The chunk WALK is the native
  // graft_riff_chunk loop (data-dependent offsets, see RiffChunkOffset);
  // the FIELD reads are codegen'd little-endian SQL byte arithmetic at
  // fixed offsets from the returned chunk position.
  // ---------------------------------------------------------------------

  /** Little-endian unsigned int read: `len` bytes of `payload` at
    * 1-based offset `pos` (a Column — data-dependent offsets work).
    * Byte-reversed hex concat; null past end-of-payload (the truncation
    * guard [[beUInt]] uses). */
  private def leUInt(payload: Column, pos: Column, len: Int): Column = {
    val leHex = concat((len to 1 by -1).map(i =>
      hex(payload.substr(pos + (i - 1), lit(1)))): _*)
    when(octet_length(payload.substr(pos, lit(len))) === len,
      conv(leHex, 16, 10).cast("long"))
  }

  /** (kind, sample_rate, channels, bits_per_sample, byte_rate,
    * data_bytes, duration_ms) parsed from a binary payload. `wav` needs
    * the RIFF/WAVE preamble AND both `fmt ` and `data` chunks within
    * `maxChunks` hops; anything else is `opaque` with null fields.
    * Duration is integer arithmetic (data_bytes · 1000 div byte_rate) so
    * the oracle can re-derive it exactly. */
  def withAudioMeta(df: DataFrame, payloadCol: String,
      maxChunks: Int = 16): DataFrame = {
    val p = col(payloadCol)
    graft.functions.RiffChunkOffset.register(df.sparkSession)
    def chunk(fourcc: Int): Column = call_function(
      graft.functions.RiffChunkOffset.Name, p, lit(fourcc), lit(maxChunks))
    val fmtOff = chunk(graft.functions.RiffChunkOffset.FmtFourcc)
    val dataOff = chunk(graft.functions.RiffChunkOffset.DataFourcc)
    val isWav = fmtOff.isNotNull && dataOff.isNotNull
    val sr = when(isWav, leUInt(p, fmtOff + 12, 4))
    val byteRate = when(isWav, leUInt(p, fmtOff + 16, 4))
    val dataBytes = when(isWav, leUInt(p, dataOff + 4, 4))
    df.withColumn("kind", when(isWav, "wav").otherwise("opaque"))
      .withColumn("sample_rate", sr)
      .withColumn("channels", when(isWav, leUInt(p, fmtOff + 10, 2)))
      .withColumn("bits_per_sample", when(isWav, leUInt(p, fmtOff + 22, 2)))
      .withColumn("byte_rate", byteRate)
      .withColumn("data_bytes", dataBytes)
      .withColumn("duration_ms",
        when(isWav && byteRate > 0, expr("data_bytes * 1000 div byte_rate")))
  }

  /** Deterministic in-plan WAV payloads over the documents table:
    * doc_id%3 picks a well-formed WAV with DATA-DEPENDENT chunk layout /
    * a malformed RIFF (preamble intact, first chunk's declared size
    * overruns the payload, so the walk dies truncated) / opaque text
    * bytes. The well-formed case interposes a variable-length LIST chunk
    * (odd sizes included — the word-alignment pad byte is load-bearing)
    * before `fmt ` and a variable JUNK chunk before `data`, so a
    * fixed-offset "parser" fails on it; fmt fields derive from
    * (doc_id, n_chars) so the oracle re-derives them arithmetically
    * while Spark must recover them by PARSING. The data chunk declares
    * its length but ships no samples — header-scan reality, where only
    * the first KB of a media file is ever fetched. Pure codegen'd byte
    * assembly (to_binary/concat), no UDF. */
  def syntheticWavPayloads(docs: DataFrame): DataFrame = {
    def u16le(c: Column): Column = {
      val h = lpad(hex(c), 4, "0")
      to_binary(concat(substring(h, 3, 2), substring(h, 1, 2)), lit("hex"))
    }
    def u32le(c: Column): Column = {
      val h = lpad(hex(c), 8, "0")
      to_binary(concat(substring(h, 7, 2), substring(h, 5, 2),
        substring(h, 3, 2), substring(h, 1, 2)), lit("hex"))
    }
    val sr = expr("8000 + pmod(n_chars, 37) * 100")
    val ch = expr("1 + pmod(doc_id, 2)")
    // bits must vary on a modulus independent of the doc_id%3 kind
    // selector (all wav rows share doc_id%3==0, which would pin a
    // doc_id%3-derived depth to a constant and un-load-bear the read)
    val bits = expr("8 * (1 + pmod(doc_id div 3, 3))")
    val byteRate = expr("(8000 + pmod(n_chars, 37) * 100) * (1 + pmod(doc_id, 2)) * (1 + pmod(doc_id div 3, 3))")
    val blockAlign = expr("(1 + pmod(doc_id, 2)) * (1 + pmod(doc_id div 3, 3))")
    val dataBytes = expr("100 + pmod(n_chars * 7, 9973)")
    val listLen = expr("pmod(doc_id, 23) + 4") // odd sizes exercise the pad
    val junkLen = expr("pmod(n_chars, 17) + 3")
    def chunkOf(id: String, size: Column, body: Column): Column =
      concat(lit(id.getBytes("US-ASCII")), u32le(size), body,
        when(size % 2 === 1, expr("X'00'")).otherwise(expr("X''")))
    val fmtBody = concat(u16le(lit(1)), u16le(ch), u32le(sr), u32le(byteRate),
      u16le(blockAlign), u16le(bits))
    val wav = concat(lit("RIFF".getBytes("US-ASCII")), u32le(lit(0)),
      lit("WAVE".getBytes("US-ASCII")),
      chunkOf("LIST", listLen, encode(expr("repeat('l', pmod(doc_id, 23) + 4)"), "UTF-8")),
      chunkOf("fmt ", lit(16), fmtBody),
      chunkOf("JUNK", junkLen, encode(expr("repeat('j', pmod(n_chars, 17) + 3)"), "UTF-8")),
      lit("data".getBytes("US-ASCII")), u32le(dataBytes))
    // preamble says WAVE, first chunk claims more bytes than exist: the
    // walk must die truncated instead of looping or misreading
    val overrun = concat(lit("RIFF".getBytes("US-ASCII")), u32le(lit(0)),
      lit("WAVE".getBytes("US-ASCII")),
      lit("LIST".getBytes("US-ASCII")), u32le(lit(1000000)),
      lit("x".getBytes("US-ASCII")))
    docs.select(col("doc_id"), col("n_chars"),
      when(pmod(col("doc_id"), lit(3)) === 0, wav)
        .when(pmod(col("doc_id"), lit(3)) === 1, overrun)
        .otherwise(encode(col("text"), "UTF-8")).as("payload"))
  }

  /** The `mm_audio_meta` query body: synthesize payloads, parse the
    * headers back. */
  def audioMeta(docs: DataFrame): DataFrame =
    withAudioMeta(syntheticWavPayloads(docs), "payload")
      .select(col("doc_id"), col("kind"), col("sample_rate"), col("channels"),
        col("bits_per_sample"), col("byte_rate"), col("data_bytes"),
        col("duration_ms"))

  /** Distinct waveforms: doc_id % WavSeeds picks the PCM pattern — the
    * audio analogue of [[PixelSeeds]]. Formula constants are single-
    * sourced here for the generator, decoder spec, and SQL oracle. */
  val WavSeeds = 32
  def wavSeed(docId: Long): Int = (docId % WavSeeds).toInt
  def wavRate(seed: Int): Int = 8000 + 100 * (seed % 5)
  def wavN(seed: Int): Int = 50 + seed % 37
  /** 16-bit signed sample i of waveform `seed` — quadratic phase, so
    * the sequence wraps mod 2^16 irregularly instead of repeating. */
  def wavSample(seed: Int, i: Int): Int =
    ((seed * 131 + 17 * i * i + 29 * i) % 65536) - 32768

  final case class PcmStats(doc_id: Long, sample_rate: Long, n_samples: Long,
      sum_samples: Long, max_abs: Long, energy: Long)

  /** REAL audio sample decode — the PCM sibling of [[pixelDhashDupes]]:
    * per document a mono 16-bit WAV is written through the JDK sound
    * stack (`AudioSystem.write`, a real RIFF encoder) and decoded back
    * through `AudioSystem.getAudioInputStream` (the real WAV codec —
    * format fields come from the DECODER, never echoed from the
    * generator), then the samples are summarized exactly: count, sum,
    * peak |s|, and integer energy Σs². WAV PCM is lossless, so the
    * oracle re-derives every sample from the generator formula — a
    * codec, byte-order, or frame-length bug breaks the hash check.
    * [[audioMeta]] stays the header-scan gate; this is the
    * fetch-the-samples path a loudness/silence filter needs.
    *
    * Scale shape: encode+decode+summarize is ONE narrow mapPartitions
    * over doc ids — zero exchanges; at 100 TB the codec cost
    * parallelizes per-split and only 48-byte stat rows move. */
  def wavPcmStats(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import javax.sound.sampled._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val seed = wavSeed(id)
        val n = wavN(seed)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = wavSample(seed, i)
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new AudioFormat(wavRate(seed).toFloat, 16, 1, true, false)
        val bout = new java.io.ByteArrayOutputStream()
        AudioSystem.write(new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
          AudioFileFormat.Type.WAVE, bout)
        // decode the real container: every field below comes from the
        // codec's parse of the bytes just written
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bout.toByteArray))
        val df = ais.getFormat
        require(df.getChannels == 1 && df.getSampleSizeInBits == 16 &&
          !df.isBigEndian, s"unexpected decoded format for doc $id: $df")
        val out = ais.readAllBytes()
        ais.close()
        val m = out.length / 2
        var sum = 0L; var peak = 0L; var energy = 0L
        var j = 0
        while (j < m) {
          val s = ((out(2 * j) & 0xff) | (out(2 * j + 1).toInt << 8)).toShort.toLong
          sum += s
          if (math.abs(s) > peak) peak = math.abs(s)
          energy += s * s
          j += 1
        }
        PcmStats(id, df.getSampleRate.toLong, m.toLong, sum, peak, energy)
      }
    }.toDF()
  }

  /** DuckDB half of [[wavPcmStats]]: sample fan-out by formula
    * (`unnest(range(...))`), the same exact-integer summary. */
  def wavPcmOracle: String =
    s"""WITH d AS (SELECT doc_id, doc_id % $WavSeeds AS seed FROM documents),
       |s AS (SELECT doc_id, seed, unnest(range(0, 50 + seed % 37)) AS i FROM d),
       |v AS (SELECT doc_id, seed,
       |        ((seed*131 + 17*i*i + 29*i) % 65536) - 32768 AS smp FROM s)
       |SELECT doc_id, (8000 + 100*(seed % 5))::BIGINT AS sample_rate,
       |  count(*)::BIGINT AS n_samples, sum(smp)::BIGINT AS sum_samples,
       |  max(abs(smp))::BIGINT AS max_abs, sum(smp*smp)::BIGINT AS energy
       |FROM v GROUP BY doc_id, seed"""
      .stripMargin

  /** VAD framing constants: frame length in samples, the silence
    * energy threshold (near-silent frames carry samples in {−1,0,1} —
    * energy ≤ [[VadFrame]]; active frames run ~10⁹), and the
    * every-third-frame silence cadence of the VAD waveform family. */
  val VadFrame = 16
  val VadSilenceThreshold = 1024L
  val VadSilentMod = 3

  /** Sample i of the VAD waveform family: every third frame (by
    * (frame + seed) mod [[VadSilentMod]]) is near-silent (samples in
    * {−1, 0, 1}), the rest carry the [[wavSample]] pattern — so the
    * silence flag and the leading-silence trim are exercised on every
    * document, not decorative. */
  def vadSample(seed: Int, i: Int): Int =
    if ((i / VadFrame + seed) % VadSilentMod == 0) (i % 3) - 1
    else wavSample(seed, i)

  final case class VadStats(doc_id: Long, n_samples: Long, n_frames: Long,
      n_silent: Long, lead_silent: Long, zero_crossings: Long)

  /** Frame-level voice-activity detection over REAL decoded PCM — the
    * trim-silence / speech-segmentation pass an audio curation pipeline
    * runs after fetch: each WAV (written and re-read through the JDK
    * sound stack, like [[wavPcmStats]]) is cut into [[VadFrame]]-sample
    * frames; a frame is SILENT when its integer energy Σs² is below
    * [[VadSilenceThreshold]]. Reported per document: frame counts,
    * silent-frame count, LEADING silent run (the trim offset), and the
    * document-wide zero-crossing count (strict sign flips s·s' < 0 —
    * the classic pitch/noisiness feature, exact in integers).
    *
    * Scale shape: encode→decode→frame→summarize is ONE narrow
    * mapPartitions over doc ids — the codec and the framing never cross
    * a shuffle; only fixed-width stat rows move. */
  def audioVad(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    import javax.sound.sampled._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      it.map { id =>
        val seed = wavSeed(id)
        val n = wavN(seed)
        val pcm = new Array[Byte](n * 2)
        var i = 0
        while (i < n) {
          val s = vadSample(seed, i)
          pcm(2 * i) = (s & 0xff).toByte
          pcm(2 * i + 1) = ((s >> 8) & 0xff).toByte
          i += 1
        }
        val fmt = new AudioFormat(wavRate(seed).toFloat, 16, 1, true, false)
        val bout = new java.io.ByteArrayOutputStream()
        AudioSystem.write(new AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong),
          AudioFileFormat.Type.WAVE, bout)
        val ais = AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bout.toByteArray))
        val df = ais.getFormat
        require(df.getChannels == 1 && df.getSampleSizeInBits == 16 &&
          !df.isBigEndian, s"unexpected decoded format for doc $id: $df")
        val out = ais.readAllBytes()
        ais.close()
        val m = out.length / 2
        def sample(j: Int): Long =
          ((out(2 * j) & 0xff) | (out(2 * j + 1).toInt << 8)).toShort.toLong
        val nFrames = (m + VadFrame - 1) / VadFrame
        var silent = 0L; var lead = 0L; var zcr = 0L
        var leading = true
        var f = 0
        while (f < nFrames) {
          var e = 0L
          var j = f * VadFrame
          val end = math.min(j + VadFrame, m)
          while (j < end) { val s = sample(j); e += s * s; j += 1 }
          if (e < VadSilenceThreshold) {
            silent += 1
            if (leading) lead += 1
          } else leading = false
          f += 1
        }
        var j = 1
        while (j < m) {
          if (sample(j - 1) * sample(j) < 0) zcr += 1
          j += 1
        }
        VadStats(id, m.toLong, nFrames.toLong, silent, lead, zcr)
      }
    }.toDF()
  }

  /** DuckDB half of [[audioVad]]: sample fan-out by the VAD formula,
    * frame grouping by i // [[VadFrame]], the same integer energy
    * threshold, leading-run count, and strict-sign-flip crossings. */
  def audioVadOracle: String =
    s"""WITH d AS (SELECT doc_id, doc_id % $WavSeeds AS seed FROM documents),
       |s AS (SELECT doc_id, seed, unnest(range(0, 50 + seed % 37)) AS i FROM d),
       |v AS (SELECT doc_id, i, i // $VadFrame AS f,
       |        CASE WHEN ((i // $VadFrame) + seed) % $VadSilentMod = 0 THEN (i % 3) - 1
       |             ELSE ((seed*131 + 17*i*i + 29*i) % 65536) - 32768 END AS smp
       |      FROM s),
       |fr AS (SELECT doc_id, f, sum(smp*smp) < $VadSilenceThreshold AS silent
       |       FROM v GROUP BY 1, 2),
       |act AS (SELECT doc_id, min(CASE WHEN NOT silent THEN f END) AS first_active,
       |          count(*) AS n_frames,
       |          sum(CASE WHEN silent THEN 1 ELSE 0 END)::BIGINT AS n_silent
       |        FROM fr GROUP BY 1),
       |x AS (SELECT doc_id, smp,
       |        lag(smp) OVER (PARTITION BY doc_id ORDER BY i) AS prev FROM v),
       |z AS (SELECT doc_id, count(*)::BIGINT AS n_samples,
       |        sum(CASE WHEN smp * prev < 0 THEN 1 ELSE 0 END)::BIGINT
       |          AS zero_crossings
       |      FROM x GROUP BY 1)
       |SELECT z.doc_id, z.n_samples, act.n_frames::BIGINT AS n_frames, act.n_silent,
       |  coalesce(act.first_active, act.n_frames)::BIGINT AS lead_silent,
       |  z.zero_crossings
       |FROM z JOIN act ON act.doc_id = z.doc_id"""
      .stripMargin

  // ---------------------------------------------------------------------
  // GIF metadata: the sub-block container (every extension and every
  // frame's image data is a [len][bytes]...0 chain, descriptors carry
  // packed color-table bit fields). The block WALK is the native
  // graft_gif_frames loop (see functions/GifFrames.scala — a fixed
  // unrolling is impossible here, sub-block counts are unbounded); the
  // FIELD reads (width/height u16-LE in the logical screen descriptor)
  // are the same SQL byte arithmetic as WAV.
  // ---------------------------------------------------------------------

  /** GIF synthesis formulas, single-sourced for the generator (Spark
    * SQL) and the oracle (DuckDB `%` — identical on the nonnegative
    * ids/lengths here). Dims stay < 256 so the u16-LE high byte is 0. */
  val GifWidthSql = "20 + pmod(doc_id, 11)"
  val GifHeightSql = "10 + pmod(n_chars, 7)"
  val GifFramesSql = "1 + pmod(doc_id, 4)"
  val GifSubLenSql = "1 + pmod(doc_id, 5)"

  /** Real GIF89a payloads built byte-by-byte in-plan: logical screen
    * descriptor (u16-LE dims), a global color table on even ids (packed
    * field 0x81 → 4 entries), per frame a graphic-control extension +
    * image descriptor + LZW-prefixed data sub-block of doc-dependent
    * length, trailer. One in three ids instead ships a TRUNCATED
    * extension (a sub-block length pointing past the end — the
    * malformed case the walk must reject), one in three the raw text
    * bytes (not GIF at all). */
  def syntheticGifPayloads(docs: DataFrame): DataFrame = {
    def u8(c: Column): Column = to_binary(lpad(hex(c), 2, "0"), lit("hex"))
    def u16leSmall(c: Column): Column = concat(u8(c), u8(lit(0)))
    val width = expr(GifWidthSql)
    val height = expr(GifHeightSql)
    val frames = expr(GifFramesSql)
    val header = lit("GIF89a".getBytes("US-ASCII"))
    val gctFlag = pmod(col("doc_id"), lit(2)) === 0
    val lsd = concat(u16leSmall(width), u16leSmall(height),
      u8(when(gctFlag, lit(0x81)).otherwise(lit(0x00))), u8(lit(0)), u8(lit(0)))
    val gct = when(gctFlag, to_binary(lit("ff" * 12), lit("hex")))
      .otherwise(lit(Array.emptyByteArray))
    // graphic-control extension: 0x21 0xF9, one 4-byte sub-block, 0x00
    val gce = to_binary(lit("21f904" + "00" * 4 + "00"), lit("hex"))
    // image descriptor: 0x2C, left/top 0, w/h, packed 0 (no local table)
    val desc = concat(u8(lit(0x2c)), u16leSmall(lit(0)), u16leSmall(lit(0)),
      u16leSmall(width), u16leSmall(height), u8(lit(0)))
    // LZW min code size + ONE data sub-block of doc-dependent length + 0
    val data = concat(u8(lit(2)), u8(expr(GifSubLenSql)),
      to_binary(expr(s"repeat('aa', $GifSubLenSql)"), lit("hex")), u8(lit(0)))
    val frame = concat(gce, desc, data)
    val frameSeq = when(frames === 1, frame)
      .when(frames === 2, concat(frame, frame))
      .when(frames === 3, concat(frame, frame, frame))
      .otherwise(concat(frame, frame, frame, frame))
    val gif = concat(header, lsd, gct, frameSeq, u8(lit(0x3b)))
    // truncated: an extension whose sub-block claims 0xC8 bytes that
    // are not there
    val bad = concat(header, lsd, to_binary(lit("21f9c8"), lit("hex")))
    docs.select(col("doc_id"), col("n_chars"),
      when(pmod(col("doc_id"), lit(3)) === 0, gif)
        .when(pmod(col("doc_id"), lit(3)) === 1, bad)
        .otherwise(encode(col("text"), "UTF-8")).as("payload"))
  }

  /** (kind, width, height, n_frames) parsed from a binary payload:
    * `gif` needs the signature AND a walkable block chain reaching the
    * trailer within `maxBlocks`; anything else is `opaque` with null
    * fields. Every reported field comes from the DECODER's byte reads,
    * never echoed from the generator. */
  def withGifMeta(df: DataFrame, payloadCol: String,
      maxBlocks: Int = 64): DataFrame = {
    graft.functions.GifFrameCount.register(df.sparkSession)
    val p = col(payloadCol)
    val frames = call_function(graft.functions.GifFrameCount.Name, p, lit(maxBlocks))
    val isGif = frames.isNotNull
    df.withColumn("kind", when(isGif, "gif").otherwise("opaque"))
      .withColumn("width", when(isGif, leUInt(p, lit(7), 2)))
      .withColumn("height", when(isGif, leUInt(p, lit(9), 2)))
      .withColumn("n_frames", frames)
  }

  /** The `mm_gif_meta` query body: synthesize payloads, parse the
    * blocks back. */
  def gifMeta(docs: DataFrame): DataFrame =
    withGifMeta(syntheticGifPayloads(docs), "payload")
      .select(col("doc_id"), col("kind"), col("width"), col("height"),
        col("n_frames"))

  /** DuckDB half of [[gifMeta]]: the same arm split and field formulas
    * (decode ≡ generator for a lossless header walk). */
  val gifMetaOracle: String =
    """SELECT doc_id,
      |  CASE WHEN doc_id % 3 = 0 THEN 'gif' ELSE 'opaque' END AS kind,
      |  CASE WHEN doc_id % 3 = 0 THEN (20 + doc_id % 11)::BIGINT END AS width,
      |  CASE WHEN doc_id % 3 = 0 THEN (10 + n_chars % 7)::BIGINT END AS height,
      |  CASE WHEN doc_id % 3 = 0 THEN (1 + doc_id % 4)::BIGINT END AS n_frames
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------------
  // Video header decode: ISO BMFF (MP4) box metadata by pure byte-parse
  // (major brand from ftyp; timescale/duration from moov→mvhd — a
  // duration/brand admission gate needs the boxes, never the samples).
  // The box WALK is the native graft_bmff_box loop; NESTING composes via
  // codegen'd substr-on-binary (slice moov's body, walk the slice); the
  // FIELD reads are the same big-endian SQL byte arithmetic as PNG.
  // ---------------------------------------------------------------------

  /** (kind, major_brand, timescale, duration, duration_ms) parsed from a
    * binary payload. `mp4` needs a top-level `ftyp` AND an `mvhd` inside
    * `moov` within `maxBoxes` hops at each level; anything else is
    * `opaque` with null fields. Duration is integer arithmetic
    * (duration · 1000 div timescale) so the oracle re-derives it
    * exactly. mvhd is read as version 0 (u32 timescale at box+20,
    * u32 duration at box+24 — ISO 14496-12 §8.2.2). */
  def withVideoMeta(df: DataFrame, payloadCol: String,
      maxBoxes: Int = 16): DataFrame = {
    val p = col(payloadCol)
    graft.functions.BmffBoxOffset.register(df.sparkSession)
    def box(c: Column, fourcc: Int): Column = call_function(
      graft.functions.BmffBoxOffset.Name, c, lit(fourcc), lit(maxBoxes))
    val ftyp = box(p, graft.functions.BmffBoxOffset.FtypFourcc)
    val moov = box(p, graft.functions.BmffBoxOffset.MoovFourcc)
    val moovSize = beUInt(p, moov, 4)
    // moov's BODY as its own payload: nested walks need no start-offset
    // argument — binary substr is the composition operator
    val inner = p.substr((moov + 8).cast("int"), (moovSize - 8).cast("int"))
    val mvhd = box(inner, graft.functions.BmffBoxOffset.MvhdFourcc)
    val isMp4 = ftyp.isNotNull && mvhd.isNotNull
    val timescale = when(isMp4, beUInt(inner, mvhd + 20, 4))
    val duration = when(isMp4, beUInt(inner, mvhd + 24, 4))
    df.withColumn("kind", when(isMp4, "mp4").otherwise("opaque"))
      .withColumn("major_brand",
        when(isMp4, decode(p.substr((ftyp + 8).cast("int"), lit(4)), "US-ASCII")))
      .withColumn("timescale", timescale)
      .withColumn("duration", duration)
      .withColumn("duration_ms",
        when(isMp4 && timescale > 0, expr("duration * 1000 div timescale")))
  }

  /** Deterministic in-plan MP4 payloads over the documents table:
    * doc_id%3 picks a well-formed MP4 with DATA-DEPENDENT box layout
    * (variable `free` box before `moov`, variable `udta` box before
    * `mvhd` inside it — a fixed-offset "parser" fails on both levels) /
    * a malformed chain (valid ftyp, then a box whose size field is
    * smaller than its own header — the walk must die, not loop) /
    * opaque text bytes. mvhd declares its full v0 size but ships only
    * through the duration field — header-scan reality. Fields derive
    * from (doc_id, n_chars) so the oracle re-derives them arithmetically
    * while Spark must recover them by PARSING. */
  def syntheticMp4Payloads(docs: DataFrame): DataFrame = {
    def u32be(c: Column): Column = to_binary(lpad(hex(c), 8, "0"), lit("hex"))
    val freeLen = expr("pmod(doc_id, 19) + 1")
    val udtaLen = expr("pmod(n_chars, 13) + 2")
    val timescale = expr("600 + pmod(n_chars, 11) * 100")
    val duration = expr("pmod(doc_id * 13, 99991) + 1")
    val brand = when(pmod(col("doc_id"), lit(2)) === 0, "isom").otherwise("mp42")
    val ftyp = concat(u32be(lit(16)), lit("ftyp".getBytes("US-ASCII")),
      encode(brand, "US-ASCII"), u32be(lit(0)))
    val free = concat(u32be(freeLen + 8), lit("free".getBytes("US-ASCII")),
      encode(expr("repeat('f', pmod(doc_id, 19) + 1)"), "UTF-8"))
    val udta = concat(u32be(udtaLen + 8), lit("udta".getBytes("US-ASCII")),
      encode(expr("repeat('u', pmod(n_chars, 13) + 2)"), "UTF-8"))
    // v0 mvhd: declared size 108, shipped through duration (28 bytes)
    val mvhd = concat(u32be(lit(108)), lit("mvhd".getBytes("US-ASCII")),
      u32be(lit(0)), u32be(lit(0)), u32be(lit(0)), u32be(timescale), u32be(duration))
    val moov = concat(u32be(udtaLen + 8 + lit(108) + 8), lit("moov".getBytes("US-ASCII")),
      udta, mvhd)
    val mp4 = concat(ftyp, free, moov)
    val badChain = concat(ftyp, u32be(lit(4)), lit("junk".getBytes("US-ASCII")))
    docs.select(col("doc_id"), col("n_chars"),
      when(pmod(col("doc_id"), lit(3)) === 0, mp4)
        .when(pmod(col("doc_id"), lit(3)) === 1, badChain)
        .otherwise(encode(col("text"), "UTF-8")).as("payload"))
  }

  /** The `mm_video_meta` query body: synthesize payloads, parse the
    * boxes back. */
  def videoMeta(docs: DataFrame): DataFrame =
    withVideoMeta(syntheticMp4Payloads(docs), "payload")
      .select(col("doc_id"), col("kind"), col("major_brand"),
        col("timescale"), col("duration"), col("duration_ms"))

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

  // ---------------------------------------------------------------------
  // TIFF/EXIF metadata: the offset-table format (header points at an
  // entry directory elsewhere; every multi-byte read switches on the
  // II/MM byte-order mark). The directory lookup is the native
  // graft_tiff_tag loop; see functions/TiffTag.scala.
  // ---------------------------------------------------------------------

  /** (format, byte_order, width, height) from a binary payload: `tiff`
    * needs a valid BOM + magic + IFD with ImageWidth(256) and
    * ImageLength(257) entries within `maxEntries`; anything else is
    * `opaque` with null fields. */
  def withTiffMeta(df: DataFrame, payloadCol: String,
      maxEntries: Int = 16): DataFrame = {
    graft.functions.TiffTag.register(df.sparkSession)
    val p = col(payloadCol)
    def tag(t: Int): Column = call_function(graft.functions.TiffTag.Name,
      p, lit(t), lit(maxEntries))
    val w = tag(graft.functions.TiffTag.ImageWidth)
    val h = tag(graft.functions.TiffTag.ImageLength)
    val isTiff = w.isNotNull && h.isNotNull
    df.withColumn("format", when(isTiff, "tiff").otherwise("opaque"))
      .withColumn("byte_order",
        when(isTiff, p.substr(lit(1), lit(2)).cast("string")))
      .withColumn("width", when(isTiff, w))
      .withColumn("height", when(isTiff, h))
  }

  /** Deterministic in-plan TIFF payloads: doc_id%2 picks the byte order
    * (II/MM — BOTH code paths of every multi-byte read), the IFD sits
    * behind pmod(n_chars, 23) junk bytes (the offset indirection is
    * load-bearing), and pmod(doc_id, 3)+1 dummy low-tag entries precede
    * the width/height tags (the entry scan is load-bearing). doc_id%5=4
    * docs are opaque text. Pure codegen'd byte assembly, no UDF. */
  def syntheticTiffPayloads(docs: DataFrame): DataFrame = {
    val w = expr("64 + pmod(n_chars, 1901)")
    val h = expr("64 + pmod(doc_id * 31, 1013)")
    val junk = expr("pmod(n_chars, 23)")
    def build(le: Boolean): Column = {
      def u16(c: Column): Column = {
        val hx = lpad(hex(c), 4, "0")
        val ordered = if (le) concat(substring(hx, 3, 2), substring(hx, 1, 2)) else hx
        to_binary(ordered, lit("hex"))
      }
      def u32(c: Column): Column = {
        val hx = lpad(hex(c), 8, "0")
        val ordered = if (le) concat(substring(hx, 7, 2), substring(hx, 5, 2),
          substring(hx, 3, 2), substring(hx, 1, 2)) else hx
        to_binary(ordered, lit("hex"))
      }
      def entryShort(tag: Int, v: Column): Column =
        concat(u16(lit(tag)), u16(lit(3)), u32(lit(1)), u16(v), u16(lit(0)))
      def entryLong(tag: Int, v: Column): Column =
        concat(u16(lit(tag)), u16(lit(4)), u32(lit(1)), u32(v))
      def ifd(dummies: Int): Column = {
        val ds = (1 to dummies).map(k => entryShort(249 + k, lit(7 * k)))
        concat((u16(lit(dummies + 2)) +: ds) ++
          Seq(entryShort(256, w), entryLong(257, h), u32(lit(0))): _*)
      }
      val d = pmod(col("doc_id"), lit(3)) + 1
      concat(lit((if (le) "II" else "MM").getBytes("UTF-8")),
        u16(lit(42)), u32(junk + 8),
        encode(expr("repeat('j', pmod(n_chars, 23))"), "UTF-8"),
        when(d === 1, ifd(1)).when(d === 2, ifd(2)).otherwise(ifd(3)))
    }
    docs.select(col("doc_id"), col("n_chars"),
      when(pmod(col("doc_id"), lit(5)) === 4, encode(col("text"), "UTF-8"))
        .when(pmod(col("doc_id"), lit(2)) === 0, build(le = true))
        .otherwise(build(le = false)).as("payload"))
  }

  /** The `mm_tiff_meta` query body: synthesize payloads, parse the IFD
    * back. */
  def tiffMeta(docs: DataFrame): DataFrame =
    withTiffMeta(syntheticTiffPayloads(docs), "payload")
      .select(col("doc_id"), col("format"), col("byte_order"),
        col("width"), col("height"))

  /** dHash bit count (64-bit fingerprint from 65 samples). */
  val PhashBits = 64

  /** Difference-hash perceptual fingerprint over binary payloads — the
    * image-dedup primitive (dHash: Krawetz '13): sample `PhashBits`+1
    * evenly-strided bytes across the payload, bit i = sample(i) >
    * sample(i+1); payloads with mostly-equal content produce equal (or
    * Hamming-near) fingerprints, so exact grouping on the hash is the
    * threshold-0 perceptual dedup (band the blocks like SimHash for a
    * Hamming radius — [[Dedup]]'s machinery applies unchanged to this
    * hash). With the container's codecs stubbed, the "luma samples" are
    * raw payload bytes — swapping in a real decoder changes only the
    * byte source (swap in [[decodeImage]] luma, as [[pixelDhashDupes]]
    * does); the sampling, bit
    * construction, grouping, and scale shape are the shipped surface.
    *
    * Output: (doc_id, dhash, n_same) — n_same > 1 marks perceptual-dup
    * candidate groups. Payloads under `PhashBits`+1 bytes are excluded
    * (no 65 distinct sample positions exist).
    *
    * Scale shape: the fingerprint is a fixed 64-comparison expression
    * dag fused with the scan (codegen, no UDF, no shuffle); the only
    * exchange is the 8-byte-key dup count. Cross-engine determinism:
    * byte reads are hex/conv arithmetic, shifts are inlined literals
    * (the sign-bit term is added LAST on both engines, keeping every
    * partial sum in BIGINT range). */
  def phashDupes(docs: DataFrame): DataFrame = {
    def byteAt(pos: Column): Column =
      conv(hex(col("payload").substr(pos.cast("int"), lit(1))), 16, 10).cast("long")
    // Byte-based sampling is only char-oracle-comparable on all-ASCII
    // payloads; guard that invariant structurally (octet_length = length)
    // so one non-ASCII document shifts into the excluded set on BOTH
    // engines instead of silently changing stride and samples.
    val p = docs
      .filter(octet_length(col("text")) === length(col("text")))
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .filter(col("n_bytes") >= PhashBits + 1)
      .withColumn("stride", expr(s"n_bytes div ${PhashBits + 1}"))
    val bits = (0 until PhashBits).map { i =>
      when(byteAt(col("stride") * i + 1) > byteAt(col("stride") * (i + 1) + 1),
        lit(1L << i)).otherwise(lit(0L))
    }
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("dhash"))
    p.withColumn("dhash", bits.reduce(_ + _))
      .withColumn("n_same", count(lit(1)).over(w))
      .select(col("doc_id"), col("dhash"), col("n_same"))
  }

  // ---------------------------------------------------------------------
  // Real pixel decode: dHash over luma samples decoded by an actual codec
  // (JDK ImageIO). The corpus is synthesized IN-PLAN as real grayscale
  // PNGs whose pixel pattern is a pure arithmetic function of doc_id —
  // PNG is lossless, so the SQL oracle derives every decoded sample from
  // the same formula WITHOUT a decoder, and any codec/plumbing bug
  // breaks the hash check.
  // ---------------------------------------------------------------------

  /** Distinct pixel patterns: doc_id % PixelSeeds selects the pattern, so
    * each pattern recurs ~|docs|/PixelSeeds times — the perceptual-dup
    * groups [[pixelDhashDupes]] must recover. */
  val PixelSeeds = 40

  /** Pattern geometry/luma — single source for generator, decoder spec,
    * and SQL oracle. Sizes vary with the seed (≥ 9×8 so the 9×8 dHash
    * sample grid has distinct positions); the luma polynomial is
    * non-monotone in x once it wraps mod 256, so dHash bits vary with
    * (seed, x, y) instead of collapsing to all-ones. */
  def pixelSeed(docId: Long): Int = (docId % PixelSeeds).toInt
  def pixelWidth(seed: Int): Int = 9 + seed % 3
  def pixelHeight(seed: Int): Int = 8 + seed % 2
  def pixelLuma(seed: Int, x: Int, y: Int): Int =
    (seed * 31 + 7 * x * x + 13 * y + x * y) % 256

  /** In-plan corpus of REAL PNG payloads (one per document row): a
    * narrow map, codec state amortized per partition. */
  def syntheticPngs(docs: DataFrame): Dataset[Payload] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val s = pixelSeed(id)
        Payload(id, encodeGrayPng(pixelWidth(s), pixelHeight(s), (x, y) => pixelLuma(s, x, y)))
      }
    }
  }

  final case class PixelHash(doc_id: Long, width: Long, height: Long, dhash: Long)

  /** dHash (Krawetz '13) over REAL decoded luma: decode the PNG with
    * ImageIO, sample a 9×8 grid (gx(c) = c·(w−1)/8, gy(r) = r·(h−1)/7 —
    * nearest-sample downscale; exact, so cross-engine checkable, unlike
    * area-averaging), bit (r·8+c) = luma(gx(c+1),gy(r)) >
    * luma(gx(c),gy(r)). Equal patterns ⇒ equal hashes ⇒ `n_same` counts
    * perceptual-dup groups; banding the 64-bit hash for a Hamming
    * radius is [[Dedup]]'s SimHash machinery unchanged.
    *
    * Scale shape: decode + hash are a narrow per-partition map over
    * payload bytes (the codec never crosses a shuffle); the only
    * exchange is the 8-byte dhash dup-count. This is the production
    * image-dedup plan: fingerprint at ingest, group on the hash. */
  def pixelDhashDupes(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    val hashed = syntheticPngs(docs).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { p =>
        val img = decodeImage(p.payload).getOrElse(
          throw new IllegalStateException(s"undecodable PNG for doc ${p.doc_id}"))
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        def gx(c: Int): Int = c * (w - 1) / 8
        def gy(r: Int): Int = r * (h - 1) / 7
        var hash = 0L
        var r = 0
        while (r < 8) {
          var c = 0
          while (c < 8) {
            if (raster.getSample(gx(c + 1), gy(r), 0) > raster.getSample(gx(c), gy(r), 0))
              hash |= 1L << (r * 8 + c)
            c += 1
          }
          r += 1
        }
        PixelHash(p.doc_id, w.toLong, h.toLong, hash)
      }
    }.toDF()
    val wnd = org.apache.spark.sql.expressions.Window.partitionBy(col("dhash"))
    hashed.withColumn("n_same", count(lit(1)).over(wnd))
      .select(col("doc_id"), col("width"), col("height"), col("dhash"), col("n_same"))
  }

  /** [[pixelResize]] target geometry (every source image is ≥ 9×8, so
    * the nearest-neighbor map is a strict downsample). */
  val ResizeW = 8
  val ResizeH = 6

  final case class ResizeStats(doc_id: Long, width: Long, height: Long,
    sum_luma: Long, corner_tl: Long, corner_br: Long)

  /** Nearest-neighbor resize over REAL decoded pixels — the thumbnail /
    * fixed-input-shape step every vision pipeline runs before feature
    * extraction. Source pixel for target (x,y) is (x·w/RW, y·h/RH)
    * (integer floor — exact, so cross-engine checkable, unlike bilinear
    * kernels). The resized grid is summarized as exact integers
    * (sum + two corners) rather than re-encoded — the decode→transform→
    * aggregate shape is the surface; a re-encode would only exercise the
    * codec twice. Same scale shape as [[pixelDhashDupes]]: narrow
    * per-partition decode, no shuffle at all (no grouping needed). */
  def pixelResize(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    syntheticPngs(docs).mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { p =>
        val img = decodeImage(p.payload).getOrElse(
          throw new IllegalStateException(s"undecodable PNG for doc ${p.doc_id}"))
        val raster = img.getRaster
        val w = img.getWidth
        val h = img.getHeight
        def src(x: Int, y: Int): Int = raster.getSample(x * w / ResizeW, y * h / ResizeH, 0)
        var sum = 0L
        var y = 0
        while (y < ResizeH) {
          var x = 0
          while (x < ResizeW) { sum += src(x, y); x += 1 }
          y += 1
        }
        ResizeStats(p.doc_id, w.toLong, h.toLong, sum,
          src(0, 0).toLong, src(ResizeW - 1, ResizeH - 1).toLong)
      }
    }.toDF()
  }

  /** Every [[imageQuality]] seed divisible by this renders FLAT (one
    * gray level) — the defect class the flatness flag must catch. */
  val QcFlatMod = 5
  def qcLuma(seed: Int, x: Int, y: Int): Int =
    if (seed % QcFlatMod == 0) (seed * 7) % 256 else pixelLuma(seed, x, y)

  final case class QualityStats(doc_id: Long, width: Long, height: Long,
      n_px: Long, sum_luma: Long, var_num: Long, is_flat: Boolean,
      is_dark: Boolean, is_bright: Boolean)

  /** Image-quality gate over REAL decoded pixels — the admission filter
    * a multimodal pipeline runs after decode: per image the exact
    * integer first/second moments of the full luma grid and the three
    * classic defect flags — FLAT (zero variance: solid fills, dead
    * sensors), DARK (mean < 64) and BRIGHT (mean > 192, both as pure
    * integer comparisons sum ≶ bound·n — no division anywhere). The
    * variance is carried as its integer numerator n·Σx² − (Σx)², which
    * is zero exactly when the image is flat. One in five seeds renders
    * flat by construction, so the flag is exercised, not decorative.
    *
    * Scale shape: encode→decode→moments is one narrow mapPartitions;
    * only fixed-width stat rows ever move. */
  def imageQuality(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.map { id =>
        val s = pixelSeed(id)
        val w = pixelWidth(s)
        val h = pixelHeight(s)
        val img = decodeImage(encodeGrayPng(w, h, (x, y) => qcLuma(s, x, y)))
          .getOrElse(throw new IllegalStateException(s"undecodable PNG for doc $id"))
        val raster = img.getRaster
        var sum = 0L; var sumSq = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val v = raster.getSample(x, y, 0).toLong
            sum += v; sumSq += v * v
            x += 1
          }
          y += 1
        }
        val n = w.toLong * h
        QualityStats(id, w.toLong, h.toLong, n, sum, n * sumSq - sum * sum,
          n * sumSq == sum * sum, sum < 64L * n, sum > 192L * n)
      }
    }.toDF()
  }

  final case class LumaBin(doc_id: Long, bin: Long, n_px: Long)

  /** Per-image LUMA HISTOGRAM over REAL decoded pixels — the richer
    * sibling of [[imageQuality]]'s moments: 16 equal 16-level bins
    * (bin = luma div 16), emitted sparse (only non-empty bins) — the
    * exposure/contrast artifact a vision curation pass keeps per image.
    * Decode is the same JDK ImageIO round trip; bins are pure integer
    * division of decoded samples, so the oracle re-derives them from
    * the generator arithmetic.
    *
    * Scale shape: decode+bin is one narrow mapPartitions emitting at
    * most 16 rows per image — fixed-width, shuffle-free. */
  def imageHistogram(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { id =>
        val s = pixelSeed(id)
        val w = pixelWidth(s)
        val h = pixelHeight(s)
        val img = decodeImage(encodeGrayPng(w, h, (x, y) => qcLuma(s, x, y)))
          .getOrElse(throw new IllegalStateException(s"undecodable PNG for doc $id"))
        val raster = img.getRaster
        val bins = new Array[Long](16)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) { bins(raster.getSample(x, y, 0) / 16) += 1; x += 1 }
          y += 1
        }
        (0 until 16).iterator.filter(b => bins(b) > 0)
          .map(b => LumaBin(id, b.toLong, bins(b)))
      }
    }.toDF()
  }

  /** DuckDB half of [[imageHistogram]]: the same pixel fan-out as
    * [[imageQualityOracle]], binned by `luma // 16`. */
  val imageHistogramOracle: String = {
    val lum = s"(CASE WHEN seed % $QcFlatMod = 0 THEN (seed*7) % 256 " +
      "ELSE (seed*31 + 7*x*x + 13*y + x*y) % 256 END)"
    s"""WITH d AS (SELECT doc_id, doc_id % $PixelSeeds AS seed FROM documents),
       |g AS (SELECT doc_id, seed, 9 + seed % 3 AS w, 8 + seed % 2 AS h FROM d),
       |px AS (SELECT doc_id, seed, w, h, unnest(range(0, w)) AS x FROM g),
       |py AS (SELECT doc_id, seed, w, h, x, unnest(range(0, h)) AS y FROM px),
       |v AS (SELECT doc_id, $lum // 16 AS bin FROM py)
       |SELECT doc_id, bin::BIGINT AS bin, count(*)::BIGINT AS n_px
       |FROM v GROUP BY 1, 2""".stripMargin
  }

  /** DuckDB half of [[imageQuality]]: per-seed pixel fan-out
    * (`unnest(range)` twice), the same integer moments and flag
    * comparisons over the generator formula. */
  def imageQualityOracle: String = {
    val lum = s"(CASE WHEN seed % $QcFlatMod = 0 THEN (seed*7) % 256 " +
      "ELSE (seed*31 + 7*x*x + 13*y + x*y) % 256 END)"
    s"""WITH d AS (SELECT doc_id, doc_id % $PixelSeeds AS seed FROM documents),
       |g AS (SELECT doc_id, seed, 9 + seed % 3 AS w, 8 + seed % 2 AS h FROM d),
       |px AS (SELECT doc_id, seed, w, h, unnest(range(0, w)) AS x FROM g),
       |py AS (SELECT doc_id, seed, w, h, x, unnest(range(0, h)) AS y FROM px),
       |v AS (SELECT doc_id, w, h, $lum AS l FROM py),
       |m AS (SELECT doc_id, w, h, count(*)::BIGINT AS n, sum(l)::BIGINT AS s,
       |        sum(l*l)::BIGINT AS ss FROM v GROUP BY 1, 2, 3)
       |SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height, n AS n_px,
       |  s AS sum_luma, (n*ss - s*s)::BIGINT AS var_num,
       |  n*ss = s*s AS is_flat, s < 64*n AS is_dark, s > 192*n AS is_bright
       |FROM m""".stripMargin
  }

  /** DuckDB half of [[pixelResize]]: the same nearest-neighbor sample
    * positions over the arithmetic pattern (decode ≡ generator). */
  def pixelResizeOracle: String = {
    def lum(xExpr: String, yExpr: String): String =
      s"(seed*31 + 7*($xExpr)*($xExpr) + 13*($yExpr) + ($xExpr)*($yExpr)) % 256"
    def term(x: Int, y: Int): String =
      lum(s"(($x*w)//$ResizeW)", s"(($y*h)//$ResizeH)")
    val sum = (for (y <- 0 until ResizeH; x <- 0 until ResizeW) yield term(x, y))
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id, doc_id % $PixelSeeds AS seed FROM documents),
       |g AS (SELECT doc_id, seed, 9 + seed % 3 AS w, 8 + seed % 2 AS h FROM d)
       |SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height,
       |  ($sum)::BIGINT AS sum_luma,
       |  (${term(0, 0)})::BIGINT AS corner_tl,
       |  (${term(ResizeW - 1, ResizeH - 1)})::BIGINT AS corner_br
       |FROM g"""
      .stripMargin
  }

  /** [[tiffPages]] frame geometry (fixed per page; the page count
    * varies by seed). */
  val PageW = 9
  val PageH = 8

  /** Per-page luma for the multi-frame generator: page index shifts the
    * pattern so every frame differs. */
  def pageLuma(seed: Int, page: Int, x: Int, y: Int): Int =
    (seed * 31 + page * 59 + 7 * x * x + 13 * y + x * y) % 256

  /** Encode a multi-page grayscale TIFF (uncompressed, lossless) via
    * ImageIO's sequence writer — the JDK ships the TIFF plugin since
    * Java 9. */
  def encodeMultiPageTiff(pages: Seq[java.awt.image.BufferedImage]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    val writers = javax.imageio.ImageIO.getImageWritersByFormatName("tiff")
    require(writers.hasNext, "JDK TIFF writer missing")
    val writer = writers.next()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.prepareWriteSequence(null)
      pages.foreach(p => writer.writeToSequence(new javax.imageio.IIOImage(p, null, null), null))
      writer.endWriteSequence()
    } finally { writer.dispose(); ios.close() }
    out.toByteArray
  }

  final case class PageStats(doc_id: Long, page: Long, width: Long, height: Long, sum_luma: Long)

  /** REAL multi-frame container decode — frame extraction over an
    * actual multi-page TIFF (the video-pipeline shape [[sampleFrames]]
    * stubs over raw bytes, on a real container): synthesize 1 + seed%3
    * grayscale pages per document (pattern arithmetic in doc_id and
    * page index), write ONE multi-page TIFF payload through the JDK
    * TIFF sequence writer, then decode page-by-page with the reader
    * (`getNumImages` + indexed `read`) and summarize each frame's luma
    * exactly. TIFF is lossless, so the oracle re-derives every sample
    * from the generator formula — the [[pixelDhashDupes]] bridge, now
    * across a MULTI-frame container boundary.
    *
    * Scale shape: one narrow mapPartitions (encode+decode amortize the
    * codec per partition); the per-page fan-out happens inside the row
    * iterator, never via a shuffle. */
  def tiffPages(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { id =>
        val seed = pixelSeed(id)
        val nPages = 1 + seed % 3
        val imgs = (0 until nPages).map { p =>
          val img = new java.awt.image.BufferedImage(PageW, PageH,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          for (y <- 0 until PageH; x <- 0 until PageW)
            img.getRaster.setSample(x, y, 0, pageLuma(seed, p, x, y))
          img
        }
        val payload = encodeMultiPageTiff(imgs)
        // decode the real container: page count from the reader, pages
        // by index
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no reader for TIFF payload of doc $id")
        val reader = readers.next()
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val rows = (0 until n).map { p =>
          val img = reader.read(p)
          var sum = 0L
          for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            sum += img.getRaster.getSample(x, y, 0)
          PageStats(id, p.toLong, img.getWidth.toLong, img.getHeight.toLong, sum)
        }
        reader.dispose()
        iis.close()
        rows
      }
    }.toDF()
  }

  /** DuckDB half of [[tiffPages]]: page fan-out by formula, per-page
    * luma sum as one generated integer expression. */
  def tiffPagesOracle: String = {
    def lum(p: String, x: Int, y: Int): String =
      s"(seed*31 + ($p)*59 + ${7 * x * x + 13 * y} + ${x * y}) % 256"
    val sum = (for (y <- 0 until PageH; x <- 0 until PageW) yield lum("page", x, y))
      .mkString(" + ")
    s"""WITH d AS (SELECT doc_id, doc_id % $PixelSeeds AS seed FROM documents),
       |p AS (SELECT doc_id, seed, unnest(range(0, 1 + seed % 3)) AS page FROM d)
       |SELECT doc_id, page, $PageW::BIGINT AS width, $PageH::BIGINT AS height,
       |  ($sum)::BIGINT AS sum_luma
       |FROM p"""
      .stripMargin
  }

  /** Shared CTE chain: (doc_id, w, h, dhash) from the arithmetic
    * pattern, for [[pixelDhashOracle]] and [[pixelImageDedupOracle]]. */
  private def pixelDhashCtes: String = {
    def lum(xExpr: String, yExpr: String): String =
      s"(seed*31 + 7*($xExpr)*($xExpr) + 13*($yExpr) + ($xExpr)*($yExpr)) % 256"
    val terms = for (r <- 0 until 8; c <- 0 until 8) yield {
      val y = s"(($r*(h-1))//7)"
      val a = lum(s"((${c + 1}*(w-1))//8)", y)
      val b = lum(s"(($c*(w-1))//8)", y)
      s"(CASE WHEN $a > $b THEN ${1L << (r * 8 + c)} ELSE 0 END)"
    }
    s"""d AS (SELECT doc_id, doc_id % $PixelSeeds AS seed FROM documents),
       |g AS (SELECT doc_id, seed, 9 + seed % 3 AS w, 8 + seed % 2 AS h FROM d),
       |b AS (SELECT doc_id, w, h, (${terms.mkString(" + ")})::BIGINT AS dhash FROM g)""".stripMargin
  }

  /** DuckDB half of [[pixelDhashDupes]]: the SAME 64 grid comparisons
    * over the arithmetic pattern — never a decoder. Decode(encode(f))
    * == f is the bridge (PNG losslessness); the sign-bit term (bit 63)
    * is emitted LAST so every partial sum stays in BIGINT range. */
  def pixelDhashOracle: String =
    s"""WITH $pixelDhashCtes
       |SELECT doc_id, w::BIGINT AS width, h::BIGINT AS height, dhash,
       |  count(*) OVER (PARTITION BY dhash) AS n_same FROM b"""
      .stripMargin

  /** The composed image-dedup verdict: real decode → dHash → canonical
    * keeper (earliest doc per fingerprint), one plan — the image twin
    * of the text canonical-keeper selection. */
  def imageDedup(docs: DataFrame): DataFrame = {
    val wnd = org.apache.spark.sql.expressions.Window.partitionBy(col("dhash"))
    pixelDhashDupes(docs)
      .withColumn("keeper_id", min(col("doc_id")).over(wnd))
      .select(col("doc_id"), col("dhash"), col("keeper_id"),
        (col("doc_id") === col("keeper_id")).as("is_canonical"))
  }

  /** DuckDB half of [[imageDedup]]. */
  def pixelImageDedupOracle: String =
    s"""WITH $pixelDhashCtes
       |SELECT doc_id, dhash, min(doc_id) OVER (PARTITION BY dhash) AS keeper_id,
       |  doc_id = min(doc_id) OVER (PARTITION BY dhash) AS is_canonical FROM b"""
      .stripMargin

  /** Frames per shot in the [[shotBoundaries]] synthetic sequences —
    * consecutive frames within a shot are the SAME pattern panned one
    * column, so their luma histograms differ by at most 2·FrameH
    * (one column's values leave, one enters). */
  val ShotLen = 2
  /** Pattern change between shots: the quadratic and linear
    * coefficients shift per shot (a constant additive jump would only
    * rotate the histogram mod 256 and barely move its L1 — measured:
    * coefficient changes separate cuts ~4× better than a +97 offset). */
  val ShotJump = 97
  /** Frame size for the shot sequences — larger than the dHash pages
    * (24×16 = 384 px) so the 16-bin histogram statistic has room: the
    * within-shot pan moves at most 2·FrameH = 32 of its mass, while
    * independent frames land near the multinomial expectation ≈ 85. */
  val FrameW = 24
  val FrameH = 16
  /** Histogram-L1 cut threshold = the PROVABLE within-shot pan bound
    * (a one-column pan moves at most 2·FrameH histogram mass), so
    * false positives are impossible by construction; measured at
    * sf0.001: within-shot max L1 = 20, and 788/825 true cuts (95.5%)
    * clear the bound. */
  val CutThreshold: Long = 2L * FrameH

  /** Luma of frame `p` for a document seed — shot pattern plus a
    * one-column pan within the shot (x shifts by p mod [[ShotLen]]). */
  def shotLuma(seed: Int, p: Int, x: Int, y: Int): Int = {
    val u = x + p % ShotLen
    val shot = p / ShotLen
    (seed * 31 + shot * ShotJump + (7 + 11 * shot) * u * u +
      (13 + 5 * shot) * y + u * y) % 256
  }

  final case class ShotDelta(doc_id: Long, frame: Long, l1: Long, is_cut: Boolean)

  /** Shot-boundary detection over REAL decoded frames — the video-
    * ingest segmentation step (keyframe selection, per-shot sampling,
    * scene dedup all start from it): synthesize 4 + seed%3 frames per
    * document where shots change every [[ShotLen]] frames and frames
    * within a shot only PAN one column, write them through the JDK
    * multi-page TIFF writer, decode the real container frame-by-frame,
    * histogram each frame's decoded luma (16 bins), and flag
    * transitions whose histogram L1 exceeds [[CutThreshold]]. The
    * histogram detector is exactly what makes panning survivable: a
    * pan displaces pixel VALUES but barely changes their distribution
    * (L1 ≤ 2·FrameH), while a cut redraws the distribution.
    *
    * Integer-only end to end, so the oracle re-derives every verdict
    * from the generator formula through a plain pixel fan-out — no
    * fixed-order float chains needed. Scale shape: ONE narrow
    * mapPartitions (codec amortized per partition); all of a
    * document's frames live in one payload, so consecutive-frame
    * deltas compute inside the row iterator — zero shuffles. */
  def shotBoundaries(docs: DataFrame): DataFrame = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { it =>
      javax.imageio.ImageIO.setUseCache(false)
      it.flatMap { id =>
        val seed = pixelSeed(id)
        val nFrames = 4 + seed % 3
        val imgs = (0 until nFrames).map { p =>
          val img = new java.awt.image.BufferedImage(FrameW, FrameH,
            java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
          for (y <- 0 until FrameH; x <- 0 until FrameW)
            img.getRaster.setSample(x, y, 0, shotLuma(seed, p, x, y))
          img
        }
        val payload = encodeMultiPageTiff(imgs)
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(payload))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        require(readers.hasNext, s"no reader for TIFF payload of doc $id")
        val reader = readers.next()
        reader.setInput(iis)
        val n = reader.getNumImages(true)
        val hists = (0 until n).map { p =>
          val img = reader.read(p)
          val h = new Array[Long](16)
          for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
            h(img.getRaster.getSample(x, y, 0) / 16) += 1L
          h
        }
        reader.dispose()
        iis.close()
        (1 until n).map { t =>
          val l1 = (0 until 16).map(b => math.abs(hists(t)(b) - hists(t - 1)(b))).sum
          ShotDelta(id, t.toLong, l1, l1 > CutThreshold)
        }
      }
    }.toDF()
  }

  /** DuckDB half of [[shotBoundaries]]: the generator formula through a
    * pixel fan-out → per-frame 16-bin histograms → signed-union L1 per
    * transition. All integers, so no aggregation-order caveats. */
  def shotBoundariesOracle: String =
    s"""WITH d AS (SELECT doc_id, doc_id % $PixelSeeds AS seed FROM documents),
       |f AS (SELECT doc_id, seed, 4 + seed % 3 AS nf, unnest(range(0, 4 + seed % 3)) AS p FROM d),
       |px AS (SELECT doc_id, p,
       |        ((seed*31 + (p // $ShotLen) * $ShotJump
       |          + (7 + 11*(p // $ShotLen))*(x + p % $ShotLen)*(x + p % $ShotLen)
       |          + (13 + 5*(p // $ShotLen))*y + (x + p % $ShotLen)*y) % 256) // 16 AS bin
       |      FROM f,
       |      LATERAL (SELECT unnest(generate_series(0, ${FrameW - 1})) AS x),
       |      LATERAL (SELECT unnest(generate_series(0, ${FrameH - 1})) AS y)),
       |h AS (SELECT doc_id, p, bin, count(*) AS n FROM px GROUP BY 1, 2, 3),
       |u AS (SELECT doc_id, p + 1 AS frame, bin, n AS na, 0 AS nb FROM h
       |      UNION ALL SELECT doc_id, p, bin, 0, n FROM h),
       |l AS (SELECT doc_id, frame, bin, abs(sum(na) - sum(nb)) AS db FROM u GROUP BY 1, 2, 3),
       |r AS (SELECT l.doc_id, l.frame, CAST(sum(db) AS BIGINT) AS l1
       |      FROM l JOIN (SELECT DISTINCT doc_id, nf FROM f) c ON c.doc_id = l.doc_id
       |      WHERE l.frame >= 1 AND l.frame < c.nf GROUP BY 1, 2)
       |SELECT doc_id, frame, l1, l1 > $CutThreshold AS is_cut FROM r"""
      .stripMargin
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** LLM-data-pipeline operator specs over small controlled fixtures (the
  * testdata-scale behavior is pinned by the DuckDB oracle entries in
  * SparkEntry; these pin the operator semantics themselves). */
class PipelineSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog", "en"),
    (1L, "the quick brown fox jumps over the lazy cat", "en"), // near-dup of 0
    (2L, "completely different words appear here now always", "en"),
    (3L, "the quick brown fox jumps over the lazy dog", "en"), // exact dup of 0
    (4L, "tiny doc", "en"), // < 3 tokens → no shingles
  ).toDF("doc_id", "text", "lang")

  test("exact dedup keeps one row per distinct text with multiplicity") {
    val r = Dedup.exact(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(r(0L) == 2L) // docs 0 and 3 collapse to keeper 0
    assert(r(1L) == 1L && r(2L) == 1L && r(4L) == 1L)
    assert(!r.contains(3L))
  }

  test("row-hash dedup groups by the engine's canonical tuple hash") {
    val d = docs.withColumn("source", lit("s"))
    val r = Dedup.exactByRowHash(d, "doc_id", "documents", Seq("lang", "source", "text"))
      .collect().map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    assert(r.map(_._3).sum == 5L)
    assert(r.count(_._3 == 2L) == 1) // docs 0 and 3 share one content hash
    // the column hash IS the engine's tuple hash
    val expected = graft.hashing.Hashing.tupleHash("documents", Seq(
      "lang" -> graft.types.Value.StrV("en"),
      "source" -> graft.types.Value.StrV("s"),
      "text" -> graft.types.Value.StrV("the quick brown fox jumps over the lazy dog")))
    assert(r.exists(x => x._1 == expected && x._3 == 2L))
  }

  test("shingleRows emits distinct word 3-grams; short docs drop out") {
    val sh = Dedup.shingleRows(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val byDoc = sh.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    assert(byDoc(0L).contains("the quick brown"))
    assert(byDoc(0L).size == 7) // 9 tokens → 7 shingles, all distinct here
    assert(!byDoc.contains(4L))
    assert(byDoc(0L) == byDoc(3L))
  }

  test("minhash near-dup pipeline finds the planted pairs, never self-pairs") {
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // exact dup pair (0,3) has J=1; near-dup (0,1)/(1,3) share 6 of 8 shingles
    assert(pairs.exists(p => p._1 == 0L && p._2 == 3L && p._3 == 1.0))
    pairs.foreach { p =>
      assert(p._1 < p._2)
      assert(p._3 >= Dedup.JaccardThreshold && p._3 <= 1.0)
    }
  }

  test("containment flags an engulfed copy that jaccard misses") {
    val short = "alpha beta gamma delta epsilon"
    val long = short + " " + (1 to 60).map(i => s"tok$i").mkString(" ")
    val df = Seq((1L, short), (2L, long), (3L, "unrelated words entirely here now"))
      .toDF("doc_id", "text")
    val c = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.9).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(3)))
    // every shingle of doc 1 appears in doc 2 → containment 1.0
    assert(c.toSeq === Seq((1L, 2L, 1.0)))
    // symmetric jaccard on the same pair is far below any dedup threshold
    val j = Dedup.jaccardPairs(df, "doc_id", "text", threshold = 0.0001).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2))).toMap
    assert(j((1L, 2L)) < 0.06, j.toString)
  }

  test("containment respects the hot-shingle cap and the a<b canon") {
    val df = Seq((10L, "x y z x y z"), (20L, "x y z w q r"), (30L, "p d q w e r"))
      .toDF("doc_id", "text")
    val all = Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.0001).collect()
    all.foreach(r => assert(r.getLong(0) < r.getLong(1)))
    // a cap of 1 removes every shared shingle → no candidate pairs at all
    assert(Dedup.containmentPairs(df, "doc_id", "text", threshold = 0.0001,
      maxShingleFreq = Some(1)).count() === 0)
  }

  test("exact jaccard pairs agree with minhash-verified pairs on shared support") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", threshold = 0.5).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val lsh = Dedup.nearDupPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // LSH is a recall<=1 subset of the exact pairs at the same threshold
    assert(lsh.subsetOf(exact))
    assert(exact.contains((0L, 3L, 1.0)))
  }

  test("simhash: identical texts share fingerprints; near-dups are close, distinct texts differ") {
    val fp = TextPipeline.simhash(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    assert(fp(0L) == fp(3L))
    assert(fp(0L).length == 16)
    assert(fp(0L).forall("0123456789abcdef".contains(_)))
    def hamming(a: String, b: String): Int = a.zip(b).map { case (x, y) =>
      Integer.bitCount(Integer.parseInt(x.toString, 16) ^ Integer.parseInt(y.toString, 16))
    }.sum
    assert(hamming(fp(0L), fp(1L)) < hamming(fp(0L), fp(2L)))
  }

  test("simhash block-banding finds pairs within the hamming bound") {
    val pairs = Dedup.simhashPairs(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // exact dup pair (0,3): identical fingerprints, hamming 0
    assert(pairs.exists(p => p._1 == 0L && p._2 == 3L && p._3 == 0L))
    pairs.foreach { p =>
      assert(p._1 < p._2)
      assert(p._3 <= Dedup.MaxHamming)
    }
    // recall guarantee at hd <= MaxHamming: brute-force check on this corpus
    val fp = TextPipeline.simhash(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def hd(a: String, b: String): Int = a.zip(b).map { case (x, y) =>
      Integer.bitCount(Integer.parseInt(x.toString, 16) ^ Integer.parseInt(y.toString, 16))
    }.sum
    val brute = (for {
      (ia, sa) <- fp; (ib, sb) <- fp if ia < ib && hd(sa, sb) <= Dedup.MaxHamming
    } yield (ia, ib)).toSet
    assert(pairs.map(p => (p._1, p._2)).toSet == brute)
  }

  test("token stats and quality are pure per-row arithmetic") {
    val ts = TextPipeline.tokenStats(docs, "doc_id", "text").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(ts(0L)._1 == 9 && ts(0L)._2 == 8) // "the" repeats
    assert(ts(0L)._3 == math.rint(8.0 / 9.0 * 10000) / 10000)
    val q = TextPipeline.quality(docs, "doc_id", "text").collect()
    assert(q.forall(_.getAs[Double]("stop_ratio") >= 0.0))
    val r0 = q.find(_.getLong(0) == 0L).get
    assert(r0.getAs[Long]("n_tokens") == 9L)
    assert(r0.getAs[Double]("stop_ratio") == math.rint(2.0 / 9.0 * 10000) / 10000)
  }

  test("langId predicts by stopword profile with fixed tie-break") {
    val d = Seq(
      (0L, "the cat and the dog of the house"),  // en stopwords
      (1L, "der hund und die katze ist da"),     // de stopwords
      (2L, "xyzzy plugh frobozz"),               // no hits → tie → first profile
    ).toDF("doc_id", "text")
    val r = TextPipeline.langId(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getAs[String]("pred_lang"))).toMap
    assert(r(0L) == "en")
    assert(r(1L) == "de")
    assert(r(2L) == "en") // tie-break order
  }

  test("fingerprint: whitespace/case-insensitive full hash, shingle min-hash") {
    val d = Seq(
      (0L, "Hello   World again"),
      (1L, "hello world again"),
    ).toDF("doc_id", "text")
    val fp = TextPipeline.fingerprint(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), (r.getString(1), r.getString(2)))).toMap
    assert(fp(0L)._1 == fp(1L)._1) // normalization collapses case+spaces
    assert(fp(1L)._2 != null)      // min shingle hash present
  }

  test("ann: brute-force top-k is exact; lsh buckets partition; lsh top-k ⊆ brute order") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f) ++ Array.fill(62)(0.0f)),
      (1L, Array(0.99f, 0.1f) ++ Array.fill(62)(0.0f)),   // ≈ vec 0
      (2L, Array(-1.0f, 0.05f) ++ Array.fill(62)(0.0f)),  // opposite
      (3L, Array(0.7f, 0.7f) ++ Array.fill(62)(0.0f)),
    ).toDF("vec_id", "embedding")
    val topk = Ann.cosineTopK(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val for0 = topk.filter(_._1 == 0L).sortBy(-_._3)
    assert(for0.head._2 == 1L) // nearest to e1 is its perturbation
    assert(for0.last._2 == 2L) // farthest is the antipode
    val buckets = Ann.lshBuckets(vecs).collect()
    assert(buckets.map(_.getAs[Long]("n_vecs")).sum == 4L)
    val lsh = Ann.lshTopK(vecs).collect()
    // any LSH answer must be a same-bucket vector with its exact brute sim
    val bruteSims = topk.map(t => (t._1, t._2) -> t._3).toMap
    lsh.foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(bruteSims(key) == r.getDouble(2))
    }
  }

  test("native DotProduct matches the explicit chain and its interpreted eval") {
    val vecs = Seq(
      (0L, Array(1.5f, -2.25f, 0.5f)),
      (1L, Array(0.25f, 4.0f, -1.0f)),
    ).toDF("vec_id", "embedding")
    graft.functions.Functions.register(spark)
    val native = vecs.selectExpr("graft_dot(embedding, embedding) AS d")
      .collect().map(_.getDouble(0)).toSeq
    // left-associated explicit chain (the oracle's formulation)
    val chain = vecs.select(
      (1 to 3).map(i => element_at(col("embedding"), i).cast("double") *
        element_at(col("embedding"), i).cast("double")).reduce(_ + _).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(native == chain)
    assert(native.head == (1.5 * 1.5 + (-2.25) * (-2.25) + 0.5 * 0.5))
    // interpreted path agrees with codegen
    val e = graft.functions.DotProduct(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0f, 2.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(3.0f, 4.0f),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.FloatType, false)))
    assert(e.eval(null) == 11.0)
    assert(e.checkInputDataTypes().isSuccess)
  }

  test("ivf: cell assignment probes only the query's cell; embedding pairs stay in-bucket") {
    // ids 0,1 seed centroid cells; 10,11 are non-centroid members that
    // must assign to their nearest seed's cell (ids < NumCentroids would
    // each seed a singleton cell of their own)
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f) ++ Array.fill(62)(0.0f)),    // centroid seed
      (1L, Array(0.0f, 1.0f) ++ Array.fill(62)(0.0f)),    // centroid seed
      (10L, Array(0.9f, 0.1f) ++ Array.fill(62)(0.0f)),   // → cell of 0
      (11L, Array(0.1f, 0.9f) ++ Array.fill(62)(0.0f)),   // → cell of 1
    ).toDF("vec_id", "embedding")
    val ivf = Ann.ivfTopK(vecs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(ivf(0L)._1 == 10L && ivf(0L)._2 > 0.9) // probe finds the in-cell neighbor
    assert(ivf(1L)._1 == 11L && ivf(1L)._2 > 0.9)
    assert(ivf.size == 2) // queries are vec_id < NumQueries → 0 and 1 only

    val pairs = Ann.embeddingPairs(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    pairs.foreach { p =>
      assert(p._1 < p._2)
      assert(p._3 >= Ann.CosineDupThreshold)
    }
    // (0,10) are near-identical directions → must be reported
    assert(pairs.exists(p => p._1 == 0L && p._2 == 10L && p._3 > 0.9))
  }

  test("multimodal: binary payload plumbing with REAL ImageIO pixel decode") {
    // PNG round-trip is lossless: decoded raster == generator pattern,
    // sample for sample — the property the mm_pixel_dhash oracle rests on
    def pat(x: Int, y: Int): Int = (11 * x * x + 3 * y + x * y) % 256
    val png = MultiModal.encodeGrayPng(32, 16, pat)
    val img = MultiModal.decodeImage(png).getOrElse(fail("PNG did not decode"))
    assert(img.getWidth == 32 && img.getHeight == 16)
    for (y <- 0 until 16; x <- 0 until 32)
      assert(img.getRaster.getSample(x, y, 0) == pat(x, y), s"sample ($x,$y)")
    assert(MultiModal.decodeImage(Array[Byte](9, 9, 9)).isEmpty)

    val ds = Seq(
      MultiModal.Payload(1L, png),
      MultiModal.Payload(2L, Array[Byte](0, 0, 0)),
    ).toDS()
    val feats = MultiModal.extractFeatures(ds).collect().map(f => f.doc_id -> f).toMap
    assert(feats(1L).width == 32 && feats(1L).height == 16 && feats(1L).kind == "image")
    assert(feats(1L).n_bytes == png.length.toLong)
    assert(feats(2L).kind == "opaque" && feats(2L).width == 0)

    val stats = MultiModal.payloadStats(docs.withColumn("source", lit("s"))).collect()
    assert(stats.length == docs.count())
    stats.foreach { r =>
      assert(r.getAs[Long]("n_bytes") > 0)
      assert(r.getAs[String]("checksum").length == 32)
    }
  }

  test("extractFeatures decodes JPEG payloads too (lossy: dims exact, luma approximate)") {
    // a real JPEG written by the JDK encoder: dimensions survive exactly;
    // pixel values only approximately (lossy DCT) — which is WHY the
    // oracle rows use PNG, and why this stays a spec
    val img = new java.awt.image.BufferedImage(24, 18,
      java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    for (y <- 0 until 18; x <- 0 until 24) img.getRaster.setSample(x, y, 0, 128)
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", out)
    val jpeg = out.toByteArray
    val feats = MultiModal.extractFeatures(
      Seq(MultiModal.Payload(9L, jpeg)).toDS()).collect()
    assert(feats.length == 1)
    assert(feats(0).kind == "image" && feats(0).width == 24 && feats(0).height == 18)
    val dec = MultiModal.decodeImage(jpeg).getOrElse(fail("JPEG did not decode"))
    // uniform-gray roundtrip: every sample within DCT tolerance
    for (y <- 0 until 18; x <- 0 until 24)
      assert(math.abs(dec.getRaster.getSample(x, y, 0) - 128) <= 4, s"sample ($x,$y)")
  }

  test("pixelDhashDupes: dHash over decoded luma equals the generator-pattern dHash") {
    val df = (0L until 90L).toDF("doc_id")
    val out = MultiModal.pixelDhashDupes(df).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("width"), r.getAs[Long]("height"),
          r.getAs[Long]("dhash"), r.getAs[Long]("n_same")))).toMap
    assert(out.size == 90)
    // brute-force the expected hash straight from the pattern (no codec)
    def expected(id: Long): (Long, Long, Long) = {
      val s = MultiModal.pixelSeed(id)
      val w = MultiModal.pixelWidth(s)
      val h = MultiModal.pixelHeight(s)
      var hash = 0L
      for (r <- 0 until 8; c <- 0 until 8)
        if (MultiModal.pixelLuma(s, (c + 1) * (w - 1) / 8, r * (h - 1) / 7) >
            MultiModal.pixelLuma(s, c * (w - 1) / 8, r * (h - 1) / 7))
          hash |= 1L << (r * 8 + c)
      (w.toLong, h.toLong, hash)
    }
    for (id <- 0L until 90L) {
      val (w, h, hash) = expected(id)
      assert(out(id)._1 == w && out(id)._2 == h, s"dims for doc $id")
      assert(out(id)._3 == hash, s"decoded-luma dHash for doc $id")
    }
    // n_same counts hash-equal docs: derive the truth from the
    // brute-forced hashes (same-seed docs always share one; cross-seed
    // collisions, if the pattern family ever produced one, merge groups
    // identically on both sides)
    val wantSame = (0L until 90L).groupBy(id => expected(id)._3).map { case (h, ids) => h -> ids.size.toLong }
    for (id <- 0L until 90L)
      assert(out(id)._4 == wantSame(expected(id)._3), s"n_same for doc $id")
    // same seed ⇒ same group, always
    for (id <- 0L until 50L)
      assert(out(id)._3 == out(id + 40L)._3, s"docs $id and ${id + 40} share a seed")
  }

  test("multimodal: fixed-size chunking covers every byte exactly once") {
    // 100 bytes of 'a' + "END" → 103 bytes: chunks of 40 = [40, 40, 23]
    val df = Seq((1L, "a" * 100 + "END"), (2L, "xy")).toDF("doc_id", "text")
    val chunks = MultiModal.chunkPayloads(df, chunkBytes = 40)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val d1 = chunks.filter(_._1 == 1L).sortBy(_._2)
    assert(d1.map(c => (c._2, c._3)).toSeq === Seq((0L, 40L), (1L, 40L), (2L, 23L)))
    assert(d1.map(_._3).sum === 103L)
    // digests match a direct md5 of each byte slice
    val md = java.security.MessageDigest.getInstance("MD5")
    val full = ("a" * 100 + "END").getBytes("UTF-8")
    val want0 = md.digest(full.slice(0, 40)).map(b => f"$b%02x").mkString
    assert(d1.head._4 === want0)
    assert(chunks.filter(_._1 == 2L).map(c => (c._2, c._3)).toSeq === Seq((0L, 2L)))
    // narrow plan: no exchange anywhere
    val plan = MultiModal.chunkPayloads(df, 40).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking shuffled:\n$plan")
  }

  test("multimodal: PNG/JPEG header dimensions by byte-parse") {
    // hand-assembled headers with the real layouts: PNG sig + IHDR;
    // JPEG SOI + APP0(JFIF) + COM + SOF0 (dims big-endian u16)
    def u16(v: Int) = Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Int) = Array((v >> 24).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    val png = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte) ++
      u32(13) ++ "IHDR".getBytes ++ u32(1920) ++ u32(1080) ++
      Array[Byte](8, 2, 0, 0, 0)
    val app0 = Array(0xff, 0xe0).map(_.toByte) ++ u16(16) ++
      ("JFIF" + " ").getBytes ++ Array.fill[Byte](9)(0)
    val com = Array(0xff, 0xfe).map(_.toByte) ++ u16(7) ++ "hello".getBytes
    val sof0 = Array(0xff, 0xc0).map(_.toByte) ++ u16(17) ++ Array[Byte](8) ++
      u16(480) ++ u16(640) ++ Array.fill[Byte](10)(1)
    val jpeg = Array(0xff, 0xd8).map(_.toByte) ++ app0 ++ com ++ sof0 ++
      Array(0xff, 0xd9).map(_.toByte)
    val truncated = jpeg.take(10) // dies mid-APP0: must parse as opaque
    val rows = MultiModal.withImageDims(
      Seq((1L, png), (2L, jpeg), (3L, "plain text".getBytes), (4L, truncated))
        .toDF("id", "payload"), "payload")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(2), r.get(3), r.get(4)))).toMap
    assert(rows(1L) == (("png", 1920L, 1080L)))
    assert(rows(2L) == (("jpeg", 640L, 480L)))
    assert(rows(3L)._1 == "opaque" && rows(3L)._2 == null)
    assert(rows(4L)._1 == "opaque" && rows(4L)._2 == null)

    // generator → parser round-trip recovers exactly the seeded dims
    val dims = MultiModal.dimensions(docs.withColumn("n_chars", length(col("text"))))
      .collect()
    assert(dims.length == docs.count())
    dims.foreach { r =>
      val id = r.getLong(0)
      val kind = (id % 4).toInt
      val fmt = r.getString(1)
      if (kind == 3) assert(fmt == "opaque" && r.get(2) == null)
      else {
        assert(fmt == (if (kind == 0) "png" else "jpeg"), s"doc $id")
        assert(r.getLong(3) == 64 + (id * 31) % 1013, s"height of doc $id")
      }
    }
    // the resolution gate: null dims never keep (coalesce to false)
    val keeps = Seq((null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(500L)),
        (java.lang.Long.valueOf(500L), java.lang.Long.valueOf(500L)),
        (java.lang.Long.valueOf(500L), java.lang.Long.valueOf(100L)))
      .toDF("w", "h")
      .select(MultiModal.resolutionKeep(col("w"), col("h")).as("keep"))
      .collect().map(_.getBoolean(0)).toSeq
    assert(keeps == Seq(false, true, false))
  }

  test("image header parse never throws on arbitrary bytes (fuzz)") {
    val rnd = new scala.util.Random(7)
    val payloads = Seq.tabulate(300) { i =>
      val n = rnd.nextInt(64)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      // bias some toward magic prefixes so the walk paths get fuzzed too
      if (i % 3 == 0 && n >= 2) { b(0) = 0xff.toByte; b(1) = 0xd8.toByte }
      if (i % 7 == 0 && n >= 8)
        Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
          .map(_.toByte).copyToArray(b)
      (i.toLong, b)
    }
    val out = MultiModal.withImageDims(payloads.toDF("id", "payload"), "payload")
      .collect()
    assert(out.length == 300)
    out.foreach { r =>
      assert(Set("png", "jpeg", "opaque")(r.getString(2)), r.toString)
    }
  }

  test("WAV header parse: chunk walk hops LIST/JUNK (odd sizes padded), rejects malformed") {
    def u16le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def u32le(v: Int) = Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]) =
      id.getBytes ++ u32le(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    val fmtBody = u16le(1) ++ u16le(2) ++ u32le(44100) ++ u32le(176400) ++
      u16le(4) ++ u16le(16)
    // an ODD-length LIST before fmt: the pad byte must be skipped or
    // every later offset is off by one
    val wav = "RIFF".getBytes ++ u32le(0) ++ "WAVE".getBytes ++
      chunk("LIST", Array.fill[Byte](7)('l')) ++
      chunk("fmt ", fmtBody) ++
      chunk("JUNK", Array.fill[Byte](4)('j')) ++
      "data".getBytes ++ u32le(882000)
    // declared chunk size overruns the payload: must die, not loop
    val overrun = "RIFF".getBytes ++ u32le(0) ++ "WAVE".getBytes ++
      "LIST".getBytes ++ u32le(1000000) ++ "x".getBytes
    // fmt present but data absent: not a usable wav
    val noData = "RIFF".getBytes ++ u32le(0) ++ "WAVE".getBytes ++
      chunk("fmt ", fmtBody)
    val rows = MultiModal.withAudioMeta(
      Seq((1L, wav), (2L, overrun), (3L, noData), (4L, "words".getBytes))
        .toDF("id", "payload"), "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(2) == "wav")
    assert(rows(1L).getLong(3) == 44100L) // sample_rate
    assert(rows(1L).getLong(4) == 2L)     // channels
    assert(rows(1L).getLong(5) == 16L)    // bits_per_sample
    assert(rows(1L).getLong(6) == 176400L) // byte_rate
    assert(rows(1L).getLong(7) == 882000L) // data_bytes
    assert(rows(1L).getLong(8) == 5000L)   // duration_ms
    Seq(2L, 3L, 4L).foreach { id =>
      assert(rows(id).getString(2) == "opaque", s"payload $id")
      assert(rows(id).get(3) == null, s"payload $id fields must be null")
    }
  }

  test("MP4 box parse: nested walk hops free/udta, handles largesize, rejects malformed") {
    def u32be(v: Long) = Array((v >> 24).toByte, (v >> 16).toByte, (v >> 8).toByte, v.toByte)
    def u64be(v: Long) = u32be(v >> 32) ++ u32be(v & 0xffffffffL)
    def boxOf(id: String, body: Array[Byte]) = u32be(body.length + 8L) ++ id.getBytes ++ body
    val ftyp = boxOf("ftyp", "isom".getBytes ++ u32be(0))
    val mvhd = boxOf("mvhd", u32be(0) ++ u32be(0) ++ u32be(0) ++ u32be(90000) ++ u32be(450000))
    val moov = boxOf("moov", boxOf("udta", Array.fill[Byte](5)('u')) ++ mvhd)
    // a LARGESIZE free box (size==1 + u64) between ftyp and moov: the
    // 64-bit hop must be taken or every later offset is wrong
    val bigFree = u32be(1) ++ "free".getBytes ++ u64be(16 + 6) ++ Array.fill[Byte](6)('F')
    val mp4 = ftyp ++ bigFree ++ moov
    val badSize = ftyp ++ u32be(4) ++ "junk".getBytes // size < header
    val truncated = mp4.take(ftyp.length + 10)        // dies mid-largesize
    val rows = MultiModal.withVideoMeta(
      Seq((1L, mp4), (2L, badSize), (3L, truncated), (4L, "words".getBytes))
        .toDF("id", "payload"), "payload")
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getString(2) == "mp4")
    assert(rows(1L).getString(3) == "isom")
    assert(rows(1L).getLong(4) == 90000L)  // timescale
    assert(rows(1L).getLong(5) == 450000L) // duration
    assert(rows(1L).getLong(6) == 5000L)   // duration_ms
    Seq(2L, 3L, 4L).foreach { id =>
      assert(rows(id).getString(2) == "opaque", s"payload $id")
      assert(rows(id).get(3) == null, s"payload $id fields must be null")
    }
  }

  test("video box parse never throws on arbitrary bytes (fuzz)") {
    val rnd = new scala.util.Random(13)
    val payloads = Seq.tabulate(300) { i =>
      val n = rnd.nextInt(64)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      if (i % 3 == 0 && n >= 8) "ftyp".getBytes.copyToArray(b, 4)
      (i.toLong, b)
    }
    val out = MultiModal.withVideoMeta(payloads.toDF("id", "payload"), "payload")
      .collect()
    assert(out.length == 300)
    out.foreach(r => assert(Set("mp4", "opaque")(r.getString(2)), r.toString))
  }

  test("audio header parse never throws on arbitrary bytes (fuzz)") {
    val rnd = new scala.util.Random(11)
    val payloads = Seq.tabulate(300) { i =>
      val n = rnd.nextInt(64)
      val b = new Array[Byte](n); rnd.nextBytes(b)
      if (i % 3 == 0 && n >= 12) {
        "RIFF".getBytes.copyToArray(b)
        "WAVE".getBytes.copyToArray(b, 8)
      }
      (i.toLong, b)
    }
    val out = MultiModal.withAudioMeta(payloads.toDF("id", "payload"), "payload")
      .collect()
    assert(out.length == 300)
    out.foreach(r => assert(Set("wav", "opaque")(r.getString(2)), r.toString))
  }

  test("hot-shingle cap bounds candidate pairs under corpus-wide boilerplate") {
    // 60 docs, each: a unique body + the SAME boilerplate block. The
    // boilerplate shingles co-occur in all 60 docs, so uncapped
    // candidate generation degenerates to ~all-pairs; capped, only the
    // planted near-dup pair (shared body) survives as a candidate.
    val boiler = Dedup.SkewBoiler
    val docs = ((0 until 58).map(i =>
      (i.toLong, s"unique body words alpha$i beta$i gamma$i delta$i epsilon$i $boiler")) ++ Seq(
      // shared body long enough that capped J = 14/(31+31-14) ≈ 0.29
      // clears the 0.2 threshold even with the boiler inflating sizes
      (100L, s"the quick brown fox jumps over the lazy dog while the calm river flows gently north tonight $boiler"),
      (101L, s"the quick brown fox jumps over the lazy dog while the calm river flows gently north today $boiler")))
      .toDF("doc_id", "text")
    val inv = Dedup.shingleRows(docs, "doc_id", "text")
    val uncapped = Dedup.shingleCandidates(inv, "doc_id", None).count()
    val capped = Dedup.shingleCandidates(inv, "doc_id", Some(Dedup.SkewCapFreq)).count()
    val allPairs = 60L * 59 / 2
    assert(uncapped == allPairs, s"boilerplate must force all-pairs uncapped, got $uncapped")
    assert(capped <= 5L, s"cap must reduce candidates to genuine overlap, got $capped")
    // and the scored output still finds the planted near-dup pair
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text",
      threshold = 0.2, maxShingleFreq = Some(Dedup.SkewCapFreq)).collect()
    assert(pairs.exists(r => r.getLong(0) == 100L && r.getLong(1) == 101L))
  }

  test("band signatures are deterministic across invocations") {
    val a = Dedup.bandSignatures(docs, "doc_id", "text").collect().map(_.toSeq).toSet
    val b = Dedup.bandSignatures(docs, "doc_id", "text").collect().map(_.toSeq).toSet
    assert(a == b)
    assert(a.forall(_.length == 1 + Dedup.NumBands))
  }

  // ---- non-default configurations: the tunables are real arguments ----

  test("LSH geometry is tunable: 4×2 bands, bigram shingles") {
    val cfg = Dedup.LshConfig(numHashes = 8, numBands = 4, rowsPerBand = 2, shingleN = 2)
    val sigs = Dedup.bandSignatures(docs, "doc_id", "text", cfg)
    assert(sigs.columns.toSeq == Seq("doc_id", "b0", "b1", "b2", "b3"))
    // bigrams admit the 2-token doc the default trigram geometry drops
    assert(sigs.count() == 5)
    // the full pipeline still finds the exact-dup pair under the new geometry
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", cfg)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L)))
    assertThrows[IllegalArgumentException](Dedup.LshConfig(numHashes = 7, numBands = 4, rowsPerBand = 2))
  }

  test("jaccardPairs hot-shingle cap bounds the inverted index") {
    // every doc shares the hot shingle; only 0/1/3 share rare ones
    val hot = Seq(
      (0L, "common common common alpha beta gamma"),
      (1L, "common common common alpha beta delta"),
      (2L, "common common common zz yy xx"),
      (3L, "common common common alpha beta gamma")).toDF("doc_id", "text")
    val exact = Dedup.jaccardPairs(hot, "doc_id", "text", threshold = 0.01)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // cap = 3 removes the shingles shared by all four docs; pairs that
    // only overlapped on hot shingles disappear, the rare-overlap pairs stay
    val capped = Dedup.jaccardPairs(hot, "doc_id", "text", threshold = 0.01,
      maxShingleFreq = Some(3)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped.subsetOf(exact))
    assert(capped.contains((0L, 3L)) && capped.contains((0L, 1L)))
    assert(!capped.contains((0L, 2L)) && exact.contains((0L, 2L)))
  }

  test("hot-band-bucket cap drops oversized buckets before the pair join") {
    // three identical docs fill every band bucket to size 3; a distinct
    // identical pair fills its buckets to size 2 — cap=2 keeps only the pair
    val trip = "the quick brown fox jumps over the lazy dog"
    val duo = "completely different words appear here now always again"
    val d = Seq((0L, trip), (1L, trip), (2L, trip), (3L, duo), (4L, duo)).toDF("doc_id", "text")
    val uncapped = Dedup.nearDupPairs(d, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(uncapped == Set((0L, 1L), (0L, 2L), (1L, 2L), (3L, 4L)))
    val capped = Dedup.nearDupPairs(d, "doc_id", "text",
        Dedup.LshConfig(maxBandBucket = Some(2)))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped == Set((3L, 4L)))
    assertThrows[IllegalArgumentException](Dedup.LshConfig(maxBandBucket = Some(1)))
  }

  test("simhash banding is tunable: 8 blocks catch wider hamming bounds") {
    val near = Seq(
      (0L, "the quick brown fox jumps over the lazy dog tonight again"),
      (1L, "the quick brown fox jumps over the lazy dog tonight often"),
      (2L, "utterly unrelated content with zero shared vocabulary here")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(near, "doc_id", "text", maxHamming = 7, blocks = 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(pairs.forall(_._3 <= 7))
    assertThrows[IllegalArgumentException](
      Dedup.simhashPairs(near, "doc_id", "text", maxHamming = 4, blocks = 4))
  }

  test("connected components merge transitive chains; singletons label themselves") {
    val nodes = Seq(0L, 1L, 2L, 3L, 4L, 5L, 6L).toDF("doc_id")
    // chain 0-1-2-3 (no direct 0-3 edge), island 4-5, singleton 6
    val pairs = Seq((0L, 1L), (1L, 2L), (2L, 3L), (4L, 5L)).toDF("doc_a", "doc_b")
    val expected = Map(0L -> 0L, 1L -> 0L, 2L -> 0L, 3L -> 0L, 4L -> 4L, 5L -> 4L, 6L -> 6L)
    // driver union-find regime (small pair set)
    val local = Dedup.clustersFromPairs(nodes, pairs, "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(local == expected)
    // distributed propagation regime must agree (localThreshold = 0)
    val dist = Dedup.clustersFromPairs(nodes, pairs, "doc_id", localThreshold = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(dist == expected)
    // no pairs at all: every node is its own cluster
    val lone = Dedup.clustersFromPairs(nodes, pairs.limit(0), "doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(lone.forall(p => p._1 == p._2) && lone.length == 7)
    // unconverged distributed propagation must throw, not silently mislabel
    assertThrows[IllegalStateException](
      Dedup.clustersFromPairs(nodes, pairs, "doc_id", maxIter = 1, localThreshold = 0).collect())
  }

  test("near-dup clusters collapse exact+near dup groups over the LSH pairs") {
    val got = Dedup.nearDupClusters(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got.size == 5) // every doc labeled, including shingle-less doc 4
    assert(got(3L) == 0L && got(1L) == 0L) // 0/1/3 are one near-dup cluster
    assert(got(2L) == 2L && got(4L) == 4L) // singletons keep their own id
  }

  test("hash split is stable, salted, and respects bucket boundaries") {
    val ids = (0L until 512L).toDF("doc_id")
    val s1 = Splits.hashSplit(ids, "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val s2 = Splits.hashSplit(ids, "doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(s1.sortBy(_._1).sameElements(s2.sortBy(_._1))) // rerun-stable
    s1.foreach { case (_, bucket, split) =>
      val expected = if (bucket < Splits.TrainUpper) "train"
        else if (bucket < Splits.ValUpper) "val" else "test"
      assert(split == expected)
    }
    val bySplit = s1.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > bySplit("val") && bySplit("train") > bySplit("test"))
    // a different salt draws an independent assignment
    val salted = Splits.hashSplit(ids, "doc_id", salt = "other").collect()
      .map(r => (r.getLong(0), r.getString(2))).toMap
    val base = s1.map(p => (p._1, p._3)).toMap
    assert((0L until 512L).exists(i => salted(i) != base(i)))
    assertThrows[IllegalArgumentException](
      Splits.hashSplit(ids, "doc_id", trainUpper = "f0", valUpper = "10"))
  }

  test("repetition: looped text scores high, varied text zero, short text no grams") {
    val d = Seq(
      (0L, "spam spam spam spam spam spam"),          // one token, one gram
      (1L, "all seven words here are fully distinct"),
      (2L, "so") // < 3 tokens → zero grams
    ).toDF("doc_id", "text")
    val r = TextPipeline.repetition(d, "doc_id", "text").collect()
      .map(x => (x.getLong(0), (x.getLong(1), x.getDouble(2), x.getLong(3), x.getDouble(4)))).toMap
    val (n0, dt0, g0, dg0) = r(0L)
    assert(n0 == 6 && g0 == 4)
    assert(dt0 == 0.8333 && dg0 == 0.75) // 1 distinct of 6 tokens / 1 of 4 grams
    val (_, dt1, _, dg1) = r(1L)
    assert(dt1 == 0.0 && dg1 == 0.0)
    val (n2, _, g2, dg2) = r(2L)
    assert(n2 == 1 && g2 == 0 && dg2 == 0.0)
  }

  test("contamination flags corpus docs sharing enough shingles with the benchmark") {
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // near-copy of bench 1
      (11L, "completely unrelated corpus content lives right here"),
      (12L, "the quick brown fox naps all day")              // shares 2 shingles with bench 1
    ).toDF("doc_id", "text")
    val bench = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "benchmark questions about astrophysics and chemistry")).toDF("doc_id", "text")
    val hits = Dedup.contamination(corpus, bench, "doc_id", "text")
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(hits((10L, 1L)) == 7L) // full 7-shingle overlap
    assert(hits((12L, 1L)) == 2L) // "the quick brown" + "quick brown fox"
    assert(!hits.keySet.exists(_._1 == 11L)) // clean doc stays clean
    assert(!hits.keySet.exists(_._2 == 2L))  // untouched benchmark doc flags nothing
    // raising the threshold drops the weak overlap
    val strict = Dedup.contamination(corpus, bench, "doc_id", "text", minOverlap = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strict == Set((10L, 1L)))
  }

  test("PII redaction replaces emails, IPv4s, and phone runs; clean text is untouched") {
    import TextPipeline.RedactionFixture
    val r = TextPipeline.redact(RedactionFixture.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getString(1) == "contact me at <EMAIL> or at work")
    assert(r(2L).getString(1) == "server <IP> and <IP> timed out")
    assert(r(3L).getString(1) == "call <PHONE> or <PHONE> now")
    assert(r(4L).getString(1) == "mixed: <EMAIL> from <IP> dialed <PHONE>")
    assert(r(5L).getString(1) == RedactionFixture.toMap.apply(5L)) // untouched
    // per-pattern counts (emails, ipv4, phones)
    assert((r(4L).getLong(2), r(4L).getLong(3), r(4L).getLong(4)) == ((1L, 1L, 1L)))
    assert((r(2L).getLong(2), r(2L).getLong(3), r(2L).getLong(4)) == ((0L, 2L, 0L)))
  }

  test("canonical keepers: highest quality wins within a cluster, ties break by id") {
    // docs 0, 1, 3 cluster together (near/exact dups); 2 and 4 are singletons
    val got = Dedup.canonicalKeepers(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got.keySet == Set(0L, 2L, 4L))
    val (keeper, n) = got(0L)
    assert(n == 3L)
    // quality is identical for the exact dups 0 and 3 → keeper ties to
    // the smaller id among the argmax set
    val q = TextPipeline.quality(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(6)).toMap
    val best = Seq(0L, 1L, 3L).maxBy(id => (q(id), -id))
    assert(keeper == best)
    assert(got(2L) == ((2L, 1L)) && got(4L) == ((4L, 1L)))
  }

  test("unicode-word tokenizer: punctuation splits, diacritics and digits stay inside tokens") {
    val d = Seq((0L, "Hello, wörld 42—done!"), (1L, "...!!!")).toDF("doc_id", "text")
    val uni = TextPipeline.Tokenizer.UnicodeWords
    val r = TextPipeline.tokenStats(d, "doc_id", "text", uni).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2)))).toMap
    assert(r(0L) == ((4L, 4L))) // Hello | wörld | 42 | done
    assert(r(1L) == ((0L, 0L))) // all-symbol text: zero tokens
    // whitespace tokenizer sees 3 raw chunks for doc 0 (punct attached)
    val ws = TextPipeline.tokenStats(d, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(ws(0L) == 3L)
    // packing under the alternate tokenizer counts the same tokens
    val packed = Packing.pack(d, "doc_id", "text", capacity = 8, tokenizer = uni)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    assert(packed(0L) == 4L && packed(1L) == 0L)
  }

  test("trained IVF quantizer: recall@1 at least matches the untrained first-N baseline") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val exact = Ann.cosineTopK(vecs, k = 1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def recallAt1(iters: Int): Double = {
      val got = Ann.ivfTopK(vecs, iters = iters).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      exact.count { case (q, nn) => got.get(q).contains(nn) }.toDouble / exact.size
    }
    val untrained = recallAt1(0)
    val trained = recallAt1(Ann.KMeansIters)
    info(s"IVF recall@1 on testdata queries: untrained=$untrained trained=$trained")
    assert(trained >= untrained,
      s"Lloyd training degraded recall: $trained < $untrained")
  }

  test("PQ-ADC: codebooks have full geometry, top-1 recalls most exact inner-product neighbors") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val books = Ann.pqCodebooks(vecs)
    assert(books.length == Ann.PqSubspaces)
    books.foreach { b =>
      assert(b.nonEmpty && b.length <= Ann.PqCentroids) // Lloyd may drop empty cells
      b.foreach { case (_, ce) => assert(ce.length == Ann.PqSubDim) }
    }
    // exact top-1 by RAW inner product (the thing ADC approximates)
    import org.apache.spark.sql.expressions.Window
    val n = vecs.select(col("vec_id"), col("embedding"))
    val q = broadcast(n.filter(col("vec_id") < Ann.NumQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe")))
    val dotCol = graft.functions.Functions.dot(spark, col("qe"), col("embedding"))
    val w = Window.partitionBy(col("query_id")).orderBy(col("ip").desc, col("vec_id"))
    val exact = n.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("ip", dotCol)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rn") === 1)
      .collect().map(r => r.getAs[Long]("query_id") -> r.getAs[Long]("vec_id")).toMap
    val got = Ann.pqTopK(vecs).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.keySet == exact.keySet)
    // structureless random embeddings are PQ's worst case, so the
    // honest metric is the rerank window: the ADC winner must land in
    // the exact top-25 (top 5% of this corpus) — the set a real
    // deployment re-scores at full precision
    val window = 25
    val w25 = Window.partitionBy(col("query_id")).orderBy(col("ip").desc, col("vec_id"))
    val top25 = n.join(q, col("vec_id") =!= col("query_id"))
      .withColumn("ip", dotCol)
      .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w25))
      .filter(col("rn") <= window)
      .collect().groupBy(_.getAs[Long]("query_id"))
      .view.mapValues(_.map(_.getAs[Long]("vec_id")).toSet).toMap
    val inWindow = got.count { case (qid, nn) => top25(qid).contains(nn) }.toDouble / got.size
    info(s"PQ-ADC top-1 within exact top-$window: $inWindow")
    assert(inWindow >= 0.8, s"PQ rerank-window recall collapsed: $inWindow")
  }

  test("IVF×PQ: neighbors share the query's coarse cell; deterministic; old oracles intact") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Ann.ivfPqTopK(vecs).collect()
    assert(out.nonEmpty)
    // the composed probe must return at most one neighbor per query and
    // never the query itself
    assert(out.map(_.getLong(0)).distinct.length == out.length)
    out.foreach(r => assert(r.getLong(0) != r.getLong(1)))
    val again = Ann.ivfPqTopK(vecs).collect()
    assert(out.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
    // the refactor did not drift the shared-CTE oracles
    assert(Oracles.annIvfTopK.contains("asg") &&
      Oracles.annIvfPqTopK.contains("asg") &&
      Oracles.annIvfPqTopK.contains("af_0"))
  }

  test("ANN tunables: plane count reshapes buckets, centroid count reshapes cells") {
    val vecs = (0L until 32L).map(i =>
      (i, Array.tabulate(Ann.Dim)(d => ((i * 31 + d * 7) % 13 - 6).toFloat))).toDF("vec_id", "embedding")
    val b2 = Ann.lshBuckets(vecs, planes = 2).collect().map(_.getLong(0)).toSet
    assert(b2.subsetOf((0L until 4L).toSet)) // 2 planes → ≤4 buckets
    val b6 = Ann.lshBuckets(vecs, planes = 6).collect().map(_.getLong(0)).toSet
    assert(b6.forall(b => b >= 0 && b < 64))
    val ivf = Ann.ivfTopK(vecs, numCentroids = 2, numQueries = 3).collect()
    assert(ivf.map(_.getLong(0)).toSet.subsetOf(Set(0L, 1L, 2L)))
    val topk = Ann.cosineTopK(vecs, k = 5, numQueries = 2)
    assert(topk.groupBy(col("query_id")).count().collect().forall(_.getLong(1) == 5L))
  }

  test("lmScore: mean transition probability in exact fixed-point") {
    // corpus bigrams: "a b" x3 (docs 0,1), "b a" x1, "b c" x1 (doc 1)
    // c1: a->4? no: prefixes: a appears as w1 in "a b"(3x) => c1(a)=3... recompute in assertions
    val tiny = Seq(
      (0L, "a b"),
      (1L, "a b a b c"),
      (2L, "z"), // single token -> 0 bigrams, NULL score
    ).toDF("doc_id", "text")
    val out = TextPipeline.lmScore(tiny, "doc_id", "text").collect()
      .map(r => r.getLong(0) -> r).toMap
    // bigram counts: (a,b)=3, (b,a)=1, (b,c)=1 ; prefix counts: a=3, b=2
    // doc 0: one bigram (a,b): q = 3_000_000 div 3 = 1_000_000 -> score 1.0
    assert(out(0L).getLong(1) == 1L)
    assert(out(0L).getDouble(2) == 1.0)
    // doc 1: bigrams (a,b),(b,a),(a,b),(b,c) -> q = 1e6, 5e5, 1e6, 5e5
    // sum = 3_000_000 over 4*1e6 -> 0.75
    assert(out(1L).getLong(1) == 4L)
    assert(out(1L).getDouble(2) == 0.75)
    // sub-2-token doc: zero bigrams, NULL score
    assert(out(2L).getLong(1) == 0L)
    assert(out(2L).isNullAt(2))
  }

  test("centroidOutliers: planted off-centroid member wins its group; exact arithmetic") {
    val dim = Ann.Dim
    // group 0: 4 near-identical vectors + 1 planted far outlier;
    // group 1: 3 identical vectors (all dist2 tie -> vec_id order)
    val mk = (base: Float) => Array.fill(dim)(base)
    val rows = Seq(
      (0, 10L, mk(0.1f)), (0, 11L, mk(0.1f)), (0, 12L, mk(0.11f)),
      (0, 13L, mk(0.09f)), (0, 14L, mk(3.0f)), // outlier
      (1, 20L, mk(-0.5f)), (1, 21L, mk(-0.5f)), (1, 22L, mk(-0.5f)),
    ).toDF("label", "vec_id", "embedding")
    val out = Embeddings.centroidOutliers(rows, topK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val g0 = out.filter(_._1 == 0L).sortBy(_._2)
    // the planted outlier must rank first in group 0
    assert(out.filter(_._1 == 0L).maxBy(_._3)._2 == 14L)
    assert(g0.length == 2)
    // group 1: identical members -> dist2 0, tie broken by vec_id asc
    val g1 = out.filter(_._1 == 1L).map(x => (x._2, x._3)).sortBy(_._1)
    assert(g1.toSeq == Seq((20L, 0L), (21L, 0L)))
    assert(out.forall(_._4 > 0)) // n_members rides along
    // deterministic across runs (exact integer arithmetic end-to-end)
    val again = Embeddings.centroidOutliers(rows, topK = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet == again.toSet)
  }

  test("filteredCosineTopK: predicate restricts the corpus side only") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val out = Ann.filteredCosineTopK(vecs, col("label") === Ann.FilterLabel)
    val labels = vecs.select(col("vec_id"), col("label")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every returned neighbor satisfies the predicate...
    rows.foreach(r => assert(labels(r.getLong(1)) == Ann.FilterLabel))
    // ...queries are NOT restricted (some query must be off-slice)
    assert(rows.map(_.getLong(0)).distinct.exists(q => labels(q) != Ann.FilterLabel))
    // equivalent to exact top-k over the pre-filtered corpus + all queries
    val expected = {
      import org.apache.spark.sql.expressions.Window
      val n = vecs.select(col("vec_id"), col("embedding"), col("label"))
      val q = n.filter(col("vec_id") < Ann.NumQueries)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"))
      val dot = graft.functions.Functions.dot(spark, col("qe"), col("embedding"))
      val qn = org.apache.spark.sql.functions.sqrt(
        graft.functions.Functions.dot(spark, col("qe"), col("qe")))
      val cn = org.apache.spark.sql.functions.sqrt(
        graft.functions.Functions.dot(spark, col("embedding"), col("embedding")))
      val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("vec_id"))
      n.filter(col("label") === Ann.FilterLabel)
        .join(q, col("vec_id") =!= col("qid"))
        .withColumn("sim", org.apache.spark.sql.functions.round(dot / (qn * cn), 4))
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter(col("rn") <= Ann.TopK)
        .select(col("qid"), col("vec_id"), col("sim"))
        .collect().map(_.toSeq).toSet
    }
    assert(rows.map(_.toSeq).toSet == expected)
  }

  test("lshRecall: one-row eval consistent with its two component queries") {
    val vecs = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val row = Ann.lshRecall(vecs).collect() match {
      case Array(r) => r
      case other => fail(s"expected 1 row, got ${other.length}")
    }
    val nQueries = row.getLong(0)
    val nAnswered = row.getLong(1)
    val nHits = row.getLong(2)
    val recall = row.getDouble(3)
    assert(nQueries == Ann.NumQueries.toLong)
    assert(nAnswered <= nQueries && nHits <= nAnswered)
    assert(recall == math.round(nHits.toDouble / Ann.NumQueries * 10000) / 10000.0)
    // cross-check against the component queries composed by hand
    val approx = Ann.lshTopK(vecs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val exact = Ann.cosineTopK(vecs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(nAnswered == approx.size.toLong)
    assert(nHits == approx.count(exact.contains).toLong)
  }

  test("mixTokenBudget: proportional integer budgets, straddling doc admitted, zero weight excludes") {
    // sA: 3 docs x 4 tokens; sB: 2 docs x 4 tokens; weights A=3, B=0,
    // default 1 (unused), budget 16 -> W=3, A budget=(16*3) div 3=16? no:
    // sources present: A(3), B(0) -> W=3; A: 16, B: 0
    val docs = Seq(
      (1L, "a b c d", "sA"), (2L, "e f g h", "sA"), (3L, "i j k l", "sA"),
      (4L, "m n o p", "sB"), (5L, "q r s t", "sB"),
    ).toDF("doc_id", "text", "source")
    val out = Sampling.mixTokenBudget(docs, "doc_id", "source", "text",
      Seq("sA" -> 3L, "sB" -> 0L), 1L, 16L).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    // every sB doc rejected outright (budget 0)
    assert(Seq(4L, 5L).forall(id => out(id)._4 == 0L && !out(id)._5))
    // sA budget 16 >= 12 total tokens: all three admitted
    assert(Seq(1L, 2L, 3L).forall(id => out(id)._4 == 16L && out(id)._5))
    // tighter budget: 5 tokens -> first doc (hash order) admitted at
    // cum_before=0 (straddling), second at cum_before=4 admitted
    // (4 < 5, straddles), third at cum_before=8 rejected
    val tight = Sampling.mixTokenBudget(docs, "doc_id", "source", "text",
      Seq("sA" -> 1L, "sB" -> 0L), 1L, 5L).collect()
      .filter(_.getString(1) == "sA")
      .map(r => (r.getLong(3), r.getBoolean(5))).sortBy(_._1)
    assert(tight.map(_._1).toSeq == Seq(0L, 4L, 8L))
    assert(tight.map(_._2).toSeq == Seq(true, true, false))
    // deterministic admission order across runs (salted hash, no rand())
    val again = Sampling.mixTokenBudget(docs, "doc_id", "source", "text",
      Seq("sA" -> 3L, "sB" -> 0L), 1L, 16L).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    assert(out == again)
  }

  test("cooccurrence: windowed pairs, lexical normalization, log-free PMI fraction") {
    // doc: "b a b" window 2 -> positional pairs (b,a),(b,b),(a,b)
    // normalized: (a,b) x2, (b,b) x1 ; unigrams a=1, b=2, N=3
    val tiny = Seq((1L, "b a b")).toDF("doc_id", "text")
    val out = TextPipeline.cooccurrence(tiny, "doc_id", "text", window = 2, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    assert(out(("a", "b")) == ((2L, 1L, 2L, 3.0)))  // 2*3/(1*2)
    assert(out(("b", "b")) == ((1L, 2L, 2L, 0.75))) // 1*3/(2*2)
    assert(out.size == 2)
    // window 1 sees only adjacent pairs: (b,a),(a,b) -> (a,b) x2
    val w1 = TextPipeline.cooccurrence(tiny, "doc_id", "text", window = 1, topK = 10)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(w1 == Map(("a", "b") -> 2L))
  }

  test("commonNeighbors: non-adjacent pairs ranked by shared neighbors; hub cap drops centers") {
    import graft.operators.Triangles
    // star center 9 over {1,2,3} plus edge 1-2: pairs (1,3),(2,3) share
    // only 9; (1,2) is adjacent -> excluded despite sharing 9
    val edges = Seq((1L, 9L), (2L, 9L), (3L, 9L), (1L, 2L)).toDF("x", "y")
    val canon = Triangles.canonicalEdges(edges, "x", "y")
    val out = Triangles.commonNeighbors(canon, topK = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // adjacency {1-9, 2-9, 3-9, 1-2}: (1,3) and (2,3) share center 9 and
    // are non-adjacent; every other sharing pair ((1,2), (1,9), (2,9))
    // is an existing edge and must be anti-joined out
    assert(out == Map((1L, 3L) -> 1L, (2L, 3L) -> 1L))
    // capping degree at 2 drops center 9 (degree 3): no wedges survive
    // except via centers 1 and 2, whose pairs are all adjacent
    val capped = Triangles.commonNeighbors(canon, topK = 10, maxDegree = Some(2L))
      .collect()
    assert(capped.isEmpty)
  }

  test("truncatedRecall: full dims give recall 1.0; recall is monotone in the prefix") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    def recall(dims: Int): Double =
      Ann.truncatedRecall(emb, dims).collect()(0).getDouble(3)
    // at dims = Dim the "truncated" top-1 IS the exact top-1 → always
    // inside the exact top-k
    assert(recall(Ann.Dim) === 1.0)
    assert(recall(16) <= recall(48))
  }

  test("hardNegatives: only cross-label answers, exactly k per query, most-similar first") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val rows = Ann.hardNegatives(emb, k = 3, numQueries = 5).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getInt(3), r.getDouble(4)))
    assert(rows.length === 15)
    assert(rows.forall { case (_, ql, _, nl, _) => ql != nl })
    // per query, sims are the top of the cross-label distribution:
    // no cross-label vector outside the answer set may beat the floor
    val byQ = rows.groupBy(_._1)
    assert(byQ.values.forall(_.length == 3))
  }

  test("phashDupes: identical payloads collide, different byte gradients do not") {
    import graft.pipeline.MultiModal
    val base = (0 until 200).map(i => ('a' + (i * 7) % 26).toChar).mkString
    val docs = Seq(
      (1L, base), (2L, base),                  // exact dup pair
      (3L, base.reverse),                      // opposite gradients
      (4L, "short"))                           // under 65 bytes → excluded
      .toDF("doc_id", "text")
    val out = MultiModal.phashDupes(docs).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(!out.contains(4L))
    assert(out(1L)._1 === out(2L)._1 && out(1L)._2 === 2L && out(2L)._2 === 2L)
    assert(out(3L)._1 !== out(1L)._1)
    assert(out(3L)._2 === 1L)
  }

  test("clusteringCoeff: triangle vertices score 1.0, hub with pendant scores lower") {
    import graft.operators.Triangles
    // triangle {1,2,3}; pendant 4 hangs off 1 → deg(1)=3, T(1)=1 →
    // coeff 2/(3·2) = 0.3333; nodes 2,3 close fully; 4 has deg 1 → out
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (1L, 4L)).toDF("a", "b")
    val out = Triangles.clusteringCoeff(edges).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    assert(out === Map(
      1L -> ((3L, 1L, 0.3333)),
      2L -> ((2L, 1L, 1.0)),
      3L -> ((2L, 1L, 1.0))))
  }

  test("jaccardLinks: degree normalization reorders what raw counts cannot") {
    import graft.operators.Triangles
    // hub 9 connects {1,2,3,4}; besides that, 5-6-7 is a path through 6.
    // Pair (5,7) shares only 6 but deg(5)=deg(7)=1 → jaccard 1/1 = 1.0;
    // hub pairs like (1,2) share only 9 with deg 1 each → also 1.0 via
    // the hub... so give 1 and 2 an extra neighbor to split them
    val edges = Seq(
      (1L, 9L), (2L, 9L), (3L, 9L), (4L, 9L),
      (1L, 8L), (2L, 8L),
      (5L, 6L), (6L, 7L)).toDF("x", "y")
    val canon = Triangles.canonicalEdges(edges, "x", "y")
    val out = Triangles.jaccardLinks(canon, topK = 100).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
      .toMap
    // (5,7): common {6}, degrees 1,1 → 1/(1+1-1) = 1.0 — the top score
    assert(out((5L, 7L)) === ((1L, 1L, 1L, 1.0)))
    // (1,2): common {8,9}, degrees 2,2 → 2/(2+2-2) = 1.0
    assert(out((1L, 2L)) === ((2L, 2L, 2L, 1.0)))
    // (3,4): common {9}, degrees 1,1 → 1.0; (1,3): common {9}, degrees
    // 2,1 → 1/2 — the hub pair the normalization demotes
    assert(out((1L, 3L)) === ((1L, 2L, 1L, 0.5)))
    // adjacent pairs never appear
    assert(!out.contains((5L, 6L)) && !out.contains((1L, 9L)))
  }

  test("mixTokenBudget: admission is monotone in the budget (scalacheck)") {
    import org.scalacheck.{Gen, Prop}
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60).cache()
    docs.count()
    def admitted(budget: Long): Set[Long] =
      Sampling.mixTokenBudget(docs, "doc_id", "source", "text",
          Seq("src0" -> 2L), 1L, budget)
        .filter(col("admitted")).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    val budgets = Gen.choose(1L, 8000L)
    // a bigger global budget can only grow every source's budget
    // (integer division is monotone in the numerator), and a bigger
    // source budget admits a superset under the same hash order
    val prop = Prop.forAll(budgets, budgets) { (b1raw: Long, b2raw: Long) =>
      val (b1, b2) = (math.min(b1raw, b2raw), math.max(b1raw, b2raw))
      admitted(b1).subsetOf(admitted(b2))
    }
    val params = org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(6)
    val result = org.scalacheck.Test.check(params, prop)
    docs.unpersist()
    assert(result.passed, result.status.toString)
  }

  test("sampleFrames: stepped generation, tail frame short, stride 1 = full chunking") {
    val d = Seq((1L, "a" * 200)).toDF("doc_id", "text") // 200 bytes -> frames 0..3 at 64B
    val s4 = MultiModal.sampleFrames(d, frameBytes = 64, stride = 4).collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    assert(s4.toSeq == Seq((0L, 64L))) // only frame 0 at stride 4
    val s2 = MultiModal.sampleFrames(d, frameBytes = 64, stride = 2).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(s2.toSeq == Seq((0L, 64L), (2L, 64L)))
    // stride 1 reproduces the full chunk grid (incl. the 8-byte tail)
    val s1 = MultiModal.sampleFrames(d, frameBytes = 64, stride = 1).collect()
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(s1.toSeq == Seq((0L, 64L), (1L, 64L), (2L, 64L), (3L, 8L)))
    val chunks = MultiModal.chunkPayloads(d, chunkBytes = 64).collect()
      .map(r => (r.getLong(1), r.getString(3))).toMap
    MultiModal.sampleFrames(d, frameBytes = 64, stride = 1).collect().foreach { r =>
      assert(chunks(r.getLong(1)) == r.getString(3)) // same frame digests
    }
  }

  test("fertility and confusion derive from the shared tokenizer/langid maps") {
    val d = Seq(
      (1L, "the cat, and the dog!", "en"),   // ws 5, unicode 5
      (2L, "der hund und die katze", "de"),  // ws 5, unicode 5
    ).toDF("doc_id", "text", "lang")
    val fert = d.select(col("lang"),
        size(TextPipeline.Tokenizer.Whitespace.of(col("text"))).as("ws"),
        size(TextPipeline.Tokenizer.UnicodeWords.of(col("text"))).as("uni"))
      .collect().map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(fert("en") == ((5, 5)))
    assert(fert("de") == ((5, 5)))
    val conf = TextPipeline.langId(d, "doc_id", "text")
      .join(d.select(col("doc_id"), col("lang").as("labeled")), "doc_id")
      .groupBy(col("labeled"), col("pred_lang")).count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(conf == Map(("en", "en") -> 1L, ("de", "de") -> 1L))
  }

  test("semanticDedup: earliest in-cell eps-neighbor supersedes; low-cos rows kept") {
    def v(parts: (Int, Float)*): Array[Float] = {
      val a = Array.fill(Ann.Dim)(0.0f); parts.foreach { case (i, x) => a(i) = x }; a
    }
    val vecs = Seq(
      (0L, v(0 -> 1.0f)),              // centroid seed / cell A anchor
      (1L, v(1 -> 1.0f)),              // centroid seed / cell B anchor
      (10L, v(0 -> 0.99f, 1 -> 0.01f)), // ~x: superseded by 0
      (11L, v(0 -> 0.98f, 1 -> 0.02f)), // ~x: superseded by 0 (EARLIEST, not 10)
      (12L, v(0 -> 0.1f, 2 -> 1.0f)),   // cos ~0.1 to both anchors: kept
      (13L, v(1 -> 0.97f, 0 -> 0.03f)), // ~y: superseded by 1
    ).toDF("vec_id", "embedding")
    val out = Ann.semanticDedup(vecs, numCentroids = 2).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(out.size == 6)
    assert(out(0L)._2 == 0L && out(1L)._2 == 1L && out(12L)._2 == 12L) // self-kept
    assert(out(10L)._2 == 0L)
    assert(out(11L)._2 == 0L) // min over BOTH eps-neighbors {0, 10} = 0
    assert(out(13L)._2 == 1L)
    // keeper is never later than the vector, and shares its cell when
    // it is a real dominator
    out.foreach { case (id, (cell, keeper)) =>
      assert(keeper <= id)
      if (keeper != id) assert(out(keeper)._1 == cell)
    }
  }

  test("incrementalNearDup flags batch docs colliding with the index; banded-only verdicts") {
    val corpus = docs.filter(col("doc_id").isin(0L, 1L, 2L)) // index side
    val batch = Seq(
      (3L, "the quick brown fox jumps over the lazy dog", "en"), // exact dup of idx 0
      (5L, "entirely novel content with no overlap whatsoever today", "en"),
      (4L, "tiny doc", "en"), // < ShingleN tokens: no bands, no verdict
    ).toDF("doc_id", "text", "lang")
    val r = Dedup.incrementalNearDup(corpus, batch, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getInt(2)))).toMap
    assert(r.keySet == Set(3L, 5L)) // tiny doc produces no verdict row
    assert(r(3L)._1 >= 1L && r(3L)._2 == 0) // identical doc shares every band
    assert(r(5L) == ((0L, 1)))
  }

  test("minhashRecall scores band candidates against exact-Jaccard truth") {
    val r = Dedup.minhashRecall(docs, "doc_id", "text").collect()
    assert(r.length == 1)
    val row = r.head
    val (nTruth, nCand, nHits) = (row.getLong(0), row.getLong(1), row.getLong(2))
    // truth at 0.5: (0,3) J=1.0, (0,1) and (1,3) at J=0.75
    assert(nTruth == 3L)
    assert(nHits == 3L && row.getDouble(3) == 1.0) // all truth pairs banded
    assert(nHits <= nCand && row.getDouble(4) <= 1.0)
  }

  test("prefixFilterPairs equals the full inverted-index join (lossless reduction)") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    // the shared fixture, plus a seeded synthetic corpus with overlap
    val rnd = new scala.util.Random(7)
    val vocab = (0 until 40).map(i => s"w$i")
    val synth = (0L until 30L).map { i =>
      val base = Seq.fill(12)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
      (100L + i, base, "en")
    }
    val corpus = docs.union(synth.toDF("doc_id", "text", "lang"))
    for (t <- Seq(0.5, 0.75)) {
      val full = pairs(Dedup.jaccardPairs(corpus, "doc_id", "text", threshold = t))
      val pref = pairs(Dedup.prefixFilterPairs(corpus, "doc_id", "text", threshold = t))
      assert(pref == full, s"threshold $t diverged")
    }
    // the planted exact dup always survives
    assert(pairs(Dedup.prefixFilterPairs(docs, "doc_id", "text"))
      .contains((0L, 3L, 1.0)))
  }

  test("winnowing: brute-force parity, shared-span guarantee, short docs empty") {
    val n = 3; val w = TextPipeline.WinnowW
    val span = "alpha beta gamma delta epsilon zeta" // 6 tokens = w + n - 1
    val d1 = s"one two three four five $span six seven eight nine"
    val d2 = s"red orange yellow $span green blue indigo violet pink"
    val d = Seq((1L, d1), (2L, d2), (3L, "too short here")).toDF("doc_id", "text")
    val out = TextPipeline.winnowFingerprints(d, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byDoc = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // doc 3 has 1 gram (m=1 < w): no complete window, no fingerprints
    assert(!byDoc.contains(3L))
    // guaranteed collision: both docs embed the same w+n-1-token span
    assert((byDoc(1L) & byDoc(2L)).nonEmpty)
    // brute-force parity for doc 1: same hash chain, same window minima
    val hv = spark.sql(
      s"SELECT transform(ws, g -> cast(conv(substring(md5(g), 1, 15), 16, 10) AS bigint)) FROM " +
      s"(SELECT transform(sequence(1, size(t) - ${n - 1}), i -> " +
      s"concat_ws(' ', t[i-1], t[i], t[i+1])) AS ws FROM (SELECT split('$d1', ' ') AS t))")
      .collect().head.getSeq[Long](0)
    val expected = hv.sliding(w).map(_.min).toSet
    assert(byDoc(1L) == expected)
  }

  test("header walkers never throw on seeded random bytes (fuzz)") {
    val rnd = new scala.util.Random(42)
    val blobs = (0L until 300L).map { i =>
      val len = rnd.nextInt(220)
      val b = new Array[Byte](len); rnd.nextBytes(b)
      // bias some prefixes to the real magics so the walkers enter the
      // chunk/box/segment loops over random interiors, not just bail
      if (len > 12) (i % 5) match {
        case 0 => b(0) = 'R'; b(1) = 'I'; b(2) = 'F'; b(3) = 'F'
          b(8) = 'W'; b(9) = 'A'; b(10) = 'V'; b(11) = 'E'
        case 1 => b(0) = 0xff.toByte; b(1) = 0xd8.toByte
        case 2 => b(0) = 0x89.toByte; b(1) = 'P'; b(2) = 'N'; b(3) = 'G'
        case 3 => b(4) = 'f'; b(5) = 't'; b(6) = 'y'; b(7) = 'p'
        case _ => ()
      }
      (i, b)
    }
    val df = blobs.toDF("id", "payload")
    // completing the collect IS the assertion: junk must parse to
    // opaque/null verdicts, never throw from the native walkers
    assert(MultiModal.withImageDims(df, "payload").collect().length == 300)
    assert(MultiModal.withAudioMeta(df, "payload").collect().length == 300)
    assert(MultiModal.withVideoMeta(df, "payload").collect().length == 300)
    assert(MultiModal.withTiffMeta(df, "payload").collect().length == 300)
  }

  test("gramMatrix: exact quantized second moments, upper triangle only") {
    val vecs = Seq(
      (0L, Array.tabulate(Ann.Dim)(d => ((d % 7) - 3) * 0.5f)),
      (1L, Array.tabulate(Ann.Dim)(d => ((d * 3) % 5 - 2) * 0.25f)),
      (2L, Array.fill(Ann.Dim)(0.0f)),
    ).toDF("vec_id", "embedding")
    val out = Embeddings.gramMatrix(vecs).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(out.size == Ann.Dim * (Ann.Dim + 1) / 2)
    assert(out.keys.forall { case (i, j) => i <= j })
    // brute force with the same floor quantization
    val qs = Seq(
      Array.tabulate(Ann.Dim)(d => math.floor(((d % 7) - 3) * 0.5 * Embeddings.GramQuant).toLong),
      Array.tabulate(Ann.Dim)(d => math.floor(((d * 3) % 5 - 2) * 0.25 * Embeddings.GramQuant).toLong),
      Array.fill(Ann.Dim)(0L))
    for (i <- 1 to Ann.Dim; j <- i to Ann.Dim) {
      val expect = qs.map(q => q(i - 1) * q(j - 1)).sum
      assert(out((i, j)) == ((3L, expect)), s"cell ($i,$j)")
    }
  }

  test("whiten: output covariance is the identity (decorrelation contract)") {
    // correlated inputs: dims 2..4 each mix in dim 1, plus independent
    // structure — whitening must remove exactly that correlation
    val rnd = new scala.util.Random(7)
    val vecs = (0L until 400L).map { i =>
      val a = rnd.nextGaussian(); val b = rnd.nextGaussian()
      val c = rnd.nextGaussian(); val d = rnd.nextGaussian()
      val e = rnd.nextGaussian(); val f = rnd.nextGaussian()
      i -> Array.tabulate(Ann.Dim) {
        case 0 => a.toFloat
        case 1 => (0.8 * a + 0.6 * b).toFloat
        case 2 => (0.5 * a - 0.5 * b + 0.7 * c).toFloat
        case 3 => (0.3 * a + 0.9 * d).toFloat
        case 4 => (0.6 * b + 0.7 * e).toFloat
        case 5 => (0.2 * a - 0.4 * e + 0.8 * f).toFloat
        case k => ((k % 5) * 0.25f)
      }
    }.toDF("vec_id", "embedding")
    // the chain is GENERATED from the recurrence: check the default d=4
    // and a wider d=6 instance
    for (dims <- Seq(4, 6)) {
      val w = Embeddings.whiten(vecs, dims = dims).collect()
        .map(r => (1 to dims).map(r.getDouble).toArray)
      val n = w.length.toDouble
      assert(w.length == 400)
      for (i <- 0 until dims; j <- 0 until dims) {
        val mean_i = w.map(_(i)).sum / n
        val mean_j = w.map(_(j)).sum / n
        val cov = w.map(v => (v(i) - mean_i) * (v(j) - mean_j)).sum / n
        val want = if (i == j) 1.0 else 0.0
        assert(math.abs(cov - want) < 1e-6,
          s"d=$dims cov($i,$j) = $cov, want $want (whitened covariance must be I)")
      }
    }
  }

  test("gopherRules: each named rule fails on its own fixture; weights down-weight clusters") {
    val fix = Seq(
      (1L, ("the is " + (1 to 30).map(i => s"word$i").mkString(" "))),   // passes all
      (2L, "the is tiny"),                                                // fails r_words
      (3L, "the is " + (1 to 30).map(_ => "a").mkString(" ")),            // mean len < 3
      (4L, "the is " + (1 to 30).map(_ => "12345").mkString(" ")),        // alpha frac < 0.8
      (5L, (1 to 30).map(i => s"word$i").mkString(" ")),                  // no stopwords
    ).toDF("doc_id", "text")
    val r = TextPipeline.gopherRules(fix, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getBoolean(5), x.getBoolean(6), x.getBoolean(7),
        x.getBoolean(8), x.getBoolean(9)))).toMap
    assert(r(1L) == ((true, true, true, true, true)))
    assert(!r(2L)._1 && !r(2L)._5)
    assert(!r(3L)._2 && !r(3L)._5)
    assert(!r(4L)._3 && !r(4L)._5)
    assert(!r(5L)._4 && !r(5L)._5)

    // soft dedup: docs 0,1,3 cluster together (J >= 0.5); 1/3 weights
    val w = Dedup.softDedupWeights(docs, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getLong(2), x.getDouble(3)))).toMap
    assert(w(0L) == ((3L, 0.3333)) && w(1L) == ((3L, 0.3333)) && w(3L) == ((3L, 0.3333)))
    assert(w(2L) == ((1L, 1.0)) && w(4L) == ((1L, 1.0)))
  }

  test("TIFF tag walk: both byte orders, junk gap, truncation, type/count rejection") {
    import graft.functions.TiffTag
    def u16(v: Int, le: Boolean): Array[Byte] =
      if (le) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
      else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def u32(v: Long, le: Boolean): Array[Byte] =
      if (le) Array.tabulate(4)(i => ((v >> (8 * i)) & 0xff).toByte)
      else Array.tabulate(4)(i => ((v >> (8 * (3 - i))) & 0xff).toByte)
    def tiff(le: Boolean, junk: Int, w: Int, h: Long): Array[Byte] = {
      val bom = (if (le) "II" else "MM").getBytes
      val entries =
        u16(250, le) ++ u16(3, le) ++ u32(1, le) ++ u16(9, le) ++ u16(0, le) ++
        u16(256, le) ++ u16(3, le) ++ u32(1, le) ++ u16(w, le) ++ u16(0, le) ++
        u16(257, le) ++ u16(4, le) ++ u32(1, le) ++ u32(h, le)
      bom ++ u16(42, le) ++ u32(8L + junk, le) ++ Array.fill(junk)('j'.toByte) ++
        u16(3, le) ++ entries ++ u32(0, le)
    }
    val good = Seq(tiff(le = true, 5, 640, 480L), tiff(le = false, 0, 33, 77L))
    good.zipWithIndex.foreach { case (b, k) =>
      assert(TiffTag.tagValue(b, 256, 16) == (if (k == 0) 640 else 33))
      assert(TiffTag.tagValue(b, 257, 16) == (if (k == 0) 480 else 77))
      assert(TiffTag.tagValue(b, 258, 16) == -1) // absent tag
      assert(TiffTag.tagValue(b, 256, 1) == -1)  // entry cap stops before tag 256
      assert(TiffTag.tagValue(b.take(12), 256, 16) == -1) // truncated entry table
    }
    assert(TiffTag.tagValue("IIx".getBytes ++ Array.fill(8)(0.toByte), 256, 16) == -1) // bad magic
    assert(TiffTag.tagValue(Array[Byte](), 256, 16) == -1)
    // count != 1 and unsupported type reject rather than misread
    val multi = {
      val le = true
      "II".getBytes ++ u16(42, le) ++ u32(8L, le) ++ u16(1, le) ++
        (u16(256, le) ++ u16(3, le) ++ u32(2, le) ++ u16(5, le) ++ u16(6, le)) ++ u32(0, le)
    }
    assert(TiffTag.tagValue(multi, 256, 16) == -1)
  }

  test("shot boundaries: pans never flag, flags only clear the pan bound") {
    val docs = (0L until 40L).map(i => Tuple1(i)).toDF("doc_id")
    val r = MultiModal.shotBoundaries(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getBoolean(3)))
    assert(r.nonEmpty)
    for ((_, frame, l1, isCut) <- r) {
      assert(isCut == (l1 > MultiModal.CutThreshold))
      if (frame % MultiModal.ShotLen != 0) { // within-shot pan transition
        assert(l1 <= MultiModal.CutThreshold, s"pan transition flagged: l1=$l1")
        assert(!isCut)
      }
    }
    // the detector actually fires: most true cuts clear the bound
    val cuts = r.filter(_._2 % MultiModal.ShotLen == 0)
    assert(cuts.nonEmpty && cuts.count(_._4) * 10 >= cuts.length * 8)
  }

  test("phrase search counts exact consecutive-token occurrences only") {
    val d = Seq(
      (0L, "a b c a b c"),   // two occurrences
      (1L, "a b a c"),       // terms present, never consecutive
      (2L, "c a b c x"),     // one occurrence mid-text
      (3L, "b c a"),         // wrap-around is NOT a match
    ).toDF("doc_id", "text")
    val r = TextPipeline.phraseSearch(d, Seq("a", "b", "c"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(r == Map(0L -> 2L, 2L -> 1L))
    // single-term phrase degenerates to a term count
    val one = TextPipeline.phraseSearch(d, Seq("a"))
      .collect().map(x => (x.getLong(0), x.getLong(1))).toMap
    assert(one == Map(0L -> 2L, 1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("sign-word packing and hamming topk rank by sign disagreement") {
    val emb = Seq(
      (0L, Array.fill(64)(0.1f), 0),
      (1L, Array.fill(64)(-0.1f), 0), // all signs flipped vs 0 → hamming 64
      (2L, Array(-0.1f) ++ Array.fill(63)(0.1f), 0), // one bit off vs 0
    ).toDF("vec_id", "embedding", "label")
    val words = emb.select(col("vec_id"),
      Ann.signWord(col("embedding"), 0).as("w0"),
      Ann.signWord(col("embedding"), 1).as("w1")).collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(words(0L) == ((4294967295L, 4294967295L))) // all 32 bits set, twice
    assert(words(1L) == ((0L, 0L)))
    assert(words(2L) == ((4294967294L, 4294967295L))) // bit 0 of word 0 clear
    val top = Ann.hammingTopK(emb, k = 2, numQueries = 1).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(top == Set((0L, 2L, 1L), (0L, 1L, 64L)))
    // -0.0f packs like +0.0 (>= 0) — the IEEE edge both engines agree on
    val zeros = Seq((9L, Array.fill(64)(-0.0f), 0)).toDF("vec_id", "embedding", "label")
      .select(Ann.signWord(col("embedding"), 0).as("w0")).collect()
    assert(zeros(0).getLong(0) == 4294967295L)
    // rerank recall on the fixture: truth top-1 of query 0 is vec 2
    // (cosine ≈ 0.97 vs −1 for vec 1); the 2-candidate shortlist keeps
    // it and the exact rerank ranks it first → recall 1.0
    val rec = Ann.hammingRecall(emb, shortlist = 2, k = 1, numQueries = 1).collect()(0)
    assert(rec.getLong(0) == 1L && rec.getLong(1) == 1L && rec.getDouble(2) == 1.0)
  }
}

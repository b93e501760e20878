package graft.pipeline

import graft.SparkTestBase
import graft.functions.GifFrameCount
import org.apache.spark.sql.functions._

/** Specs for the GIF block walk and the mm_gif_meta surface. */
class GifMetaSpec extends SparkTestBase {
  import spark.implicits._

  private def hexBytes(s: String): Array[Byte] =
    s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray

  // minimal 2-frame GIF89a: 3x2 screen, no GCT, per frame a
  // graphic-control ext + descriptor + one 2-byte data sub-block
  private val frame = "21f9040000000000" + // ext: 0x21 0xF9 [4]...0
    "2c" + "0000" + "0000" + "0300" + "0200" + "00" + // descriptor 3x2
    "02" + "02aaaa" + "00" // lzw min + sub-block(2) + terminator
  private val gif2 = "474946383961" + "0300" + "0200" + "00" + "00" + "00" +
    frame + frame + "3b"

  test("frameCount: hand-built GIFs parse; malformed chains reject") {
    assert(GifFrameCount.frameCount(hexBytes(gif2), 64) == 2L)
    // global color table: packed 0x81 -> 4 entries (12 bytes)
    val withGct = "474946383961" + "0300" + "0200" + "81" + "00" + "00" +
      ("ff" * 12) + frame + "3b"
    assert(GifFrameCount.frameCount(hexBytes(withGct), 64) == 1L)
    // local color table on the descriptor: packed 0x81 after dims
    val lctFrame = "2c" + "0000" + "0000" + "0300" + "0200" + "81" +
      ("00" * 12) + "02" + "01aa" + "00"
    val withLct = "474946383961" + "0300" + "0200" + "00" + "00" + "00" +
      lctFrame + "3b"
    assert(GifFrameCount.frameCount(hexBytes(withLct), 64) == 1L)
    // GIF87a accepted too
    assert(GifFrameCount.frameCount(
      hexBytes("474946383761" + "0100" + "0100" + "00" + "00" + "00" + "3b"), 64) == 0L)
    // rejects: wrong magic, truncated sub-block, unknown block type,
    // missing trailer, maxBlocks exhausted
    assert(GifFrameCount.frameCount(hexBytes("47494638" + "00" * 9), 64) == -1L)
    assert(GifFrameCount.frameCount(
      hexBytes("474946383961" + "0300" + "0200" + "00" + "00" + "00" + "21f9c8"), 64) == -1L)
    assert(GifFrameCount.frameCount(
      hexBytes("474946383961" + "0300" + "0200" + "00" + "00" + "00" + "ff3b"), 64) == -1L)
    assert(GifFrameCount.frameCount(
      hexBytes("474946383961" + "0300" + "0200" + "00" + "00" + "00"), 64) == -1L)
    assert(GifFrameCount.frameCount(hexBytes(gif2), 2) == -1L,
      "trailer beyond maxBlocks hops is malformed, not zero")
  }

  test("gifMeta: decoded fields equal the generator formulas on every arm") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .limit(60)
    val out = MultiModal.gifMeta(docs).collect()
    assert(out.nonEmpty)
    for (r <- out) {
      val id = r.getLong(0)
      val nChars = docs.filter(col("doc_id") === id).head().getAs[Long]("n_chars")
      if (id % 3 == 0) {
        assert(r.getString(1) == "gif", s"doc $id")
        assert(r.getLong(2) == 20 + id % 11, s"width of $id read from the bytes")
        assert(r.getLong(3) == 10 + nChars % 7, s"height of $id")
        assert(r.getLong(4) == 1 + id % 4, s"frames of $id")
      } else {
        assert(r.getString(1) == "opaque" && r.isNullAt(2) && r.isNullAt(4), s"doc $id")
      }
    }
  }
}

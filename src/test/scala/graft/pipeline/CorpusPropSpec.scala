package graft.pipeline

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean

/** Randomized invariants for the round-5 corpus operators: chunk-grid
  * coverage/minimality against a brute-force reference, and the
  * quantizer's reconstruction bound, over generated corpora and
  * generated (window, stride) geometry. */
class CorpusPropSpec extends SparkTestBase {
  import spark.implicits._

  private def checkProp(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  private val genGeom = for {
    window <- Gen.choose(2, 20)
    stride <- Gen.choose(1, window)
    nTokens <- Gen.choose(1, 60)
  } yield (window, stride, nTokens)

  test("chunk grid: full coverage, every chunk adds tokens, idx formula holds") {
    checkProp(Prop.forAll(genGeom) { case (window, stride, n) =>
      val text = (1 to n).map(i => s"t$i").mkString(" ")
      val chunks = TextPipeline.chunkTokens(
        Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", window, stride)
        .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(_._2)
      val spans = chunks.map { case (_, s, len) => (s, s + len - 1) }
      // coverage: every token position in some chunk
      val covered = spans.flatMap { case (a, b) => a to b }.toSet
      val coverOk = covered == (1L to n).toSet
      // progress: each chunk ends strictly beyond its predecessor
      val progressOk = spans.sliding(2).forall {
        case Array((_, e1), (_, e2)) => e2 > e1
        case _ => true
      }
      // geometry: starts on the stride grid, idx consistent, length ≤ window
      val gridOk = chunks.forall { case (idx, s, len) =>
        (s - 1) % stride == 0 && idx == (s - 1) / stride + 1 && len <= window && len >= 1
      }
      (coverOk :| s"coverage broken: $spans over n=$n") &&
        (progressOk :| s"redundant chunk: $spans") &&
        (gridOk :| s"grid broken: ${chunks.toSeq} window=$window stride=$stride")
    })
  }

  private val genVec = Gen.listOfN(8,
    Gen.choose(-1000, 1000).map(_ / 16.0f)).map(_.toArray)

  test("quantizer: codes in ±127, reconstruction within scale/2, checksum exact") {
    checkProp(Prop.forAll(Gen.listOfN(5, genVec)) { vecs =>
      vecs.nonEmpty ==> {
        val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
          .toDF("vec_id", "embedding")
        val rows = Embeddings.quantizeInt8(df).collect().map { r =>
          (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getSeq[Int](3), r.getLong(4))
        }
        rows.forall { case (id, amax, scale, codes, l1) =>
          val orig = vecs(id.toInt).map(_.toDouble)
          val amaxOk = amax == orig.map(math.abs).max
          val boundOk = codes.forall(c => c >= -127 && c <= 127)
          val l1Ok = l1 == codes.map(c => math.abs(c).toLong).sum
          val reconOk = orig.zip(codes).forall { case (x, c) =>
            math.abs(x - c * scale) <= scale / 2 + 1e-12
          }
          amaxOk && boundOk && l1Ok && reconOk
        } :| s"quantizer invariant broken on ${rows.toSeq}"
      }
    })
  }

  test("bpePairs: total pair mass = Σ max(0, len−1); counts match brute force") {
    val genCorpus = Gen.listOfN(6,
      Gen.listOf(Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    checkProp(Prop.forAll(genCorpus) { texts =>
      val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val got = TextPipeline.bpePairs(df, "doc_id", "text", topK = 1000)
        .collect().map(r => (r.getString(0), r.getLong(1))).toMap
      val expected = texts
        .map(_.trim.split("\\s+").toSeq)
        .flatMap(ts => if (ts.length < 2) Nil else ts.sliding(2).map(_.mkString(" ")))
        .groupBy(identity).map { case (p, os) => (p, os.size.toLong) }
      (got == expected) :| s"got $got expected $expected from $texts"
    })
  }

  test("prefix-filtered join equals the full inverted-index join on random corpora") {
    val genCorpus = for {
      nDocs <- Gen.choose(4, 18)
      vocabSize <- Gen.choose(6, 25)
      seed <- Gen.choose(0L, 10000L)
      t <- Gen.oneOf(0.5, 0.75, 0.25)
    } yield (nDocs, vocabSize, seed, t)
    checkProp(Prop.forAll(genCorpus) { case (nDocs, vocabSize, seed, t) =>
      val rnd = new scala.util.Random(seed)
      val docs = (0L until nDocs.toLong).map { i =>
        val n = 5 + rnd.nextInt(12)
        (i, Seq.fill(n)(s"w${rnd.nextInt(vocabSize)}").mkString(" "))
      }.toDF("doc_id", "text")
      def pairs(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
      val full = pairs(Dedup.jaccardPairs(docs, "doc_id", "text", threshold = t))
      val pref = pairs(Dedup.prefixFilterPairs(docs, "doc_id", "text", threshold = t))
      (pref == full) :| s"diverged at t=$t seed=$seed: missing=${full -- pref} extra=${pref -- full}"
    })
  }
}

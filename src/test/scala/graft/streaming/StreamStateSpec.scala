package graft.streaming

import java.nio.file.{Files, Path}
import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The scale contract of [[BucketedState]] — the versioned,
  * hash-bucketed state the streaming CDC upsert and the near-dup band
  * index maintain:
  *
  *  1. O(touched buckets) per batch: a version directory holds ONLY the
  *     buckets the batch's keys hash into — a one-key batch against a
  *     million-key state writes one bucket, not the state;
  *  2. reads compose the newest version PER BUCKET (untouched buckets
  *     survive at their older versions);
  *  3. replay safety: batch N's read pins to versions < N, so a
  *     foreachBatch re-execution of N reads the same pre-batch state the
  *     first attempt read — never the partial v=N it overwrites — and
  *     rewrites identical content.
  */
class StreamStateSpec extends SparkTestBase {
  import spark.implicits._

  private def tmpRoot(): Path = {
    val p = Files.createTempDirectory("graft-bucketstate")
    p.toFile.deleteOnExit()
    p
  }

  /** Keyed payload with the state's bucket column attached. */
  private def keyed(st: BucketedState, kv: (Long, String)*): DataFrame =
    kv.toSeq.toDF("k", "v").withColumn("__bucket", st.bucketOf(col("k")))

  private def asMap(df: DataFrame): Map[Long, String] =
    df.select(col("k"), col("v")).collect().map(r => r.getLong(0) -> r.getString(1)).toMap

  private def touchedOf(df: DataFrame): Set[Int] =
    df.select(col("__bucket")).distinct().collect().map(_.getInt(0)).toSet

  /** Bucket partition dirs present under version `v`. */
  private def bucketsIn(root: Path, v: Long): Set[String] = {
    val d = root.resolve(s"__v=$v").toFile
    Option(d.listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.startsWith("__bucket="))
      .map(_.getName).toSet
  }

  test("a batch writes ONLY the buckets it touches; reads stitch newest-per-bucket") {
    val root = tmpRoot()
    val st = new BucketedState(spark, root, buckets = 8)

    // batch 0: a spread of keys (establishes several buckets)
    val b0 = keyed(st, (1L, "a0"), (2L, "b0"), (3L, "c0"), (4L, "d0"), (5L, "e0"))
    st.write(0L, b0, touchedOf(b0))
    val buckets0 = bucketsIn(root, 0L)

    // batch 1: ONE key — exactly one bucket directory may appear in v=1
    val b1 = keyed(st, (1L, "a1"))
    st.write(1L, b1, touchedOf(b1))
    assert(bucketsIn(root, 1L).size == 1,
      s"one-key batch wrote ${bucketsIn(root, 1L)} — the full-state rewrite is back")
    assert(buckets0.size > 1, s"fixture degenerate: batch 0 landed in $buckets0")

    // current() = k1 from v=1, everything else from v=0
    val cur = asMap(st.current().getOrElse(fail("state empty")))
    assert(cur == Map(1L -> "a1", 2L -> "b0", 3L -> "c0", 4L -> "d0", 5L -> "e0"), cur.toString)
  }

  test("a bucket EMPTIED by deletes tombstones — old keys never resurface from older versions") {
    val root = tmpRoot()
    val st = new BucketedState(spark, root, buckets = 8)
    // pick a key ALONE in its bucket plus two keepers from other buckets,
    // so deleting it genuinely empties a bucket
    val probe = keyed(st, (1L to 20L).map(k => k -> s"x$k"): _*)
      .select(col("k"), col("__bucket")).collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    val soloBucket = probe(1L)
    val keeps = probe.collect { case (k, b) if b != soloBucket => k }.toSeq.sorted.take(2)
    assume(keeps.size == 2, "degenerate hash fixture — all probe keys in one bucket")
    val b0 = keyed(st, (1L -> "a0") +: keeps.map(k => k -> s"keep$k"): _*)
    st.write(0L, b0, touchedOf(b0))

    // the cdcUpsert merge shape, restricted to key 1's bucket: drop key 1
    // (the merged frame for that bucket is EMPTY — the tombstone case)
    val touched = Set(soloBucket)
    val prior = st.before(1L, Some(touched)).getOrElse(fail("no prior"))
    st.write(1L, prior.join(Seq(1L).toDF("k"), Seq("k"), "left_anti"), touched)

    // the tombstone is structurally there: v=1 holds exactly the emptied
    // bucket's dir, with no part files
    assert(bucketsIn(root, 1L) == Set(s"__bucket=$soloBucket"))
    val cur = asMap(st.current().getOrElse(fail("state empty")))
    assert(!cur.contains(1L), s"deleted key resurfaced from the shadowed version: $cur")
    assert(cur == keeps.map(k => k -> s"keep$k").toMap, cur.toString)
  }

  test("compact() removes only SHADOWED partitions — reads identical before and after") {
    val root = tmpRoot()
    val st = new BucketedState(spark, root, buckets = 4)
    val b0 = keyed(st, (1L to 8L).map(k => k -> s"v0_$k"): _*)
    st.write(0L, b0, touchedOf(b0))
    val b1 = keyed(st, (1L, "v1_1"), (2L, "v1_2"))
    st.write(1L, b1, touchedOf(b1))
    val b2 = keyed(st, (3L, "v2_3"))
    st.write(2L, b2, touchedOf(b2))

    val beforeCompact = asMap(st.current().getOrElse(fail("state empty")))
    st.compact(2L)
    val afterCompact = asMap(st.current().getOrElse(fail("state empty")))
    assert(afterCompact == beforeCompact, s"$afterCompact vs $beforeCompact")

    // shadowed partitions are physically gone: key 1's bucket must no
    // longer exist under __v=0 (its newest home is __v=1)
    val b1bucket = touchedOf(keyed(st, (1L, "x"))).head
    assert(!root.resolve("__v=0").resolve(s"__bucket=$b1bucket").toFile.exists(),
      "compact left a shadowed partition behind")
    // and replays of the NEXT batch still read a complete pre-batch state
    assert(asMap(st.before(3L).getOrElse(fail("no state"))) == beforeCompact)
  }

  test("merge(): upsert + delete in one batch, touched buckets only, retention swept") {
    val root = tmpRoot()
    val st = new BucketedState(spark, root, buckets = 4)
    val b0 = keyed(st, (1L, "a0"), (2L, "b0"), (3L, "c0"))
    st.write(0L, b0, touchedOf(b0))

    // batch 1: update key 1, DELETE key 2 (a touched key with no upsert
    // row), leave key 3 alone
    val touchedKeys = keyed(st, (1L, "x"), (2L, "x")).select(col("k"), col("__bucket"))
    val upserts = keyed(st, (1L, "a1"))
    st.merge(1L, touchedKeys, upserts, Seq("k"))

    val cur = asMap(st.current().getOrElse(fail("state empty")))
    assert(cur == Map(1L -> "a1", 3L -> "c0"), cur.toString)
    // retention ran: no bucket partition below v=1 shadows a newer one
    val keysAgain = asMap(st.before(2L).getOrElse(fail("no state")))
    assert(keysAgain == cur)
  }

  test("replay of batch N reads the pre-N state (v < N) and rewrites identical content") {
    val root = tmpRoot()
    val st = new BucketedState(spark, root, buckets = 4)
    val b0 = keyed(st, (1L, "a0"), (2L, "b0"))
    st.write(0L, b0, touchedOf(b0))

    def runBatch1(): Unit = {
      // merge shape: upsert key 1 — reads MUST see v=0's a0 even when a
      // previous attempt already installed v=1
      val ups = keyed(st, (1L, "a1"))
      val touched = touchedOf(ups)
      val prior = st.before(1L, Some(touched)).getOrElse(fail("no prior"))
      assert(asMap(prior.filter(col("k") === 1L)) == Map(1L -> "a0"),
        "replay read its own partial output — the self-read-overwrite hazard")
      st.write(1L,
        prior.join(ups.select(col("k")), Seq("k"), "left_anti").unionByName(ups), touched)
    }
    runBatch1()
    val first = asMap(st.current().getOrElse(fail("state empty")))
    runBatch1() // the foreachBatch retry
    val second = asMap(st.current().getOrElse(fail("state empty")))
    assert(first == second && first(1L) == "a1", s"$first vs $second")
  }
}

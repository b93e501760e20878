package graft.streaming

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Hash-bucketed, VERSIONED parquet state for foreachBatch pipelines —
  * the scale-shaped replacement for the full-rewrite snapshot MERGE:
  * a micro-batch rewrites only the hash buckets its keys touch
  * (O(batch-touched buckets) per batch), never the whole state
  * (O(state) per batch).
  *
  * Layout: `root/v=<batchId>/__bucket=<b>/part-*.parquet` — one
  * partitioned write job per batch, holding ONLY the touched buckets.
  * The state visible to batch N is, per bucket, the newest version
  * STRICTLY BELOW N; untouched buckets simply stay at their older
  * versions.
  *
  * Replay safety (foreachBatch may re-execute a batch id after a
  * failure): reads pin to v < batchId, so a replay reads exactly the
  * pre-batch state the first attempt read — never the partial v=N it
  * is about to overwrite (no self-read-overwrite), and the rewrite is
  * byte-deterministic. Superseded versions are left for a janitor
  * (at 100 TB a retention sweep deletes bucket partitions shadowed by
  * newer versions; here the scratch dir is wiped per run). */
final class BucketedState(spark: SparkSession, root: Path, buckets: Int) {
  require(buckets > 0, s"bucket count must be positive: $buckets")

  /** Bucket assignment for a key — callers add this as `__bucket`. */
  def bucketOf(first: org.apache.spark.sql.Column,
      rest: org.apache.spark.sql.Column*): org.apache.spark.sql.Column =
    pmod(hash(first +: rest: _*), lit(buckets))

  /** bucket → newest version strictly below `beforeBatch` (driver
    * directory listing: O(versions × buckets) metadata, no Spark job). */
  private def latest(beforeBatch: Long): Map[Int, Long] = {
    val acc = scala.collection.mutable.Map[Int, Long]()
    for {
      vdir <- Option(root.toFile.listFiles()).getOrElse(Array.empty[java.io.File])
      if vdir.isDirectory && vdir.getName.startsWith("__v=")
      v <- vdir.getName.drop("__v=".length).toLongOption
      if v < beforeBatch
      bdir <- Option(vdir.listFiles()).getOrElse(Array.empty[java.io.File])
      if bdir.isDirectory && bdir.getName.startsWith("__bucket=")
      b <- bdir.getName.drop("__bucket=".length).toIntOption
    } if (acc.getOrElse(b, -1L) < v) acc(b) = v
    acc.toMap
  }

  /** State visible strictly before `batch`, restricted to
    * `onlyBuckets` (None = all): per listed bucket, exactly its newest
    * qualifying version is read — older versions are never scanned. A
    * bucket whose newest version is EMPTY (every key deleted — the dir
    * exists as a tombstone but holds no part files) is skipped, not
    * resurrected from an older version. */
  def before(batch: Long, onlyBuckets: Option[Set[Int]] = None): Option[DataFrame] = {
    val paths = latest(batch)
      .filter { case (b, _) => onlyBuckets.forall(_.contains(b)) }
      .map { case (b, v) => Paths.get(s"$root/__v=$v/__bucket=$b") }
      .filter { p =>
        val s = Files.list(p)
        try s.anyMatch(f => f.getFileName.toString.endsWith(".parquet"))
        finally s.close()
      }
    if (paths.isEmpty) None
    else Some(spark.read.option("basePath", root.toString)
      .parquet(paths.map(_.toString).toSeq: _*)
      .drop("__v"))
  }

  /** The final state (newest version per bucket, all buckets). */
  def current(): Option[DataFrame] = before(Long.MaxValue, None)

  /** Install version `batch`: one partitioned write of the touched
    * buckets only (`df` must carry `__bucket`). `touched` must name
    * every bucket the batch's keys hash into — a bucket the merge
    * left EMPTY (all keys deleted) writes no part files, so its dir is
    * created explicitly as a tombstone; without it the bucket's older
    * version would stay newest and the deleted keys would resurface. */
  def write(batch: Long, df: DataFrame, touched: Set[Int]): Unit = {
    // cluster rows by bucket before the partitioned write: one task —
    // and one file — per touched bucket, instead of every shuffle
    // partition fanning out a sliver-file into every bucket dir (the
    // same discipline a cluster-scale writer needs so a batch's write
    // parallelism is its touched-bucket count, not tasks × buckets)
    df.repartition(math.max(touched.size, 1), col("__bucket"))
      .write.mode("overwrite").partitionBy("__bucket")
      .parquet(root.resolve(s"__v=$batch").toString)
    touched.foreach { b =>
      Files.createDirectories(root.resolve(s"__v=$batch").resolve(s"__bucket=$b")); ()
    }
  }

  /** One MERGE micro-batch, end to end — the whole foreachBatch protocol
    * in one call: replace every row whose key appears in `touchedKeys`
    * with the rows of `upserts` (a key in touchedKeys but not in upserts
    * is a DELETE), touching only the buckets the batch's keys hash into,
    * then sweep versions shadowed below this batch. Both inputs must
    * carry `__bucket` (from [[bucketOf]] over the key columns).
    * Replay-safe: a re-execution of `batch` reads the same pre-batch
    * state and rewrites identical content. This is what the
    * `streaming_cdc_upsert` oracle row runs. */
  def merge(batch: Long, touchedKeys: DataFrame, upserts: DataFrame,
      keyCols: Seq[String]): Unit = {
    // bounded collect: at most `buckets` ints cross the driver
    val touched = touchedKeys.select(col("__bucket")).distinct()
      .collect().map(_.getInt(0)).toSet
    val merged = before(batch, Some(touched)) match {
      case None => upserts
      case Some(p) =>
        p.join(touchedKeys.select(keyCols.map(c => col(s"`$c`")): _*), keyCols, "left_anti")
          .unionByName(upserts)
    }
    write(batch, merged, touched)
    compact(batch - 1)
  }

  /** Retention janitor: delete every bucket partition SHADOWED by a
    * newer version at or below `upToBatch` (exclusive versions above
    * it are left alone — they may belong to an in-flight batch).
    * Reads are unaffected by construction: `before`/`current` resolve
    * newest-per-bucket, and only non-newest partitions are removed;
    * version dirs emptied of all bucket partitions are deleted.
    * Run it BETWEEN batches (e.g. every N-th foreachBatch, after the
    * write lands) — never concurrently with a read of the versions it
    * sweeps. At 100 TB this is the compaction pass that bounds the
    * state table to one live copy per bucket plus the in-flight
    * version. */
  def compact(upToBatch: Long): Unit = {
    val keep = latest(upToBatch + 1) // newest version per bucket, <= upToBatch
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(wipe))
      f.delete(): Unit
    }
    for {
      vdir <- Option(root.toFile.listFiles()).getOrElse(Array.empty[java.io.File])
      if vdir.isDirectory && vdir.getName.startsWith("__v=")
      v <- vdir.getName.drop("__v=".length).toLongOption
      if v <= upToBatch
    } {
      for {
        bdir <- Option(vdir.listFiles()).getOrElse(Array.empty[java.io.File])
        if bdir.isDirectory && bdir.getName.startsWith("__bucket=")
        b <- bdir.getName.drop("__bucket=".length).toIntOption
        if !keep.get(b).contains(v)
      } wipe(bdir)
      val left = Option(vdir.listFiles()).getOrElse(Array.empty[java.io.File])
      if (!left.exists(f => f.isDirectory && f.getName.startsWith("__bucket=")))
        wipe(vdir)
    }
  }
}

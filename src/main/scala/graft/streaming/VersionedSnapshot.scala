package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Whole-snapshot VERSIONED parquet state for foreachBatch folds whose
  * entire state is one small mergeable value — a KMV k-minima set, a
  * count-min counter grid, a Bernoulli-gate sample — rather than a keyed
  * row table (keyed tables use [[BucketedState]], which rewrites only
  * touched hash slots; here the fold law touches the whole value every
  * batch, so the state IS the rewrite unit).
  *
  * Layout: `root/v=<batch>/part-*.parquet` plus a `root/__latest`
  * pointer file (written via temp name + ATOMIC_MOVE, monotone — the
  * same commit discipline as [[BucketedState]]'s manifest pointer).
  *
  * Protocol per batch N: read [[newestBelow]](N) — pinned STRICTLY below
  * N, so a foreachBatch replay of N reads exactly the pre-batch state
  * its first attempt read, never the partial v=N it is about to
  * overwrite — fold the batch in, then [[write]](N, folded), which
  * installs v=N (overwrite mode — replay-idempotent), advances the
  * pointer, and SWEEPS every version strictly below the newest version
  * < N (that one must survive: it is what a replay of N resolves
  * through). Disk state is therefore bounded at TWO versions (pre-batch
  * + current) for the lifetime of the stream, and the common read is one
  * pointer GET + one parquet read — no directory LIST (the LIST survives
  * only as the fallback for a missing/stale pointer or a replay reading
  * below its own id). A long-lived ingest stream neither accretes one
  * version per batch forever nor pays a LIST per batch — the
  * object-store posture the streamed sketches require at 100 TB.
  */
final class VersionedSnapshot(spark: SparkSession, root: Path) {

  private def pointerPath: Path = root.resolve("__latest")
  private def versionPath(v: Long): Path = root.resolve(s"v=$v")

  private def readPointer(): Option[Long] =
    if (!Files.exists(pointerPath)) None
    else scala.util.Try(
      new String(Files.readAllBytes(pointerPath), "UTF-8").trim.toLong).toOption

  /** Monotone atomic pointer advance (see [[BucketedState]]: a crash
    * between the parquet write and the pointer leaves a stale pointer,
    * which the incomplete batch's replay re-advances). */
  private def writePointer(batch: Long): Unit =
    if (!readPointer().exists(_ >= batch)) {
      Files.createDirectories(root)
      val tmp = root.resolve(".__latest.tmp")
      Files.write(tmp, batch.toString.getBytes("UTF-8"))
      Files.move(tmp, pointerPath, StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING): Unit
    }

  /** The LIST fallback — and the sweep's census. */
  private def versions(): Seq[Long] =
    Option(root.toFile.listFiles()).getOrElse(Array.empty[java.io.File])
      .flatMap(f => Option(f.getName).filter(_.startsWith("v="))
        .filter(_ => f.isDirectory)
        .flatMap(_.drop("v=".length).toLongOption))
      .toSeq.sorted

  private def newestVersionBelow(batch: Long): Option[Long] =
    readPointer().filter(_ < batch)
      .orElse(versions().filter(_ < batch).lastOption)

  /** The state visible STRICTLY before `batch` (replay-deterministic);
    * None before the first write. `newestBelow(Long.MaxValue)` is the
    * final-state read. */
  def newestBelow(batch: Long): Option[DataFrame] =
    newestVersionBelow(batch)
      .map(v => spark.read.parquet(versionPath(v).toString))

  /** Install version `batch`, advance the pointer, sweep superseded
    * versions. Overwrite mode makes a replayed write idempotent; the
    * sweep keeps exactly the newest version strictly below `batch`
    * (a replay of `batch` reads it) plus v=`batch` itself. */
  def write(batch: Long, df: DataFrame): Unit = {
    df.write.mode("overwrite").parquet(versionPath(batch).toString)
    writePointer(batch)
    // one LIST per write (amortized janitor cost, never on the read path)
    val below = versions().filter(_ < batch)
    def wipe(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(wipe))
      f.delete(): Unit
    }
    below.dropRight(1).foreach(v => wipe(versionPath(v).toFile))
  }
}

package graft.streaming

import java.nio.file.{Files, Path, StandardCopyOption}

/** The `__latest` pointer-file protocol shared by [[BucketedState]]
  * (points at the newest manifest) and [[VersionedSnapshot]] (points at
  * the newest version dir): a tiny file holding one version id, written
  * to a temp name and ATOMIC_MOVEd (readers see old or new, never
  * partial), advanced MONOTONICALLY (a replayed batch never moves it
  * backwards). One GET replaces the directory LIST on the read path;
  * the LIST survives only as each owner's fallback for a missing,
  * unreadable, stale, or dangling pointer. Single-sourced here so a
  * protocol fix cannot silently miss one copy. */
private[streaming] object LatestPointer {

  def path(root: Path): Path = root.resolve("__latest")

  def read(root: Path): Option[Long] =
    if (!Files.exists(path(root))) None
    else scala.util.Try(
      new String(Files.readAllBytes(path(root)), "UTF-8").trim.toLong).toOption

  /** Monotone atomic advance. Owners write it AFTER their version
    * commit point (manifest / _SUCCESS): a crash between the two leaves
    * a stale pointer, which is harmless — the incomplete batch replays
    * (foreachBatch only commits after the sink lands), its reads pin
    * strictly below its own id (= the stale pointer's version), and the
    * replay's commit re-advances the pointer. */
  def advance(root: Path, batch: Long): Unit =
    if (!read(root).exists(_ >= batch)) {
      Files.createDirectories(root)
      val tmp = root.resolve(".__latest.tmp")
      Files.write(tmp, batch.toString.getBytes("UTF-8"))
      Files.move(tmp, path(root), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING): Unit
    }

  /** Recursive delete (the janitors' shared helper). */
  def wipeTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(wipeTree))
    f.delete(): Unit
  }
}

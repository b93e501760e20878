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
  * protocol fix cannot silently miss one copy.
  *
  * == Object-store contract ==
  *
  * This POSIX implementation is the local-filesystem BINDING of a
  * protocol whose primitives map directly onto a real object store —
  * the mapping is part of the design, not an afterthought:
  *
  *  - '''read''' = one GET of a small immutable-per-version object.
  *  - '''advance''' = a CONDITIONAL PUT: "install value N unless the
  *    current value is >= N". On S3 that is a `PutObject` with
  *    `If-Match` on the read etag (retry on 412); on GCS a
  *    generation-match precondition; on ABFS an etag-conditional
  *    update. Those primitives are ATOMIC at the store, so the
  *    cross-process monotonicity hole described below CLOSES on a real
  *    object store — the deployment this layer is shaped for is
  *    strictly stronger than the test binding. POSIX has no
  *    conditional rename, so here the condition is emulated by
  *    read-check-move under a JVM-wide lock on the interned pointer
  *    path: atomic against every advancer IN THIS JVM (all of
  *    Structured Streaming's foreachBatch callers for all queries in a
  *    local session), best-effort against a second JVM.
  *
  * == Ownership: exactly one advancer per state root ==
  *
  * The protocol REQUIRES a single live advancer per state root. This
  * is not an extra assumption — it is Structured Streaming's own
  * execution model: a state root belongs to one streaming query, whose
  * driver executes foreachBatch bodies sequentially (batch N+1 never
  * starts before N's body returns), and a restarted query resumes the
  * SAME ownership from the checkpoint, it does not add a second owner.
  * Two live queries advancing one root is a deployment error of the
  * same class as two Spark queries sharing one checkpoint dir.
  *
  * == Failure shapes, and what each degrades to ==
  *
  * Readers treat the pointer as a HINT, gated by the owner's own
  * commit evidence — never as ground truth:
  *
  *  - '''torn / corrupt''' (crash mid-write without ATOMIC_MOVE, bit
  *    rot, garbage bytes): [[read]] returns None → directory-LIST
  *    fallback.
  *  - '''dangling''' (names a version whose manifest / `_SUCCESS` is
  *    missing — e.g. the sweep raced a crash): the owner's gate
  *    (`readManifest` existence in [[BucketedState]], `committed` in
  *    [[VersionedSnapshot]]) fails → LIST fallback over committed
  *    versions.
  *  - '''stale''' (crash between the version commit and [[advance]]):
  *    harmless by construction — the incomplete batch replays
  *    (foreachBatch commits the sink AFTER the body), its reads pin
  *    strictly below its own id (= the stale pointer's version), and
  *    the replay's commit re-advances the pointer.
  *  - '''ahead of the read's bound''' (a replay reading below its own
  *    id after the first attempt already advanced): the strict-below
  *    filter rejects the pointer → LIST fallback, which applies the
  *    same bound.
  *  - '''regressed to a SWEPT version''' (only a contract-violating
  *    second writer can produce this): the gate fails exactly like the
  *    dangling case → LIST fallback wins. Pinned adversarially by
  *    LatestPointerSpec.
  *  - '''regressed to a LIVE committed version''': undetectable
  *    without paying a LIST on every read, and the one reason the
  *    single-advancer rule is CONTRACT rather than advice. On a real
  *    object store the conditional PUT refuses the regression at the
  *    store, so this shape exists only on the POSIX binding under a
  *    rogue second JVM. LatestPointerSpec pins the behavior so the
  *    trade is recorded, not latent.
  */
private[streaming] object LatestPointer {

  def path(root: Path): Path = root.resolve("__latest")

  def read(root: Path): Option[Long] =
    if (!Files.exists(path(root))) None
    else scala.util.Try(
      new String(Files.readAllBytes(path(root)), "UTF-8").trim.toLong).toOption

  /** Monotone conditional advance — the POSIX binding of the
    * conditional PUT (see the object-store contract above). The
    * read-check-move runs under a JVM-wide lock on the interned
    * pointer path, so every advancer in this JVM serializes; owners
    * call it AFTER their version commit point (manifest / _SUCCESS),
    * so a crash between the two leaves a stale pointer, which the
    * replay re-advances. */
  def advance(root: Path, batch: Long): Unit =
    path(root).toString.intern().synchronized {
      if (!read(root).exists(_ >= batch)) {
        Files.createDirectories(root)
        val tmp = root.resolve(".__latest.tmp")
        Files.write(tmp, batch.toString.getBytes("UTF-8"))
        Files.move(tmp, path(root), StandardCopyOption.ATOMIC_MOVE,
          StandardCopyOption.REPLACE_EXISTING): Unit
      }
    }

  /** Recursive delete (the janitors' shared helper). */
  def wipeTree(f: java.io.File): Unit = {
    if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(wipeTree))
    f.delete(): Unit
  }
}

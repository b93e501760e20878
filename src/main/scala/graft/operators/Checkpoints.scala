package graft.operators

import org.apache.spark.sql.DataFrame

/** Plan truncation for the iterative operators (BFS, connected
  * components, k-truss): each round's result is cut out of the lineage
  * so the next round's plan stays one round deep.
  *
  * Two modes, selected once per JVM:
  *
  *  - default: `localCheckpoint` — blocks live on executors, zero
  *    distributed-FS traffic; the right single-tenant shape, but a block
  *    dies with its executor (an executor loss mid-iteration fails the
  *    job, which then re-runs from the source);
  *  - `SPARK_GRAFT_CHECKPOINT_DIR=<dir>` (env, or the
  *    `graft.checkpoint.dir` system property — the spec-settable form):
  *    RELIABLE `checkpoint` against the given directory. A
  *    1000-executor run over hours flips this on so iteration state
  *    survives executor churn; the directory must be a shared
  *    filesystem all executors reach (HDFS/S3; any local path under
  *    local[*] or same-host local-cluster).
  *
  * Both modes are EAGER (the returned frame is materialized) — the
  * iterative loops count on cut-then-unpersist round discipline, and a
  * lazy cut would stack rounds. The flag changes durability only, never
  * results: ReliableCheckpointSpec pins result equality and that files
  * actually land under the dir.
  *
  * Retention: reliable checkpoint files outlive the frames that made
  * them. A long-lived session running with the flag should also set
  * `spark.cleaner.referenceTracking.cleanCheckpoints=true` so
  * checkpoint data is removed when its RDD is garbage-collected;
  * short-lived jobs just delete the directory afterwards (the
  * local-cluster smoke run does).
  */
object Checkpoints {

  private def dir: Option[String] =
    sys.props.get("graft.checkpoint.dir").orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))

  /** Whether the reliable mode is active (diagnostics/specs). */
  def reliable: Boolean = dir.isDefined

  /** Cut `df`'s lineage: eager local or reliable checkpoint per the
    * switch. */
  def cut(df: DataFrame): DataFrame = dir match {
    case Some(d) =>
      val sc = df.sparkSession.sparkContext
      // setCheckpointDir appends a UUID segment, so the context's current
      // dir matches the configured one iff its PARENT path resolves to it
      // (a leaf-name substring test would accept any stale dir sharing the
      // leaf name). Only touch it when unset or pointed elsewhere — a
      // session serves many queries and each setCheckpointDir call mints a
      // fresh UUID directory.
      val want = {
        val p = new org.apache.hadoop.fs.Path(d)
        if (p.toUri.getScheme == null)
          new org.apache.hadoop.fs.Path(new java.io.File(d).getAbsolutePath)
        else p
      }
      val pointed = sc.getCheckpointDir.exists { cur =>
        val par = new org.apache.hadoop.fs.Path(cur).getParent
        par != null && par.toUri.getPath == want.toUri.getPath &&
          (want.toUri.getScheme == null || par.toUri.getScheme == null ||
            want.toUri.getScheme == par.toUri.getScheme)
      }
      if (!pointed) sc.setCheckpointDir(d)
      df.checkpoint()
    case None => df.localCheckpoint()
  }
}

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
  * The LOCAL mode is LAZY (`localCheckpoint(false)`): the logical plan
  * is truncated to a one-node `LogicalRDD` immediately (so iterative
  * plans still stay one round deep — truncation is a plan-build-time
  * property, not a materialization-time one), but the blocks compute
  * when the first action touches the frame, FUSING the cut's
  * materialization into the job that consumes it. The r15 eager cut
  * paid one extra job + one extra block-read pass per round in every
  * iterative loop (star alternation, truss peel, BFS, DCL delta
  * assembly, forest resolution) — measured ~8.7 s of eager-cut stages
  * in one scaleprobe_dclmerge_x4 pass alone. Loop discipline under
  * laziness: a loop that unpersists an input AFTER cutting a frame
  * derived from it must materialize the cut first (the fixpoint probes
  * — count/isEmpty — already do; BFS materializes its tail once before
  * releasing the symmetric edge cache).
  *
  * The RELIABLE mode stays EAGER (`checkpoint()`): its entire point is
  * that the blocks durably exist the moment the cut returns. The flag
  * changes durability only, never results: ReliableCheckpointSpec pins
  * result equality and that files actually land under the dir.
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

  /** Cut `df`'s lineage: lazy local or eager reliable checkpoint per
    * the switch. */
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
    case None => df.localCheckpoint(false)
  }

  /** Free a cut frame's checkpoint blocks NOW (an iterative loop calls
    * this on round r−1 once round r has materialized): the
    * ContextCleaner reaps them on dereference eventually, but a long
    * iteration under memory pressure shouldn't wait for GC (guide §5).
    * Safe only when NOTHING will read the frame again — a local cut has
    * no lineage to recompute from, so a later read of a released frame
    * fails rather than silently recomputing. No-op for frames that are
    * not cuts; for reliable cuts it drops cached blocks only (the
    * checkpoint FILES stay — durability is unaffected). */
  def release(df: DataFrame): Unit = df.queryExecution.analyzed match {
    case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd.unpersist(false); ()
    case _ => ()
  }
}

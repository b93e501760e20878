package graft

import org.apache.spark.sql.SparkSession

/** Storage-maintenance entry point for a persisted store root:
  *
  * {{{
  * runMain graft.Maintenance fsck  /path/to/root   # deep integrity scan
  * runMain graft.Maintenance gc    /path/to/root   # collect orphans
  * runMain graft.Maintenance prune /path/to/root   # retire history + gc
  * }}}
  *
  * Exit code 0 = healthy/done; 1 = findings or usage error (findings are
  * printed one per line).
  *
  * gc and prune skip anything modified inside a grace window
  * ([[graft.engine.Persist.DefaultGcGraceMs]], 15 min), which protects
  * the objects of an in-flight snapshot save (objects land before their
  * manifest) from a collector racing a live writer. Offline runs remain
  * the recommendation — a young TRUE orphan simply waits for the next
  * pass. fsck is read-only and safe anytime. */
object Maintenance {
  def main(args: Array[String]): Unit = {
    val usage = "usage: graft.Maintenance <fsck|gc|prune> <storage-root>"
    if (args.length != 2) { System.err.println(usage); sys.exit(1) }
    val Array(cmd, root) = args
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName(s"graft-maintenance-$cmd")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val result: Either[String, Seq[String]] = cmd match {
      case "fsck"  => graft.engine.Persist.fsck(spark, root)
      case "gc"    => graft.engine.Persist.gc(spark, root).map(_.map(o => s"deleted $o"))
      case "prune" => graft.engine.Persist.prune(spark, root).map(_.map(o => s"deleted $o"))
      case other   => Left(s"unknown command: $other\n$usage")
    }
    spark.stop()
    result match {
      case Left(err) => System.err.println(err); sys.exit(1)
      case Right(lines) =>
        lines.foreach(println)
        if (cmd == "fsck" && lines.nonEmpty) sys.exit(1)
        println(s"$cmd: ${if (lines.isEmpty) "clean" else s"${lines.length} item(s)"}")
    }
  }
}

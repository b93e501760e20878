package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Dump `.explain("formatted")` for named queries to files — the
  * optimization-round evidence artifacts (`plans/rNN/<query>_{before,after}.txt`).
  *
  * Usage: runMain graft.PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>
  *
  * The plan captured is the EXECUTED plan after an actual run (AQE final
  * plan — join strategies and coalesced exchanges as they really
  * executed), falling back to the pre-execution formatted string for
  * queries whose frame is the product of imperative machinery (engine
  * scripts, streaming runs) where re-execution is the only way to see a
  * plan at all. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 4, "usage: PlanDump <sfDir> <outDir> <suffix> <q1,q2,...>")
    val Array(sfDir, outDir, suffix, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    for (n <- names.split(",").map(_.trim).filter(_.nonEmpty)) {
      spark.catalog.clearCache()
      val df = n match {
        // INTERNAL-STAGE evidence frame (not a declared query): the
        // wedge self-join + closure probe of graph_triangles — its
        // declared frame is a one-row collect that hides the joins
        // (r16 verdict asked for the wedge-stage plan specifically)
        case "graph_triangles_wedge" =>
          import org.apache.spark.sql.functions.col
          val lp = spark.read.parquet(s"$sfDir/lineitem.parquet")
            .select(col("l_orderkey").as("ok"), col("l_partkey").as("p")).distinct()
          val l1 = lp.select(col("ok"), col("p").as("s1"))
          val l2 = lp.select(col("ok").as("ok2"), col("p").as("s2"))
          val pairs = l1.join(l2, col("ok") === col("ok2") && col("s1") < col("s2"))
          val edges = graft.operators.Triangles.canonicalEdges(pairs, "s1", "s2")
            .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
          graft.operators.Triangles.orientedClosure(edges)._3
        case _ =>
          val fn = SparkEntry.queries.getOrElse(n, SparkEntry.scaleProbes(n))
          fn(spark, sfDir)
      }
      df.count()
      val txt = df.queryExecution.explainString(FormattedMode)
      // a plan-stacking pathology can render MBs of tree — keep the
      // artifact reviewable: head + a node-count summary
      def c(s: String) = txt.split(s, -1).length - 1
      val summary = s"\n=== PLAN SUMMARY: ${txt.length} chars, " +
        s"Exchange=${c("Exchange")}, BroadcastHashJoin=${c("BroadcastHashJoin")}, " +
        s"SortMergeJoin=${c("SortMergeJoin")}, ShuffledHashJoin=${c("ShuffledHashJoin")}, " +
        s"CartesianProduct=${c("CartesianProduct")}, Scan=${c("Scan ")} ===\n"
      val body =
        if (txt.length <= 200000) txt + summary
        else txt.take(120000) + s"\n... [truncated ${txt.length - 120000} chars]\n" + summary
      Files.writeString(Paths.get(outDir, s"${n}_$suffix.txt"), body)
      println(s"dumped $n (${txt.length} chars)")
    }
    spark.stop()
  }
}

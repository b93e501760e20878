package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round triage harness: run one named query (warm, like
  * the bench — one untimed pass then timed passes) with a listener
  * recording every Spark job's wall time and call site, so a multi-job
  * query's cost distributes over its actual jobs instead of guessing.
  * Also prints the wall time not covered by any job (driver-side gaps:
  * planning, checkpoint log IO, sequential engine folds).
  *
  * Usage: runMain graft.ProfileQuery <sfDir> <query> [passes]
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val passes = args.lift(2).map(_.toInt).getOrElse(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("PROFILE_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries.getOrElse(name, SparkEntry.scaleProbes(name))
    // untimed warmup (bench discipline)
    fn(spark, sfDir).count()
    spark.catalog.clearCache()

    case class J(id: Int, desc: String, start: Long, var end: Long = 0L)
    val jobs = new scala.collection.concurrent.TrieMap[Int, J]()
    val stages = new scala.collection.concurrent.TrieMap[Int, (String, Long, Int)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Seq("spark.job.description", "callSite.short")
          .flatMap(k => Option(e.properties.getProperty(k))).filter(_.nonEmpty)
          .headOption.getOrElse("?")
        jobs.put(e.jobId, J(e.jobId, d, e.time)): Unit
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.get(e.jobId).foreach(_.end = e.time)
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val dur = (for {a <- i.completionTime; b <- i.submissionTime} yield a - b).getOrElse(0L)
        stages.put(i.stageId, (i.name.takeWhile(_ != '\n').take(90), dur, i.numTasks)): Unit
      }
    }
    spark.sparkContext.addSparkListener(listener)
    for (p <- 1 to passes) {
      jobs.clear()
      stages.clear()
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      Thread.sleep(300) // let the listener bus drain
      val js = jobs.values.toSeq.sortBy(_.start)
      val jobTotal = js.map(j => (j.end - j.start).max(0L)).sum / 1e3
      println(f"== pass $p: wall=$wall%.3f s, jobs=${js.size}, jobTime=$jobTotal%.3f s, driverGap=${wall - jobTotal}%.3f s")
      // group jobs by call-site/description
      val byDesc = js.groupBy(_.desc).map { case (d, g) =>
        (d, g.size, g.map(j => (j.end - j.start).max(0L)).sum / 1e3)
      }.toSeq.sortBy(-_._3)
      byDesc.take(30).foreach { case (d, n, t) =>
        println(f"  $t%8.3f s  n=$n%-4d $d")
      }
      val byStage = stages.values.groupBy(_._1).map { case (nm, g) =>
        (nm, g.size, g.map(_._2).sum / 1e3, g.map(_._3).sum)
      }.toSeq.sortBy(-_._3)
      println("  -- stages --")
      byStage.take(25).foreach { case (nm, n, t, tasks) =>
        println(f"  $t%8.3f s  n=$n%-4d tasks=$tasks%-5d $nm")
      }
    }
    spark.stop()
  }
}

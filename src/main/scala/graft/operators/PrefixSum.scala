package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** The two-phase distributed prefix-sum scaffold shared by every global
  * order statistic in the engine ([[graft.pipeline.Packing.pack]]'s token
  * offsets, [[GlobalRank]]'s rank/NTILE): range-partition by the order
  * key (parallel range exchange), aggregate one measure per partition,
  * prefix-sum those aggregates on the driver (numPartitions rows — never
  * data), and hand back the partition bases for a per-partition window to
  * finish locally. The alternative — `Window.orderBy` with no partition
  * key — funnels the corpus through ONE task.
  *
  * Single home for the subtle parts: the ranged frame is persisted
  * because range-boundary SAMPLING is not re-run deterministic — the
  * driver aggregation pass and the caller's window pass must see the SAME
  * partitioning (persisted until LRU eviction or `clearCache`; the bench
  * clears caches between passes, so one-shot queries do not accumulate).
  * Partition boundaries cancel out of the final numbers, so different
  * layouts produce identical results (DeterminismSpec pins this).
  */
object PrefixSum {

  /** Returns (ranged frame + `__pid`, base frame (`__pid`, `__base`),
    * grand total), where `__base` is the sum of `measure` over all
    * partitions strictly before `__pid` in range order. Callers join
    * `broadcast(bases)` on `__pid` and finish with a window partitioned
    * by `__pid` ordered by `orderCols`. */
  def rangedBases(df: DataFrame, orderCols: Seq[String],
      measure: Column): (DataFrame, DataFrame, Long) = {
    val spark = df.sparkSession
    val parallelism = spark.sparkContext.defaultParallelism
    val cols: Seq[Column] = orderCols.map(c => col(s"`$c`"))
    val ranged = df.repartitionByRange(parallelism, cols: _*)
      .sortWithinPartitions(cols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val perPart = ranged.groupBy(col("__pid"))
      .agg(sum(measure).cast("long").as("__m"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val bases = Iterator.iterate((0, 0L)) { case (pid, acc) =>
      (pid + 1, acc + perPart.getOrElse(pid, 0L))
    }.take(parallelism + 1).toSeq
    val total = perPart.values.sum
    import spark.implicits._
    (ranged, bases.toDF("__pid", "__base"), total)
  }
}

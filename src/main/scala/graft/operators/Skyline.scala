package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{functions => F}
import org.apache.spark.storage.StorageLevel

/** Distributed 2-D skyline (Pareto front): rows not dominated on a
  * (minimize `costCol`, maximize `gainCol`) pair — the multi-criteria
  * shortlist primitive (cheapest-but-largest part, best
  * quality-per-token document, price/performance frontiers).
  *
  * Dominance: A dominates B iff A.cost ≤ B.cost ∧ A.gain ≥ B.gain with
  * at least one strict. Equal (cost, gain) points do not dominate each
  * other — duplicates of a frontier point all survive.
  *
  * Scale shape — the classic sort-sweep, distributed without ever
  * sorting the base table globally:
  *  1. ONE hash aggregate collapses rows to (cost → best gain): after
  *     it, everything is sized by DISTINCT costs, not rows.
  *  2. The strictly-cheaper running max over that collapsed table uses
  *     the [[PrefixSum]] discipline: range-partition by cost, ONE
  *     per-partition max each, prefix-max of those partition maxima on
  *     the driver (numPartitions values — never data), then a
  *     per-partition ROWS window finishes locally. No single-task
  *     global window anywhere.
  *  3. A point survives iff its gain is the best at its cost AND
  *     strictly exceeds every cheaper cost's best (ties in gain lose to
  *     the strictly cheaper holder). The frontier membership is joined
  *     back to the base on (cost, gain) — an equi-join keyed on the
  *     pair.
  * The result set is a property of the DATA (the non-dominated set) —
  * independent of partitioning, so it hash-checks against a quadratic
  * NOT-EXISTS oracle.
  */
object Skyline {

  /** Rows of `df` on the (min `costCol`, max `gainCol`) Pareto front. */
  def front2d(df: DataFrame, costCol: String, gainCol: String): DataFrame = {
    val spark = df.sparkSession
    val cost = col(s"`$costCol`")
    val gain = col(s"`$gainCol`")

    // 1. collapse to one row per cost
    val best = df.filter(cost.isNotNull && gain.isNotNull)
      .groupBy(cost.as("__c")).agg(F.max(gain).as("__g"))

    // 2. two-phase strictly-preceding running max over cost order
    val parallelism = spark.sparkContext.defaultParallelism
    val ranged = best.repartitionByRange(parallelism, col("__c"))
      .sortWithinPartitions(col("__c"))
      .withColumn("__pid", spark_partition_id())
      .persist(StorageLevel.MEMORY_AND_DISK)
    val perPart = ranged.groupBy(col("__pid")).agg(F.max(col("__g")).as("__m"))
      .collect().map(r => r.getInt(0) -> r.get(1)).toMap
    // prefix-max of partition maxima: base(p) = max over partitions < p
    val bases = (0 to parallelism).scanLeft((0, Option.empty[Any])) {
      case ((_, acc), pid) =>
        val next = (acc.toSeq ++ perPart.get(pid - 1)).reduceOption(maxAny)
        (pid, next)
    }.drop(1).map { case (pid, m) => (pid, m.orNull) }
    val gainType = best.schema("__g").dataType
    val baseDf = spark.createDataFrame(
      spark.sparkContext.parallelize(
        bases.map(b => org.apache.spark.sql.Row(b._1, b._2)), 1),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("__pid", org.apache.spark.sql.types.IntegerType),
        org.apache.spark.sql.types.StructField("__base", gainType))))

    val w = Window.partitionBy(col("__pid")).orderBy(col("__c"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val frontier = ranged.join(broadcast(baseDf), Seq("__pid"))
      .withColumn("__prev", greatest(F.max(col("__g")).over(w), col("__base")))
      .filter(col("__prev").isNull || col("__g") > col("__prev"))
      .select(col("__c"), col("__g"))

    // 3. join frontier membership back to the base rows.
    // `ranged` stays persisted (PrefixSum discipline: the driver-side
    // partition maxima and the window pass must see the SAME range
    // boundaries — re-sampling on recompute could shift them); the
    // bench clears caches between passes.
    df.join(frontier,
      cost === col("__c") && gain === col("__g"))
      .drop("__c", "__g")
  }

  private def maxAny(a: Any, b: Any): Any = (a, b) match {
    case (null, y) => y
    case (x, null) => x
    case (x: Int, y: Int) => if (x >= y) x else y
    case (x: Long, y: Long) => if (x >= y) x else y
    case (x: Double, y: Double) => if (x >= y) x else y
    case (x: Float, y: Float) => if (x >= y) x else y
    case (x: java.math.BigDecimal, y: java.math.BigDecimal) =>
      if (x.compareTo(y) >= 0) x else y
    case (x, y) => throw new IllegalArgumentException(
      s"unsupported gain type: ${x.getClass} / ${y.getClass}")
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Global order statistics WITHOUT a single-task global sort.
  *
  * Spark's `Window.orderBy` with no partition key collapses to one task —
  * the classic scale cliff for rank/ntile over a corpus. This operator
  * computes the same numbers the parallel way (same two-phase shape as
  * [[graft.pipeline.Packing.pack]]'s distributed prefix sum):
  *
  *  1. range-partition by the order key (parallel range exchange),
  *     sort WITHIN partitions (parallel sorts);
  *  2. count rows per partition, prefix-sum the counts on the driver
  *     (numPartitions rows — never data);
  *  3. global rank = partition base + local row_number (a partition-local
  *     window, fully parallel); NTILE follows in closed form.
  *
  * The order columns must form a total order (append a unique id as the
  * final tiebreak) — that is also what makes the result deterministic and
  * lets the DuckDB oracle replay it with the engine's own `ntile`.
  */
object GlobalRank {

  /** `df` plus a global 1-based `rankName` column under `orderCols`
    * (ascending, total order). */
  def withRank(df: DataFrame, orderCols: Seq[String],
      rankName: String = "rank"): DataFrame =
    ranked(df, orderCols)._1.withColumnRenamed("__rank", rankName)
      .drop("__pid")

  /** `df` plus the SQL-standard `NTILE(buckets)` under `orderCols`: the
    * first (n mod buckets) tiles get ceil(n/buckets) rows, the rest
    * floor(n/buckets) — the exact semantics of `ntile()` in Spark and
    * DuckDB, derived from the global rank in integer arithmetic. */
  def withNtile(df: DataFrame, orderCols: Seq[String], buckets: Int,
      out: String = "ntile"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val (r, n) = ranked(df, orderCols)
    val b = buckets.toLong
    val big = n % b
    val sizeBig = n / b + 1
    val sizeSmall = math.max(n / b, 1L) // unreachable divisor when n < b
    val thr = big * sizeBig
    r.withColumn(out,
      when(col("__rank") <= thr,
        expr(s"((__rank - 1) div ${sizeBig}L) + 1"))
        .otherwise(expr(s"$big + ((__rank - $thr - 1) div ${sizeSmall}L) + 1"))
        .cast("int"))
      .drop("__pid", "__rank")
  }

  /** Shared phase 1+2: range-partitioned frame with `__pid` and global
    * `__rank` columns, plus the total row count (free from the
    * per-partition counts — no extra job). The scaffold (range exchange,
    * driver prefix sum, persist rationale) lives in [[PrefixSum]]. */
  private def ranked(df: DataFrame, orderCols: Seq[String]): (DataFrame, Long) = {
    val (ranged, baseDf, n) = PrefixSum.rangedBases(df, orderCols, lit(1L))
    val cols: Seq[Column] = orderCols.map(c => col(s"`$c`"))
    val w = Window.partitionBy(col("__pid")).orderBy(cols: _*)
    val out = ranged.join(broadcast(baseDf), Seq("__pid"))
      .withColumn("__rank", col("__base") + row_number().over(w))
      .drop("__base")
    (out, n)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series reduction operators over an aggregated (key, x, y)
  * series — changepoint detection and display downsampling. Both are
  * pure integer arithmetic end-to-end (no libm, no float accumulation),
  * so the DuckDB oracle hash-checks them exactly at any scale.
  *
  * Scale shape: the series these run on is an AGGREGATE (per-day
  * totals), so the input is metadata-sized relative to the corpus —
  * thousands of rows per key, never the raw events. Every window below
  * is partitioned by the series key (or the bucket id), never a
  * single-task global sort.
  */
object Series {

  /** CUSUM changepoint per key: for the series y_1..y_n (ordered by x),
    * the cumulative-sum deviation at step k is classically
    * S_k − k·mean(y). Scaling by n keeps it integral:
    *
    *   D_k = n·S_k − k·T      (S_k = running sum, T = total)
    *
    * The changepoint is the x maximizing |D_k| — where the running mean
    * diverges most from the global mean, i.e. the most likely single
    * level-shift split (Page '54's one-pass statistic). Ties break to
    * the earliest x. Returns one row per key:
    * (key, split_x, dev = max |D_k|, n_points).
    *
    * Plan: ONE hash exchange on the key feeds all four window
    * aggregates (count/total over the unbounded frame, running sum +
    * row number over the ordered frame) AND the final per-key argmin —
    * the groupBy reuses the window's HashPartitioning, so no second
    * shuffle. |D| is bounded by n·T: at 1e6 points of 1e9 totals it
    * sits near 2^70 — past BIGINT — so callers aggregate y to a scale
    * where n·T < 2^63 (daily grains: n ≤ ~1e4, T ≤ ~1e14 comfortably
    * clears it; the oracle overflows identically, not silently, if
    * violated).
    */
  def cusumChangepoint(series: DataFrame, key: String = "event_type",
      x: String = "day", y: String = "y"): DataFrame = {
    val part = Window.partitionBy(col(key))
    val ordered = part.orderBy(col(x))
    val running = ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val scored = series
      .withColumn("__n", count(lit(1)).over(part))
      .withColumn("__t", sum(col(y)).over(part))
      .withColumn("__s", sum(col(y)).over(running))
      .withColumn("__k", row_number().over(ordered).cast("long"))
      .withColumn("__dev", abs(col("__n") * col("__s") - col("__k") * col("__t")))
    scored.groupBy(col(key))
      .agg(min(struct(negate(col("__dev")).as("ndev"), col(x).as("bx"),
        col("__n").as("bn"))).as("__best"))
      .select(col(key),
        col("__best").getField("bx").as("split_x"),
        negate(col("__best").getField("ndev")).as("dev"),
        col("__best").getField("bn").as("n_points"))
  }

  /** Lags reported by [[autocorr]] (1 = momentum, 7 = weekly season). */
  val AcfLags: Seq[Int] = Seq(1, 7)

  /** Lag-k autocorrelation of an integer series — the seasonality/
    * momentum detector next to [[cusumChangepoint]]: Pearson r over the
    * (y_t, y_{t+k}) pairs for each lag in `lags`. Moments are exact
    * integer sums (y is a count series), so both engines evaluate ONE
    * identical IEEE expression per lag; pairs come from a lag-shifted
    * self-join on x+k (the `ts_seasonal_naive` join shape), never a
    * window over the corpus. Returns (lag, n_pairs, acf). */
  def autocorr(series: DataFrame, lags: Seq[Int] = AcfLags,
      x: String = "day", y: String = "y"): DataFrame = {
    require(lags.nonEmpty, "need at least one lag")
    val lagged = series.select(explode(typedLit(lags.map(_.toLong))).as("lag"),
      col(x), col(y))
    val shifted = series.select((col(x)).as("__sx"), col(y).as("__yl"))
    val pairs = lagged.join(shifted, col("__sx") === col(x) + col("lag"))
    pairs.groupBy(col("lag"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col(y)).as("__sa"), sum(col("__yl")).as("__sb"),
        sum(col(y) * col("__yl")).as("__sab"),
        sum(col(y) * col(y)).as("__saa"),
        sum(col("__yl") * col("__yl")).as("__sbb"))
      .select(col("lag"), col("n_pairs"),
        // zero-variance guard: a constant series (or <2 pairs) makes a
        // variance term 0 — Spark's Divide would return NULL while
        // DuckDB's IEEE division returns NaN/Inf; pin BOTH to NULL via
        // an explicit CASE (the corrMatrix/assortativity discipline).
        // The variance terms are exact integers here, so === 0 is safe.
        when(col("n_pairs") * col("__saa") - col("__sa") * col("__sa") <= 0 ||
             col("n_pairs") * col("__sbb") - col("__sb") * col("__sb") <= 0,
          lit(null).cast("double"))
        .otherwise(
          round((col("n_pairs").cast("double") * col("__sab").cast("double") -
            col("__sa").cast("double") * col("__sb").cast("double")) /
            (sqrt(col("n_pairs").cast("double") * col("__saa").cast("double") -
              col("__sa").cast("double") * col("__sa").cast("double")) *
              sqrt(col("n_pairs").cast("double") * col("__sbb").cast("double") -
                col("__sb").cast("double") * col("__sb").cast("double"))), 6))
          .as("acf"))
  }

  /** Interior bucket count for [[lttbDownsample]]. */
  val LttbBuckets = 12

  /** Largest-Triangle-Three-Buckets display downsampling (Steinarsson
    * '13), the FIXED-ANCHOR variant: the series' interior is cut into
    * `buckets` equal x-ranges; each bucket keeps the point forming the
    * largest triangle with the NEIGHBOR BUCKETS' MEAN points (the
    * classic algorithm anchors on the previously SELECTED point — a
    * sequential chain; anchoring on the bucket means instead makes
    * every bucket independent, the standard parallel variant, at the
    * cost of slightly different selections near flat regions). The
    * first and last points are always kept (buckets −1 and `buckets`).
    *
    * Exactness: with A and C the mean points of the flanking buckets
    * and P = (px, py) a candidate, 2·area·np²·nc is the INTEGER
    *
    *   (Sxp·nc − Sxc·np)(py·np − Syp) − (Sxp − px·np)(Syc·np − Syp·nc)
    *
    * and np, nc are constant within a bucket, so ranking by its
    * absolute value ranks by area — no division ever happens. Ties
    * break to the earliest x. An empty flanking bucket falls back to
    * the series endpoint on that side (documented divergence from the
    * sequential algorithm, which cannot have empty anchors).
    *
    * Plan: bounds are ONE 1-row aggregate broadcast back (the
    * scalar-subquery BNLJ shape); bucket stats are one groupBy on the
    * bucket id broadcast onto the candidates; selection is one
    * bucket-keyed argmin. The series is day-grain metadata, so every
    * exchange moves bounded rows. Magnitudes: |score| <
    * Sx·n²·y ≈ x·y·n³ — day indices (~2·10⁴), daily totals ≤ 10⁹ and
    * n ≤ 31 per bucket stay under 2^63 with margin.
    */
  def lttbDownsample(series: DataFrame, buckets: Int = LttbBuckets,
      x: String = "day", y: String = "y"): DataFrame = {
    require(buckets >= 1, s"buckets must be >= 1, got $buckets")
    val b = lit(buckets.toLong)
    val bounds = broadcast(series.agg(
      min(struct(col(x), col(y))).as("p0"),
      max(struct(col(x), col(y))).as("p1"))
      .select(col("p0").getField(x).as("x0"), col("p0").getField(y).as("y0"),
        col("p1").getField(x).as("x1"), col("p1").getField(y).as("y1")))
    val interior = series.crossJoin(bounds)
      .filter(col(x) > col("x0") && col(x) < col("x1"))
      .withColumn("bucket",
        expr(s"(($x - x0 - 1L) * ${buckets}L) div (x1 - x0 - 1L)"))
    val stats = interior.groupBy(col("bucket"))
      .agg(sum(col(x)).as("sx"), sum(col(y)).as("sy"), count(lit(1)).as("n"))
    val prev = stats.select((col("bucket") + 1).as("bucket"),
      col("sx").as("psx"), col("sy").as("psy"), col("n").as("pn"))
    val next = stats.select((col("bucket") - 1).as("bucket"),
      col("sx").as("nsx"), col("sy").as("nsy"), col("n").as("nn"))
    val anchored = interior
      .join(broadcast(prev), Seq("bucket"), "left_outer")
      .join(broadcast(next), Seq("bucket"), "left_outer")
      .withColumn("psx", coalesce(col("psx"), col("x0"))) // empty/missing left
      .withColumn("psy", coalesce(col("psy"), col("y0"))) // flank → start point
      .withColumn("pn", coalesce(col("pn"), lit(1L)))
      .withColumn("nsx", coalesce(col("nsx"), col("x1"))) // … → end point
      .withColumn("nsy", coalesce(col("nsy"), col("y1")))
      .withColumn("nn", coalesce(col("nn"), lit(1L)))
      .withColumn("score", abs(
        (col("psx") * col("nn") - col("nsx") * col("pn")) *
          (col(y) * col("pn") - col("psy")) -
          (col("psx") - col(x) * col("pn")) *
            (col("nsy") * col("pn") - col("psy") * col("nn"))))
    val picked = anchored.groupBy(col("bucket"))
      .agg(min(struct(negate(col("score")).as("nscore"), col(x).as("bx"),
        col(y).as("by"))).as("__best"))
      .select(col("bucket"),
        col("__best").getField("bx").as(x),
        col("__best").getField("by").as(y),
        negate(col("__best").getField("nscore")).as("score"))
    val endpoints = bounds.select(lit(-1L).as("bucket"), col("x0").as(x),
      col("y0").as(y), lit(0L).as("score"))
      .union(bounds.select(b, col("x1"), col("y1"), lit(0L)))
    picked.unionByName(endpoints)
  }
}

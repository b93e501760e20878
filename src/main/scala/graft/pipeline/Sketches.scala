package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed-sketch operators whose estimates are DETERMINISTIC —
  * unlike HLL-family sketches (whose register layout is
  * implementation-defined, so no cross-engine oracle can check them),
  * these are exact functions of the input multiset and re-derivable in
  * plain SQL by the DuckDB oracle.
  */
object Sketches {

  /** 2^60 — the hash-space size of the 15-hex-char md5 prefix used as the
    * KMV uniform hash (same construction as [[Dedup]]'s MinHash base
    * hash). Exactly representable in a double (a power of two), so the
    * estimate's floating-point arithmetic is reproducible anywhere. */
  val KmvHashSpace: Double = 1152921504606846976.0

  /** K-minimum-values distinct-count sketch (Bar-Yossef et al. '02): hash
    * every value uniformly, keep the k smallest DISTINCT hashes; with
    * U = kth smallest hash / hash-space, distinct ≈ (k−1)/U. Relative
    * error ~ 1/√(k−2) (≈3% at k=1024). Deterministic: same input set →
    * same k-minima → same estimate, on any engine that can md5.
    *
    * Scale shape: the hash is a narrow map fused with the scan; the
    * distinct is a map-side-combined hash aggregate on an 8-byte key (each
    * partition ships its UNIQUE hashes once); the k smallest is
    * TakeOrderedAndProject — per-partition heaps + driver merge of
    * k·partitions rows, never a global sort. The shuffle is bounded by the
    * distinct-value count, not the row count — the right trade for a
    * sketch whose whole job is `count(DISTINCT x)` without a giant exact
    * distinct: the estimate needs only ONE pass and O(k) driver memory.
    *
    * Returns one row: `k` (minima actually kept), `kth` (the largest of
    * them), `est_distinct`. Fewer than k distinct values → the sketch IS
    * the exact count and reports it. */
  def kmvDistinct(df: DataFrame, valueCol: String, k: Int = 1024): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    val h = kmvHash(valueCol)
    // null values hash to a null hv; drop them EXPLICITLY on both engine
    // sides — Spark windows sort NULLS FIRST while DuckDB sorts NULLS
    // LAST, so an unfiltered null would silently skew the k-minima set
    // on exactly one side (count(DISTINCT x) ignores nulls anyway)
    // NOTE: no pre-hash rebalance here — measured at sf0.1, the extra
    // exchange costs more than the single-column md5 it parallelizes
    // (kmv_distinct 1.9 → 2.7 s WITH it); the multi-column ndvProfile
    // is where the rebalance wins (7.4 → 2.0 s), and it rebalances at
    // its own call site before the 16× explode.
    kmvEstimateFromMins(
      df.select(h.as("hv")).where(col("hv").isNotNull).distinct()
        .orderBy(col("hv")).limit(k), k)
  }

  /** The KMV estimator over an already-computed k-minima set `mins`
    * (one `hv` column, ≤ k distinct hashes): (k−1)·space/kth, or the
    * exact count below k. Shared by the one-shot [[kmvDistinct]] and
    * the streamed fold ([[graft.streaming.StreamOracle]]), which must
    * agree bit-for-bit. */
  def kmvEstimateFromMins(mins: DataFrame, k: Int): DataFrame =
    mins.agg(count(lit(1)).as("k"), max(col("hv")).as("kth"))
      .select(col("k"), col("kth"),
        when(col("k") < k, col("k").cast("double"))
          .otherwise((col("k") - 1).cast("double") * lit(KmvHashSpace) /
            col("kth").cast("double"))
          .as("est_distinct"))

  /** The [[kmvDistinct]] hash: 60-bit prefix of md5 over the value's
    * string form (single-sourced for the streamed fold). */
  def kmvHash(valueCol: String): org.apache.spark.sql.Column =
    conv(substring(md5(col(valueCol).cast("string")), 1, 15), 16, 10).cast("long")

  /** The DuckDB re-derivation of [[kmvDistinct]] over `table.valueExpr`
    * (single-sourced so the two sides cannot drift). */
  def kmvDistinctOracle(table: String, valueExpr: String, k: Int = 1024): String =
    s"""WITH h AS (SELECT DISTINCT ('0x' || substr(md5(($valueExpr)::VARCHAR), 1, 15))::BIGINT AS hv FROM $table WHERE ($valueExpr) IS NOT NULL),
       |mins AS (SELECT hv FROM h ORDER BY hv LIMIT $k),
       |m AS (SELECT count(*) AS k, max(hv) AS kth FROM mins)
       |SELECT k, kth, CASE WHEN k < $k THEN k::DOUBLE
       |  ELSE (k - 1)::DOUBLE * $KmvHashSpace / kth::DOUBLE END AS est_distinct
       |FROM m""".stripMargin

  /** Per-group KMV: [[kmvDistinct]] partitioned by a group column — the
    * "distinct users per segment / distinct tokens per language" profile
    * at sketch cost. Same determinism contract (md5-prefix hash, k
    * smallest per group, (k−1)/U estimate).
    *
    * Scale shape: the (group, hash) distinct is one map-side-combined
    * aggregate shipping each group's UNIQUE hashes once; the k-minima
    * ranking is a per-group window over those distinct hashes (partition
    * size = group's distinct count, never its row count). Groups with
    * fewer than k distinct values report the exact count. */
  def kmvDistinctByGroup(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val h = kmvHash(valueCol)
    // null-hash filter mirrors [[kmvDistinct]]: without it the two
    // engines' divergent null ordering would pick different k-minima
    val hv = df.select(col(groupCol), h.as("hv"))
      .where(col("hv").isNotNull).distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("hv"))
    hv.withColumn("__rn", row_number().over(w)).where(col("__rn") <= k)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("k"), max(col("hv")).as("kth"))
      .select(col(groupCol), col("k"), col("kth"),
        when(col("k") < k, col("k").cast("double"))
          .otherwise((col("k") - 1).cast("double") * lit(KmvHashSpace) /
            col("kth").cast("double"))
          .as("est_distinct"))
  }

  /** The DuckDB re-derivation of [[kmvDistinctByGroup]] (single-sourced
    * with the Spark side so the two contracts cannot drift). */
  def kmvDistinctByGroupOracle(table: String, groupCol: String,
      valueExpr: String, k: Int = 256): String =
    s"""WITH h AS (SELECT DISTINCT $groupCol, ('0x' || substr(md5(($valueExpr)::VARCHAR), 1, 15))::BIGINT AS hv FROM $table WHERE ($valueExpr) IS NOT NULL),
       |r AS (SELECT $groupCol, hv, row_number() OVER (PARTITION BY $groupCol ORDER BY hv) AS rn FROM h),
       |m AS (SELECT $groupCol, count(*) AS k, max(hv) AS kth FROM r WHERE rn <= $k GROUP BY 1)
       |SELECT $groupCol, k, kth, CASE WHEN k < $k THEN k::DOUBLE
       |  ELSE (k - 1)::DOUBLE * $KmvHashSpace / kth::DOUBLE END AS est_distinct
       |FROM m""".stripMargin

  /** KMV set algebra (Beyer et al. '07): sketch two value sets with the
    * SAME hash, then
    *   - the union sketch is the k smallest of the combined minima, so
    *     est |A∪B| is the usual (k−1)/U estimator over it;
    *   - ρ = (union minima present in BOTH input sketches) / k is an
    *     unbiased estimate of the Jaccard J(A,B);
    *   - est |A∩B| = ρ · est |A∪B|.
    * The audience-overlap / cross-corpus-contamination question at
    * sketch cost: no join between the two populations ever happens —
    * each side ships k 8-byte minima. When the union has fewer than k
    * distinct hashes both sketches are complete and every figure is
    * EXACT (reported via the same formulas). Deterministic: an exact
    * function of the two distinct sets, re-derivable by the oracle.
    *
    * Scale shape per side: one scan-fused hash map + one distinct
    * aggregate + a TakeOrderedAndProject heap — the [[kmvDistinct]]
    * plan; the algebra itself runs over 2k rows. */
  def kmvOverlap(a: DataFrame, aCol: String, b: DataFrame, bCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    def minima(df: DataFrame, c: String) = {
      df.select(kmvHash(c).as("hv")).where(col("hv").isNotNull).distinct()
        .orderBy(col("hv")).limit(k)
    }
    val u = minima(a, aCol).select(col("hv"), lit(1).as("ia"), lit(0).as("ib"))
      .unionAll(minima(b, bCol).select(col("hv"), lit(0).as("ia"), lit(1).as("ib")))
      .groupBy(col("hv"))
      .agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      .orderBy(col("hv")).limit(k)
    val estU = when(col("k") < k, col("k").cast("double"))
      .otherwise((col("k") - 1).cast("double") * lit(KmvHashSpace) /
        col("kth").cast("double"))
    u.agg(count(lit(1)).as("k"), max(col("hv")).as("kth"),
        sum(col("ia") * col("ib")).as("n_both"))
      .select(col("k"), col("kth"), col("n_both"),
        estU.as("est_union"),
        (col("n_both").cast("double") / col("k").cast("double")).as("jaccard"),
        (col("n_both").cast("double") / col("k").cast("double") * estU)
          .as("est_intersection"))
  }

  /** The DuckDB re-derivation of [[kmvOverlap]] (single-sourced:
    * `filterA`/`filterB` carve the two populations out of `table`). */
  def kmvOverlapOracle(table: String, valueExpr: String, filterA: String,
      filterB: String, k: Int = 256): String = {
    def minima(f: String) =
      s"""SELECT hv FROM (SELECT DISTINCT ('0x' || substr(md5(($valueExpr)::VARCHAR), 1, 15))::BIGINT AS hv
         |  FROM $table WHERE ($f) AND ($valueExpr) IS NOT NULL) ORDER BY hv LIMIT $k""".stripMargin
    s"""WITH u AS (SELECT hv, max(ia) AS ia, max(ib) AS ib FROM (
       |    SELECT hv, 1 AS ia, 0 AS ib FROM (${minima(filterA)})
       |    UNION ALL SELECT hv, 0, 1 FROM (${minima(filterB)}))
       |  GROUP BY hv ORDER BY hv LIMIT $k),
       |m AS (SELECT count(*) AS k, max(hv) AS kth, sum(ia * ib)::BIGINT AS n_both FROM u)
       |SELECT k, kth, n_both,
       |  CASE WHEN k < $k THEN k::DOUBLE
       |       ELSE (k - 1)::DOUBLE * $KmvHashSpace / kth::DOUBLE END AS est_union,
       |  n_both::DOUBLE / k::DOUBLE AS jaccard,
       |  n_both::DOUBLE / k::DOUBLE *
       |    (CASE WHEN k < $k THEN k::DOUBLE
       |          ELSE (k - 1)::DOUBLE * $KmvHashSpace / kth::DOUBLE END) AS est_intersection
       |FROM m""".stripMargin
  }

  /** KMV rollup — the MERGEABILITY contract that makes sketches useful
    * at warehouse scale: build one k-minima sketch PER GROUP (per day,
    * per shard, per partition — [[kmvDistinctByGroup]]'s shape), then
    * merge the groups' minima into the global k-minima sketch and
    * estimate the union's distinct count. Merging is provably LOSSLESS
    * for KMV: any hash among the global k smallest is among its own
    * group's k smallest (its group holds a subset of the smaller
    * hashes), so the merged estimate EQUALS a direct global sketch —
    * pre-aggregate daily, roll up weekly/monthly for free, never
    * rescan (the property spec pins merge ≡ direct; HLL merges are
    * likewise lossless but not oracle-checkable — see the object doc).
    *
    * Output: one row (n_groups, k, kth, est_distinct). Scale shape: the
    * per-group stage is [[kmvDistinctByGroup]]'s bounded window; the
    * merge handles n_groups·k 8-byte rows — metadata, not data. */
  def kmvRollup(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 256): DataFrame = {
    require(k >= 2, s"KMV needs k >= 2, got $k")
    import org.apache.spark.sql.expressions.Window
    val h = kmvHash(valueCol)
    val hv = df.select(col(groupCol), h.as("hv"))
      .where(col("hv").isNotNull).distinct()
    val w = Window.partitionBy(col(groupCol)).orderBy(col("hv"))
    val perGroup = hv.withColumn("__rn", row_number().over(w))
      .where(col("__rn") <= k)
    val estU = when(col("k") < k, col("k").cast("double"))
      .otherwise((col("k") - 1).cast("double") * lit(KmvHashSpace) /
        col("kth").cast("double"))
    perGroup
      .agg(countDistinct(col(groupCol)).as("n_groups"),
        collect_list(col("hv")).as("__minima"))
      .select(col("n_groups"),
        explode(slice(array_sort(array_distinct(col("__minima"))), 1, k)).as("hv"))
      .groupBy(col("n_groups"))
      .agg(count(lit(1)).as("k"), max(col("hv")).as("kth"))
      .select(col("n_groups"), col("k"), col("kth"), estU.as("est_distinct"))
  }

  /** DuckDB half of [[kmvRollup]] — deliberately the DIRECT global KMV
    * (plus the group count): the rollup's whole claim is that merging
    * per-group sketches loses nothing, so the oracle checks the merged
    * estimate against the from-scratch one. */
  def kmvRollupOracle(table: String, groupExpr: String, valueExpr: String,
      k: Int = 256): String =
    s"""WITH h AS (SELECT DISTINCT ('0x' || substr(md5(($valueExpr)::VARCHAR), 1, 15))::BIGINT AS hv
       |  FROM $table WHERE ($valueExpr) IS NOT NULL),
       |g AS (SELECT count(DISTINCT $groupExpr) AS n_groups FROM $table WHERE ($valueExpr) IS NOT NULL),
       |mins AS (SELECT hv FROM h ORDER BY hv LIMIT $k),
       |m AS (SELECT count(*) AS k, max(hv) AS kth FROM mins)
       |SELECT g.n_groups, m.k, m.kth, CASE WHEN m.k < $k THEN m.k::DOUBLE
       |  ELSE (m.k - 1)::DOUBLE * $KmvHashSpace / m.kth::DOUBLE END AS est_distinct
       |FROM m, g""".stripMargin

  val QuantileSalt = "graft-qsk"

  /** Deterministic sampled quantile: a salted-hash Bernoulli sample
    * (same 4-hex gate as [[Sampling]] — the sample is a pure function of
    * row identity, not of rand() or partitioning) and ONE exact
    * percentile over the sample. Estimate quality is the classic
    * order-statistic bound (±O(1/√(n·rate)) quantile error); determinism
    * comes from integral `valueCol` values at a binary-fraction `q`
    * (interpolation is then IEEE-exact — the `agg_quartiles` contract).
    *
    * Scale shape: the gate filters AT THE SCAN (zero wide exchange over
    * the corpus); the percentile is a single aggregate over the
    * rate-shrunken sample — the answer to "approximate median of 100 TB"
    * without a global sort or a mergeable-histogram library. */
  def sampledQuantile(df: DataFrame, idCol: org.apache.spark.sql.Column,
      valueCol: org.apache.spark.sql.Column, q: Double, rate: Double,
      salt: String = QuantileSalt): DataFrame =
    quantileEstimate(df.where(quantileGate(idCol, salt) < quantileBound(rate)),
      valueCol, q)

  /** The [[sampledQuantile]] Bernoulli gate (pure function of row
    * identity) and its rate bound — single-sourced for the streamed
    * fold, which must admit EXACTLY the one-shot sample. */
  def quantileGate(idCol: org.apache.spark.sql.Column,
      salt: String = QuantileSalt): org.apache.spark.sql.Column =
    conv(substring(sha2(concat(idCol.cast("string"), lit("|" + salt)), 256), 1, 4), 16, 10)
      .cast("long")

  def quantileBound(rate: Double): Long = math.min((rate * 65536).toLong, 65535L)

  /** One exact percentile + size over an already-gated sample (shared by
    * [[sampledQuantile]] and the streamed fold). */
  def quantileEstimate(sample: DataFrame, valueCol: org.apache.spark.sql.Column,
      q: Double): DataFrame =
    sample.agg(percentile(valueCol, lit(q)).as("estimate"),
      count(lit(1)).as("n_sampled"))

  /** DuckDB half of [[sampledQuantile]] (quantile_cont shares Spark
    * percentile's (n−1)·q interpolation). */
  def sampledQuantileOracle(table: String, idExpr: String, valueExpr: String,
      q: Double, rate: Double, salt: String = QuantileSalt): String = {
    val bound = math.min((rate * 65536).toLong, 65535L)
    s"""SELECT quantile_cont($valueExpr, $q) AS estimate, count(*) AS n_sampled
       |FROM $table
       |WHERE ('0x' || substr(sha256(($idExpr) || '|$salt'), 1, 4))::BIGINT < $bound""".stripMargin
  }

  /** Quantile-sketch rollup — the mergeability contract, quantile
    * edition (the [[kmvRollup]] sibling): build one salted-hash sample
    * PER GROUP (per day, per shard — the pre-aggregate a warehouse
    * persists), then merge the groups' samples and take ONE exact
    * percentile over the union. Merging is provably LOSSLESS here
    * because the Bernoulli gate is a pure function of row identity —
    * each row's membership is decided locally, so the union of
    * per-group samples IS the direct global sample, row for row
    * (contrast rate-targeting per-group reservoirs, which are NOT
    * mergeable without reweighting). The oracle computes the direct
    * global sampled quantile from scratch; merge ≡ direct is the row's
    * claim. Estimate quality is [[sampledQuantile]]'s order-statistic
    * bound; determinism needs integral values + binary-fraction q.
    *
    * Output: one row (n_groups, estimate, n_sampled); n_groups counts
    * groups that contributed ≥1 sampled row. Scale shape: the gate
    * filters at the scan; the per-group stage is one hash exchange over
    * the rate-shrunken sample; the merge moves those same sample rows
    * once more — at rate 5% of a 100 TB corpus that is the 5 TB you
    * already decided a quantile estimate is worth, and the per-group
    * sketches are what you'd persist to AVOID the rescan. */
  def quantileRollup(df: DataFrame, groupCol: org.apache.spark.sql.Column,
      idCol: org.apache.spark.sql.Column, valueCol: org.apache.spark.sql.Column,
      q: Double, rate: Double, salt: String = QuantileSalt): DataFrame = {
    val bound = math.min((rate * 65536).toLong, 65535L)
    val gate = conv(substring(sha2(concat(idCol.cast("string"), lit("|" + salt)), 256), 1, 4), 16, 10)
      .cast("long")
    val sampled = df.where(gate < bound).select(groupCol.as("__g"), valueCol.as("__v"))
    // the per-group sketches (persistable pre-aggregates)...
    val perGroup = sampled.groupBy(col("__g"))
      .agg(collect_list(col("__v")).as("__sample"))
    // ...merged: concatenate and take one exact percentile over the
    // union. explode_outer + count(__v): an EMPTY sample must still
    // yield the one (0, NULL, 0) summary row the oracle's ungrouped
    // aggregate produces — plain explode would drop it and the engines
    // would diverge on row count
    perGroup
      .agg(count(lit(1)).as("n_groups"),
        flatten(collect_list(col("__sample"))).as("__all"))
      .select(col("n_groups"), explode_outer(col("__all")).as("__v"))
      .groupBy(col("n_groups"))
      .agg(percentile(col("__v"), lit(q)).as("estimate"),
        count(col("__v")).as("n_sampled"))
      .select(col("n_groups"), col("estimate"), col("n_sampled"))
  }

  /** DuckDB half of [[quantileRollup]] — deliberately the DIRECT global
    * sampled quantile (plus the contributing-group count): lossless
    * merging is the contract being checked. */
  def quantileRollupOracle(table: String, groupExpr: String, idExpr: String,
      valueExpr: String, q: Double, rate: Double,
      salt: String = QuantileSalt): String = {
    val bound = math.min((rate * 65536).toLong, 65535L)
    s"""SELECT count(DISTINCT $groupExpr) AS n_groups,
       |  quantile_cont($valueExpr, $q) AS estimate, count(*) AS n_sampled
       |FROM $table
       |WHERE ('0x' || substr(sha256(($idExpr) || '|$salt'), 1, 4))::BIGINT < $bound""".stripMargin
  }

  /** Count-min sketch depth (independent hash rows) and width (counters
    * per row). Error bound: est ≤ true + 2N/width with prob
    * 1 − 2^−depth; memory is depth·width counters, period. */
  val CmsDepth = 4
  val CmsWidth = 256

  /** Hash row r's bucket for `key` — an independent md5 per row via a
    * row-salted preimage (same construction family as the KMV /
    * MinHash base hashes; 8 hex chars < 2^32, so the mod is positive). */
  private def cmsBucket(r: Int, key: org.apache.spark.sql.Column) =
    conv(substring(md5(concat(lit(s"cms$r|"), key.cast("string"))), 1, 8), 16, 10)
      .cast("long") % CmsWidth

  /** Count-min sketch (Cormode–Muthukrishnan '05) heavy-hitter
    * evaluation: build the depth×width counter grid over `keyCol` in
    * one pass, then read back the `topK` true-heaviest keys' point
    * estimates next to their exact counts. CMS never undercounts
    * (est = min over rows of a counter that includes every occurrence
    * of the key), so `overcount = est − true ≥ 0` — the row both
    * demonstrates the sketch and MEASURES its collision inflation at
    * this width, the number you read before trusting the sketch alone
    * at 100 TB (where the exact side of this harness is unaffordable
    * and the sketch is all you keep).
    *
    * Mergeability is structural: counters are plain sums, so per-shard
    * grids merged by cell-wise addition ARE the global grid — the same
    * contract [[kmvRollup]] and [[quantileRollup]] pin for their
    * families.
    *
    * Scale shape: the grid build is ONE map-side-combined aggregation
    * whose key space is depth·width (1024 cells) regardless of input
    * size — the depth-fold explode collapses in the partial aggregate,
    * so only ~1024 rows per partition cross the exchange. The truth arm
    * is one exact groupBy + TakeOrderedAndProject (top-k heaps, never a
    * global sort); the probe join is 1024 cells against depth·topK
    * probe rows — both sides broadcastable. */
  def cmsHeavy(df: DataFrame, keyCol: String, topK: Int = 10): DataFrame =
    cmsProbeHeavy(df, keyCol, topK, cmsGrid(df, keyCol))

  /** The (row, bucket) counter grid of the CMS over `df.keyCol` —
    * counters are SUMS, so per-batch grids fold by addition into the
    * global grid (the `streaming_cms_heavy` law). */
  def cmsGrid(df: DataFrame, keyCol: String): DataFrame = {
    val keyed = df.select(col(s"`$keyCol`").as("key")).where(col("key").isNotNull)
    val rbs = array((0 until CmsDepth).map(r =>
      struct(lit(r).as("r"), cmsBucket(r, col("key")).as("b"))): _*)
    keyed.select(explode(rbs).as("rb"))
      .groupBy(col("rb.r").as("r"), col("rb.b").as("b"))
      .agg(count(lit(1)).as("c"))
  }

  /** The check arm: exact top-`topK` keys probed against `grid` (min
    * across the depth rows = the CMS estimate). Shared by the one-shot
    * [[cmsHeavy]] and the streamed fold, which must agree exactly. */
  def cmsProbeHeavy(df: DataFrame, keyCol: String, topK: Int,
      grid: DataFrame): DataFrame = {
    require(topK >= 1, s"topK must be >= 1, got $topK")
    val key = col(s"`$keyCol`")
    val keyed = df.select(key.as("key")).where(col("key").isNotNull)
    val rbs = array((0 until CmsDepth).map(r =>
      struct(lit(r).as("r"), cmsBucket(r, col("key")).as("b"))): _*)
    val truth = keyed.groupBy(col("key"))
      .agg(count(lit(1)).as("true_count"))
      .orderBy(col("true_count").desc, col("key")).limit(topK)
    truth.select(col("key"), col("true_count"), explode(rbs).as("rb"))
      .join(grid, col("rb.r") === grid("r") && col("rb.b") === grid("b"))
      .groupBy(col("key"), col("true_count"))
      .agg(min(col("c")).as("cms_est"))
      .select(col("key"), col("true_count"), col("cms_est"),
        (col("cms_est") - col("true_count")).as("overcount"))
  }

  /** DuckDB half of [[cmsHeavy]] — the same salted-md5 grid, truth
    * top-k, and min-over-rows readback (hash rows unrolled so the two
    * sides share the exact preimage strings). */
  def cmsHeavyOracle(table: String, keyExpr: String, topK: Int = 10): String = {
    def bucket(r: Int, k: String) =
      s"('0x' || substr(md5('cms$r|' || $k::VARCHAR), 1, 8))::BIGINT % $CmsWidth"
    val gridArms = (0 until CmsDepth).map(r =>
      s"SELECT $r AS r, ${bucket(r, "key")} AS b, count(*) AS c FROM k GROUP BY 2")
      .mkString("\n      UNION ALL ")
    val probeArms = (0 until CmsDepth).map(r =>
      s"SELECT key, true_count, $r AS r, ${bucket(r, "key")} AS b FROM t")
      .mkString("\n      UNION ALL ")
    s"""WITH k AS (SELECT ($keyExpr) AS key FROM $table WHERE ($keyExpr) IS NOT NULL),
       |g AS ($gridArms),
       |t AS (SELECT key, count(*)::BIGINT AS true_count FROM k GROUP BY 1
       |      ORDER BY true_count DESC, key LIMIT $topK),
       |p AS ($probeArms)
       |SELECT p.key, p.true_count, min(g.c)::BIGINT AS cms_est,
       |  (min(g.c) - p.true_count)::BIGINT AS overcount
       |FROM p JOIN g ON g.r = p.r AND g.b = p.b
       |GROUP BY 1, 2""".stripMargin
  }
}

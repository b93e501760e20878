package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) layout keys — the multi-dimensional data-clustering
  * primitive behind scan pruning at scale: rows range-partitioned and
  * sorted by the interleaved key land in files whose per-column min/max
  * ranges are TIGHT in every dimension at once, so a predicate on either
  * dimension skips most files (the Delta/Iceberg OPTIMIZE ZORDER idea,
  * from Morton '66 / the UB-tree literature). A lexicographic sort key
  * (a, b) prunes only on `a`; the z-key prunes on both.
  *
  * The bit-interleave is the classic magic-number spread — five
  * shift-or-mask steps per dimension, a fixed expression dag of integer
  * ops: codegen-friendly, no UDF, and bit-identical on any engine (the
  * oracle replays the same chain). Inputs are required to fit 31 bits
  * (callers bucket or offset first — rank/day/bucket ids, not raw
  * payloads), which keeps the interleaved key inside a signed 64-bit
  * long: spread(31-bit) occupies even bit positions ≤ 60, the second
  * dimension shifts to odd positions ≤ 61.
  */
object Layout {

  private val Masks: Seq[(Int, Long)] = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8  -> 0x00FF00FF00FF00FFL,
    4  -> 0x0F0F0F0F0F0F0F0FL,
    2  -> 0x3333333333333333L,
    1  -> 0x5555555555555555L)

  /** Spread the low 31 bits of `x` onto even bit positions. */
  def spreadBits(x: Column): Column =
    Masks.foldLeft(x.cast("long").bitwiseAND(lit(0x7FFFFFFFL))) {
      case (acc, (sh, m)) => (acc.bitwiseOR(shiftleft(acc, sh))).bitwiseAND(lit(m))
    }

  /** Morton key of two ≤31-bit non-negative dimensions: bits of `a` on
    * even positions, bits of `b` on odd. */
  def zkey(a: Column, b: Column): Column =
    spreadBits(a).bitwiseOR(shiftleft(spreadBits(b), 1))

  /** The same spread as a SQL string over expression `e` — the oracle
    * half of the contract (DuckDB `&`/`|`/`<<` on BIGINT). */
  def spreadSql(e: String): String =
    Masks.foldLeft(s"(($e) & ${0x7FFFFFFFL})") {
      case (acc, (sh, m)) => s"((($acc) | (($acc) << $sh)) & $m)"
    }

  def zkeySql(a: String, b: String): String =
    s"(${spreadSql(a)} | (${spreadSql(b)} << 1))"

  /** Small-file compaction plan (the OPTIMIZE/auto-compaction step every
    * long-lived table needs: streaming ingest and partitioned writes
    * leave thousands of KB-sized files whose per-file open/footer cost
    * dominates scans). Input is a FILE INVENTORY — one row per file with
    * its group (table partition), a stable order key, and its size;
    * output assigns each group's files, in order, to target-sized output
    * bins: bin = floor(bytes-before-this-file / targetBytes), the
    * concat-and-chunk rule ([[graft.pipeline.Packing]]'s tape cut applied
    * to files), then reports one row per planned output file. Keeping
    * the in-group order key (e.g. a z-order/Hilbert range or min key)
    * preserves the clustering the layout paid for — compaction must not
    * shuffle rows back into randomness.
    *
    * Returned manifest: (group, bin, n_files, total_bytes, first/last
    * order key) — exactly what a rewrite job consumes. Scale shape: ONE
    * hash exchange on the group + a per-group window over file METADATA
    * (a 100 TB table is ~10⁶ file rows — this plan never touches data);
    * the group key bounds every window partition. Deterministic: a pure
    * function of (group, order, size). */
  def compactionPlan(files: org.apache.spark.sql.DataFrame, groupCol: String,
      orderCol: String, sizeCol: String, targetBytes: Long): org.apache.spark.sql.DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    import org.apache.spark.sql.expressions.Window
    def q(c: String): Column = col(s"`$c`")
    val w = Window.partitionBy(q(groupCol)).orderBy(q(orderCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("__before", coalesce(sum(q(sizeCol)).over(w), lit(0L)))
      .withColumn("bin", expr(s"__before div $targetBytes"))
      .groupBy(q(groupCol), col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(q(sizeCol)).as("total_bytes"),
        min(q(orderCol)).as("first_key"), max(q(orderCol)).as("last_key"))
  }

  /** Retention planning — the third leg of table maintenance (with
    * [[compactionPlan]] and the storage gc): given a file inventory with
    * each file's newest record timestamp, plan which files a TTL policy
    * retires (max_ts < cutoff ⟹ every record in the file is expired —
    * the file-level prune that makes deletion METADATA work; a file
    * straddling the cutoff is left for a rewriting compaction instead,
    * and is counted so the planner can see how much data hides in
    * straddlers). One row per group: files/bytes retired, kept, and
    * straddling. Pure metadata aggregation — never touches data. */
  def retentionPlan(files: org.apache.spark.sql.DataFrame, groupCol: String,
      maxTsCol: String, minTsCol: String, sizeCol: String,
      cutoff: Long): org.apache.spark.sql.DataFrame = {
    def q(c: String): Column = col(s"`$c`")
    val expired = q(maxTsCol) < cutoff
    val straddle = q(minTsCol) < cutoff && !expired
    files.groupBy(q(groupCol))
      .agg(
        sum(when(expired, 1L).otherwise(0L)).as("n_expired_files"),
        sum(when(expired, q(sizeCol)).otherwise(0L)).as("expired_bytes"),
        sum(when(straddle, 1L).otherwise(0L)).as("n_straddling_files"),
        sum(when(straddle, q(sizeCol)).otherwise(0L)).as("straddling_bytes"),
        sum(when(!expired && !straddle, 1L).otherwise(0L)).as("n_kept_files"),
        sum(when(!expired && !straddle, q(sizeCol)).otherwise(0L)).as("kept_bytes"))
  }

  /** Range-partition boundary planning — the sampling pass behind every
    * globally-sorted / range-clustered write (Spark's RangePartitioner,
    * Iceberg's sort-order writer): a salted-hash Bernoulli sample of the
    * sort key (the [[graft.pipeline.Sketches.sampledQuantile]] gate —
    * deterministic, scan-pushed) and ONE exact multi-quantile over the
    * sample yields the `numPartitions − 1` cut points a range shuffle
    * assigns ranges by. Boundary quality follows the order-statistic
    * bound; determinism needs integral keys and power-of-two
    * `numPartitions` (binary-fraction quantiles interpolate
    * IEEE-exactly — the agg_quartiles contract).
    *
    * Output: (cut, q, boundary), cut = 1..numPartitions−1. Scale shape:
    * the gate filters AT THE SCAN; one aggregate over the rate-shrunken
    * sample; the boundary table is metadata-sized and broadcasts into
    * the write's partitioner. */
  def rangeBounds(df: org.apache.spark.sql.DataFrame, idCol: Column, keyCol: Column,
      numPartitions: Int = 8, rate: Double = 0.05,
      salt: String = graft.pipeline.Sketches.QuantileSalt): org.apache.spark.sql.DataFrame = {
    require(numPartitions >= 2 && (numPartitions & (numPartitions - 1)) == 0,
      s"numPartitions must be a power of two >= 2 (binary-fraction quantiles), got $numPartitions")
    val bound = math.min((rate * 65536).toLong, 65535L)
    val gate = conv(substring(sha2(concat(idCol.cast("string"), lit("|" + salt)), 256), 1, 4), 16, 10)
      .cast("long")
    val qs = (1 until numPartitions).map(i => i.toDouble / numPartitions)
    df.where(gate < bound)
      .agg(percentile(keyCol, array(qs.map(lit): _*)).as("__bs"))
      .select(posexplode(col("__bs")).as(Seq("__p", "boundary")))
      .select((col("__p") + 1).as("cut"),
        round((col("__p") + 1).cast("double") / numPartitions, 4).as("q"),
        col("boundary"))
  }

  /** DuckDB half of [[rangeBounds]]: the same gated sample, one
    * quantile_cont per cut (shared (n−1)·q interpolation). */
  def rangeBoundsOracle(table: String, idExpr: String, keyExpr: String,
      numPartitions: Int = 8, rate: Double = 0.05,
      salt: String = graft.pipeline.Sketches.QuantileSalt): String = {
    val bound = math.min((rate * 65536).toLong, 65535L)
    val cuts = (1 until numPartitions).map { i =>
      val q = i.toDouble / numPartitions
      s"SELECT $i AS cut, round($i::DOUBLE / $numPartitions, 4) AS q, " +
        s"quantile_cont($keyExpr, $q) AS boundary FROM s"
    }.mkString("\nUNION ALL ")
    s"""WITH s AS (SELECT * FROM $table
       |  WHERE ('0x' || substr(sha256(($idExpr) || '|$salt'), 1, 4))::BIGINT < $bound)
       |$cuts"""
      .stripMargin
  }

  /** Hilbert index of two `order`-bit dimensions via the native
    * codegen'd walk ([[graft.functions.HilbertKey]] — the rotation
    * recurrence would be an exponential expression TREE, hence native).
    * Better range-pruning locality than [[zkey]]: consecutive Hilbert
    * indices are always Manhattan-adjacent cells, so key-range file
    * boundaries enclose tighter (min, max) boxes in both dimensions. */
  def hilbertKey(spark: org.apache.spark.sql.SparkSession, a: Column,
      b: Column, order: Int = 16): Column =
    graft.functions.HilbertKey.hilbert(spark, a.cast("long"), b.cast("long"), order)

  /** The oracle half: the same xy→d walk as a LINEAR chain of
    * per-level SELECT expressions (x, y, d threaded through `order`
    * nested subqueries — each level references the previous level's
    * columns exactly once, so the SQL stays linear where a naive
    * expression substitution would double per level). Emits a scalar
    * expression usable in a SELECT via DuckDB lateral-style nesting:
    * callers wrap with `FROM (...)` chains instead; here we emit the
    * full chained-subquery SELECT given base column expressions. */
  def hilbertLevelsSql(tableName: String, xExpr: String, yExpr: String,
      order: Int, carryCols: Seq[String]): String = {
    require(carryCols.nonEmpty,
      "carryCols must be non-empty (an empty list would emit 'SELECT , ...')")
    val carry = carryCols.mkString(", ")
    val base = s"SELECT $carry, ($xExpr)::BIGINT AS hx, ($yExpr)::BIGINT AS hy, 0::BIGINT AS hd"
    (0 until order).foldLeft(s"($base FROM $tableName)") { (inner, l) =>
      val s = 1L << (order - 1 - l)
      val rx = s"(CASE WHEN (hx & $s) > 0 THEN 1 ELSE 0 END)"
      val ry = s"(CASE WHEN (hy & $s) > 0 THEN 1 ELSE 0 END)"
      s"""(SELECT $carry,
         |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $s - 1 - hy ELSE hy END) ELSE hx END AS hx,
         |  CASE WHEN $ry = 0 THEN (CASE WHEN $rx = 1 THEN $s - 1 - hx ELSE hx END) ELSE hy END AS hy,
         |  hd + $s * $s * xor(3 * $rx, $ry) AS hd
         | FROM $inner t$l)""".stripMargin
    }
  }

  /** Clustering-depth census — the metric an OPTIMIZE/recluster
    * decision reads: given each file's [min,max] interval on a query
    * key, the DEPTH at a point is how many files a reader must consult
    * there. Computed by the classic boundary sweep (+1 at each min, −1
    * at each max, running sum ordered by key with opens before closes
    * at ties, so touching intervals count as overlapping): per group,
    * `max_depth` (worst point lookup) and `avg_depth` (mean depth at
    * file-open boundaries — the expected consult count for a key
    * landing in a fresh file). A perfectly clustered layout reads 1;
    * depth ≈ n_files means the key is unclustered and every range scan
    * touches everything.
    *
    * Determinism at ties: rows tied on (key, delta) receive
    * order-dependent running sums individually, but every emitted
    * figure (sum/max over the opens of a tie group) is
    * permutation-invariant, so both engines agree.
    *
    * Scale shape: pure METADATA — two projections of the file
    * inventory, one per-group window over 2·n_files rows, one
    * aggregation. The table's data is never read. */
  def clusterDepth(files: org.apache.spark.sql.DataFrame, groupCol: String,
      minCol: String, maxCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    def q(c: String): Column = col(s"`$c`")
    val opens = files.select(q(groupCol).as("__g"), q(minCol).as("__k"), lit(1L).as("__d"))
    val closes = files.select(q(groupCol).as("__g"), q(maxCol).as("__k"), lit(-1L).as("__d"))
    val w = Window.partitionBy(col("__g")).orderBy(col("__k"), col("__d").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    opens.unionAll(closes)
      .withColumn("__depth", sum(col("__d")).over(w))
      .filter(col("__d") === 1L)
      .groupBy(col("__g"))
      .agg(count(lit(1)).as("n_files"), max(col("__depth")).as("max_depth"),
        round(sum(col("__depth")).cast("double") / count(lit(1)), 4).as("avg_depth"))
      .withColumnRenamed("__g", groupCol)
  }
}

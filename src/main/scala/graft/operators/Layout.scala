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
}

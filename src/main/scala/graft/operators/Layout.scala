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
}

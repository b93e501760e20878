package graft.drl

import graft.types.Value

/** DRL query AST — the ten node shapes of the reference's query language
  * (reference lib/drl/ast.ml:16-28). `direction = Asc | Desc` is declared
  * there but no Sort node exists; we mirror the live surface only.
  */
sealed trait Query
object Query {
  /** Scan a base relation by name (resolved against a Catalog). */
  final case class Base(name: String) extends Query
  /** Single-tuple literal relation from (attr, literal) pairs. */
  final case class Const(attrs: List[(String, Value)]) extends Query
  /** Semijoin-style selection: source rows that agree with `filter` on
    * their common attributes, projected back to source attributes
    * (reference lib/drl/executor.ml:35-49). */
  final case class Select(filter: Query, source: Query) extends Query
  /** Equijoin on the named attributes; left value wins on collisions. */
  final case class Join(attrs: List[String], left: Query, right: Query) extends Query
  final case class Cartesian(left: Query, right: Query) extends Query
  final case class Project(attrs: List[String], source: Query) extends Query
  /** Rename by (old, new) pairs. */
  final case class Rename(pairs: List[(String, String)], source: Query) extends Query
  /** Bag union, left schema. */
  final case class Union(left: Query, right: Query) extends Query
  /** Left tuples not attribute-equal to any right tuple; left duplicates
    * preserved. */
  final case class Diff(left: Query, right: Query) extends Query
  /** First n tuples. */
  final case class Take(n: Int, source: Query) extends Query

  // ---- extension nodes (SURVEY.md §7.2 step 7): the surface the
  // reference DECLARES but never constructs — `direction = Asc | Desc`
  // (lib/drl/ast.ml:14) and Lineage.Sort/Aggregate/ThetaJoin
  // (lib/relation.ml:25-28) — realized as live DRL nodes. ----

  sealed trait Direction
  case object Asc extends Direction
  case object Desc extends Direction

  /** Total order by the listed (attribute, direction) keys. Order is
    * observable through Take (top-k) and the cursor protocol. */
  final case class Sort(keys: List[(String, Direction)], source: Query) extends Query

  /** Aggregate function surface: count(*) plus per-attribute sum/min/
    * max/avg (the "aggregates-for-integrity" intent named in the
    * reference's docs/karuta-integration.org:19-21). */
  sealed trait AggFn
  object AggFn {
    case object CountAll extends AggFn
    final case class Sum(attr: String) extends AggFn
    final case class Min(attr: String) extends AggFn
    final case class Max(attr: String) extends AggFn
    final case class Avg(attr: String) extends AggFn
  }
  /** Group by the listed attributes (empty = global aggregate) and
    * compute the named aggregates. */
  final case class Aggregate(groupBy: List[String], aggs: List[(AggFn, String)],
      source: Query) extends Query

  /** Window function surface: per-partition analytics over a total
    * order — the third reused query shape (top-k-per-group numbering,
    * running totals, previous-row deltas) promoted to a named node. */
  sealed trait WinFn
  object WinFn {
    case object RowNumber extends WinFn
    /** Cumulative sum of `attr` over rows unbounded-preceding..current. */
    final case class RunningSum(attr: String) extends WinFn
    /** Previous row's `attr` within the partition (null at the head). */
    final case class Lag(attr: String) extends WinFn
  }
  /** Append column `as` = `fn` over the window (partitionBy, orderBy).
    * `partitionBy` must be non-empty: an unpartitioned window is a
    * single-task global sort — at engine scale that is GlobalRank's
    * two-phase job, not a window node (enforced at compile). */
  final case class Window(partitionBy: List[String],
      orderBy: List[(String, Direction)], fn: WinFn, as: String,
      source: Query) extends Query

  /** Comparison operators for theta-join predicates — the six
    * comparison relations of the prelude (§1.5), applied as join
    * conditions instead of membership filters. */
  sealed trait CmpOp
  object CmpOp {
    case object Lt extends CmpOp; case object Lte extends CmpOp
    case object Gt extends CmpOp; case object Gte extends CmpOp
    case object Eq extends CmpOp; case object Neq extends CmpOp
  }
  /** Inner join under a conjunction of comparisons between left and
    * right attributes; right-side name collisions resolve left-wins as
    * in equijoin. */
  final case class ThetaJoin(preds: List[(CmpOp, String, String)],
      left: Query, right: Query) extends Query
}

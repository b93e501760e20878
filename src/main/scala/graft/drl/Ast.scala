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
}

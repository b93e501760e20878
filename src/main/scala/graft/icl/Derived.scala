package graft.icl

import org.apache.spark.sql.DataFrame
import graft.core.Algebra
import graft.engine.StoredRelation

/** A derived (ephemeral) relation carrying its named constraints beside
  * the lazy DataFrame plan — the reference's constraint-propagation rules
  * per algebra operator (reference lib/algebra.ml:112-124,158-166,
  * 237-241,261,303,321; docs/constraints.org:291-323):
  *
  * | operator | constraints on the result                                  |
  * |----------|------------------------------------------------------------|
  * | select   | preserved (σ can only shrink the extension)                |
  * | project  | each constraint kept iff its vars survive ([[Analysis.filterByAttrs]]) |
  * | rename   | preserved with Var references renamed ([[Analysis.renameVars]]) |
  * | join     | AND-merged from both sides ([[Analysis.mergeNamed]])       |
  * | union    | dropped (conservative: either side alone may violate)      |
  * | diff     | left side's kept (result ⊆ left)                           |
  * | take     | preserved                                                  |
  *
  * This is metadata — exactly as in the reference, where ephemeral
  * relations are never insert targets, so their constraints annotate
  * provenance rather than gate mutations. A Derived written back into a
  * stored relation (Assign/InsertFrom) is validated by the TARGET's own
  * constraints; these travel so the engine can see what the result is
  * already guaranteed to satisfy.
  */
final case class Derived(df: DataFrame, constraints: Seq[(String, Body)]) {

  /** σ by semijoin-with-filter-relation (DRL Select semantics). */
  def select(filter: DataFrame): Derived =
    Derived(Algebra.select(filter, df), constraints)

  /** π — constraints whose variables are all retained survive; the rest
    * are dropped (reference project → Constraint.filter_by_attrs). */
  def project(attrs: List[String]): Derived =
    Derived(Algebra.project(attrs)(df),
      constraints.flatMap { case (n, b) => Analysis.filterByAttrs(attrs, b).map(n -> _) })

  /** ρ — Var references follow the attribute renames. */
  def rename(pairs: Seq[(String, String)]): Derived =
    Derived(Algebra.rename(pairs)(df),
      constraints.map { case (n, b) => n -> Analysis.renameVars(pairs.toMap, b) })

  /** ⋈ — both sides' constraints hold of every joined row: AND-merge. */
  def join(attrs: Seq[String], right: Derived): Derived =
    Derived(Algebra.equijoin(attrs, df, right.df),
      Analysis.mergeNamed(constraints, right.constraints))

  /** ∪ — conservative drop (a union row satisfies only its own side). */
  def union(right: Derived): Derived =
    Derived(Algebra.union(df, right.df), Nil)

  /** − — the result is a subset of the left side. */
  def diff(right: Derived): Derived =
    Derived(Algebra.diff(df, right.df), constraints)

  /** τ — a prefix of the extension. */
  def take(n: Int): Derived = Derived(Algebra.take(n)(df), constraints)
}

object Derived {
  /** A stored relation's extension with its registered constraints. */
  def ofStored(rel: StoredRelation): Derived = Derived(rel.df, rel.constraints.toSeq)
}

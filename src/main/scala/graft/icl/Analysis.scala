package graft.icl

import graft.types.Value

/** Static constraint analyses powering incremental re-checking
  * (reference lib/constraint.ml:279-546,
  * docs/incremental_constraint_checking.org). */
object Analysis {

  // ---- polarity (reference polarity_of, lib/constraint.ml:298-326) ----

  sealed trait Polarity
  case object Positive extends Polarity // DELETE from the relation can violate
  case object Negative extends Polarity // INSERT into the relation can violate
  case object Both extends Polarity

  def mergePolarity(a: Polarity, b: Polarity): Polarity = (a, b) match {
    case (Positive, Positive) => Positive
    case (Negative, Negative) => Negative
    case _                    => Both
  }

  def flip(p: Polarity): Polarity = p match {
    case Positive => Negative
    case Negative => Positive
    case Both     => Both
  }

  /** Per referenced relation: the position polarity within the constraint.
    * `Not` flips; `Forall` quantifiers are Negative; `Exists` quantifiers
    * and `MemberOf` targets are Positive. */
  def polarityOf(c: Body, neg: Boolean = false): Map[String, Polarity] = {
    def add(acc: Map[String, Polarity], name: String, p: Polarity) =
      acc.updated(name, acc.get(name).map(mergePolarity(_, p)).getOrElse(p))
    def withNeg(isNeg: Boolean, p: Polarity) = if (isNeg) flip(p) else p
    def loop(acc: Map[String, Polarity], isNeg: Boolean, node: Body): Map[String, Polarity] =
      node match {
        case Body.MemberOf(target, _) => add(acc, target, withNeg(isNeg, Positive))
        case Body.Not(body, _)        => loop(acc, !isNeg, body)
        case Body.And(cs)             => cs.foldLeft(acc)(loop(_, isNeg, _))
        case Body.Or(cs)              => cs.foldLeft(acc)(loop(_, isNeg, _))
        case Body.Exists(_, q, body)  => loop(add(acc, q, withNeg(isNeg, Positive)), isNeg, body)
        case Body.Forall(_, q, body)  => loop(add(acc, q, withNeg(isNeg, Negative)), isNeg, body)
      }
    loop(Map.empty, neg, c)
  }

  /** Does a mutation of the given kind trigger a recheck for this polarity?
    * (reference polarity_triggered_by, lib/manipulation.ml:430-434). */
  def triggeredBy(kind: String, p: Polarity): Boolean = (kind, p) match {
    case ("insert", Negative | Both) => true
    case ("delete", Positive | Both) => true
    case _                           => false
  }

  // ---- focused filter (reference focused_filter, lib/constraint.ml:355-383) ----

  /** For a mutated `depRel` tuple, the (source-attr, value) pairs that
    * narrow which constrained-relation tuples could be affected: only
    * tuples agreeing with the transition tuple on these attributes need
    * re-checking. Empty means no narrowing. */
  def focusedFilter(c: Body, depRel: String, transition: Seq[(String, Value)]): List[(String, Value)] = {
    val tmap = transition.toMap
    def loop(acc: List[(String, Value)], node: Body): List[(String, Value)] = node match {
      case Body.MemberOf(target, binding) if target == depRel =>
        binding.foldLeft(acc) {
          case (a, (_, Binding.Var(src))) => tmap.get(src).map(v => (src, v) :: a).getOrElse(a)
          case (a, _)                     => a
        }
      case Body.MemberOf(_, _)    => acc
      case Body.Not(body, _)      => loop(acc, body)
      case Body.Exists(_, _, b)   => loop(acc, b)
      case Body.Forall(_, _, b)   => loop(acc, b)
      case Body.And(cs)           => cs.foldLeft(acc)(loop)
      case Body.Or(cs)            => cs.foldLeft(acc)(loop)
    }
    loop(Nil, c)
  }

  // ---- trigger constants (reference trigger_constants, lib/constraint.ml:390-412) ----

  /** Const binding values targeting `depRel`: fixed-value preconditions —
    * if the mutated tuple doesn't carry them, the constraint cannot be
    * violated by the mutation. */
  def triggerConstants(c: Body, depRel: String): List[(String, Value)] = {
    def loop(acc: List[(String, Value)], node: Body): List[(String, Value)] = node match {
      case Body.MemberOf(target, binding) if target == depRel =>
        binding.foldLeft(acc) {
          case (a, (tgt, Binding.Const(v))) => (tgt, v) :: a
          case (a, _)                       => a
        }
      case Body.MemberOf(_, _)  => acc
      case Body.Not(body, _)    => loop(acc, body)
      case Body.Exists(_, _, b) => loop(acc, b)
      case Body.Forall(_, _, b) => loop(acc, b)
      case Body.And(cs)         => cs.foldLeft(acc)(loop)
      case Body.Or(cs)          => cs.foldLeft(acc)(loop)
    }
    loop(Nil, c)
  }

  // ---- universal variable substitution (reference substitute_transition,
  // lib/constraint.ml:428-546) ----

  /** Rewrite quantifiers over the mutated `depRel`: inside their bodies,
    * `Var "variable.attr"` becomes `Const transitionValue`. Once inside a
    * substituting quantifier, nested quantifiers over `depRel` do NOT
    * restart substitution (the outer binding wins, as in the reference's
    * SubstituteApply mode). Base-tuple Vars (un-namespaced) are never
    * substituted. */
  def substituteTransition(c: Body, depRel: String, transition: Seq[(String, Value)]): Body = {
    def apply(subs: Map[String, Value], binding: List[(String, Binding)]): List[(String, Binding)] =
      binding.map {
        case (t, Binding.Var(v)) if subs.contains(v) => (t, Binding.Const(subs(v)))
        case p => p
      }
    def namespaced(variable: String): Map[String, Value] =
      transition.map { case (a, v) => s"$variable.$a" -> v }.toMap
    def go(node: Body, subs: Option[Map[String, Value]]): Body = node match {
      case Body.MemberOf(t, binding) =>
        subs.fold(node: Body)(m => Body.MemberOf(t, apply(m, binding)))
      case Body.Not(body, u)  => Body.Not(go(body, subs), u)
      case Body.And(cs)       => Body.And(cs.map(go(_, subs)))
      case Body.Or(cs)        => Body.Or(cs.map(go(_, subs)))
      case Body.Exists(v, q, body) =>
        val mode = subs.orElse(if (q == depRel) Some(namespaced(v)) else None)
        Body.Exists(v, q, go(body, mode))
      case Body.Forall(v, q, body) =>
        val mode = subs.orElse(if (q == depRel) Some(namespaced(v)) else None)
        Body.Forall(v, q, go(body, mode))
    }
    go(c, None)
  }

  // ---- attribute projection (reference filter_by_attrs,
  // lib/constraint.ml:97-121) ----

  /** Keep only the parts of a constraint whose variables all survive a
    * projection to `attrs`; Or requires every branch to survive. */
  def filterByAttrs(attrs: List[String], c: Body): Option[Body] = c match {
    case m @ Body.MemberOf(_, _) =>
      if (Body.varsIn(m).forall(attrs.contains)) Some(m) else None
    case Body.Not(body, u) => filterByAttrs(attrs, body).map(Body.Not(_, u))
    case Body.And(cs) =>
      val kept = cs.flatMap(filterByAttrs(attrs, _))
      if (kept.isEmpty) None else Some(Body.And(kept))
    case Body.Or(cs) =>
      val kept = cs.flatMap(filterByAttrs(attrs, _))
      if (kept.length == cs.length) Some(Body.Or(kept)) else None
    case Body.Exists(v, q, body) =>
      filterByAttrs(v :: attrs, body).map(Body.Exists(v, q, _))
    case Body.Forall(v, q, body) =>
      filterByAttrs(v :: attrs, body).map(Body.Forall(v, q, _))
  }

  /** Rename base-tuple Var references per (old → new) pairs (reference
    * rename_vars, lib/constraint.ml:69-93): only un-namespaced Vars are
    * touched — quantifier-bound `v.attr` names are scoped to their
    * quantifier row, not the renamed relation's attributes. */
  def renameVars(pairs: Map[String, String], c: Body): Body = c match {
    case Body.MemberOf(t, binding) => Body.MemberOf(t, binding.map {
      case (tgt, Binding.Var(src)) if !src.contains('.') && pairs.contains(src) =>
        (tgt, Binding.Var(pairs(src)))
      case p => p
    })
    case Body.Not(b, u)          => Body.Not(renameVars(pairs, b), u)
    case Body.And(cs)            => Body.And(cs.map(renameVars(pairs, _)))
    case Body.Or(cs)             => Body.Or(cs.map(renameVars(pairs, _)))
    case Body.Exists(v, q, b)    => Body.Exists(v, q, renameVars(pairs, b))
    case Body.Forall(v, q, b)    => Body.Forall(v, q, renameVars(pairs, b))
  }

  /** AND-merge named constraint lists on name collision (reference merge,
    * lib/constraint.ml:121-135). */
  def mergeNamed(cs1: Seq[(String, Body)], cs2: Seq[(String, Body)]): Seq[(String, Body)] = {
    val grouped = (cs1 ++ cs2).groupBy(_._1)
    (cs1 ++ cs2).map(_._1).distinct.map { name =>
      grouped(name).map(_._2).toList match {
        case List(one) => name -> one
        case many      => name -> Body.And(many)
      }
    }
  }
}

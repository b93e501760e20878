package graft.icl

import graft.types.Value

/** ICL constraint bodies (reference lib/icl/ast.ml:8-23, runtime type
  * lib/constraint.ml:26-32). A constraint is first-order logic over
  * relation membership: negation carries an explicit closed-world
  * `universe` annotation; quantifiers range over finite relations and
  * namespace their rows under `variable.` prefixes.
  */
sealed trait Binding
object Binding {
  /** Value of the named attribute of the tuple under test (or, with a
    * "v.attr" name, of a quantifier row). */
  final case class Var(attr: String) extends Binding
  final case class Const(v: Value) extends Binding
}

sealed trait Body
object Body {
  /** The resolved binding pairs must match some tuple of `target`. */
  final case class MemberOf(target: String, binding: List[(String, Binding)]) extends Body
  /** Closed-world negation; `universe` is a declarative annotation only
    * (reference lib/constraint.ml:173-181). */
  final case class Not(body: Body, universe: String) extends Body
  final case class And(cs: List[Body]) extends Body
  final case class Or(cs: List[Body]) extends Body
  final case class Exists(variable: String, quantifier: String, body: Body) extends Body
  final case class Forall(variable: String, quantifier: String, body: Body) extends Body

  /** All Var attribute names referenced anywhere in the body
    * (reference vars_in, lib/constraint.ml:42-66). */
  def varsIn(b: Body): Set[String] = b match {
    case MemberOf(_, binding) => binding.collect { case (_, Binding.Var(v)) => v }.toSet
    case Not(body, _)         => varsIn(body)
    case And(cs)              => cs.flatMap(varsIn).toSet
    case Or(cs)               => cs.flatMap(varsIn).toSet
    case Exists(_, _, body)   => varsIn(body)
    case Forall(_, _, body)   => varsIn(body)
  }

  /** Relations referenced by the body (targets, universes, quantifiers). */
  def relationsIn(b: Body): Set[String] = b match {
    case MemberOf(t, _)     => Set(t)
    case Not(body, u)       => relationsIn(body) + u
    case And(cs)            => cs.flatMap(relationsIn).toSet
    case Or(cs)             => cs.flatMap(relationsIn).toSet
    case Exists(_, q, body) => relationsIn(body) + q
    case Forall(_, q, body) => relationsIn(body) + q
  }
}

/** Constraint evaluation timing (reference lib/manipulation.ml:965-1027):
  * Immediate constraints run inside every mutation; Deferred ones are
  * recorded on the database and only evaluated at commit. */
sealed trait Timing
object Timing {
  case object Immediate extends Timing
  case object Deferred extends Timing
}

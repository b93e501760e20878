package graft.icl

import graft.types.Value

/** Per-tuple constraint evaluation (reference lib/constraint.ml:151-266).
  *
  * A tuple under test is an attribute→value map; quantifier rows are merged
  * in under `variable.attr` namespaced keys (reference extend_tuple,
  * lib/constraint.ml:230-251) so they can never shadow base attributes.
  */
object Eval {
  type Tuple = Map[String, Value]

  /** Evaluation context closed over a database snapshot (reference
    * build_eval_context, lib/manipulation.ml:92-148).
    *
    * `checkMembership(rel, bound)` — does some tuple of `rel` agree with
    * the bound (possibly partial) attribute values? The reference's
    * in-code check degenerates to schema conformance for stored relations
    * (lib/manipulation.ml:28-36 Materialized branch never consults the
    * tree), but its documented cost model is a presence scan
    * (docs/icl-quantification.org:85-91) and the FK tests require presence
    * semantics — we implement the documented scan.
    *
    * `iterateFinite(rel)` — all rows of a finite relation, or None for
    * infinite ones (UnboundedQuantifier). */
  final case class Ctx(
      checkMembership: (String, Seq[(String, Value)]) => Boolean,
      iterateFinite: String => Option[Seq[Seq[(String, Value)]]])

  sealed trait Diag {
    def render: String = this match {
      case MembershipFailed(t)        => s"membership failed in $t"
      case UnboundedQuantifier(v, q)  => s"unbounded quantifier $q for $v"
      case Failures(fs) => fs.map { case (n, _) => s"constraint $n violated" }.mkString("; ")
    }
  }
  final case class MembershipFailed(target: String) extends Diag
  final case class UnboundedQuantifier(variable: String, quantifier: String) extends Diag
  final case class Failures(fs: List[(String, Diag)]) extends Diag

  /** Resolve a binding against the tuple; unresolvable Vars are silently
    * dropped (reference bind, lib/constraint.ml:151-164). */
  def bind(binding: List[(String, Binding)], tuple: Tuple): List[(String, Value)] =
    binding.flatMap {
      case (target, Binding.Const(v)) => Some(target -> v)
      case (target, Binding.Var(src)) => tuple.get(src).map(target -> _)
    }

  def evaluate(ctx: Ctx, tuple: Tuple, c: Body): Either[Diag, Boolean] = c match {
    case Body.MemberOf(target, binding) =>
      if (ctx.checkMembership(target, bind(binding, tuple))) Right(true)
      else Left(MembershipFailed(target))

    case Body.Not(body, _) =>
      // universe is declarative only (reference lib/constraint.ml:173-181)
      evaluate(ctx, tuple, body) match {
        case Right(b)                  => Right(!b)
        case Left(MembershipFailed(_)) => Right(true)
        case Left(d)                   => Left(d)
      }

    case Body.And(cs) =>
      cs.foldLeft(Right(true): Either[Diag, Boolean]) {
        case (Right(true), c2) => evaluate(ctx, tuple, c2)
        case (stop, _)         => stop
      }

    case Body.Or(cs) => // swallows errors (reference lib/constraint.ml:224-228)
      if (cs.exists(c2 => evaluate(ctx, tuple, c2) == Right(true))) Right(true)
      else Right(false)

    case Body.Exists(variable, quantifier, body) =>
      ctx.iterateFinite(quantifier) match {
        case None => Left(UnboundedQuantifier(variable, quantifier))
        case Some(rows) =>
          Right(rows.exists(row => evaluate(ctx, extend(tuple, variable, row), body) == Right(true)))
      }

    case Body.Forall(variable, quantifier, body) =>
      ctx.iterateFinite(quantifier) match {
        case None => Left(UnboundedQuantifier(variable, quantifier))
        case Some(rows) =>
          rows.foldLeft(Right(true): Either[Diag, Boolean]) {
            case (Right(true), row) =>
              evaluate(ctx, extend(tuple, variable, row), body) match {
                case Right(b)                  => Right(b)
                case Left(MembershipFailed(_)) => Right(false)
                case Left(d)                   => Left(d)
              }
            case (stop, _) => stop
          }
      }
  }

  /** Namespace a quantifier row's attributes under `variable.` and merge
    * (reference extend_tuple, lib/constraint.ml:230-251). */
  def extend(tuple: Tuple, variable: String, row: Seq[(String, Value)]): Tuple =
    tuple ++ row.map { case (a, v) => s"$variable.$a" -> v }

  /** Collect ALL failing constraints (reference evaluate_named,
    * lib/constraint.ml:254-266). */
  def evaluateNamed(ctx: Ctx, tuple: Tuple, named: Seq[(String, Body)]): Either[Diag, Unit] = {
    val failures = named.toList.flatMap { case (name, c) =>
      evaluate(ctx, tuple, c) match {
        case Right(true)  => None
        case Right(false) => Some(name -> MembershipFailed(name))
        case Left(d)      => Some(name -> d)
      }
    }
    if (failures.isEmpty) Right(()) else Left(Failures(failures))
  }

  /** Halt at the first non-passing constraint (reference
    * evaluate_first_failure, lib/constraint.ml:270-277). */
  def firstFailure(ctx: Ctx, tuple: Tuple, named: Seq[(String, Body)]): Either[Diag, Unit] =
    named.foldLeft(Right(()): Either[Diag, Unit]) {
      case (Right(()), (name, c)) =>
        evaluate(ctx, tuple, c) match {
          case Right(true)  => Right(())
          case Right(false) => Left(Failures(List(name -> MembershipFailed(name))))
          case Left(d)      => Left(Failures(List(name -> d)))
        }
      case (stop, _) => stop
    }
}

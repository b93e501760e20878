package graft.drl

import graft.sexp.Sexp
import graft.sexp.Sexp.{Atom, SList}
import graft.types.Value

/** Sexp → DRL AST, covering the surface the reference derives with ppx
  * (reference lib/drl/parser.ml:3-7 over lib/drl/ast.ml:16-28).
  *
  * Accepted forms:
  * {{{
  * (Base name)                    (Const ((age (Int 18)) (name (Str "x"))))
  * (Select <filter> <source>)     (Join (a b) <q1> <q2>)
  * (Cartesian <q1> <q2>)          (Project (a b) <q>)
  * (Rename ((old new) ...) <q>)   (Union <q1> <q2>)
  * (Diff <q1> <q2>)               (Take 5 <q>)
  * }}}
  * An optional leading `drl` tag — the listener's dispatch tag
  * (reference lib/listener.ml:17-28) — is accepted and stripped.
  */
object Parser {
  import Query._

  def parse(input: String): Either[String, Query] =
    Sexp.parse(input).flatMap(ofSexp)

  def ofSexp(s: Sexp): Either[String, Query] = s match {
    case SList(Atom("drl") :: q :: Nil) => ofSexp(q)

    case SList(List(Atom("Base"), Atom(name))) => Right(Base(name))

    case SList(List(Atom("Const"), SList(pairs))) =>
      traverse(pairs) {
        case SList(List(Atom(attr), lit)) => Value.fromSexp(lit).map(attr -> _)
        case other => Left(s"bad Const binding: ${other.render}")
      }.map(Const(_))

    case SList(List(Atom("Select"), f, src)) =>
      for { fq <- ofSexp(f); sq <- ofSexp(src) } yield Select(fq, sq)

    case SList(List(Atom("Join"), SList(attrs), l, r)) =>
      for {
        as <- traverse(attrs) { case Atom(a) => Right(a); case o => Left(s"bad Join attr: ${o.render}") }
        lq <- ofSexp(l); rq <- ofSexp(r)
      } yield Join(as, lq, rq)

    case SList(List(Atom("Cartesian"), l, r)) =>
      for { lq <- ofSexp(l); rq <- ofSexp(r) } yield Cartesian(lq, rq)

    case SList(List(Atom("Project"), SList(attrs), src)) =>
      for {
        as <- traverse(attrs) { case Atom(a) => Right(a); case o => Left(s"bad Project attr: ${o.render}") }
        sq <- ofSexp(src)
      } yield Project(as, sq)

    case SList(List(Atom("Rename"), SList(pairs), src)) =>
      for {
        ps <- traverse(pairs) {
          case SList(List(Atom(o), Atom(n))) => Right(o -> n)
          case other => Left(s"bad Rename pair: ${other.render}")
        }
        sq <- ofSexp(src)
      } yield Rename(ps, sq)

    case SList(List(Atom("Union"), l, r)) =>
      for { lq <- ofSexp(l); rq <- ofSexp(r) } yield Union(lq, rq)

    case SList(List(Atom("Diff"), l, r)) =>
      for { lq <- ofSexp(l); rq <- ofSexp(r) } yield Diff(lq, rq)

    case SList(List(Atom("Take"), Atom(n), src)) =>
      for {
        k <- n.toIntOption.filter(_ >= 0).toRight(s"bad Take count: $n")
        sq <- ofSexp(src)
      } yield Take(k, sq)

    case other => Left(s"unrecognized DRL form: ${other.render}")
  }

  /** Render an AST back to its sexp form (round-trip surface). */
  def toSexp(q: Query): Sexp = q match {
    case Base(n)        => Sexp.list(Atom("Base"), Atom(n))
    case Const(attrs)   => Sexp.list(Atom("Const"), SList(attrs.map { case (a, v) =>
      Sexp.list(Atom(a), valueSexp(v)) }))
    case Select(f, s)   => Sexp.list(Atom("Select"), toSexp(f), toSexp(s))
    case Join(as, l, r) => Sexp.list(Atom("Join"), SList(as.map(Atom(_))), toSexp(l), toSexp(r))
    case Cartesian(l, r) => Sexp.list(Atom("Cartesian"), toSexp(l), toSexp(r))
    case Project(as, s) => Sexp.list(Atom("Project"), SList(as.map(Atom(_))), toSexp(s))
    case Rename(ps, s)  => Sexp.list(Atom("Rename"), SList(ps.map { case (o, n) =>
      Sexp.list(Atom(o), Atom(n)) }), toSexp(s))
    case Union(l, r)    => Sexp.list(Atom("Union"), toSexp(l), toSexp(r))
    case Diff(l, r)     => Sexp.list(Atom("Diff"), toSexp(l), toSexp(r))
    case Take(n, s)     => Sexp.list(Atom("Take"), Atom(n.toString), toSexp(s))
  }

  private def valueSexp(v: Value): Sexp = v match {
    case Value.IntV(i)   => Sexp.list(Atom("Int"), Atom(i.toString))
    case Value.FloatV(f) => Sexp.list(Atom("Float"), Atom(f.toString))
    case Value.StrV(s)   => Sexp.list(Atom("Str"), Atom(s))
    case Value.BoolV(b)  => Sexp.list(Atom("Bool"), Atom(b.toString))
  }

  private def traverse[A, B](xs: List[A])(f: A => Either[String, B]): Either[String, List[B]] =
    xs.foldRight(Right(Nil): Either[String, List[B]]) { (a, acc) =>
      for { b <- f(a); rest <- acc } yield b :: rest
    }
}

package graft.icl

import graft.sexp.Sexp
import graft.sexp.Sexp.{Atom, SList}
import graft.types.Value

/** Constraint-body sexp renderer — the exact inverse of [[Parser.parseBody]]
  * (roundtrip pinned by PersistSpec). Needed wherever constraint bodies
  * are serialized: the persistence manifests, and any client echoing a
  * registered constraint back over the wire. */
object Render {

  def value(v: Value): Sexp = v match {
    case Value.IntV(i)   => Sexp.list(Atom("Int"), Atom(i.toString))
    case Value.FloatV(f) => Sexp.list(Atom("Float"), Atom(f.toString))
    case Value.StrV(s)   => Sexp.list(Atom("Str"), Atom(s))
    case Value.BoolV(b)  => Sexp.list(Atom("Bool"), Atom(b.toString))
  }

  private def binding(b: Binding): Sexp = b match {
    case Binding.Var(a)   => Sexp.list(Atom("Var"), Atom(a))
    case Binding.Const(v) => Sexp.list(Atom("Const"), value(v))
  }

  def body(b: Body): Sexp = b match {
    case Body.MemberOf(target, bs) =>
      Sexp.list(Atom("MemberOf"),
        Sexp.list(Atom("target"), Atom(target)),
        Sexp.list(Atom("binding"),
          SList(bs.map { case (attr, bx) => Sexp.list(Atom(attr), binding(bx)) })))
    case Body.Not(inner, universe) =>
      Sexp.list(Atom("Not"),
        Sexp.list(Atom("body"), body(inner)),
        Sexp.list(Atom("universe"), Atom(universe)))
    case Body.And(cs) => Sexp.list(Atom("And"), SList(cs.map(body)))
    case Body.Or(cs)  => Sexp.list(Atom("Or"), SList(cs.map(body)))
    case Body.Exists(v, q, inner) =>
      Sexp.list(Atom("Exists"),
        Sexp.list(Atom("variable"), Atom(v)),
        Sexp.list(Atom("quantifier"), Atom(q)),
        Sexp.list(Atom("body"), body(inner)))
    case Body.Forall(v, q, inner) =>
      Sexp.list(Atom("Forall"),
        Sexp.list(Atom("variable"), Atom(v)),
        Sexp.list(Atom("quantifier"), Atom(q)),
        Sexp.list(Atom("body"), body(inner)))
  }
}

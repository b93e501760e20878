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

  /** Statement-head atoms this grammar owns (bare-statement dispatch —
    * the session routes a bare form to the grammar whose head table
    * contains it, so parse errors are reported by the owning grammar). */
  val heads: Set[String] = Set("Base", "Const", "Select", "Join", "Cartesian",
    "Project", "Rename", "Union", "Diff", "Take", "Sort", "Aggregate",
    "ThetaJoin", "Window")
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

    // (Sort ((attr Asc) (attr2 Desc)) <q>)
    case SList(List(Atom("Sort"), SList(keys), src)) =>
      for {
        ks <- traverse(keys) {
          case SList(List(Atom(a), Atom("Asc")))  => Right(a -> (Asc: Direction))
          case SList(List(Atom(a), Atom("Desc"))) => Right(a -> (Desc: Direction))
          case other => Left(s"bad Sort key: ${other.render}")
        }
        sq <- ofSexp(src)
      } yield Sort(ks, sq)

    // (Aggregate (group (a b)) (aggs ((sum x total) (count n))) <q>)
    case SList(List(Atom("Aggregate"), SList(List(Atom("group"), SList(groups))),
        SList(List(Atom("aggs"), SList(aggs))), src)) =>
      for {
        gs <- traverse(groups) { case Atom(a) => Right(a); case o => Left(s"bad group attr: ${o.render}") }
        as <- traverse(aggs) {
          case SList(List(Atom("count"), Atom(alias)))          => Right((AggFn.CountAll: AggFn) -> alias)
          case SList(List(Atom("sum"), Atom(a), Atom(alias)))   => Right((AggFn.Sum(a): AggFn) -> alias)
          case SList(List(Atom("min"), Atom(a), Atom(alias)))   => Right((AggFn.Min(a): AggFn) -> alias)
          case SList(List(Atom("max"), Atom(a), Atom(alias)))   => Right((AggFn.Max(a): AggFn) -> alias)
          case SList(List(Atom("avg"), Atom(a), Atom(alias)))   => Right((AggFn.Avg(a): AggFn) -> alias)
          case other => Left(s"bad aggregate: ${other.render}")
        }
        sq <- ofSexp(src)
      } yield Aggregate(gs, as, sq)

    // (ThetaJoin ((lt a b) (neq c d)) <l> <r>)
    case SList(List(Atom("ThetaJoin"), SList(preds), l, r)) =>
      for {
        ps <- traverse(preds) {
          case SList(List(Atom(op), Atom(a), Atom(b))) =>
            cmpOf(op).map(c => (c, a, b))
          case other => Left(s"bad ThetaJoin predicate: ${other.render}")
        }
        _ <- if (ps.isEmpty) Left("ThetaJoin needs at least one predicate") else Right(())
        lq <- ofSexp(l); rq <- ofSexp(r)
      } yield ThetaJoin(ps, lq, rq)

    // (Window (partition (a b)) (order ((x Asc))) (fn (row_number)) (as rn) <q>)
    case SList(List(Atom("Window"), SList(List(Atom("partition"), SList(parts))),
        SList(List(Atom("order"), SList(ord))),
        SList(List(Atom("fn"), fnS)), SList(List(Atom("as"), Atom(alias))), src)) =>
      for {
        ps <- traverse(parts) { case Atom(a) => Right(a); case o => Left(s"bad partition attr: ${o.render}") }
        os <- traverse(ord) {
          case SList(List(Atom(a), Atom("Asc")))  => Right(a -> (Asc: Direction))
          case SList(List(Atom(a), Atom("Desc"))) => Right(a -> (Desc: Direction))
          case other => Left(s"bad Window order key: ${other.render}")
        }
        fn <- fnS match {
          case SList(List(Atom("row_number")))          => Right(WinFn.RowNumber: WinFn)
          case SList(List(Atom("running_sum"), Atom(a))) => Right(WinFn.RunningSum(a): WinFn)
          case SList(List(Atom("lag"), Atom(a)))         => Right(WinFn.Lag(a): WinFn)
          case other => Left(s"bad Window fn: ${other.render}")
        }
        _ <- if (os.isEmpty) Left("Window needs at least one order key") else Right(())
        sq <- ofSexp(src)
      } yield Window(ps, os, fn, alias, sq)

    case other => Left(s"unrecognized DRL form: ${other.render}")
  }

  private def cmpOf(op: String): Either[String, CmpOp] = op match {
    case "lt" => Right(CmpOp.Lt); case "lte" => Right(CmpOp.Lte)
    case "gt" => Right(CmpOp.Gt); case "gte" => Right(CmpOp.Gte)
    case "eq" => Right(CmpOp.Eq); case "neq" => Right(CmpOp.Neq)
    case o => Left(s"bad comparison op: $o")
  }

  private def cmpName(op: CmpOp): String = op match {
    case CmpOp.Lt => "lt"; case CmpOp.Lte => "lte"; case CmpOp.Gt => "gt"
    case CmpOp.Gte => "gte"; case CmpOp.Eq => "eq"; case CmpOp.Neq => "neq"
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
    case Sort(ks, s)    => Sexp.list(Atom("Sort"), SList(ks.map { case (a, d) =>
      Sexp.list(Atom(a), Atom(d.toString)) }), toSexp(s))
    case Aggregate(gs, as, s) => Sexp.list(Atom("Aggregate"),
      Sexp.list(Atom("group"), SList(gs.map(Atom(_)))),
      Sexp.list(Atom("aggs"), SList(as.map {
        case (AggFn.CountAll, alias) => Sexp.list(Atom("count"), Atom(alias))
        case (AggFn.Sum(a), alias)   => Sexp.list(Atom("sum"), Atom(a), Atom(alias))
        case (AggFn.Min(a), alias)   => Sexp.list(Atom("min"), Atom(a), Atom(alias))
        case (AggFn.Max(a), alias)   => Sexp.list(Atom("max"), Atom(a), Atom(alias))
        case (AggFn.Avg(a), alias)   => Sexp.list(Atom("avg"), Atom(a), Atom(alias))
      })), toSexp(s))
    case ThetaJoin(ps, l, r) => Sexp.list(Atom("ThetaJoin"),
      SList(ps.map { case (op, a, b) => Sexp.list(Atom(cmpName(op)), Atom(a), Atom(b)) }),
      toSexp(l), toSexp(r))
    case Window(ps, os, fn, alias, s) => Sexp.list(Atom("Window"),
      Sexp.list(Atom("partition"), SList(ps.map(Atom(_)))),
      Sexp.list(Atom("order"), SList(os.map { case (a, d) =>
        Sexp.list(Atom(a), Atom(d.toString)) })),
      Sexp.list(Atom("fn"), fn match {
        case WinFn.RowNumber      => Sexp.list(Atom("row_number"))
        case WinFn.RunningSum(a)  => Sexp.list(Atom("running_sum"), Atom(a))
        case WinFn.Lag(a)         => Sexp.list(Atom("lag"), Atom(a))
      }),
      Sexp.list(Atom("as"), Atom(alias)), toSexp(s))
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

package graft.drl

import graft.catalog.Catalog
import graft.types.Cardinality

/** Finiteness gate — static pre-flight check run before every DRL
  * execution, porting the decision table of the reference's Coq-verified
  * `predicted_finite` (reference proof/Drl.v:49-67, extracted to
  * lib/drl_verified/drl_verified.ml:39-67, invoked by lib/drl/gate.ml:71-79
  * via lib/drl/sublanguage.ml:18-23).
  *
  * Decision table:
  *  - `Base r`:    finite iff the relation's cardinality is
  *                 Finite | ConstrainedFinite (gate.ml:49-55);
  *  - `Const`, `Take`: always finite;
  *  - `Join`, `Cartesian`, `Union`: finite iff BOTH sides are;
  *  - `Select`: finite iff the SOURCE is (the filter may be infinite —
  *    that is exactly how comparison relations are used);
  *  - `Diff`: finite iff the LEFT is;
  *  - `Project`, `Rename`: pass through.
  */
object Gate {
  import Query._

  /** The reference maps gate rejections to the DRL executor's ParseError
    * (lib/drl/sublanguage.ml:18-19), so the wire form is `(parse-error m)`. */
  val rejection: graft.Err = graft.Err.ParseError(
    "query produces potentially infinite result; use Take to bound it")

  def cardinality(cat: Catalog, q: Query): Either[graft.Err, Cardinality] = q match {
    case Base(name)       => cat.cardinality(name)
    case Const(_)         => Right(Cardinality.Finite(1))
    case Take(n, _)       => Right(Cardinality.Finite(n.toLong))
    case Select(_, src)   => cardinality(cat, src)
    case Diff(l, _)       => cardinality(cat, l)
    case Project(_, src)  => cardinality(cat, src)
    case Rename(_, src)   => cardinality(cat, src)
    case Join(_, l, r)    => both(cat, l, r)
    case Cartesian(l, r)  => both(cat, l, r)
    case Union(l, r)      => both(cat, l, r)
    // extension nodes: Sort permutes (pass-through); Aggregate cannot
    // grow its input (finite in → finite out); ThetaJoin is bounded by
    // the cross product, so both sides must be finite (same rule as
    // Join/Cartesian in the reference's table, proof/Drl.v:49-67).
    case Sort(_, src)          => cardinality(cat, src)
    case Aggregate(_, _, src)  => cardinality(cat, src)
    case ThetaJoin(_, l, r)    => both(cat, l, r)
    // Window appends a column to each input row — cardinality-preserving
    case Window(_, _, _, _, src) => cardinality(cat, src)
  }

  private def both(cat: Catalog, l: Query, r: Query): Either[graft.Err, Cardinality] =
    for { cl <- cardinality(cat, l); cr <- cardinality(cat, r) }
      yield if (cl.isFinite && cr.isFinite) Cardinality.ConstrainedFinite
            else Cardinality.AlephZero

  /** Admit the query or reject with the reference's error message
    * (lib/drl/gate.ml:76-78). */
  def admit(cat: Catalog, q: Query): Either[graft.Err, Unit] =
    cardinality(cat, q).flatMap(c => if (c.isFinite) Right(()) else Left(rejection))
}

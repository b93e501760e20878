package graft.icl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.engine.Database
import graft.types.Value
import graft.virtual.Virtual

/** Set-wise constraint compilation: a constraint [[Body]] becomes ONE
  * DataFrame query computing the candidate rows that VIOLATE it — the
  * join-predicate formulation SURVEY §2.5 prescribes for the reference's
  * per-tuple evaluator (lib/constraint.ml:169-212) and cascade
  * (lib/manipulation.ml:427-521):
  *
  *  - `MemberOf` over a stored relation → left-semi/anti join against the
  *    target (the FK case is a single anti-join on the key attributes);
  *  - `MemberOf` over a virtual relation (§1.5) → a Column predicate;
  *  - `And`/`Or`/`Not` → intersection/union/complement of per-row verdict
  *    sets, tracked by a deterministic content key;
  *  - `Exists`/`Forall` → the quantifier relation is joined in under
  *    `variable.attr` namespaced columns (the reference's extend_tuple,
  *    lib/constraint.ml:230-251) and the body verdict is grouped back to
  *    the parent row.
  *
  * Every path is a distributed plan — no per-row driver evaluation, which
  * is what lets a constrained bulk insert or cascade re-check survive a
  * 10^9-row relation. Semantics mirror [[Eval]] exactly, including the
  * quirks: unresolvable Vars are dropped from bindings, `Or` swallows
  * evaluation errors, `Exists` absorbs any non-true body outcome, empty
  * bindings / unknown targets / empty stored targets fail membership.
  *
  * [[violations]] returns None when the body needs the per-row evaluator
  * (an unbounded quantifier at a position whose error outcome is
  * data-dependent); [[compilable]] is the static mirror of that contract.
  */
object Compile {

  private val KeyCol = "__graft_k"
  private val Internal = "__graft_"

  /** Would [[violations]] return Some for this body? Static: quantifiers
    * must range over finite stored relations (except under `Exists`,
    * whose body errors are absorbed — see [[Eval.evaluate]]). */
  def compilable(db: Database, body: Body): Boolean = body match {
    case _: Body.MemberOf        => true
    case Body.Not(b, _)          => compilable(db, b)
    case Body.And(cs)            => cs.forall(compilable(db, _))
    case Body.Or(_)              => true // never-true branches are skipped
    case Body.Exists(_, q, _)    => finiteStored(db, q)
    case Body.Forall(_, q, b)    => finiteStored(db, q) && compilable(db, b)
  }

  /** Does the body quantify over `rel`? When true, cascade re-checking
    * needs the reference's per-transition universal-variable substitution
    * (Analysis.substituteTransition) — a batch recheck without it would
    * also surface pre-existing violations the reference leaves latent. */
  def quantifiesOver(body: Body, rel: String): Boolean = body match {
    case _: Body.MemberOf       => false
    case Body.Not(b, _)         => quantifiesOver(b, rel)
    case Body.And(cs)           => cs.exists(quantifiesOver(_, rel))
    case Body.Or(cs)            => cs.exists(quantifiesOver(_, rel))
    case Body.Exists(_, q, b)   => q == rel || quantifiesOver(b, rel)
    case Body.Forall(_, q, b)   => q == rel || quantifiesOver(b, rel)
  }

  private def finiteStored(db: Database, q: String): Boolean =
    !Virtual.isVirtual(q) && db.relations.contains(q)

  /** A (possibly negated) stored-relation membership — the shapes
    * storedQuant compiles to an equi count/anti-join with no frame
    * extension. The distribution rewrites only fire when every branch
    * has this shape (or, for ∃∨, is otherwise product-free). */
  private def storedShape(b: Body): Boolean = b match {
    case m: Body.MemberOf              => !Virtual.isVirtual(m.target)
    case Body.Not(m: Body.MemberOf, _) => !Virtual.isVirtual(m.target)
    case _                             => false
  }

  /** Does the body reference the quantifier variable's namespaced
    * attributes anywhere? Conservative: a same-named inner quantifier's
    * references count too (skipping the degenerate-quantifier shortcut
    * there is safe, just not fast). */
  private def usesVariable(b: Body, v: String): Boolean =
    Body.varsIn(b).exists(_.startsWith(s"$v."))

  /** The candidate rows that violate `body`, as one lazy DataFrame plan
    * (empty result = constraint satisfied), or None when the body is not
    * set-wise compilable. `candidates` rows must carry the constrained
    * relation's attributes and no nulls (the stored-relation invariant). */
  def violations(db: Database, body: Body, candidates: DataFrame): Option[DataFrame] = body match {
    // FK fast path: one anti-join, no keying machinery
    case m: Body.MemberOf => Some(memberNot(db, candidates, m))
    // mutual-exclusion fast path: violators are the rows where membership HOLDS
    case Body.Not(m: Body.MemberOf, _) => Some(memberIs(db, candidates, m))
    // a conjunction violator fails SOME conjunct: union of per-conjunct violations
    case Body.And(cs) =>
      cs.foldLeft(Option(candidates.limit(0))) { (acc, c) =>
        for { a <- acc; v <- violations(db, c, candidates) } yield a.unionAll(v)
      }
    // a quantifier the body never references degenerates to an
    // emptiness gate (zero-job: the root count) around the body itself —
    // the reference's FK-via-Exists idiom compiles to the body's anti-join
    case Body.Exists(v, q, b) if !usesVariable(b, v) && finiteStored(db, q) =>
      if (db.relations(q).root.count == 0) Some(candidates) // ∃ over ∅: every row violates
      else violations(db, b, candidates)
        .orElse(Some(candidates)) // incompilable body is never-true → all violate
    case Body.Forall(v, q, b) if !usesVariable(b, v) && finiteStored(db, q) =>
      if (db.relations(q).root.count == 0) Some(candidates.limit(0)) // vacuous
      else violations(db, b, candidates)
    // single-join fast paths for predicate-bodied quantifiers
    case Body.Exists(v, q, b) =>
      quantJoin(db, candidates, v, q, b, isForall = false, wantViolations = true)
        .orElse(storedQuant(db, candidates, v, q, b, isForall = false, wantViolations = true))
        .orElse(generic(db, body, candidates))
    case Body.Forall(v, q, b) =>
      quantJoin(db, candidates, v, q, b, isForall = true, wantViolations = true)
        .orElse(storedQuant(db, candidates, v, q, b, isForall = true, wantViolations = true))
        .orElse(generic(db, body, candidates))
    case other => generic(db, other, candidates)
  }

  private def generic(db: Database, body: Body, candidates: DataFrame): Option[DataFrame] = {
    val base = candidates.withColumn(KeyCol, keyOver(candidates.schema))
    holds(db, body, base, 0).map { h =>
      base.join(h.select(col(KeyCol)).distinct(), Seq(KeyCol), "left_anti").drop(KeyCol)
    }
  }

  /** Deterministic per-row content key over the frame's data columns
    * (internal columns excluded). Stored relations are sets, so the key is
    * unique within a base frame; extended frames compose it with the
    * quantifier row's key. Length-prefixed encoding — no separator
    * collisions; frames carry no nulls. */
  private def keyOver(schema: StructType): Column = {
    val fields = schema.fields.filterNot(_.name.startsWith(Internal)).sortBy(_.name)
    val parts = fields.zipWithIndex.flatMap { case (f, i) =>
      val repr = f.dataType match {
        case IntegerType | ShortType | ByteType => col(s"`${f.name}`").cast(LongType).cast(StringType)
        case FloatType => col(s"`${f.name}`").cast(DoubleType).cast(StringType)
        case _ => col(s"`${f.name}`").cast(StringType)
      }
      val piece = concat(lit(s"${f.name}:"), octet_length(repr).cast(StringType), lit(":"), repr)
      if (i == 0) Seq(piece) else Seq(lit(";"), piece)
    }
    sha2(concat(parts.toIndexedSeq: _*), 256)
  }

  /** The subset of frame rows (same columns) for which `body` HOLDS.
    * Invariant: None is returned ONLY when the body contains an unbounded
    * quantifier whose evaluation cannot statically be shown never-true —
    * such a body can never evaluate to Right(true) per-row, which is what
    * makes the Or-branch skip below exact. */
  private def holds(db: Database, body: Body, f: DataFrame, depth: Int): Option[DataFrame] = body match {
    case m: Body.MemberOf => Some(memberIs(db, f, m))

    case Body.Not(b, _) => // universe is declarative only (Eval.evaluate)
      holds(db, b, f, depth).map(h =>
        f.join(h.select(col(KeyCol)).distinct(), Seq(KeyCol), "left_anti"))

    case Body.And(cs) =>
      cs.foldLeft(Option(f))((acc, c) => acc.flatMap(holds(db, c, _, depth)))

    case Body.Or(cs) =>
      // an incompilable branch can never be Right(true) — skipping it is
      // exactly Or's swallow-errors semantics (Eval.evaluate Or)
      val branches = cs.flatMap(c => holds(db, c, f, depth))
      Some(branches match {
        case Nil => f.limit(0)
        case hs => f.join(hs.map(_.select(col(KeyCol))).reduce(_ unionAll _).distinct(),
          Seq(KeyCol), "left_semi")
      })

    case Body.Exists(v, q, b) if !usesVariable(b, v) && finiteStored(db, q) =>
      if (db.relations(q).root.count == 0) Some(f.limit(0))
      else holds(db, b, f, depth).orElse(Some(f.limit(0))) // never-true body: ∃ is const false

    case Body.Forall(v, q, b) if !usesVariable(b, v) && finiteStored(db, q) =>
      if (db.relations(q).root.count == 0) Some(f)
      else holds(db, b, f, depth)

    // ∀ distributes over ∧ exactly (∀x. A∧B ⟺ (∀x.A)∧(∀x.B)); compiled
    // conjuncts are error-free, and an incompilable conjunct makes both
    // forms return None (the per-row fallback), so the orders agree.
    // Restricted to all-stored-membership conjuncts, where each ∀
    // becomes a storedQuant count/anti-join shape — no extend join at
    // all. A predicate conjunct must NOT be distributed: in isolation
    // its ∀ negates to a disjunctive join condition (a nested-loop
    // product), while the undistributed theta path keeps the positive
    // equality as a hash-join key and counts matches instead.
    case Body.Forall(v, q, Body.And(cs)) if cs.nonEmpty && finiteStored(db, q) &&
        cs.forall(storedShape) =>
      holds(db, Body.And(cs.map(c => Body.Forall(v, q, c))), f, depth)

    case Body.Exists(v, q, b) =>
      // ∃ distributes over ∨ exactly (∃x. A∨B ⟺ (∃x.A)∨(∃x.B)), and the
      // error semantics agree: Exists absorbs per-branch non-true
      // outcomes just as Or swallows branch errors. Tried only AFTER
      // quantJoin misses (the whole-body join is built once, not once in
      // a guard and again here), and BEFORE the whole-body stored/theta
      // fallbacks: per-branch fast paths beat crossing the frame with
      // the quantifier for the whole disjunction.
      def distributedOr: Option[DataFrame] = b match {
        case Body.Or(cs) if cs.nonEmpty && finiteStored(db, q) =>
          holds(db, Body.Or(cs.map(c => Body.Exists(v, q, c))), f, depth)
        case _ => None
      }
      quantJoin(db, f, v, q, b, isForall = false, wantViolations = false)
        .orElse(distributedOr)
        .orElse(storedQuant(db, f, v, q, b, isForall = false, wantViolations = false))
        .map(Some(_)).getOrElse {
        extendFrame(db, f, v, q, depth, b).map { case Extended(ext, pk, residual, _) =>
          // theta-filtered pairs have body = false (a compilable conjunct
          // never errors), and Exists absorbs every non-true outcome —
          // so the parents that hold are exactly those with a surviving
          // pair whose residual holds
          residual.map(holds(db, _, ext, depth + 1)) match {
            case Some(Some(h)) =>
              f.join(h.select(col(s"`$pk`").as(KeyCol)).distinct(), Seq(KeyCol), "left_semi")
            case Some(None) =>
              // body can never be Right(true); Exists absorbs non-true
              // outcomes (Eval.evaluate compares == Right(true)) → const false
              f.limit(0)
            case None => // body fully absorbed by the theta predicate
              f.join(ext.select(col(s"`$pk`").as(KeyCol)).distinct(), Seq(KeyCol), "left_semi")
          }
        }
      }

    case Body.Forall(v, q, b) =>
      quantJoin(db, f, v, q, b, isForall = true, wantViolations = false)
        .orElse(storedQuant(db, f, v, q, b, isForall = true, wantViolations = false))
        .map(Some(_)).getOrElse {
        for {
          extended <- extendFrame(db, f, v, q, depth, b)
          Extended(ext, pk, residualOpt, thetaApplied) = extended
          totalQ = db.relations(q).root.count
          res <-
            if (totalQ == 0) Some(f) // vacuous
            else {
              // a pair dropped by the theta predicate is a body-false row,
              // which FAILS the parent: it holds only when every q-row
              // passed the theta (matched(p) = |q|, a duplicate-safe
              // distinct count — no cross join needed to see the misses)
              val base =
                if (!thetaApplied) f
                else {
                  val cnt = s"${Internal}cnt"
                  val qCols = db.relations(q).struct.fields.map(fl => col(s"`$v.${fl.name}`"))
                  val allP = ext.groupBy(col(s"`$pk`"))
                    .agg(countDistinct(struct(qCols.toIndexedSeq: _*)).as(cnt))
                    .filter(col(cnt) === lit(totalQ)).select(col(s"`$pk`").as(KeyCol))
                  f.join(allP, Seq(KeyCol), "left_semi")
                }
              residualOpt match {
                case None => Some(base)
                case Some(rb) =>
                  // Forall propagates body errors, so the residual must be
                  // compilable; a parent fails iff SOME surviving pair
                  // makes the residual not-hold
                  holds(db, rb, ext, depth + 1).map { h =>
                    val failing =
                      ext.join(h.select(col(KeyCol)).distinct(), Seq(KeyCol), "left_anti")
                    base.join(failing.select(col(s"`$pk`").as(KeyCol)).distinct(),
                      Seq(KeyCol), "left_anti")
                  }
              }
            }
        } yield res
      }
  }

  /** Fast path for a quantifier whose body is a pure Column predicate
    * over frame + namespaced quantifier columns (virtual MemberOf under
    * And/Or/Not — error-free by construction): ONE semi/anti join against
    * the quantifier relation, no key machinery, no cross join.
    *
    *   Exists holds      = f ⋉ q on p      Exists violations = f ▷ q on p
    *   Forall holds      = f ▷ q on ¬p     Forall violations = f ⋉ q on ¬p
    *
    * (Empty quantifier: Exists never holds, Forall is vacuous — the joins
    * produce exactly that.) None → caller falls back to the generic path. */
  private def quantJoin(db: Database, f: DataFrame, v: String, q: String, b: Body,
      isForall: Boolean, wantViolations: Boolean): Option[DataFrame] =
    if (!finiteStored(db, q)) None
    else {
      val qrel = db.relations(q)
      val qAttrs = qrel.struct.fields.map(_.name).toSeq
      // shadowing of an outer same-variable binding: let the generic
      // machinery handle it (renamed q columns would be ambiguous here)
      if (qAttrs.exists(a => f.columns.contains(s"$v.$a"))) None
      else {
        val fields = f.schema.fields.filterNot(_.name.startsWith(Internal))
          .map(x => x.name -> x.dataType).toMap ++
          qrel.struct.fields.map(x => s"$v.${x.name}" -> x.dataType).toMap
        asPredicate(db, fields, b).map { p =>
          val qren = qrel.df.select(qAttrs.map(a => col(s"`$a`").as(s"$v.$a")): _*)
          val (cond, joinType) =
            if (isForall == wantViolations) (if (isForall) !p else p, "left_semi")
            else (if (isForall) !p else p, "left_anti")
          f.join(qren, cond, joinType)
        }
      }
    }

  /** Fast path for a quantifier whose body is a single STORED-relation
    * membership test (or its closed-world negation) that references the
    * quantifier variable: compiles to binary joins over the parent-free
    * PAIR SET  J = q ⋈ target  (joined on the binding conjuncts that
    * involve only `v.attr` columns and constants), so the plan contains no
    * candidates × quantifier cross join — the scale hazard of the generic
    * keyed path. With matchedQ(p) = |{distinct q-rows matched for parent
    * p}| and |q| the maintained ContentRoot count (driver value, no job):
    *
    *   ∃ MemberOf   holds = f ⋉ J on parent conds   (violations = f ▷ J)
    *   ∀ ¬MemberOf  holds = f ▷ J                   (violations = f ⋉ J)
    *   ∀ MemberOf   holds = {p : matchedQ(p) = |q|}
    *   ∃ ¬MemberOf  holds = {p : matchedQ(p) < |q|} ∪ zero-match parents
    *
    * The count shapes group the f ⋈ J pairs back by ALL parent columns
    * (frame rows are unique — stored relations are sets and extended
    * frames carry composite keys). A binding that references no parent
    * column makes the verdict uniform across parents; that degenerates to
    * one bounded aggregate job deciding between `f` and `f.limit(0)`.
    * Membership edge cases (unknown/empty target, empty or schema-foreign
    * binding) are constant-false, mirroring [[memberSplit]]'s `never`.
    * None → caller falls back to the generic keyed path. */
  private def storedQuant(db: Database, f: DataFrame, v: String, q: String, b: Body,
      isForall: Boolean, wantViolations: Boolean): Option[DataFrame] = {
    val memberOpt = b match {
      case m: Body.MemberOf if !Virtual.relations.contains(m.target) => Some((m, false))
      case Body.Not(m: Body.MemberOf, _) if !Virtual.relations.contains(m.target) =>
        Some((m, true))
      case _ => None
    }
    memberOpt.flatMap { case (m, negBody) =>
      if (!finiteStored(db, q)) None
      else {
        val qrel = db.relations(q)
        val qAttrs = qrel.struct.fields.map(_.name).toSeq
        if (qAttrs.exists(a => f.columns.contains(s"$v.$a"))) None // outer shadow → generic
        else {
          def whole = f
          def none = f.limit(0)
          def const(holdsAll: Boolean): Option[DataFrame] =
            Some(if (holdsAll != wantViolations) whole else none)
          val totalQ = qrel.root.count
          if (totalQ == 0) const(isForall) // ∃ over ∅ never holds; ∀ over ∅ vacuous
          else {
            val qNames = qAttrs.map(a => s"$v.$a").toSet
            val extCols = f.columns.toSet ++ qNames
            val resolved = m.binding.flatMap {
              case (t, Binding.Const(value)) => Some(t -> (Right(value): Either[String, Value]))
              case (t, Binding.Var(s)) =>
                if (extCols.contains(s)) Some(t -> (Left(s): Either[String, Value])) else None
            }
            val constFalse = db.relations.get(m.target) match {
              case None => true
              case Some(t) =>
                val sa = t.schema.attrNames.toSet
                resolved.isEmpty || !resolved.forall(p => sa.contains(p._1)) || t.root.count == 0
            }
            if (constFalse) const(negBody) // body verdict uniform for every extended row
            else {
              val qConds = resolved.collect { case (t, Left(s)) if qNames.contains(s) => (t, s) }
              if (qConds.isEmpty) None // body ignores v: degenerate shortcut owns this
              else {
                val target = db.relations(m.target)
                val parentConds = resolved.collect {
                  case (t, Left(s)) if !qNames.contains(s) => (t, s)
                }
                val constConds = resolved.collect { case (t, Right(value)) => (t, value) }
                val tAttrs = resolved.map(_._1).distinct
                val idx = tAttrs.zipWithIndex.toMap
                val tdf = target.df.select(
                  tAttrs.map(a => col(s"`$a`").as(s"${Internal}t${idx(a)}")): _*)
                val qdf = qrel.df.select(qAttrs.map(a => col(s"`$a`").as(s"$v.$a")): _*)
                val qtCond = (qConds.map { case (t, s) =>
                    col(s"`$s`") === col(s"${Internal}t${idx(t)}") } ++
                  constConds.map { case (t, value) =>
                    col(s"${Internal}t${idx(t)}") === value.lit }).reduce(_ && _)
                val pairs = qdf.join(tdf, qtCond, "inner")
                val pCond = parentConds.map { case (t, s) =>
                  col(s"`$s`") === col(s"${Internal}t${idx(t)}") }.reduceOption(_ && _)
                pCond match {
                  case Some(cond) if negBody == isForall => // plain semi/anti shapes
                    Some(f.join(pairs, cond,
                      if (wantViolations == isForall) "left_semi" else "left_anti"))
                  case Some(cond) => // count shapes: A = every q-row matched
                    val fCols = f.columns.map(c => col(s"`$c`"))
                    val cntCol = s"${Internal}cnt"
                    val grouped = f.join(pairs, cond, "inner")
                      .groupBy(fCols: _*)
                      .agg(countDistinct(struct(qAttrs.map(a => col(s"`$v.$a`")): _*)).as(cntCol))
                    val wantA = isForall != wantViolations
                    if (wantA) Some(grouped.filter(col(cntCol) === lit(totalQ)).select(fCols: _*))
                    else Some(grouped.filter(col(cntCol) < lit(totalQ)).select(fCols: _*)
                      .unionAll(f.join(pairs, cond, "left_anti")))
                  case None if negBody == isForall =>
                    // no parent column in the binding: verdict uniform;
                    // ∃ MemberOf holds iff some pair exists, ∀ ¬ iff none
                    val nonEmptyPairs = !pairs.limit(1).isEmpty
                    const(if (isForall) !nonEmptyPairs else nonEmptyPairs)
                  case None =>
                    // ∀ MemberOf holds iff every q-row matched; ∃ ¬ the dual
                    val matched =
                      pairs.select(qAttrs.map(a => col(s"`$v.$a`")): _*).distinct().count()
                    const(if (isForall) matched == totalQ else matched < totalQ)
                }
              }
            }
          }
        }
      }
    }
  }

  /** The body as a pure Column predicate over the given fields, if it is
    * built solely from virtual-relation membership and connectives —
    * error-free, so And/Or/Not are plain boolean algebra (Not flips
    * MembershipFailed to true, which ¬p reproduces; no nulls exist). */
  private def asPredicate(db: Database, fields: Map[String, org.apache.spark.sql.types.DataType],
      body: Body): Option[Column] = body match {
    case Body.MemberOf(target, binding) =>
      Virtual.relations.get(target).map { vr =>
        val resolved = binding.flatMap {
          case (t, Binding.Const(value)) => Some(t -> (Right(value): Either[String, Value]))
          case (t, Binding.Var(s)) =>
            if (fields.contains(s)) Some(t -> (Left(s): Either[String, Value])) else None
        }
        val allInts = resolved.forall {
          case (_, Right(Value.IntV(_))) => true
          case (_, Right(_))             => false
          case (_, Left(s)) => fields(s) match {
            case LongType | IntegerType | ShortType | ByteType => true
            case _ => false
          }
        }
        val bound = resolved.toMap
        if (!allInts || !vr.attrs.forall(bound.contains)) lit(false)
        else vr.predicate(vr.attrs.map { a =>
          a -> (bound(a) match {
            case Left(src)    => col(s"`$src`").cast(LongType)
            case Right(value) => value.lit
          })
        }.toMap)
      }
    case Body.Not(b, _) => asPredicate(db, fields, b).map(p => !p)
    case Body.And(cs) =>
      cs.foldLeft(Option(lit(true))) { (acc, c) =>
        for { a <- acc; p <- asPredicate(db, fields, c) } yield a && p
      }
    case Body.Or(cs) =>
      cs.foldLeft(Option(lit(false))) { (acc, c) =>
        for { a <- acc; p <- asPredicate(db, fields, c) } yield a || p
      }
    case _ => None
  }

  /** An extended frame: candidates × quantifier rows (theta-reduced),
    * the depth-unique parent-key column, the body part still to evaluate
    * post-join (None = fully absorbed by the theta predicate), and
    * whether a theta predicate was applied (false = genuine cross). */
  private final case class Extended(ext: DataFrame, pk: String,
      residual: Option[Body], thetaApplied: Boolean)

  /** Extend the frame with quantifier rows namespaced under `v.attr`
    * (reference extend_tuple, lib/constraint.ml:230-251; an inner binding
    * shadows an outer quantifier reusing the same variable). The frame's
    * key moves to a depth-unique parent-key column; the extended key is
    * the (parent, quantifier-row) composite. None iff `q` is unbounded.
    *
    * The extension is a THETA join, not a cross join, whenever any part
    * of the body compiles to a pure Column predicate ([[splitTheta]]):
    * Catalyst lifts the predicate's equality conjuncts into hash-join
    * keys, so `Exists e (And(MemberOf stored, v.x = parent.y))` plans as
    * two equi-joins instead of candidates × quantifier — the difference
    * between O(|f|·|q|) pairs and O(matches) at 100×. Pairs the predicate
    * rejects have body = false (compilable conjuncts never error), which
    * each quantifier's caller accounts for exactly. Only a body with no
    * predicate-compilable part keeps the reference's documented
    * O(∏ nᵢ) cross (docs/icl-quantification.org:438-457). */
  private def extendFrame(db: Database, f: DataFrame, v: String, q: String,
      depth: Int, body: Body): Option[Extended] =
    if (!finiteStored(db, q)) None
    else db.relations.get(q).map { qrel =>
      val pk = s"${Internal}pk$depth"
      val qkCol = s"${Internal}qk"
      val qAttrs = qrel.struct.fields.map(_.name).toSeq
      val shadowed = qAttrs.map(a => s"$v.$a").filter(f.columns.contains)
      val f2 = (if (shadowed.nonEmpty) f.drop(shadowed: _*) else f)
        .withColumnRenamed(KeyCol, pk)
      val qdf = qrel.df.withColumn(qkCol, keyOver(qrel.struct))
        .select(qAttrs.map(a => col(s"`$a`").as(s"$v.$a")) :+ col(qkCol): _*)
      val fields = f2.schema.fields.filterNot(_.name.startsWith(Internal))
        .map(x => x.name -> x.dataType).toMap ++
        qrel.struct.fields.map(x => s"$v.${x.name}" -> x.dataType).toMap
      val (thetaOpt, residual) = splitTheta(db, fields, body)
      val joined = thetaOpt match {
        case Some(p) => f2.join(qdf, p, "inner")
        case None    => f2.crossJoin(qdf)
      }
      val ext = joined
        .withColumn(KeyCol, sha2(concat(col(s"`$pk`"), col(qkCol)), 256))
        .drop(qkCol)
      Extended(ext, pk, residual, thetaOpt.nonEmpty)
    }

  /** Partition a quantifier body into (theta predicate, residual body):
    * the And-conjuncts that compile to pure Column predicates over
    * parent + `v.attr` columns move into the extend join condition; the
    * rest stays for post-join evaluation. A non-And body that compiles
    * whole becomes pure theta (this happens only under variable
    * shadowing, where [[quantJoin]] bowed out). */
  private def splitTheta(db: Database, fields: Map[String, DataType],
      body: Body): (Option[Column], Option[Body]) = body match {
    case Body.And(cs) if cs.nonEmpty =>
      val (preds, rest) = cs.partition(c => asPredicate(db, fields, c).isDefined)
      val theta = preds.flatMap(asPredicate(db, fields, _)).reduceOption(_ && _)
      val residual = rest match {
        case Nil        => None
        case one :: Nil => Some(one)
        case many       => Some(Body.And(many))
      }
      (theta, residual)
    case other =>
      asPredicate(db, fields, other) match {
        case Some(p) => (Some(p), None)
        case None    => (None, Some(other))
      }
  }

  /** Resolved binding: target attr → frame column (Var) or literal
    * (Const). Unresolvable Vars are silently dropped (Eval.bind,
    * reference lib/constraint.ml:151-164). */
  private def resolve(f: DataFrame, binding: List[(String, Binding)]): List[(String, Either[String, Value])] =
    binding.flatMap {
      case (tgt, Binding.Const(v)) => Some(tgt -> (Right(v): Either[String, Value]))
      case (tgt, Binding.Var(src)) =>
        if (f.columns.contains(src)) Some(tgt -> (Left(src): Either[String, Value])) else None
    }

  /** Frame rows where membership HOLDS (mirror of Eval.Ctx
    * checkMembership / Runtime.context: empty or schema-foreign bindings,
    * unknown targets, and empty stored targets never match). */
  private def memberIs(db: Database, f: DataFrame, m: Body.MemberOf): DataFrame =
    memberSplit(db, f, m, neg = false)

  /** Frame rows where membership FAILS — the exact complement. */
  private def memberNot(db: Database, f: DataFrame, m: Body.MemberOf): DataFrame =
    memberSplit(db, f, m, neg = true)

  private def memberSplit(db: Database, f: DataFrame, m: Body.MemberOf, neg: Boolean): DataFrame = {
    val resolved = resolve(f, m.binding)
    def never: DataFrame = if (neg) f else f.limit(0) // membership false for every row
    Virtual.relations.get(m.target) match {
      case Some(vr) =>
        // virtual membership requires every bound value to be a natural
        // (Value.IntV — Runtime.context collects only IntV) and a full
        // attribute binding (VirtualRel.ground)
        val allInts = resolved.forall {
          case (_, Right(Value.IntV(_))) => true
          case (_, Right(_))             => false
          case (_, Left(src)) => f.schema(f.schema.fieldIndex(src)).dataType match {
            case LongType | IntegerType | ShortType | ByteType => true
            case _ => false
          }
        }
        val bound = resolved.toMap
        if (!allInts || !vr.attrs.forall(bound.contains)) never
        else {
          val colMap: Map[String, Column] = vr.attrs.map { a =>
            a -> (bound(a) match {
              case Left(src) => col(s"`$src`").cast(LongType)
              case Right(v)  => v.lit
            })
          }.toMap
          val pred = vr.predicate(colMap)
          f.filter(if (neg) !pred else pred)
        }
      case None =>
        db.relations.get(m.target) match {
          case None => never
          case Some(rel) =>
            val schemaAttrs = rel.schema.attrNames.toSet
            if (resolved.isEmpty || !resolved.forall(p => schemaAttrs.contains(p._1)) ||
                rel.root.count == 0) never
            else {
              val tAttrs = resolved.map(_._1).distinct
              val idx = tAttrs.zipWithIndex.toMap
              val tdf = rel.df.select(tAttrs.map(a => col(s"`$a`").as(s"${Internal}t${idx(a)}")): _*)
              val cond = resolved.map {
                case (tgt, Left(src)) => col(s"`$src`") === col(s"${Internal}t${idx(tgt)}")
                case (tgt, Right(v))  => col(s"${Internal}t${idx(tgt)}") === v.lit
              }.reduce(_ && _)
              f.join(tdf, cond, if (neg) "left_anti" else "left_semi")
            }
        }
    }
  }
}

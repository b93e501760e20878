package graft.icl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.engine.{Database, StoredRelation}
import graft.types.Value
import graft.virtual.Virtual

/** Constraint enforcement over engine state: insert-time validation,
  * polarity-driven cascade re-checking, and deferred/commit
  * (reference lib/manipulation.ml:395-521, 965-1027).
  */
object Runtime {

  /** Eval context over a database snapshot (reference build_eval_context,
    * lib/manipulation.ml:92-148).
    *
    * Membership on a stored relation is a presence scan narrowed to the
    * bound attributes — expressed as a pushdown-friendly Spark filter
    * (the reference's documented O(n) scan, docs/icl-quantification.org:
    * 85-91, distributed). Membership on a virtual relation is a driver-side
    * arithmetic check — no job at all. */
  /** Does the row's cell for field `f` equal the bound literal? Mirrors
    * the Column predicate `col(a) === v.lit` driver-side (with the same
    * Int-widens-to-Double coercion Spark applies). */
  private def cellMatches(f: org.apache.spark.sql.types.StructField, cell: Any, v: Value): Boolean =
    (f.dataType, v) match {
      case (org.apache.spark.sql.types.DoubleType, Value.IntV(i)) => cell == i.toDouble
      case _ => cell == v.any
    }

  private def localMatches(rel: StoredRelation, row: org.apache.spark.sql.Row,
      bound: Seq[(String, Value)]): Boolean =
    bound.forall { case (a, v) =>
      val i = rel.struct.fieldIndex(a)
      cellMatches(rel.struct.fields(i), row.get(i), v)
    }

  def context(spark: SparkSession, db: Database): Eval.Ctx = Eval.Ctx(
    checkMembership = (relName, bound) =>
      Virtual.relations.get(relName) match {
        case Some(vr) =>
          val longs = bound.collect { case (a, Value.IntV(i)) => a -> i }.toMap
          longs.size == bound.size && vr.ground(longs)
        case None =>
          db.relations.get(relName) match {
            case None => false
            case Some(rel) =>
              val schemaAttrs = rel.schema.attrNames.toSet
              bound.nonEmpty && bound.forall { case (a, _) => schemaAttrs.contains(a) } &&
                rel.root.count > 0 && (rel.localRows match {
                  // Local extension: the reference's documented O(n) scan
                  // (docs/icl-quantification.org:85-91), driver-side, no job
                  case Some(rows) => rows.valuesIterator.exists(localMatches(rel, _, bound))
                  case None =>
                    val cond = bound.map { case (a, v) => col(s"`$a`") === v.lit }.reduce(_ && _)
                    !rel.df.filter(cond).isEmpty
                })
          }
      },
    iterateFinite = relName =>
      if (Virtual.isVirtual(relName)) None // AlephZero (reference standard.ml)
      else db.relations.get(relName).map { rel =>
        // eager materialization, as the reference does
        // (docs/icl-quantification.org:94-109); free for Local extensions
        rel.localRows match {
          case Some(rows) => rows.valuesIterator.toSeq.map(r => graft.engine.Engine.rowToAttrs(rel, r))
          case None => rel.df.collect().toSeq.map(r => graft.engine.Engine.rowToAttrs(rel, r))
        }
      }
  )

  private def tupleMap(attrs: Seq[(String, Value)]): Eval.Tuple = attrs.toMap

  /** Insert-time validation: evaluate ALL named constraints (including
    * deferred-attached ones, as the reference does) against the
    * pre-insert snapshot, collecting every failure
    * (reference validate_tuple_constraints, lib/manipulation.ml:395-415). */
  def validateInsert(spark: SparkSession, db: Database, rel: StoredRelation,
      coerced: Seq[(String, Value)]): Either[graft.Err, Unit] =
    if (rel.constraints.isEmpty) Right(())
    else Eval.evaluateNamed(context(spark, db), tupleMap(coerced), rel.constraints.toSeq)
      .left.map(d => graft.Err.ConstraintViolation(d.render))

  private def isDeferred(db: Database, relName: String, cname: String): Boolean =
    db.deferred.exists(e => e.constraintName == cname && e.relationName == relName)

  /** Cascade re-check after a mutation of `targetRel`
    * (reference check_cascade_constraints, lib/manipulation.ml:427-521):
    * for every constraint anywhere in the database that references the
    * mutated relation with a polarity triggered by the mutation kind,
    * re-evaluate the constrained relation's tuples — narrowed by the
    * focused filter (pushed into a Spark filter, so the candidate set is
    * computed distributed) and with the transition tuple substituted into
    * quantifiers over the mutated relation. */
  def cascade(spark: SparkSession, db: Database, targetRel: String,
      transition: Seq[(String, Value)], kind: String): Either[graft.Err, Unit] = {
    val ctx = context(spark, db)
    val verb = if (kind == "insert") "inserting into" else "deleting from"
    db.relations.valuesIterator.foldLeft(Right(()): Either[graft.Err, Unit]) { (acc, constrained) =>
      constrained.constraints.foldLeft(acc) { case (acc2, (cname, cbody)) =>
        acc2.flatMap { _ =>
          if (isDeferred(db, constrained.name, cname)) Right(())
          else Analysis.polarityOf(cbody).get(targetRel) match {
            case Some(pol) if Analysis.triggeredBy(kind, pol) =>
              val filter = Analysis.focusedFilter(cbody, targetRel, transition)
              val present = filter.filter { case (a, _) => constrained.schema.attrNames.contains(a) }
              val substituted = Analysis.substituteTransition(cbody, targetRel, transition)
              val violation = Left(graft.Err.ConstraintViolation(
                s"cascade: $verb $targetRel violates constraint $cname on ${constrained.name}"))
              def perRow(rows: Seq[org.apache.spark.sql.Row]): Either[graft.Err, Unit] =
                rows.foldLeft(Right(()): Either[graft.Err, Unit]) { (a3, row) =>
                  a3.flatMap { _ =>
                    val tup = tupleMap(graft.engine.Engine.rowToAttrs(constrained, row))
                    Eval.firstFailure(ctx, tup, Seq(cname -> substituted)) match {
                      case Right(()) => Right(())
                      case Left(_)   => violation
                    }
                  }
                }
              constrained.localRows match {
                // Local extension: focused filter applied driver-side
                case Some(rows) =>
                  perRow(
                    if (present.isEmpty) rows.valuesIterator.toSeq
                    else rows.valuesIterator.filter(localMatches(constrained, _, present)).toSeq)
                case None =>
                  // Dist extension: ONE set-wise violation query — the
                  // focused filter narrows candidates and the substituted
                  // constants ride inside the compiled joins (SURVEY §2.5)
                  val df =
                    if (present.isEmpty) constrained.df
                    else constrained.df.filter(present.map { case (a, v) => col(s"`$a`") === v.lit }.reduce(_ && _))
                  Compile.violations(db, substituted, df) match {
                    case Some(viol) => if (viol.limit(1).isEmpty) Right(()) else violation
                    case None       => perRow(df.collect().toSeq) // unbounded quantifier: per-row evaluator
                  }
              }
            case _ => Right(())
          }
        }
      }
    }
  }

  /** The constraints a mutation of `targetRel` of the given kind must
    * re-check (the cascade's iteration set, minus deferred entries). */
  def affected(db: Database, targetRel: String, kind: String)
      : Seq[(StoredRelation, String, Body)] =
    db.relations.values.toSeq.flatMap { r =>
      r.constraints.toSeq.flatMap { case (cname, body) =>
        if (isDeferred(db, r.name, cname)) None
        else Analysis.polarityOf(body).get(targetRel) match {
          case Some(pol) if Analysis.triggeredBy(kind, pol) => Some((r, cname, body))
          case _ => None
        }
      }
    }

  /** The attributes that focus a BATCH re-check of `body` after mutating
    * `depRel`: Var-bound sources of MemberOf(depRel) nodes named by both
    * the mutated relation's schema (so every transition row carries a
    * value — Analysis.focusedFilter's tmap lookup) and the constrained
    * relation's schema (cascade's `present` filter). */
  def focusAttrs(body: Body, depRel: String, depAttrs: Set[String],
      conAttrs: Set[String]): List[String] = {
    def loop(acc: List[String], node: Body): List[String] = node match {
      case Body.MemberOf(target, binding) if target == depRel =>
        binding.foldLeft(acc) {
          case (a, (_, Binding.Var(src))) if depAttrs.contains(src) && conAttrs.contains(src) => src :: a
          case (a, _) => a
        }
      case Body.MemberOf(_, _)  => acc
      case Body.Not(b, _)       => loop(acc, b)
      case Body.Exists(_, _, b) => loop(acc, b)
      case Body.Forall(_, _, b) => loop(acc, b)
      case Body.And(cs)         => cs.foldLeft(acc)(loop)
      case Body.Or(cs)          => cs.foldLeft(acc)(loop)
    }
    loop(Nil, body).distinct
  }

  /** Batch cascade after a bulk mutation of `targetRel`: one set-wise
    * violation query per affected constraint against the POST-mutation
    * state, with candidates narrowed by a semi-join against the mutation
    * batch on the focus attributes (the set-wise image of the reference's
    * per-transition focused filter, lib/constraint.ml:355-383).
    *
    * Soundness contract (the CALLER must pre-check, e.g.
    * Engine.insertFrom/deleteWhere): no affected constraint is on
    * `targetRel` itself, has Both polarity on it, quantifies over it
    * ([[Compile.quantifiesOver]] — substitution not expressible batch-wise),
    * or is incompilable. Under those conditions per-transition verdicts
    * are monotone in the mutation direction, so the single post-state
    * check equals the reference's per-transition cascade. */
  def cascadeBatch(spark: SparkSession, db: Database, targetRel: String,
      batch: org.apache.spark.sql.DataFrame, kind: String): Either[graft.Err, Unit] = {
    val verb = if (kind == "insert") "inserting into" else "deleting from"
    val depAttrs = batch.columns.toSet
    affected(db, targetRel, kind).foldLeft(Right(()): Either[graft.Err, Unit]) {
      case (acc, (constrained, cname, body)) => acc.flatMap { _ =>
        val focus = focusAttrs(body, targetRel, depAttrs, constrained.schema.attrNames.toSet)
        val candidates =
          if (focus.isEmpty) constrained.df
          else constrained.df.join(
            batch.select(focus.map(a => col(s"`$a`")): _*).distinct(), focus, "left_semi")
        Compile.violations(db, body, candidates) match {
          case Some(viol) =>
            if (viol.limit(1).isEmpty) Right(())
            else Left(graft.Err.ConstraintViolation(
              s"cascade: $verb $targetRel violates constraint $cname on ${constrained.name}"))
          case None => Left(graft.Err.StorageError(
            s"internal: cascadeBatch on incompilable constraint $cname"))
        }
      }
    }
  }

  /** Evaluate every deferred constraint against the current state
    * (reference check_deferred_constraints, lib/manipulation.ml:983-1013). */
  def checkDeferred(spark: SparkSession, db: Database): Either[graft.Err, Unit] = {
    val ctx = context(spark, db)
    db.deferred.foldLeft(Right(()): Either[graft.Err, Unit]) { (acc, entry) =>
      acc.flatMap { _ =>
        db.relations.get(entry.relationName) match {
          case None => Right(())
          case Some(rel) =>
            val violation = Left(graft.Err.ConstraintViolation(
              s"deferred constraint ${entry.constraintName} on ${entry.relationName} violated"))
            def perRow(rows: Seq[org.apache.spark.sql.Row]): Either[graft.Err, Unit] =
              rows.foldLeft(Right(()): Either[graft.Err, Unit]) { (a2, row) =>
                a2.flatMap { _ =>
                  val tup = tupleMap(graft.engine.Engine.rowToAttrs(rel, row))
                  Eval.firstFailure(ctx, tup, Seq(entry.constraintName -> entry.body)) match {
                    case Right(()) => Right(())
                    case Left(_)   => violation
                  }
                }
              }
            rel.localRows match {
              case Some(m) => perRow(m.valuesIterator.toSeq)
              case None =>
                // Dist extension: one set-wise commit-time validation query
                Compile.violations(db, entry.body, rel.df) match {
                  case Some(viol) => if (viol.limit(1).isEmpty) Right(()) else violation
                  case None       => perRow(rel.df.collect().toSeq)
                }
            }
        }
      }
    }
  }
}

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
      coerced: Seq[(String, Value)]): Either[String, Unit] =
    if (rel.constraints.isEmpty) Right(())
    else Eval.evaluateNamed(context(spark, db), tupleMap(coerced), rel.constraints.toSeq)
      .left.map(d => s"ConstraintViolation: ${d.render}")

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
      transition: Seq[(String, Value)], kind: String): Either[String, Unit] = {
    val ctx = context(spark, db)
    val verb = if (kind == "insert") "inserting into" else "deleting from"
    db.relations.valuesIterator.foldLeft(Right(()): Either[String, Unit]) { (acc, constrained) =>
      constrained.constraints.foldLeft(acc) { case (acc2, (cname, cbody)) =>
        acc2.flatMap { _ =>
          if (isDeferred(db, constrained.name, cname)) Right(())
          else Analysis.polarityOf(cbody).get(targetRel) match {
            case Some(pol) if Analysis.triggeredBy(kind, pol) =>
              val filter = Analysis.focusedFilter(cbody, targetRel, transition)
              val present = filter.filter { case (a, _) => constrained.schema.attrNames.contains(a) }
              val candidateRows: Seq[org.apache.spark.sql.Row] = constrained.localRows match {
                // Local extension: focused filter applied driver-side
                case Some(rows) =>
                  if (present.isEmpty) rows.valuesIterator.toSeq
                  else rows.valuesIterator.filter(localMatches(constrained, _, present)).toSeq
                case None =>
                  val df =
                    if (present.isEmpty) constrained.df
                    else constrained.df.filter(present.map { case (a, v) => col(s"`$a`") === v.lit }.reduce(_ && _))
                  df.collect().toSeq
              }
              val substituted = Analysis.substituteTransition(cbody, targetRel, transition)
              candidateRows.foldLeft(Right(()): Either[String, Unit]) { (a3, row) =>
                a3.flatMap { _ =>
                  val tup = tupleMap(graft.engine.Engine.rowToAttrs(constrained, row))
                  Eval.firstFailure(ctx, tup, Seq(cname -> substituted)) match {
                    case Right(()) => Right(())
                    case Left(_) => Left("ConstraintViolation: " +
                      s"cascade: $verb $targetRel violates constraint $cname on ${constrained.name}")
                  }
                }
              }
            case _ => Right(())
          }
        }
      }
    }
  }

  /** Evaluate every deferred constraint against the current state
    * (reference check_deferred_constraints, lib/manipulation.ml:983-1013). */
  def checkDeferred(spark: SparkSession, db: Database): Either[String, Unit] = {
    val ctx = context(spark, db)
    db.deferred.foldLeft(Right(()): Either[String, Unit]) { (acc, entry) =>
      acc.flatMap { _ =>
        db.relations.get(entry.relationName) match {
          case None => Right(())
          case Some(rel) =>
            val rows = rel.localRows match {
              case Some(m) => m.valuesIterator.toSeq
              case None    => rel.df.collect().toSeq
            }
            rows.foldLeft(Right(()): Either[String, Unit]) { (a2, row) =>
              a2.flatMap { _ =>
                val tup = tupleMap(graft.engine.Engine.rowToAttrs(rel, row))
                Eval.firstFailure(ctx, tup, Seq(entry.constraintName -> entry.body)) match {
                  case Right(()) => Right(())
                  case Left(_) => Left("ConstraintViolation: " +
                    s"deferred constraint ${entry.constraintName} on ${entry.relationName} violated")
                }
              }
            }
        }
      }
    }
  }
}

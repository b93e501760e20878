package graft.drl

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import graft.catalog.Catalog
import graft.core.Algebra
import graft.virtual.{Virtual, VirtualRel}

/** DRL AST → DataFrame. The fold mirrors the reference executor's
  * recursion (reference lib/drl/executor.ml:23-72) onto the Algebra
  * combinators; the resulting DataFrame is the ephemeral relation — an
  * unexecuted Catalyst plan, exactly the reference's generator-composition
  * made declarative, so pushdown/pruning/join-selection happen for free.
  */
object Compiler {
  import Query._

  /** Parse, gate, compile — the full request path of a DRL query
    * (reference lib/drl/sublanguage.ml:18-23: parse → admit → execute). */
  def run(spark: SparkSession, cat: Catalog, sexpText: String): Either[String, DataFrame] =
    for {
      q <- Parser.parse(sexpText)
      _ <- Gate.admit(cat, q)
      df <- compile(spark, cat, q)
    } yield df

  def compile(spark: SparkSession, cat: Catalog, q: Query): Either[String, DataFrame] = q match {
    case Base(name) => cat.resolve(name)

    case Const(attrs) => Right(Algebra.constRelation(spark, attrs))

    case Select(filter, source) =>
      compile(spark, cat, source).flatMap { src =>
        resolveVirtual(filter) match {
          case Some((vr, renamed)) =>
            // A virtual (infinite) filter relation compiles to its
            // membership predicate over the source's columns — the
            // declarative replacement for the reference's generator-based
            // membership check (lib/prelude/standard.ml); Catalyst pushes
            // it to the scan.
            val missing = renamed.values.filterNot(src.columns.contains)
            if (missing.nonEmpty)
              Left(s"virtual filter ${vr.name} needs attributes ${renamed.values.mkString(",")}; " +
                s"source lacks ${missing.mkString(",")}")
            else {
              val binding = vr.attrs.map(a => a -> col(s"`${renamed(a)}`")).toMap
              Right(src.filter(vr.predicate(binding)))
            }
          case None =>
            compile(spark, cat, filter).map(f => Algebra.select(f, src))
        }
      }

    case Join(attrs, l, r) =>
      for { lf <- compile(spark, cat, l); rf <- compile(spark, cat, r) }
        yield Algebra.equijoin(attrs, lf, rf)

    case Cartesian(l, r) =>
      for { lf <- compile(spark, cat, l); rf <- compile(spark, cat, r) }
        yield Algebra.cartesian(lf, rf)

    case Project(attrs, src) =>
      compile(spark, cat, src).map(Algebra.project(attrs))

    case Rename(pairs, src) =>
      compile(spark, cat, src).map(Algebra.rename(pairs))

    case Union(l, r) =>
      for { lf <- compile(spark, cat, l); rf <- compile(spark, cat, r) }
        yield Algebra.union(lf, rf)

    case Diff(l, r) =>
      for { lf <- compile(spark, cat, l); rf <- compile(spark, cat, r) }
        yield Algebra.diff(lf, rf)

    case Take(n, src) =>
      compile(spark, cat, src).map(Algebra.take(n))
  }

  /** Recognize a filter subtree that denotes a virtual relation, possibly
    * renamed: returns the relation plus a map from its canonical attribute
    * names to the names they carry after the renames. */
  def resolveVirtual(q: Query): Option[(VirtualRel, Map[String, String])] = q match {
    case Base(name) =>
      Virtual.relations.get(name).map(vr => vr -> vr.attrs.map(a => a -> a).toMap)
    case Rename(pairs, inner) =>
      resolveVirtual(inner).map { case (vr, m) =>
        val pm = pairs.toMap
        vr -> m.view.mapValues(n => pm.getOrElse(n, n)).toMap
      }
    case _ => None
  }
}

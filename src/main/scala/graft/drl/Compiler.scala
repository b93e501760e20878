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
  def run(spark: SparkSession, cat: Catalog, sexpText: String): Either[graft.Err, DataFrame] =
    for {
      q <- Parser.parse(sexpText).left.map(graft.Err.ParseError(_))
      _ <- Gate.admit(cat, q)
      df <- compile(spark, cat, q)
    } yield df

  def compile(spark: SparkSession, cat: Catalog, q: Query): Either[graft.Err, DataFrame] = q match {
    case Base(name) => cat.resolve(name)

    case Const(attrs) => Right(Algebra.constRelation(spark, attrs))

    case Select(filter, source) =>
      compile(spark, cat, source).flatMap { src =>
        filter match {
          // Constant filter: fold the semijoin to a literal predicate on
          // the common attributes. Semantically identical to the
          // reference's project(equijoin(common, source, const)) — the
          // const relation has exactly one tuple, so each matching source
          // row survives exactly once, and an attribute-disjoint const
          // degenerates to the identity — but as a WHERE clause the
          // predicate reaches the parquet scan (PushedFilters/partition
          // pruning) instead of building a 1-row broadcast join.
          case Const(attrs) =>
            val common = attrs.filter { case (a, _) => src.columns.contains(a) }
            if (common.isEmpty) Right(src)
            else Right(src.filter(common.map { case (a, v) => col(s"`$a`") === v.lit }.reduce(_ && _)))
          case _ => resolveVirtual(filter) match {
          case Some((vr, renamed)) =>
            // A virtual (infinite) filter relation compiles to its
            // membership predicate over the source's columns — the
            // declarative replacement for the reference's generator-based
            // membership check (lib/prelude/standard.ml); Catalyst pushes
            // it to the scan.
            val missing = renamed.values.filterNot(src.columns.contains)
            if (missing.nonEmpty)
              Left(graft.Err.GeneratorError(
                s"virtual filter ${vr.name} needs attributes ${renamed.values.mkString(",")}; " +
                s"source lacks ${missing.mkString(",")}"))
            else {
              val binding = vr.attrs.map(a => a -> col(s"`${renamed(a)}`")).toMap
              Right(src.filter(vr.predicate(binding)))
            }
          case None =>
            compile(spark, cat, filter).map(f => Algebra.select(f, src))
          }
        }
      }

    case Join(attrs, l, r) =>
      for { lf <- compile(spark, cat, l); rf <- compile(spark, cat, r) }
        yield Algebra.equijoin(attrs, lf, rf)

    case Cartesian(l, r) =>
      for { lf <- compile(spark, cat, l); rf <- compile(spark, cat, r) }
        yield Algebra.cartesian(lf, rf)

    case Project(attrs, src) =>
      // validated here rather than leaking Spark's AnalysisException: the
      // engine's error contract is Left, never a throw (DispatchFuzzSpec)
      compile(spark, cat, src).flatMap { df =>
        val missing = attrs.filterNot(df.columns.contains)
        if (missing.nonEmpty)
          Left(graft.Err.GeneratorError(
            s"Project: unknown attribute(s) ${missing.mkString(", ")} " +
            s"(relation has: ${df.columns.mkString(", ")})"))
        else Right(Algebra.project(attrs)(df))
      }

    case Rename(pairs, src) =>
      compile(spark, cat, src).map(Algebra.rename(pairs))

    case Union(l, r) =>
      for { lf <- compile(spark, cat, l); rf <- compile(spark, cat, r) }
        yield Algebra.union(lf, rf)

    case Diff(l, r) =>
      for { lf <- compile(spark, cat, l); rf <- compile(spark, cat, r) }
        yield Algebra.diff(lf, rf)

    case Sort(keys, src) =>
      compile(spark, cat, src).map { df =>
        val order = keys.map {
          case (a, Asc)  => col(s"`$a`").asc
          case (a, Desc) => col(s"`$a`").desc
        }
        df.orderBy(order: _*)
      }

    case Aggregate(groupBy, aggs, src) =>
      compile(spark, cat, src).map { df =>
        import org.apache.spark.sql.functions.{count, lit, sum, min, max, avg}
        val aggCols = aggs.map {
          case (AggFn.CountAll, alias) => count(lit(1)).as(alias)
          case (AggFn.Sum(a), alias)   => sum(col(s"`$a`")).as(alias)
          case (AggFn.Min(a), alias)   => min(col(s"`$a`")).as(alias)
          case (AggFn.Max(a), alias)   => max(col(s"`$a`")).as(alias)
          case (AggFn.Avg(a), alias)   => avg(col(s"`$a`")).as(alias)
        }
        if (groupBy.isEmpty) df.agg(aggCols.head, aggCols.tail: _*)
        else df.groupBy(groupBy.map(a => col(s"`$a`")): _*).agg(aggCols.head, aggCols.tail: _*)
      }

    case ThetaJoin(preds, l, r) =>
      for { lf <- compile(spark, cat, l); rf <- compile(spark, cat, r) }
        yield Algebra.thetaJoin(preds.map { case (op, a, b) =>
          (opFn(op), a, b)
        }, lf, rf)

    case Window(parts, order, fn, alias, src) =>
      if (parts.isEmpty)
        Left(graft.Err.GeneratorError(
          "Window needs a non-empty partition: an unpartitioned window " +
          "is a single-task global sort — use GlobalRank for whole-relation " +
          "ranking"))
      else compile(spark, cat, src).map { df =>
        import org.apache.spark.sql.expressions.{Window => W}
        import org.apache.spark.sql.functions.{lag, row_number, sum}
        val ord = order.map {
          case (a, Asc)  => col(s"`$a`").asc
          case (a, Desc) => col(s"`$a`").desc
        }
        val w = W.partitionBy(parts.map(a => col(s"`$a`")): _*).orderBy(ord: _*)
        val c = fn match {
          case WinFn.RowNumber => row_number().over(w)
          case WinFn.RunningSum(a) => sum(col(s"`$a`"))
            .over(w.rowsBetween(W.unboundedPreceding, W.currentRow))
          case WinFn.Lag(a) => lag(col(s"`$a`"), 1).over(w)
        }
        df.withColumn(alias, c)
      }

    case Take(n, src) =>
      virtualScanBase(src) match {
        // Take over a (possibly renamed/projected) virtual base: bounded
        // enumeration via the reference's deterministic generators —
        // the reference yields the first n generator tuples here
        // (lib/algebra.ml:305-322 over the standard.ml generators); a
        // predicate-only treatment would misreport it as unscannable.
        case Some(_) => compileVirtualTake(spark, n, src)
        case None    => compile(spark, cat, src).map(Algebra.take(n))
      }
  }

  /** The virtual relation at the base of a Rename/Project/Take chain, if
    * any — the shapes whose bounded enumeration we support. */
  private def virtualScanBase(q: Query): Option[VirtualRel] = q match {
    case Base(name)        => Virtual.relations.get(name)
    case Rename(_, inner)  => virtualScanBase(inner)
    case Project(_, inner) => virtualScanBase(inner)
    case Take(_, inner)    => virtualScanBase(inner)
    case _                 => None
  }

  /** Materialize the first n tuples of a virtual base in the reference's
    * enumeration order, then apply the surrounding Rename/Project/Take
    * chain. Only pure column-shaping nodes are admitted above the virtual
    * base — a Select/Join/Diff over an infinite enumeration could pull
    * unboundedly many tuples before yielding n results, which the
    * reference would also attempt unboundedly; we reject it instead with
    * an explicit message. */
  private def compileVirtualTake(spark: SparkSession, n: Int, q: Query): Either[graft.Err, DataFrame] = q match {
    case Base(name) =>
      val vr = Virtual.relations(name)
      import org.apache.spark.sql.types._
      val schema = StructType(vr.attrs.map(a => StructField(a, LongType)))
      val rows = vr.enumerate(n).map(t => org.apache.spark.sql.Row.fromSeq(vr.attrs.map(t)))
      Right(spark.createDataFrame(java.util.Arrays.asList(rows: _*), schema))
    case Rename(pairs, inner)  => compileVirtualTake(spark, n, inner).map(Algebra.rename(pairs))
    case Project(attrs, inner) => compileVirtualTake(spark, n, inner).map(Algebra.project(attrs))
    case Take(m, inner)        => compileVirtualTake(spark, math.min(n, m), inner).map(Algebra.take(m))
    case other => Left(graft.Err.GeneratorError(
      s"Take over a virtual relation only supports Rename/Project/Take above the base " +
      s"(got ${other.getClass.getSimpleName}); bound the finite side instead"))
  }

  private def opFn(op: Query.CmpOp): (org.apache.spark.sql.Column, org.apache.spark.sql.Column) => org.apache.spark.sql.Column =
    op match {
      case Query.CmpOp.Lt  => _ < _
      case Query.CmpOp.Lte => _ <= _
      case Query.CmpOp.Gt  => _ > _
      case Query.CmpOp.Gte => _ >= _
      case Query.CmpOp.Eq  => _ === _
      case Query.CmpOp.Neq => _ =!= _
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

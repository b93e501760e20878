package graft.core

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.types.Value

/** The relational-algebra core, re-expressed as DataFrame combinators.
  *
  * Each combinator reproduces the reference's *semantics* (reference
  * lib/algebra.ml, 334 LoC) while delegating the *algorithm* to Catalyst —
  * e.g. the reference's equijoin drains the right side and nested-loops the
  * left (lib/algebra.ml:172-235); here Spark picks broadcast / shuffled-hash
  * / sort-merge join, which is what survives at 100 TB.
  *
  * Semantics pinned by the reference and preserved exactly:
  *  - equijoin keeps the LEFT value on any non-join attribute-name
  *    collision and drops the right one (lib/algebra.ml:190-204);
  *  - union is BAG union — left stream then right stream, no dedup, left
  *    schema (lib/algebra.ml:248-262);
  *  - diff streams left and keeps tuples not attribute-equal to any right
  *    tuple — left duplicates survive (lib/algebra.ml:270-303);
  *  - select is a semijoin on common attributes projected back to source
  *    attributes (lib/drl/executor.ml:35-49), NOT a WHERE clause.
  */
object Algebra {

  /** σ by arbitrary predicate — reference `select_fn` (lib/algebra.ml:66-83)
    * filters by an opaque OCaml closure; the Spark-native equivalent is a
    * Column predicate, which stays inside codegen. */
  def selectFn(pred: Column)(df: DataFrame): DataFrame = df.filter(pred)

  /** Spread a narrow-partitioned input across the cluster before
    * map-heavy stages: a single-file parquet scan (or a broadcast-join
    * output inheriting it) is ONE partition, which would run a whole
    * hash/shingle pipeline on one core. Inputs at or above default
    * parallelism — any real corpus — keep their natural partitioning (no
    * shuffle). THE single balance helper (engine bulk paths and the
    * pipeline operators both use it, so the heuristic cannot drift). */
  def balanced(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }

  /** π — keep the listed attributes, in the listed order
    * (lib/algebra.ml:85-129). Bag semantics: no dedup. */
  def project(attrs: Seq[String])(df: DataFrame): DataFrame =
    df.select(attrs.map(col): _*)

  /** ρ — rename by (old, new) pairs (lib/algebra.ml:131-170). */
  def rename(pairs: Seq[(String, String)])(df: DataFrame): DataFrame =
    df.withColumnsRenamed(pairs.toMap)

  /** ⋈ — equijoin on the named attributes (lib/algebra.ml:172-246).
    *
    * Result schema = left schema ++ (right attributes not in the join list
    * and not colliding with a left attribute). On collision the LEFT value
    * wins (AttributeMap.union keeping left, lib/algebra.ml:190-195) — the
    * right-side colliding column is never observable, so we drop it from
    * the right input before the join (identical semantics, and it prunes
    * the column from the right-side scan).
    */
  def equijoin(attrs: Seq[String], left: DataFrame, right: DataFrame): DataFrame = {
    if (attrs.isEmpty) return cartesian(left, right)
    val leftCols = left.columns.toSet
    val collisions = right.columns.filter(c => !attrs.contains(c) && leftCols.contains(c))
    val rightPruned = if (collisions.isEmpty) right else right.drop(collisions.toIndexedSeq: _*)
    // Spark's USING join emits the join columns first; the reference's
    // merged schema preserves left order then appends the right remainder
    // (lib/algebra.ml:198-204) and that order is observable on the wire
    // (lib/listener.ml:113) — re-select the documented order.
    val outOrder = left.columns ++ rightPruned.columns.filterNot(c => attrs.contains(c))
    left.join(rightPruned, attrs, "inner").select(outOrder.toIndexedSeq.map(c => col(s"`$c`")): _*)
  }

  /** × — cross product; the reference routes Cartesian through
    * `equijoin storage [] r1 r2` (lib/drl/executor.ml:59-63). Right-side
    * colliding columns are dropped, as in equijoin. */
  def cartesian(left: DataFrame, right: DataFrame): DataFrame = {
    val leftCols = left.columns.toSet
    val collisions = right.columns.filter(leftCols.contains)
    val rightPruned = if (collisions.isEmpty) right else right.drop(collisions.toIndexedSeq: _*)
    left.crossJoin(rightPruned)
  }

  /** DRL Select: source rows that agree with `filter` on their common
    * attributes, projected back to source attributes — implemented in the
    * reference as project(source_attrs, equijoin(common, source, filter))
    * (lib/drl/executor.ml:35-49). We reproduce that composition literally:
    * an inner join (bag semantics — a filter relation with duplicate
    * common-attr tuples multiplies matching source rows, exactly as the
    * reference's nested-loop does) projected back to the source schema.
    * With no common attributes the reference's equijoin degenerates to a
    * cartesian product: each source row is multiplied by |filter| rows
    * (so it survives — once per filter row — iff filter is non-empty).
    * Catalyst folds the Const-filter case to a plain pushed-down predicate.
    */
  def select(filter: DataFrame, source: DataFrame): DataFrame = {
    val common = source.columns.filter(filter.columns.contains).toSeq
    val joined = equijoin(common, source, filter.select(common.map(col): _*))
    joined.select(source.columns.toIndexedSeq.map(col): _*)
  }

  /** ∪ — bag union, left schema; right columns aligned by name
    * (lib/algebra.ml:248-262 streams left then right with no dedup). */
  def union(left: DataFrame, right: DataFrame): DataFrame =
    left.unionAll(right.select(left.columns.toIndexedSeq.map(col): _*))

  /** − — left tuples not attribute-equal to any right tuple; left
    * duplicates preserved (lib/algebra.ml:270-303). Null-safe: a null
    * attribute compares equal to null, matching structural tuple
    * equality.
    *
    * Scale formulation: when every column is hashable, both sides fold
    * to a single 256-bit content digest and the anti-join keys on THAT —
    * a 32-byte shuffle key regardless of row width (the same identity
    * the engine's storage layer uses). Rows with nulls get an explicit
    * null tag in the digest so null = null still matches. Schemas with
    * exotic types fall back to the all-column null-safe condition. */
  def diff(left: DataFrame, right: DataFrame): DataFrame = {
    // The reference compares full attribute maps (attrs_equal,
    // lib/algebra.ml:265-270): a right relation whose attribute set differs
    // from the left's removes nothing. Mirror that instead of failing or
    // over-matching on a projected right side.
    if (left.columns.toSet != right.columns.toSet || left.columns.isEmpty) return left
    val aligned = right.select(left.columns.toIndexedSeq.map(c => col(s"`$c`")): _*)
    // the digest encodes per LEFT schema types — same-named columns of
    // differing types would render/cast differently on the right side, so
    // type skew keeps the coercing null-safe conjunction path
    val typesAgree = left.schema.fields.map(_.dataType).toSeq ==
      aligned.schema.fields.map(_.dataType).toSeq
    nullAwareRowDigest(left.schema) match {
      case Some(digest) if typesAgree =>
        val key = "__graft_diff_rh"
        left.withColumn(key, digest)
          .join(aligned.select(digest.as(key)), Seq(key), "left_anti")
          .drop(key)
      case _ =>
        val l = left.alias("l")
        val r = aligned.alias("r")
        val cond = left.columns.map(c => col(s"l.`$c`") <=> col(s"r.`$c`")).reduce(_ && _)
        l.join(r, cond, "left_anti")
    }
  }

  /** Null-aware content digest over a full row: the canonical
    * name:tag:len:value encoding (graft.hashing) with a dedicated null
    * tag, sha-256'd. None when a column type has no canonical encoding. */
  private def nullAwareRowDigest(schema: StructType): Option[Column] = {
    val tags = schema.fields.map { f =>
      f.dataType match {
        case LongType | IntegerType | ShortType | ByteType => Some("i")
        case DoubleType | FloatType => Some("f")
        case StringType => Some("s")
        case BooleanType => Some("b")
        case _ => None
      }
    }
    if (tags.exists(_.isEmpty)) None
    else Some {
      val parts = schema.fields.sortBy(_.name).zipWithIndex.flatMap { case (f, i) =>
        val tag = f.dataType match {
          case LongType | IntegerType | ShortType | ByteType => "i"
          case DoubleType | FloatType => "f"
          case StringType => "s"
          case BooleanType => "b"
          case other => throw new IllegalStateException(s"unreachable: $other")
        }
        val repr = f.dataType match {
          case IntegerType | ShortType | ByteType => col(s"`${f.name}`").cast(LongType).cast(StringType)
          case FloatType => col(s"`${f.name}`").cast(DoubleType).cast(StringType)
          case _ => col(s"`${f.name}`").cast(StringType)
        }
        val piece = when(col(s"`${f.name}`").isNull, lit(s"${f.name}:n"))
          .otherwise(concat(lit(s"${f.name}:$tag:"),
            octet_length(repr).cast(StringType), lit(":"), repr))
        if (i == 0) Seq(piece) else Seq(lit(";"), piece)
      }
      sha2(concat(parts.toIndexedSeq: _*), 256)
    }
  }

  /** τ — first n tuples (lib/algebra.ml:305-322). Spark pushes the limit
    * into the scan. */
  def take(n: Int)(df: DataFrame): DataFrame = df.limit(n)

  /** θ-join: inner join under a conjunction of (op, leftAttr, rightAttr)
    * comparisons (the extension surface of the reference's unconstructed
    * Lineage.ThetaJoin, lib/relation.ml:25-28). Output schema follows the
    * equijoin convention: left columns, then right columns that do not
    * collide with a left name (left wins). Catalyst picks the physical
    * strategy — a pure-inequality θ-join is a broadcast nested loop when
    * one side is small; mixed predicates with an equality become hash
    * joins on the equality with the inequalities as residuals. */
  def thetaJoin(preds: Seq[((Column, Column) => Column, String, String)],
      left: DataFrame, right: DataFrame): DataFrame = {
    val l = left.alias("l")
    val r = right.alias("r")
    val cond = preds.map { case (op, a, b) => op(col(s"l.`$a`"), col(s"r.`$b`")) }.reduce(_ && _)
    val keep = right.columns.filterNot(left.columns.contains)
    l.join(r, cond, "inner")
      .select(left.columns.toIndexedSeq.map(c => col(s"l.`$c`")) ++
        keep.toIndexedSeq.map(c => col(s"r.`$c`")): _*)
  }

  /** Single-tuple literal relation (lib/algebra.ml:51-62). */
  def constRelation(spark: SparkSession, attrs: Seq[(String, Value)]): DataFrame = {
    val schema = StructType(attrs.map { case (a, v) => StructField(a, v.sparkType) })
    val row = Row.fromSeq(attrs.map(_._2.any))
    spark.createDataFrame(java.util.List.of(row), schema)
  }

  /** Drain to the driver — reference `materialize` (lib/algebra.ml:324-331).
    * Driver-side by design; use only for protocol edges and tests. */
  def materialize(df: DataFrame): Seq[Row] = df.collect().toIndexedSeq
}

package graft.engine

import scala.collection.immutable.{ListMap, VectorMap}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.hashing.Hashing
import graft.hashing.Hashing.ContentRoot
import graft.icl.Body
import graft.types.{Domain, RelSchema, Value}

/** How a stored relation's extension is held — the engine's analogue of
  * Spark's broadcast-threshold decision, chosen per relation by size:
  *
  *  - [[Extension.Local]]: a driver-resident insertion-ordered
  *    row-hash → row map. Single-tuple protocol ops (insert/delete/
  *    duplicate check), constraint membership checks, and DCL diff/merge
  *    become O(1)/O(n) driver operations with ZERO Spark jobs — the same
  *    regime the reference's in-memory backend lives in permanently. As a
  *    DataFrame it is a LocalTableScan, which Catalyst broadcasts freely.
  *  - [[Extension.Dist]]: a lazy DataFrame plan. Everything stays set-wise
  *    (anti-joins, aggregations) — the only formulation that survives when
  *    a bulk insert pulls 10^9 rows from parquet.
  *
  * A relation is promoted Local→Dist the moment a bulk operation would
  * push it past [[Engine.LocalThreshold]] rows; it never demotes.
  */
sealed trait Extension
object Extension {
  final case class Local(rows: VectorMap[String, Row]) extends Extension
  final case class Dist(df: DataFrame) extends Extension
  val emptyLocal: Local = Local(VectorMap.empty)
}

/** A stored relation: declared schema + current extension + incremental
  * content root + named constraints (reference lib/relation.ml:31-42).
  * The extension holds exactly the declared columns; stored relations are
  * genuine sets (duplicate inserts are rejected) and never contain nulls.
  */
final case class StoredRelation(
    name: String,
    schema: RelSchema,
    struct: StructType,
    ext: Extension,
    root: ContentRoot,
    constraints: ListMap[String, Body] = ListMap.empty) {
  def relHash: String = Hashing.relationHash(name, schema, root)
  def rowHash: Column = Hashing.rowHashCol(name, struct)
  def cardinality: Long = root.count

  /** The extension as a DataFrame (a LocalTableScan for Local relations —
    * cheap to build, broadcastable by Catalyst). */
  def df: DataFrame = ext match {
    case Extension.Local(rows) =>
      SparkSession.active.createDataFrame(rows.values.toSeq.asJava, struct)
    case Extension.Dist(d) => d
  }

  def localRows: Option[VectorMap[String, Row]] = ext match {
    case Extension.Local(rows) => Some(rows)
    case _                     => None
  }
}

final case class DeferredEntry(constraintName: String, relationName: String, body: Body)

/** Immutable database state (reference lib/management/database.ml:17-26):
  * relations, domains, bounded history of prior state hashes, deferred
  * constraint queue, and the state hash itself. Every mutation returns a
  * NEW Database — append-only, which is what makes branches and
  * time-travel (DCL) cheap: a snapshot is just a reference. */
final case class Database(
    name: String,
    relations: ListMap[String, StoredRelation],
    domains: Map[String, Domain],
    history: List[String],
    deferred: List[DeferredEntry],
    hash: String) {
  def relation(name: String): Either[String, StoredRelation] =
    relations.get(name).toRight(s"RelationNotFound: $name")
}

/** The manipulation layer (reference lib/manipulation.ml): relation and
  * tuple lifecycle with full validation, plus system-catalog maintenance.
  *
  * Scale design: single-tuple protocol ops (InsertTuple/DeleteTuple) cost
  * one filtered scan of the target relation (attribute-equality predicates,
  * so parquet-backed relations get pushdown); bulk ops (InsertFrom, Assign,
  * DeleteWhere) are set-wise DataFrame jobs — duplicate detection via
  * aggregation/join, deletion via anti-join — never a per-row driver loop.
  * The reference materializes query results and folds row-by-row
  * (lib/dml/executor.ml:79-126); the outcome is identical because any
  * per-row failure aborts the whole statement there too.
  */
object Engine {

  /** Row count above which a relation's extension graduates from a
    * driver-local map to a distributed DataFrame plan (see [[Extension]]).
    * Analogous to spark.sql.autoBroadcastJoinThreshold: ~10^5 rows of
    * protocol-sized tuples is a few MB of driver heap, far below what a
    * broadcast would ship anyway. */
  val LocalThreshold = 100000

  // ---- schema / value admission (reference build_membership_criteria,
  // lib/manipulation.ml:20-33: integer/natural/string enforced, anything
  // else admitted; we also type-check against the domain's Spark type) ----

  def admits(domain: Domain, v: Value): Boolean = (domain.name, v) match {
    case ("integer", Value.IntV(_))  => true
    case ("integer", _)              => false
    case ("natural", Value.IntV(i))  => i >= 0
    case ("natural", _)              => false
    case ("string", Value.StrV(_))   => true
    case ("string", _)               => false
    case _ => domain.sparkType match {
      case LongType    => v.isInstanceOf[Value.IntV]
      case DoubleType  => v.isInstanceOf[Value.FloatV] || v.isInstanceOf[Value.IntV]
      case StringType  => v.isInstanceOf[Value.StrV]
      case BooleanType => v.isInstanceOf[Value.BoolV]
      case _           => true
    }
  }

  /** Validate the attribute set against the schema and coerce values to
    * their declared domains, returning them in schema order. */
  def coerce(db: Database, rel: StoredRelation, attrs: Seq[(String, Value)])
      : Either[String, List[(String, Value)]] = {
    val given = attrs.toMap
    if (attrs.size != given.size)
      Left(s"ConstraintViolation: duplicate attribute in tuple for ${rel.name}")
    else if (given.keySet != rel.schema.attrNames.toSet)
      Left("ConstraintViolation: Tuple does not satisfy membership criteria " +
        s"(expected attributes ${rel.schema.attrNames.mkString(",")})")
    else {
      val out = rel.schema.attrs.map { case (a, domName) =>
        val dom = db.domains.getOrElse(domName, Domain(domName, StringType, graft.types.Cardinality.ConstrainedFinite))
        val v = given(a)
        if (!admits(dom, v)) return Left(
          s"ConstraintViolation: Tuple does not satisfy membership criteria ($a is not a $domName)")
        val coerced = (dom.sparkType, v) match {
          case (DoubleType, Value.IntV(i)) => Value.FloatV(i.toDouble)
          case _ => v
        }
        a -> coerced
      }
      Right(out)
    }
  }

  private def rowOf(coerced: Seq[(String, Value)]): Row = Row.fromSeq(coerced.map(_._2.any))

  private def eqPredicate(coerced: Seq[(String, Value)]): Column =
    coerced.map { case (a, v) => col(s"`$a`") === v.lit }.reduce(_ && _)

  private[graft] def updateState(db: Database, relations: ListMap[String, StoredRelation]): Database = {
    val newHash = Hashing.databaseHash(db.name, relations.values.map(_.relHash))
    val history =
      if (db.hash.isEmpty) db.history
      else (db.hash :: db.history).take(128) // reference max_history (database.ml:45)
    db.copy(relations = relations, history = history, hash = newHash)
  }

  private def updateRelation(db: Database, rel: StoredRelation): Database =
    updateState(db, db.relations.updated(rel.name, rel))

  // ---- tuple lifecycle (reference lib/manipulation.ml:524-614) ----

  /** Insert one tuple: membership criteria → named constraints →
    * duplicate rejection → new state → cascade recheck. On a Local
    * relation the duplicate check is an O(1) driver map probe — no Spark
    * job; on a Dist relation it is one filtered scan with attribute
    * predicates pushed to the source. */
  def createTuple(spark: SparkSession, db: Database, relName: String,
      attrs: Seq[(String, Value)]): Either[String, Database] =
    for {
      rel <- db.relation(relName)
      coerced <- coerce(db, rel, attrs)
      _ <- graft.icl.Runtime.validateInsert(spark, db, rel, coerced)
      h = Hashing.tupleHash(relName, coerced)
      newExt <- rel.ext match {
        case Extension.Local(rows) =>
          if (rows.contains(h)) Left(s"DuplicateTuple: $h")
          else Right(Extension.Local(rows.updated(h, rowOf(coerced))))
        case Extension.Dist(d) =>
          if (rel.root.count > 0 && !d.filter(eqPredicate(coerced)).isEmpty)
            Left(s"DuplicateTuple: $h")
          else Right(Extension.Dist(
            d.unionAll(spark.createDataFrame(java.util.List.of(rowOf(coerced)), rel.struct))))
      }
      newRel = rel.copy(ext = newExt, root = rel.root.add(h))
      newDb = updateRelation(db, newRel)
      _ <- cascadeIfNeeded(spark, newDb, relName, coerced, "insert")
    } yield newDb

  /** Cascade re-check, skipped entirely when no relation carries
    * constraints (the common case costs nothing). */
  private def cascadeIfNeeded(spark: SparkSession, db: Database, relName: String,
      transition: Seq[(String, Value)], kind: String): Either[String, Unit] =
    if (db.relations.valuesIterator.forall(_.constraints.isEmpty)) Right(())
    else graft.icl.Runtime.cascade(spark, db, relName, transition, kind)

  /** Sequential fold — each insert sees the prior state; any failure
    * aborts the whole statement (reference lib/manipulation.ml:565-576). */
  def createTuples(spark: SparkSession, db: Database, relName: String,
      tuples: Seq[Seq[(String, Value)]]): Either[String, Database] =
    tuples.foldLeft(Right(db): Either[String, Database]) { (acc, t) =>
      acc.flatMap(createTuple(spark, _, relName, t))
    }

  /** Remove one tuple identified by its full attribute set
    * (reference retract_tuple, lib/manipulation.ml:579-614). */
  def retractTuple(spark: SparkSession, db: Database, relName: String,
      attrs: Seq[(String, Value)]): Either[String, Database] =
    for {
      rel <- db.relation(relName)
      coerced <- coerce(db, rel, attrs)
      h = Hashing.tupleHash(relName, coerced)
      newExt <- rel.ext match {
        case Extension.Local(rows) =>
          if (!rows.contains(h)) Left(s"TupleNotFound: $h")
          else Right(Extension.Local(rows.removed(h)))
        case Extension.Dist(d) =>
          if (rel.root.count == 0 || d.filter(eqPredicate(coerced)).isEmpty)
            Left(s"TupleNotFound: $h")
          else Right(Extension.Dist(d.filter(!eqPredicate(coerced))))
      }
      newRel = rel.copy(ext = newExt, root = rel.root.remove(h))
      newDb = updateRelation(db, newRel)
      _ <- cascadeIfNeeded(spark, newDb, relName, coerced, "delete")
    } yield newDb

  // ---- bulk paths (set-wise; scale-safe) ----

  /** Conform a query result to the relation's declared schema: exact
    * attribute set, columns cast to domain types, no nulls. */
  private def conform(rel: StoredRelation, src: DataFrame): Either[String, DataFrame] = {
    if (src.columns.toSet != rel.schema.attrNames.toSet)
      Left("ConstraintViolation: result does not satisfy membership criteria " +
        s"(expected attributes ${rel.schema.attrNames.mkString(",")}, got ${src.columns.mkString(",")})")
    else {
      val cast = src.select(rel.struct.fields.toIndexedSeq.map(f =>
        col(s"`${f.name}`").cast(f.dataType).as(f.name)): _*)
      Right(cast)
    }
  }

  /** Set-wise validation mirroring per-row membership criteria: no nulls,
    * domain checks (natural ≥ 0, user-domain predicates). */
  private def bulkValidate(db: Database, rel: StoredRelation, src: DataFrame): Either[String, Unit] = {
    val checks: Seq[Column] = rel.schema.attrs.flatMap { case (a, domName) =>
      val base = col(s"`$a`").isNull
      val domViol = db.domains.get(domName).flatMap(_.check).map(chk => !chk(col(s"`$a`")))
      Seq(base) ++ domViol.toSeq
    }
    val bad = src.filter(checks.reduce(_ || _)).limit(1)
    if (bad.isEmpty) Right(())
    else Left("ConstraintViolation: result does not satisfy membership criteria")
  }

  /** Driver-side membership criteria for one collected row: no nulls,
    * every value admitted by its declared domain (the per-row mirror of
    * [[bulkValidate]]). Returns the coerced attribute list. */
  private def validateLocalRow(db: Database, rel: StoredRelation, r: Row)
      : Either[String, Seq[(String, Value)]] = {
    var i = 0
    while (i < rel.struct.fields.length) {
      if (r.isNullAt(i)) return Left(
        "ConstraintViolation: result does not satisfy membership criteria " +
          s"(${rel.struct.fields(i).name} is null)")
      i += 1
    }
    val attrs = rowToAttrs(rel, r)
    attrs.find { case (a, v) =>
      val domName = rel.schema.attrs.find(_._1 == a).map(_._2).getOrElse("string")
      db.domains.get(domName).exists(d => !admits(d, v))
    } match {
      case Some((a, _)) => Left(
        s"ConstraintViolation: result does not satisfy membership criteria ($a)")
      case None => Right(attrs)
    }
  }

  /** Bulk insert of a query result (reference InsertFrom semantics:
    * sequential create_tuples over the materialized result,
    * lib/dml/executor.ml:89-97 — same outcome set-wise because any
    * duplicate or violation aborts the statement). Falls back to the
    * sequential path when the relation carries constraints, preserving
    * row-at-a-time constraint visibility.
    *
    * Size dispatch: the result is probed with a LocalThreshold+1-row
    * collect (one job). A small result is validated, hashed, and
    * dup-checked entirely driver-side; a large one takes the set-wise
    * DataFrame path (aggregation dup-check, anti-join clash check, one
    * distributed content-root aggregation) and promotes the relation to a
    * Dist extension. */
  def insertFrom(spark: SparkSession, db: Database, relName: String,
      src: DataFrame): Either[String, Database] =
    for {
      rel <- db.relation(relName)
      conformed <- conform(rel, src)
      db2 <-
        if (rel.constraints.nonEmpty)
          createTuples(spark, db, relName,
            conformed.collect().toSeq.map(r => rowToAttrs(rel, r)))
        else {
          val probe = conformed.limit(LocalThreshold + 1).collect()
          if (probe.length <= LocalThreshold) insertRowsLocal(db, rel, probe.toSeq)
          else insertFromDist(spark, db, rel, conformed)
        }
    } yield db2

  /** Small-result insert: all validation/hashing/dup-checking on the
    * driver; zero additional Spark jobs. */
  private def insertRowsLocal(db: Database, rel: StoredRelation, rows: Seq[Row])
      : Either[String, Database] = {
    val hashed = new scala.collection.mutable.LinkedHashMap[String, Row]()
    for (r <- rows) {
      validateLocalRow(db, rel, r) match {
        case Left(e) => return Left(e)
        case Right(attrs) =>
          val h = Hashing.tupleHash(rel.name, attrs)
          if (hashed.contains(h))
            return Left("DuplicateTuple: duplicate row in inserted result")
          hashed(h) = r
      }
    }
    rel.ext match {
      case Extension.Local(existing) =>
        hashed.keysIterator.find(existing.contains) match {
          case Some(_) => Left("DuplicateTuple: row already present")
          case None =>
            val merged = hashed.foldLeft(existing) { case (m, (h, r)) => m.updated(h, r) }
            val root = hashed.keysIterator.foldLeft(rel.root)(_.add(_))
            if (merged.size > LocalThreshold) {
              // crossed the threshold: graduate to a distributed plan
              val df = SparkSession.active.createDataFrame(merged.values.toSeq.asJava, rel.struct)
              Right(updateRelation(db, rel.copy(ext = Extension.Dist(df), root = root)))
            } else
              Right(updateRelation(db, rel.copy(ext = Extension.Local(merged), root = root)))
        }
      case Extension.Dist(d) =>
        // small batch into a large relation: one anti-join clash probe
        val batchDf = SparkSession.active.createDataFrame(rows.asJava, rel.struct)
        val clash = batchDf.join(d,
          rel.schema.attrNames.map(a => batchDf(a) <=> d(a)).reduce(_ && _), "left_semi").limit(1)
        if (!clash.isEmpty) Left("DuplicateTuple: row already present")
        else {
          val root = hashed.keysIterator.foldLeft(rel.root)(_.add(_))
          Right(updateRelation(db, rel.copy(ext = Extension.Dist(d.unionAll(batchDf)), root = root)))
        }
    }
  }

  /** Large-result insert: set-wise validation and dup-checks, one
    * distributed content-root aggregation. */
  private def insertFromDist(spark: SparkSession, db: Database, rel: StoredRelation,
      conformed: DataFrame): Either[String, Database] =
    for {
      _ <- bulkValidate(db, rel, conformed)
      hashed = conformed.withColumn("__rh", rel.rowHash)
      _ <- {
        val dupIn = hashed.groupBy(col("__rh")).count().filter(col("count") > 1).limit(1)
        if (dupIn.isEmpty) Right(()) else Left("DuplicateTuple: duplicate row in inserted result")
      }
      _ <- {
        if (rel.root.count == 0) Right(())
        else {
          val cur = rel.df
          val clash = conformed.join(cur, rel.schema.attrNames.map(a => conformed(a) <=> cur(a)).reduce(_ && _), "left_semi").limit(1)
          if (clash.isEmpty) Right(()) else Left("DuplicateTuple: row already present")
        }
      }
      srcRoot = Hashing.contentRootOf(conformed, rel.rowHash)
      newRel = rel.copy(ext = Extension.Dist(rel.df.unionAll(conformed)), root = rel.root.merge(srcRoot))
    } yield updateRelation(db, newRel)

  private[graft] def rowToAttrs(rel: StoredRelation, r: Row): Seq[(String, Value)] =
    rel.struct.fields.toIndexedSeq.zipWithIndex.map { case (f, i) =>
      val v: Value = f.dataType match {
        case LongType    => Value.IntV(r.getLong(i))
        case DoubleType  => Value.FloatV(r.getDouble(i))
        case StringType  => Value.StrV(r.getString(i))
        case BooleanType => Value.BoolV(r.getBoolean(i))
        case other       => throw new IllegalArgumentException(s"unsupported type $other")
      }
      f.name -> v
    }

  /** Delete all target rows that semijoin-match the predicate relation on
    * their common attributes (reference DeleteWhere,
    * lib/dml/executor.ml:98-126). Set-wise: the matched row-set is
    * removed via anti-join; the reference retracts row-by-row. A Local
    * relation collects the (rel-bounded) match set in one job and
    * subtracts it driver-side; a Dist relation keeps the anti-join plan
    * plus one content-root aggregation. */
  def deleteWhere(spark: SparkSession, db: Database, relName: String,
      pred: DataFrame): Either[String, Database] =
    for {
      rel <- db.relation(relName)
      common = rel.schema.attrNames.filter(pred.columns.contains)
      toDelete = graft.core.Algebra.project(rel.schema.attrNames)(
        graft.core.Algebra.equijoin(common, rel.df, pred)).distinct()
      res <- rel.ext match {
        case Extension.Local(rows) =>
          val removed = toDelete.collect().toSeq // subset of rel's own rows
          val keys = removed.map(r => Hashing.tupleHash(rel.name, rowToAttrs(rel, r)))
            .filter(rows.contains)
          val root = keys.foldLeft(rel.root)(_.remove(_))
          Right((rel.copy(ext = Extension.Local(rows.removedAll(keys)), root = root), removed))
        case Extension.Dist(d) =>
          val delRoot = Hashing.contentRootOf(toDelete, rel.rowHash)
          Right((rel.copy(ext = Extension.Dist(graft.core.Algebra.diff(d, toDelete)),
            root = rel.root.subtract(delRoot)), Seq.empty[Row]))
      }
      (newRel, removedRows) = res
      newDb = updateRelation(db, newRel)
      _ <- cascadeAll(spark, newDb, relName, removedRows, toDelete, rel)
    } yield newDb

  /** Run the delete cascade for each removed row (no-op when no relation
    * carries constraints). `removedRows` is pre-collected on the Local
    * path; the Dist path collects only when a constraint actually cares. */
  private def cascadeAll(spark: SparkSession, db: Database, relName: String,
      removedRows: Seq[Row], removedDf: DataFrame, rel: StoredRelation): Either[String, Unit] = {
    val anyConstraintCares = db.relations.values.exists(_.constraints.nonEmpty)
    if (!anyConstraintCares) Right(())
    else {
      val rows = if (removedRows.nonEmpty) removedRows else removedDf.collect().toSeq
      rows.foldLeft(Right(()): Either[String, Unit]) { (acc, r) =>
        acc.flatMap(_ => graft.icl.Runtime.cascade(spark, db, relName, rowToAttrs(rel, r), "delete"))
      }
    }
  }

  /** `:=` — evaluate, clear target, replace contents
    * (reference lib/dml/executor.ml:79-88). */
  def assign(spark: SparkSession, db: Database, relName: String,
      src: DataFrame): Either[String, Database] =
    for {
      db2 <- clearRelation(spark, db, relName)
      db3 <- insertFrom(spark, db2, relName, src)
    } yield db3

  // ---- relation lifecycle + system catalog (reference
  // lib/manipulation.ml:622-879, lib/prelude/catalog.ml) ----

  val CatalogPrefix = "sakura:"
  val CatalogNames: List[String] = List(
    "sakura:relation", "sakura:domain", "sakura:attribute",
    "sakura:constraint", "sakura:on", "sakura:timing")
  def isCatalog(name: String): Boolean = CatalogNames.contains(name)

  private val catalogSchemas: Map[String, RelSchema] = Map(
    "sakura:relation"   -> RelSchema(List("name" -> "string")),
    "sakura:domain"     -> RelSchema(List("name" -> "string")),
    "sakura:attribute"  -> RelSchema(List("relation_name" -> "string", "attr_name" -> "string", "domain_name" -> "string")),
    "sakura:constraint" -> RelSchema(List("name" -> "string", "relation_name" -> "string")),
    "sakura:on"         -> RelSchema(List("event" -> "string")),
    "sakura:timing"     -> RelSchema(List("timing" -> "string")),
  )

  private def structOf(db: Database, schema: RelSchema): Either[String, StructType] =
    schema.toStruct(db.domains)

  /** Create a relation WITHOUT catalog maintenance (bootstrap / catalog
    * relations themselves). */
  private def createRelationRaw(spark: SparkSession, db: Database, name: String,
      schema: RelSchema): Either[String, Database] =
    if (db.relations.contains(name)) Left(s"RelationAlreadyExists: $name")
    else structOf(db, schema).map { struct =>
      val rel = StoredRelation(name, schema, struct, Extension.emptyLocal, ContentRoot.empty)
      updateRelation(db, rel)
    }

  /** Driver-side seeding of known-distinct tuples (bootstrap only — no
    * Spark involvement at all). */
  private def seedRelation(spark: SparkSession, db: Database, name: String,
      tuples: Seq[Seq[(String, Value)]]): Database = {
    val rel = db.relations(name)
    val existing = rel.localRows.getOrElse(
      throw new IllegalStateException(s"seedRelation on non-local $name"))
    val merged = tuples.foldLeft((existing, rel.root)) { case ((m, r), t) =>
      val coerced = coerce(db, rel, t).fold(e => throw new IllegalStateException(e), identity)
      val h = Hashing.tupleHash(name, coerced)
      (m.updated(h, rowOf(coerced)), r.add(h))
    }
    updateRelation(db, rel.copy(ext = Extension.Local(merged._1), root = merged._2))
  }

  /** Fresh database with the four prelude domains and the seeded system
    * catalog (reference create_database → init_catalog_relations,
    * lib/manipulation.ml:701-781). */
  def createDatabase(spark: SparkSession, name: String): Database = {
    var db = Database(name, ListMap.empty, Domain.prelude, Nil, Nil, "")
    for (cat <- CatalogNames)
      db = createRelationRaw(spark, db, cat, catalogSchemas(cat))
        .fold(e => throw new IllegalStateException(e), identity)
    db = seedRelation(spark, db, "sakura:relation",
      CatalogNames.map(n => Seq("name" -> Value.StrV(n))))
    db = seedRelation(spark, db, "sakura:attribute",
      CatalogNames.flatMap(n => catalogSchemas(n).attrs.map { case (a, d) =>
        Seq("relation_name" -> Value.StrV(n), "attr_name" -> Value.StrV(a), "domain_name" -> Value.StrV(d))
      }))
    db = seedRelation(spark, db, "sakura:on",
      List("insert", "update", "delete").map(e => Seq("event" -> Value.StrV(e))))
    db = seedRelation(spark, db, "sakura:timing",
      List("immediate", "deferred").map(t => Seq("timing" -> Value.StrV(t))))
    db = seedRelation(spark, db, "sakura:domain",
      List("integer", "natural", "rational", "string").map(d => Seq("name" -> Value.StrV(d))))
    db
  }

  /** Create a user relation + catalog maintenance (reference
    * create_relation, lib/manipulation.ml:792-812). Schema order: we keep
    * DECLARATION order (the reference's Schema.add prepends, so its stored
    * order is reversed — an artifact we do not reproduce). */
  def createRelation(spark: SparkSession, db: Database, name: String,
      schema: RelSchema): Either[String, Database] =
    for {
      db2 <- createRelationRaw(spark, db, name, schema)
      db3 <-
        if (isCatalog(name)) Right(db2)
        else for {
          a <- createTuple(spark, db2, "sakura:relation", Seq("name" -> Value.StrV(name)))
          b <- createTuples(spark, a, "sakura:attribute",
            schema.attrs.map { case (at, d) => Seq(
              "relation_name" -> Value.StrV(name),
              "attr_name" -> Value.StrV(at),
              "domain_name" -> Value.StrV(d)) })
        } yield b
    } yield db3

  /** Drop a relation + catalog cleanup (reference retract_relation,
    * lib/manipulation.ml:841-850). */
  def retractRelation(spark: SparkSession, db: Database, name: String): Either[String, Database] =
    for {
      rel <- db.relation(name)
      db2 = updateState(db, db.relations.removed(name))
      db3 <-
        if (isCatalog(name)) Right(db2)
        else {
          val dropName = retractTuple(spark, db2, "sakura:relation", Seq("name" -> Value.StrV(name)))
            .getOrElse(db2) // absent row is not an error (reference checks membership first)
          rel.schema.attrs.foldLeft(Right(dropName): Either[String, Database]) { case (acc, (at, d)) =>
            acc.map { cur =>
              retractTuple(spark, cur, "sakura:attribute", Seq(
                "relation_name" -> Value.StrV(name),
                "attr_name" -> Value.StrV(at),
                "domain_name" -> Value.StrV(d))).getOrElse(cur)
            }
          }
        }
    } yield db3

  /** Truncate a relation's extension; schema, constraints, and catalog
    * rows stay (reference clear_relation, lib/manipulation.ml:853-879). */
  def clearRelation(spark: SparkSession, db: Database, name: String): Either[String, Database] =
    db.relation(name).map { rel =>
      updateRelation(db, rel.copy(ext = Extension.emptyLocal, root = ContentRoot.empty))
    }

  /** Register a domain + catalog row (reference register_domain,
    * lib/manipulation.ml:757-767). */
  def registerDomain(spark: SparkSession, db: Database, domain: Domain): Either[String, Database] = {
    val db2 = db.copy(domains = db.domains.updated(domain.name, domain))
    createTuple(spark, db2, "sakura:domain", Seq("name" -> Value.StrV(domain.name)))
  }

  // ---- constraint registration + commit (reference
  // lib/manipulation.ml:883-937, 965-1027) ----

  /** Attach a named constraint to a relation (AND-merged on name
    * collision), record it in sakura:constraint, and — when Deferred —
    * queue it on the database's deferred list (cascade then skips it
    * until commit). */
  def registerConstraint(spark: SparkSession, db: Database, constraintName: String,
      relationName: String, body: Body,
      timing: graft.icl.Timing = graft.icl.Timing.Immediate): Either[String, Database] =
    for {
      rel <- db.relation(relationName)
      merged = graft.icl.Analysis.mergeNamed(rel.constraints.toSeq, Seq(constraintName -> body))
      db2 = updateRelation(db, rel.copy(constraints = ListMap(merged: _*)))
      // idempotent catalog row: re-registering a name AND-merges the body
      // but must not produce a duplicate sakura:constraint tuple
      db3 <- createTuple(spark, db2, "sakura:constraint", Seq(
        "name" -> Value.StrV(constraintName), "relation_name" -> Value.StrV(relationName)))
        .left.flatMap(e => if (e.startsWith("DuplicateTuple")) Right(db2) else Left(e))
      db4 = timing match {
        case graft.icl.Timing.Immediate => db3
        case graft.icl.Timing.Deferred =>
          db3.copy(deferred = DeferredEntry(constraintName, relationName, body) :: db3.deferred)
      }
    } yield db4

  /** Evaluate all deferred constraints against the current state; on
    * success clear the deferral window (reference commit,
    * lib/manipulation.ml:1016-1027). */
  def commit(spark: SparkSession, db: Database): Either[String, Database] =
    graft.icl.Runtime.checkDeferred(spark, db).map(_ => db.copy(deferred = Nil))
}

package graft.types

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Literal values admitted by the query/mutation surface.
  *
  * The reference wire surface admits exactly four literal types
  * (reference lib/drl/ast.ml:4: Int | Float | Str | Bool); internally it is
  * dynamically typed (Obj.t). We go statically typed: Long / Double /
  * String / Boolean, per SURVEY.md §1.2.
  */
sealed trait Value {
  /** JVM value as Spark sees it. */
  def any: Any
  /** Type tag used in canonical hash encodings so that 1 and "1" never
    * collide (SURVEY.md §7.4). */
  def tag: String
  def lit: Column = org.apache.spark.sql.functions.lit(any)
  def sparkType: DataType
  def renderSql: String
}
object Value {
  final case class IntV(v: Long) extends Value {
    def any = v; def tag = "i"; def sparkType = LongType; def renderSql = v.toString
  }
  final case class FloatV(v: Double) extends Value {
    def any = v; def tag = "f"; def sparkType = DoubleType; def renderSql = v.toString
  }
  final case class StrV(v: String) extends Value {
    def any = v; def tag = "s"; def sparkType = StringType
    def renderSql = "'" + v.replace("'", "''") + "'"
  }
  final case class BoolV(v: Boolean) extends Value {
    def any = v; def tag = "b"; def sparkType = BooleanType; def renderSql = v.toString
  }

  /** Parse the sexp literal form `(Int 18)` / `(Float 1.5)` / `(Str "x")` /
    * `(Bool true)`. */
  def fromSexp(s: graft.sexp.Sexp): Either[String, Value] = {
    import graft.sexp.Sexp._
    s match {
      case SList(List(Atom("Int"), Atom(n)))   => n.toLongOption.toRight(s"bad Int literal: $n").map(IntV)
      case SList(List(Atom("Float"), Atom(n))) => n.toDoubleOption.toRight(s"bad Float literal: $n").map(FloatV)
      case SList(List(Atom("Str"), Atom(v)))   => Right(StrV(v))
      case SList(List(Atom("Bool"), Atom(b)))  => b.toBooleanOption.toRight(s"bad Bool literal: $b").map(BoolV)
      case other => Left(s"expected literal (Int|Float|Str|Bool v), got ${other.render}")
    }
  }
}

/** Relation cardinality classes, mirroring the reference's finiteness
  * lattice consumed by the DRL gate (reference lib/drl/gate.ml:49-55,
  * proof/Drl.v:49-67). */
sealed trait Cardinality {
  /** Statically known finite? (Finite | ConstrainedFinite) */
  def isFinite: Boolean = this match {
    case Cardinality.Finite(_) | Cardinality.ConstrainedFinite => true
    case _ => false
  }
}
object Cardinality {
  final case class Finite(n: Long) extends Cardinality
  /** Finite by constraint though exact count unknown (e.g. any stored
    * parquet-backed relation). */
  case object ConstrainedFinite extends Cardinality
  /** Countably infinite — virtual relations (less_than, plus, ...). */
  case object AlephZero extends Cardinality
  /** Uncountably infinite — part of the DDL wire surface
    * (reference lib/conventions.ml:16, lib/ddl/ast.ml:6). */
  case object Continuum extends Cardinality
}

/** A named domain: Spark type + optional membership check.
  *
  * Mirrors reference lib/domain.ml:1-7 (name, generator, membership
  * predicate, cardinality, comparator). The generator/comparator collapse
  * into Spark machinery; what remains semantic is the type and the check
  * predicate (e.g. `natural` = Long + non-negativity).
  */
final case class Domain(
    name: String,
    sparkType: DataType,
    cardinality: Cardinality,
    check: Option[Column => Column] = None,
) {
  def admits(c: Column): Column = check.map(f => f(c)).getOrElse(org.apache.spark.sql.functions.lit(true))
}

object Domain {
  /** The four prelude domains (reference lib/prelude/domains.ml:23,47,75,105). */
  val integer: Domain = Domain("integer", LongType, Cardinality.AlephZero)
  val natural: Domain = Domain("natural", LongType, Cardinality.AlephZero, Some(c => c >= 0))
  /** rational → Double (SURVEY §1.2). Adjudication of the apparent
    * num/den-pair representation: in the reference, ATTRIBUTE VALUES of
    * the rational domain are floats — compared as float
    * (lib/prelude/domains.ml:101-102: `Obj.magic a : float`) and
    * rendered/hashed through the float tag (lib/conventions.ml:27-41).
    * The numerator/denominator pair schema belongs only to the domain's
    * enumeration GENERATOR (domains.ml:75-100), and system.ml:58-67
    * registers only the ten standard virtual relations — the rational
    * generator is never exposed as a queryable relation, so the pair
    * form is unreachable from every query/DML/hash surface. Double is
    * therefore the faithful mapping, pinned by the dml_rational_hash
    * oracle (DuckDB re-derives engine tuple hashes over rational
    * values) and EngineSpec's comparator cases. */
  val rational: Domain = Domain("rational", DoubleType, Cardinality.AlephZero)
  val string: Domain = Domain("string", StringType, Cardinality.AlephZero)
  val boolean: Domain = Domain("boolean", BooleanType, Cardinality.Finite(2))

  val prelude: Map[String, Domain] =
    List(integer, natural, rational, string).map(d => d.name -> d).toMap

  /** Map a domain name to a Spark type for schema declaration; unknown
    * names are treated as opaque strings is NOT done — caller must have
    * registered the domain. */
  def sparkTypeOf(registry: Map[String, Domain], name: String): Either[String, DataType] =
    registry.get(name).map(_.sparkType).toRight(s"unknown domain: $name")
}

/** A declared relation schema: ordered (attribute, domain-name) pairs,
  * mirroring reference lib/schema.ml:9. */
final case class RelSchema(attrs: List[(String, String)]) {
  def attrNames: List[String] = attrs.map(_._1)
  def toStruct(registry: Map[String, Domain]): Either[String, StructType] = {
    val fields = attrs.map { case (a, d) =>
      Domain.sparkTypeOf(registry, d).map(t => StructField(a, t))
    }
    val (errs, oks) = fields.partitionMap(identity)
    if (errs.nonEmpty) Left(errs.mkString("; ")) else Right(StructType(oks))
  }
  /** Canonical rendering hashed into the relation identity
    * (reference lib/hashing.ml:51-56 hashes name + schema string). */
  def canonical: String = attrs.map { case (a, d) => s"$a:$d" }.mkString(",")
}

package graft.ddl

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._
import graft.engine.{Database, Engine}
import graft.sexp.Sexp
import graft.sexp.Sexp.{Atom, SList}
import graft.types.{Cardinality, Domain, RelSchema}

/** DDL statements (reference lib/ddl/ast.ml:10-16). */
sealed trait Statement
object Statement {
  final case class CreateDatabase(name: String) extends Statement
  final case class CreateRelation(name: String, schema: RelSchema) extends Statement
  final case class RetractRelation(name: String) extends Statement
  final case class ClearRelation(name: String) extends Statement
  /** `base` is our one surface extension: the prelude domain whose Spark
    * type the new domain borrows (the reference is dynamically typed and
    * needs no such mapping; a typed engine does). Defaults to `string`. */
  final case class RegisterDomain(name: String, cardinality: Cardinality, base: String = "string") extends Statement
}

object Parser {
  import Statement._

  /** Statement-head atoms this grammar owns (see drl.Parser.heads). */
  val heads: Set[String] = Set("CreateDatabase", "CreateRelation",
    "RetractRelation", "ClearRelation", "RegisterDomain")

  def parse(input: String): Either[String, Statement] =
    Sexp.parse(input).flatMap(ofSexp)

  def ofSexp(s: Sexp): Either[String, Statement] = s match {
    case SList(Atom("ddl") :: st :: Nil) => ofSexp(st)
    case SList(List(Atom("CreateDatabase"), Atom(n))) => Right(CreateDatabase(n))
    case SList(Atom("CreateRelation") :: fields) =>
      val fm = fieldMap(fields)
      for {
        n <- name(fm, "name")
        sch <- fm.get("schema").toRight("missing field: schema").flatMap {
          case SList(pairs) => traverse(pairs) {
            case SList(List(Atom(a), Atom(d))) => Right(a -> d)
            case o => Left(s"bad schema entry: ${o.render}")
          }
          case o => Left(s"bad schema: ${o.render}")
        }
      } yield CreateRelation(n, RelSchema(sch))
    case SList(List(Atom("RetractRelation"), Atom(n))) => Right(RetractRelation(n))
    case SList(List(Atom("ClearRelation"), Atom(n))) => Right(ClearRelation(n))
    case SList(Atom("RegisterDomain") :: fields) =>
      val fm = fieldMap(fields)
      for {
        n <- name(fm, "name")
        c <- fm.get("cardinality").toRight("missing field: cardinality").flatMap(parseCardinality)
        b = fm.get("base").collect { case Atom(a) => a }.getOrElse("string")
      } yield RegisterDomain(n, c, b)
    case other => Left(s"unrecognized DDL form: ${other.render}")
  }

  /** (Finite 5) | AlephZero | Continuum | ConstrainedFinite
    * (reference lib/ddl/ast.ml:3-8). */
  def parseCardinality(s: Sexp): Either[String, Cardinality] = s match {
    case Atom("AlephZero")         => Right(Cardinality.AlephZero)
    case Atom("Continuum")         => Right(Cardinality.Continuum)
    case Atom("ConstrainedFinite") => Right(Cardinality.ConstrainedFinite)
    case SList(List(Atom("Finite"), Atom(n))) =>
      n.toLongOption.toRight(s"bad Finite count: $n").map(Cardinality.Finite(_))
    case other => Left(s"bad cardinality: ${other.render}")
  }

  private def fieldMap(fields: List[Sexp]): Map[String, Sexp] =
    fields.collect { case SList(List(Atom(k), v)) => k -> v }.toMap

  private def name(fm: Map[String, Sexp], k: String): Either[String, String] =
    fm.get(k).toRight(s"missing field: $k").flatMap {
      case Atom(n) => Right(n)
      case o => Left(s"bad $k: ${o.render}")
    }

  private def traverse[A, B](xs: List[A])(f: A => Either[String, B]): Either[String, List[B]] =
    xs.foldRight(Right(Nil): Either[String, List[B]]) { (a, acc) =>
      for { b <- f(a); rest <- acc } yield b :: rest
    }
}

/** DDL executor (reference lib/ddl/executor.ml:29-61). */
object Executor {
  import Statement._

  /** CreateDatabase is the only statement meaningful without a current
    * database — the Option makes that explicit instead of a null. */
  def execute(spark: SparkSession, db: Option[Database], stmt: Statement): Either[graft.Err, Database] =
    stmt match {
      case CreateDatabase(n) => Right(Engine.createDatabase(spark, n))
      case other =>
        db.toRight(graft.Err.NoDatabase("run (ddl (CreateDatabase name)) first")).flatMap { cur =>
          other match {
            case CreateDatabase(_)      => Right(cur) // unreachable
            case CreateRelation(n, sch) => Engine.createRelation(spark, cur, n, sch)
            case RetractRelation(n)     => Engine.retractRelation(spark, cur, n)
            case ClearRelation(n)       => Engine.clearRelation(spark, cur, n)
            case RegisterDomain(n, card, base) =>
              val baseType: DataType = base match {
                case "integer" | "natural" => LongType
                case "rational"            => DoubleType
                case _                     => StringType
              }
              Engine.registerDomain(spark, cur, Domain(n, baseType, card))
          }
        }
    }

  def run(spark: SparkSession, db: Option[Database], sexpText: String): Either[graft.Err, Database] =
    Parser.parse(sexpText).left.map(graft.Err.ParseError(_)).flatMap(execute(spark, db, _))
}

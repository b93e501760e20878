package graft.dml

import org.apache.spark.sql.SparkSession
import graft.catalog.Catalog
import graft.drl.{Compiler, Gate, Query, Parser => DrlParser}
import graft.engine.{Database, DbCatalog, Engine}
import graft.sexp.Sexp
import graft.sexp.Sexp.{Atom, SList}
import graft.types.Value

/** DML — the six mutation statements (reference lib/dml/ast.ml:5-12). */
sealed trait Statement
object Statement {
  final case class InsertTuple(relation: String, attributes: List[(String, Value)]) extends Statement
  final case class InsertTuples(relation: String, tuples: List[List[(String, Value)]]) extends Statement
  final case class DeleteTuple(relation: String, attributes: List[(String, Value)]) extends Statement
  final case class Assign(target: String, body: Query) extends Statement
  final case class InsertFrom(target: String, source: Query) extends Statement
  final case class DeleteWhere(target: String, predicate: Query) extends Statement
}

/** Sexp → DML statement (surface of the reference's ppx-derived parser,
  * lib/dml/parser.ml). Record fields are matched by name. */
object Parser {
  import Statement._

  /** Statement-head atoms this grammar owns (see drl.Parser.heads). */
  val heads: Set[String] = Set("InsertTuple", "InsertTuples", "DeleteTuple",
    "Assign", "InsertFrom", "DeleteWhere")

  def parse(input: String): Either[String, Statement] =
    Sexp.parse(input).flatMap(ofSexp)

  def ofSexp(s: Sexp): Either[String, Statement] = s match {
    case SList(Atom("dml") :: st :: Nil) => ofSexp(st)
    case SList(Atom(tag) :: fields) =>
      val fm = fieldMap(fields)
      tag match {
        case "InsertTuple" =>
          for { r <- name(fm, "relation"); a <- attrs(fm, "attributes") } yield InsertTuple(r, a)
        case "InsertTuples" =>
          for {
            r <- name(fm, "relation")
            ts <- fm.get("tuples").toRight("missing field: tuples").flatMap {
              case SList(items) => traverse(items) {
                case SList(pairs) => parseAttrPairs(pairs)
                case o => Left(s"bad tuple: ${o.render}")
              }
              case o => Left(s"bad tuples: ${o.render}")
            }
          } yield InsertTuples(r, ts)
        case "DeleteTuple" =>
          for { r <- name(fm, "relation"); a <- attrs(fm, "attributes") } yield DeleteTuple(r, a)
        case "Assign" =>
          for { t <- name(fm, "target"); q <- query(fm, "body") } yield Assign(t, q)
        case "InsertFrom" =>
          for { t <- name(fm, "target"); q <- query(fm, "source") } yield InsertFrom(t, q)
        case "DeleteWhere" =>
          for { t <- name(fm, "target"); q <- query(fm, "predicate") } yield DeleteWhere(t, q)
        case other => Left(s"unrecognized DML statement: $other")
      }
    case other => Left(s"unrecognized DML form: ${other.render}")
  }

  private def fieldMap(fields: List[Sexp]): Map[String, Sexp] =
    fields.collect { case SList(List(Atom(k), v)) => k -> v }.toMap

  private def name(fm: Map[String, Sexp], k: String): Either[String, String] =
    fm.get(k).toRight(s"missing field: $k").flatMap {
      case Atom(n) => Right(n)
      case o => Left(s"bad $k: ${o.render}")
    }

  private def attrs(fm: Map[String, Sexp], k: String): Either[String, List[(String, Value)]] =
    fm.get(k).toRight(s"missing field: $k").flatMap {
      case SList(pairs) => parseAttrPairs(pairs)
      case o => Left(s"bad $k: ${o.render}")
    }

  private def parseAttrPairs(pairs: List[Sexp]): Either[String, List[(String, Value)]] =
    traverse(pairs) {
      case SList(List(Atom(a), lit)) => Value.fromSexp(lit).map(a -> _)
      case o => Left(s"bad attribute binding: ${o.render}")
    }

  private def query(fm: Map[String, Sexp], k: String): Either[String, Query] =
    fm.get(k).toRight(s"missing field: $k").flatMap(DrlParser.ofSexp)

  private def traverse[A, B](xs: List[A])(f: A => Either[String, B]): Either[String, List[B]] =
    xs.foldRight(Right(Nil): Either[String, List[B]]) { (a, acc) =>
      for { b <- f(a); rest <- acc } yield b :: rest
    }
}

/** DML executor (reference lib/dml/executor.ml:56-126). Embedded DRL
  * bodies are gated and compiled against the database (with optional
  * external-catalog fallback for ingest). */
object Executor {
  import Statement._

  def execute(spark: SparkSession, db: Database, stmt: Statement,
      external: Option[Catalog] = None): Either[graft.Err, Database] = {
    val cat = new DbCatalog(db, external)
    def eval(q: Query) =
      for { _ <- Gate.admit(cat, q); df <- Compiler.compile(spark, cat, q) } yield df
    stmt match {
      case InsertTuple(r, a)  => Engine.createTuple(spark, db, r, a)
      case InsertTuples(r, t) => Engine.createTuples(spark, db, r, t)
      case DeleteTuple(r, a)  => Engine.retractTuple(spark, db, r, a)
      case Assign(t, body)    => eval(body).flatMap(Engine.assign(spark, db, t, _))
      case InsertFrom(t, src) => eval(src).flatMap(Engine.insertFrom(spark, db, t, _))
      case DeleteWhere(t, p)  => eval(p).flatMap(Engine.deleteWhere(spark, db, t, _))
    }
  }

  /** Parse and execute one statement (parse failures become the
    * sublanguage's typed ParseError, reference lib/dml/sublanguage.ml:13-15). */
  def run(spark: SparkSession, db: Database, sexpText: String,
      external: Option[Catalog] = None): Either[graft.Err, Database] =
    Parser.parse(sexpText).left.map(graft.Err.ParseError(_))
      .flatMap(execute(spark, db, _, external))
}

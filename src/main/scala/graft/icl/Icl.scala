package graft.icl

import org.apache.spark.sql.SparkSession
import graft.engine.{Database, Engine}
import graft.sexp.Sexp
import graft.sexp.Sexp.{Atom, SList}
import graft.types.Value

/** ICL statements (reference lib/icl/ast.ml:17-23). `timing` and `Commit`
  * are surface extensions over the reference's ops-level API
  * (attach_constraint ~timing / commit, lib/manipulation.ml:965-1027),
  * which its wire surface never exposed. */
sealed trait Statement
object Statement {
  final case class RegisterConstraint(constraintName: String, relationName: String,
      body: Body, timing: Timing = Timing.Immediate) extends Statement
  case object Commit extends Statement
}

object Parser {
  import Statement._

  /** Statement-head atoms this grammar owns (see drl.Parser.heads). */
  val heads: Set[String] = Set("RegisterConstraint", "Commit")

  def parse(input: String): Either[String, Statement] =
    Sexp.parse(input).flatMap(ofSexp)

  def ofSexp(s: Sexp): Either[String, Statement] = s match {
    case SList(Atom("icl") :: st :: Nil) => ofSexp(st)
    case SList(List(Atom("Commit"))) | Atom("Commit") => Right(Commit)
    case SList(Atom("RegisterConstraint") :: fields) =>
      val fm = fields.collect { case SList(List(Atom(k), v)) => k -> v }.toMap
      for {
        cn <- atomField(fm, "constraint_name")
        rn <- atomField(fm, "relation_name")
        b <- fm.get("body").toRight("missing field: body").flatMap(parseBody)
        t <- fm.get("timing") match {
          case None                    => Right(Timing.Immediate)
          case Some(Atom("Immediate")) => Right(Timing.Immediate)
          case Some(Atom("Deferred"))  => Right(Timing.Deferred)
          case Some(o)                 => Left(s"bad timing: ${o.render}")
        }
      } yield RegisterConstraint(cn, rn, b, t)
    case other => Left(s"unrecognized ICL form: ${other.render}")
  }

  def parseBody(s: Sexp): Either[String, Body] = s match {
    case SList(Atom("MemberOf") :: fields) =>
      val fm = fields.collect { case SList(List(Atom(k), v)) => k -> v }.toMap
      for {
        target <- atomField(fm, "target")
        binding <- fm.get("binding").toRight("missing field: binding").flatMap {
          case SList(pairs) => traverse(pairs) {
            case SList(List(Atom(attr), expr)) => parseBindingExpr(expr).map(attr -> _)
            case o => Left(s"bad binding pair: ${o.render}")
          }
          case o => Left(s"bad binding: ${o.render}")
        }
      } yield Body.MemberOf(target, binding)
    case SList(Atom("Not") :: fields) =>
      val fm = fields.collect { case SList(List(Atom(k), v)) => k -> v }.toMap
      for {
        b <- fm.get("body").toRight("missing field: body").flatMap(parseBody)
        u <- atomField(fm, "universe")
      } yield Body.Not(b, u)
    case SList(List(Atom("And"), SList(cs))) => traverse(cs)(parseBody).map(Body.And(_))
    case SList(List(Atom("Or"), SList(cs)))  => traverse(cs)(parseBody).map(Body.Or(_))
    case SList(Atom("Exists") :: fields)     => quantified(fields, Body.Exists.apply)
    case SList(Atom("Forall") :: fields)     => quantified(fields, Body.Forall.apply)
    case other => Left(s"unrecognized constraint body: ${other.render}")
  }

  private def quantified(fields: List[Sexp],
      mk: (String, String, Body) => Body): Either[String, Body] = {
    val fm = fields.collect { case SList(List(Atom(k), v)) => k -> v }.toMap
    for {
      v <- atomField(fm, "variable")
      q <- atomField(fm, "quantifier")
      b <- fm.get("body").toRight("missing field: body").flatMap(parseBody)
    } yield mk(v, q, b)
  }

  private def parseBindingExpr(s: Sexp): Either[String, Binding] = s match {
    case SList(List(Atom("Var"), Atom(a)))  => Right(Binding.Var(a))
    case SList(List(Atom("Const"), lit))    => Value.fromSexp(lit).map(Binding.Const(_))
    case other => Left(s"bad binding expr: ${other.render}")
  }

  private def atomField(fm: Map[String, Sexp], k: String): Either[String, String] =
    fm.get(k).toRight(s"missing field: $k").flatMap {
      case Atom(a) => Right(a)
      case o => Left(s"bad $k: ${o.render}")
    }

  private def traverse[A, B](xs: List[A])(f: A => Either[String, B]): Either[String, List[B]] =
    xs.foldRight(Right(Nil): Either[String, List[B]]) { (a, acc) =>
      for { b <- f(a); rest <- acc } yield b :: rest
    }
}

/** ICL executor (reference lib/icl/executor.ml:42-53). */
object Executor {
  import Statement._

  def execute(spark: SparkSession, db: Database, stmt: Statement): Either[graft.Err, Database] =
    stmt match {
      case RegisterConstraint(cn, rn, body, timing) =>
        Engine.registerConstraint(spark, db, cn, rn, body, timing)
      case Commit => Engine.commit(spark, db)
    }

  def run(spark: SparkSession, db: Database, sexpText: String): Either[graft.Err, Database] =
    Parser.parse(sexpText).left.map(graft.Err.ParseError(_)).flatMap(execute(spark, db, _))
}

package graft.server

import graft.SparkTestBase

/** Robustness net for the six-sublanguage dispatcher: every
  * syntactically-parseable-but-wrong request must come back as
  * `Left(error)` — never an exception. The TCP listener wraps execute in
  * a catch-all, but the embedded API (EngineSession in a user's driver)
  * has no such net, so a throw here is an API-contract bug.
  *
  * The corpus is deterministic: structural mutations of every statement
  * family (unknown heads, missing/duplicated/truncated fields, wrong
  * literal types, unknown relations/domains/branches, arity abuse,
  * deep nesting), plus the outright-unparseable (which must Left at the
  * parser). */
class DispatchFuzzSpec extends SparkTestBase {

  private def freshSession(): EngineSession = {
    val s = new EngineSession(spark)
    def ok(stmt: String): Unit =
      s.execute(stmt).fold(e => fail(s"setup failed: $stmt -> $e"), _ => ())
    ok("(CreateDatabase g)")
    ok("(CreateRelation (name r) (schema ((x integer) (s string))))")
    ok("(InsertTuple (relation r) (attributes ((x (Int 1)) (s (Str \"a\")))))")
    s
  }

  private val corpus: Seq[String] = Seq(
    // unparseable → parser Left
    "(", ")", "(CreateDatabase", "\"unterminated", "", "; just a comment",
    // unknown heads / misplaced atoms
    "(Frobnicate x)", "(drl)", "(42 (x))", "((nested) head)",
    // DDL mutations
    "(CreateDatabase)", "(CreateDatabase g extra)",
    "(CreateRelation (name r))", "(CreateRelation (schema ((x integer))))",
    "(CreateRelation (name bad) (schema ((x unknown_domain))))",
    "(CreateRelation (name bad) (schema (x integer)))",
    "(RetractRelation (name missing))", "(ClearRelation (name missing))",
    "(RegisterDomain)", "(RegisterDomain (name))",
    // DML mutations
    "(InsertTuple (relation missing) (attributes ((x (Int 1)))))",
    "(InsertTuple (relation r) (attributes ((x (Str \"wrong_type\")))))",
    "(InsertTuple (relation r) (attributes ((unknown_attr (Int 1)))))",
    "(InsertTuple (relation r) (attributes ((x (Int 1)))))", // missing attr s
    "(InsertTuple (relation r))", "(InsertTuple)",
    "(DeleteWhere (target r))", "(DeleteWhere (target r) (predicate (Bogus)))",
    "(Assign (target r))", "(InsertFrom (target r) (source (Base missing)))",
    // DRL mutations
    "(drl (Base missing))", "(drl (Project (nope) (Base r)))",
    "(drl (Select (Eq (Var q) (Int 1)) (Base r)))",
    "(drl (Join (Base r)))", "(drl (Take -5 (Base r)))",
    "(drl (Rename ((missing new)) (Base r)))",
    // ICL mutations
    "(RegisterConstraint (constraint_name c))",
    "(RegisterConstraint (constraint_name c) (relation_name missing) " +
      "(body (MemberOf (target r) (binding ((x (Var x)))))))",
    "(RegisterConstraint (constraint_name c) (relation_name r) (body (Bogus)))",
    "(RetractConstraint (constraint_name missing) (relation_name r))",
    // DCL/SCL mutations
    "(CreateBranch)", "(Checkout missing_branch)", "(Merge missing_branch)",
    "(OpenCursor)", "(OpenCursor (name c) (query (Base missing)))",
    "(FetchCursor (name missing))", "(CloseCursor (name missing))",
    // deep nesting (parser + compiler recursion)
    "(drl " + "(Project (x) " * 40 + "(Base r)" + ")" * 40 + ")",
  )

  test("every malformed request returns Left — the dispatcher never throws") {
    val session = freshSession()
    val throwers = corpus.flatMap { stmt =>
      try { session.execute(stmt); None }
      catch { case e: Throwable => Some(s"$stmt -> ${e.getClass.getSimpleName}: ${e.getMessage}") }
    }
    assert(throwers.isEmpty, s"dispatcher threw on:\n${throwers.mkString("\n")}")
    // and the session is still fully functional afterwards
    val after = session.execute("(drl (Base r))")
    assert(after.isRight, s"session corrupted by fuzz corpus: $after")
  }

  /** The ONLY tags a client may see at the TOP LEVEL of an error payload:
    * the dispatcher's own forms (lib/listener.ml:12-45), the CAS conflict
    * (listener.ml:53-59), the documented no-database divergence, and the
    * physical-layer catch-all. Every sublanguage parse/execute failure —
    * including the manipulation forms relation-not-found, duplicate-tuple,
    * constraint-violation, … — MUST arrive wrapped in
    * `(sublanguage-error (error …))` (listener.ml:39); accepting them
    * top-level here would let an unwrapped leak through the net. */
  private val topLevelTags = Set(
    "syntax-error", "malformed-expression", "unrecognized-sublanguage",
    "sublanguage-error", "conflict", "no-database", "storage-error")

  test("every corpus Left renders a TAGGED wire form a client can pattern-match — sublanguage errors never leak unwrapped") {
    val session = freshSession()
    val untagged = corpus.flatMap { stmt =>
      try session.execute(stmt) match {
        case Left(err) => err.sexp match {
          case graft.sexp.Sexp.SList(graft.sexp.Sexp.Atom(t) :: _) if topLevelTags(t) => None
          case other => Some(s"$stmt -> ${other.render}")
        }
        case Right(_) => None // some corpus entries are legitimately fine
      } catch { case _: Throwable => None } // covered by the no-throw test
    }
    assert(untagged.isEmpty, s"unwrapped or prose errors leaked to the wire:\n${untagged.mkString("\n")}")
  }
}

package graft.server

import java.net.Socket
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.nio.charset.StandardCharsets
import graft.SparkTestBase
import graft.sexp.Sexp
import graft.sexp.Sexp.{Atom, SList}

/** One wire test per error kind of the reference's taxonomy
  * (reference lib/error.ml:18-33 + each sublanguage's executor error
  * type), through a REAL loopback socket: a client must be able to
  * pattern-match the tagged form — `(error (conflict ...))` means retry,
  * `(error (sublanguage-error (error (duplicate-tuple (hash h)))))` means
  * this exact row exists — without ever parsing prose.
  *
  * Shapes pinned here:
  *  - top level: syntax-error, malformed-expression,
  *    unrecognized-sublanguage, conflict (the CAS loss — also covered in
  *    ListenerSpec), no-database (a documented repo divergence: the
  *    reference boots with a database), storage-error (the catch-all for
  *    physical-layer throws);
  *  - wrapped in `(sublanguage-error (error …))` exactly as the
  *    reference's dispatcher does for every parse/execute failure inside
  *    a sublanguage (lib/listener.ml:39): parse-error, the keyed
  *    manipulation forms relation-not-found/(relation r),
  *    relation-already-exists, duplicate-tuple/(hash h),
  *    tuple-not-found, constraint-violation/(message m); the bare
  *    executor forms relation-not-found (DRL name resolution,
  *    lib/drl/executor.ml:14), generator-error, cursor-error,
  *    branch-not-found. */
class WireErrorSpec extends SparkTestBase {
  import spark.implicits._

  private def newListener(): Listener =
    new Listener(spark, external = Some(new graft.catalog.Catalog {
      def resolve(name: String) = name match {
        case "nums" => Right((1L to 5L).map(i => (i, s"row$i")).toDF("n", "label"))
        case other  => Left(graft.Err.RelationNotFoundBare(other))
      }
    })).start()

  private def withServer[A](f: (PrintWriter, BufferedReader) => A): A = {
    val listener = newListener()
    val sock = new Socket("127.0.0.1", listener.localPort)
    val out = new PrintWriter(sock.getOutputStream, true, StandardCharsets.UTF_8)
    val in = new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    try f(out, in) finally { sock.close(); listener.close() }
  }

  private def request(out: PrintWriter, in: BufferedReader, req: String): Sexp = {
    out.println(req)
    val line = in.readLine()
    assert(line != null, s"no response for $req")
    Sexp.parse(line).fold(e => fail(s"unparseable response '$line': $e"), identity)
  }

  /** The typed payload of an `(error <payload>)` response. */
  private def errorPayload(resp: Sexp): Sexp = resp match {
    case SList(List(Atom("error"), payload)) => payload
    case other => fail(s"expected (error <payload>), got: ${other.render}")
  }

  private def payloadTag(resp: Sexp): String = errorPayload(resp) match {
    case SList(Atom(t) :: _) => t
    case other => fail(s"untagged error payload: ${other.render}")
  }

  /** Unwrap `(sublanguage-error (error <inner>))` to the inner form. */
  private def subInner(resp: Sexp): Sexp = errorPayload(resp) match {
    case SList(List(Atom("sublanguage-error"), SList(List(Atom("error"), inner)))) => inner
    case other => fail(s"expected (sublanguage-error (error _)), got: ${other.render}")
  }

  private def innerTag(resp: Sexp): String = subInner(resp) match {
    case SList(Atom(t) :: _) => t
    case Atom(t)             => t
    case other => fail(s"untagged inner form: ${other.render}")
  }

  /** `(tag (key value))` → value, for keyed payload fields. */
  private def keyed(form: Sexp, key: String): String = form match {
    case SList(_ :: fields) => fields.collectFirst {
      case SList(List(Atom(`key`), Atom(v))) => v
    }.getOrElse(fail(s"no ($key _) in ${form.render}"))
    case other => fail(s"not a tagged form: ${other.render}")
  }

  private def bootstrap(out: PrintWriter, in: BufferedReader): Unit = {
    request(out, in, "(ddl (CreateDatabase wire))")
    request(out, in, "(ddl (CreateRelation (name t) (schema ((x integer)))))")
    request(out, in, "(dml (InsertTuple (relation t) (attributes ((x (Int 1))))))")
  }

  test("syntax-error: unlexable request text (lib/listener.ml:12-15)") {
    withServer { (out, in) =>
      for (bad <- Seq("(((", "\"unterminated", ")")) {
        val r = request(out, in, bad)
        assert(payloadTag(r) == "syntax-error", s"$bad -> ${r.render}")
      }
    }
  }

  test("malformed-expression: no grammar owns the form (lib/listener.ml:45)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      val r = request(out, in, "((nested) head)")
      assert(payloadTag(r) == "malformed-expression", r.render)
      // the offending expression rides in the payload, keyed
      assert(errorPayload(r).render.contains("(expression ((nested) head))"), r.render)
    }
  }

  test("unrecognized-sublanguage: envelope shape with an unknown tag (lib/listener.ml:34)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      val r = request(out, in, "(tcl (Begin))")
      assert(payloadTag(r) == "unrecognized-sublanguage", r.render)
      assert(keyed(errorPayload(r), "tag") == "tcl", r.render)
    }
  }

  test("no-database: mutation before CreateDatabase (documented divergence — the reference boots with a db)") {
    withServer { (out, in) =>
      val r = request(out, in, "(dml (InsertTuple (relation t) (attributes ((x (Int 1))))))")
      assert(payloadTag(r) == "no-database", r.render)
    }
  }

  test("sublanguage-error(parse-error): grammar rejects a well-formed sexp; gate rejection uses the same form (lib/drl/sublanguage.ml:18-19)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      for (bad <- Seq(
        "(drl (NoSuchNode x))",                       // unknown DRL node
        "(dml (InsertTuple (relation t)))",           // missing field
        "(drl (Base natural_plus))"))  {              // finiteness-gate rejection
        val r = request(out, in, bad)
        assert(innerTag(r) == "parse-error", s"$bad -> ${r.render}")
      }
    }
  }

  test("sublanguage-error(relation-not-found, bare): DRL name resolution (lib/drl/executor.ml:14)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      val r = request(out, in, "(drl (Base missing))")
      assert(subInner(r) == SList(List(Atom("relation-not-found"), Atom("missing"))), r.render)
    }
  }

  test("sublanguage-error(relation-not-found, keyed): manipulation target (lib/error.ml:23)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      val r = request(out, in, "(dml (InsertTuple (relation missing) (attributes ((x (Int 1))))))")
      assert(innerTag(r) == "relation-not-found", r.render)
      assert(keyed(subInner(r), "relation") == "missing", r.render)
    }
  }

  test("sublanguage-error(relation-already-exists) (lib/error.ml:24)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      val r = request(out, in, "(ddl (CreateRelation (name t) (schema ((x integer)))))")
      assert(innerTag(r) == "relation-already-exists", r.render)
      assert(keyed(subInner(r), "relation") == "t", r.render)
    }
  }

  test("sublanguage-error(duplicate-tuple): carries the row's content hash (lib/error.ml:26)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      val r = request(out, in, "(dml (InsertTuple (relation t) (attributes ((x (Int 1))))))")
      assert(innerTag(r) == "duplicate-tuple", r.render)
      val h = keyed(subInner(r), "hash")
      assert(h.length == 64 && h.forall(c => c.isDigit || ('a' to 'f').contains(c)),
        s"not a sha256 hash: $h")
    }
  }

  test("sublanguage-error(tuple-not-found) (lib/error.ml:25)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      val r = request(out, in, "(dml (DeleteTuple (relation t) (attributes ((x (Int 99))))))")
      assert(innerTag(r) == "tuple-not-found", r.render)
      assert(keyed(subInner(r), "hash").length == 64, r.render)
    }
  }

  test("sublanguage-error(constraint-violation): membership criteria and named constraints (lib/error.ml:27)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      // membership criteria (wrong type for a declared domain)
      val r1 = request(out, in, "(dml (InsertTuple (relation t) (attributes ((x (Str nope))))))")
      assert(innerTag(r1) == "constraint-violation", r1.render)
      // a named registered constraint
      request(out, in, "(icl (RegisterConstraint (constraint_name small) (relation_name t) " +
        "(body (MemberOf (target natural_natural_less_than) " +
        "(binding ((left (Var x)) (right (Const (Int 10)))))))))")
      val r2 = request(out, in, "(dml (InsertTuple (relation t) (attributes ((x (Int 50))))))")
      assert(innerTag(r2) == "constraint-violation", r2.render)
      assert(keyed(subInner(r2), "message").nonEmpty, r2.render)
    }
  }

  test("sublanguage-error(generator-error): DRL runtime misuse beyond name resolution (lib/drl/executor.ml:17)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      val r = request(out, in, "(drl (Project (nope) (Base t)))")
      assert(innerTag(r) == "generator-error", r.render)
    }
  }

  test("sublanguage-error(branch-not-found): DCL (lib/dcl/executor.ml:20)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      val r = request(out, in, "(dcl (Checkout missing_branch))")
      assert(subInner(r) == SList(List(Atom("branch-not-found"), Atom("missing_branch"))), r.render)
    }
  }

  test("sublanguage-error(no-database-at-hash): TOP-LEVEL dcl variant, never nested (lib/dcl/executor.ml:21)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      // a branch whose tip hash has no stored snapshot: Checkout reaches
      // the load and must emit the executor-level BARE form
      request(out, in, "(dcl (CreateBranch (name ghost) (hash deadbeef)))")
      val r = request(out, in, "(dcl (Checkout ghost))")
      assert(subInner(r) == SList(List(Atom("no-database-at-hash"), Atom("deadbeef"))), r.render)
    }
  }

  test("sublanguage-error(merge-error): wraps an Error.t-shaped cause — storage-error for a missing tip (management/merge.ml:177,186-188)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      request(out, in, "(dcl (CreateBranch (name live)))")
      request(out, in, "(dcl (CreateBranch (name ghost) (hash deadbeef)))")
      val r = request(out, in, "(dcl (Merge (left ghost) (right live) (strategy PreferLeft)))")
      // the reference merge loads tips through the manipulation layer,
      // whose missing-db failure is of_string_error = StorageError —
      // never the dcl-executor no-database-at-hash variant
      subInner(r) match {
        case SList(List(Atom("merge-error"), SList(List(Atom("storage-error"),
            SList(List(Atom("message"), Atom(msg))))))) =>
          assert(msg.contains("Left tip not found"), r.render)
        case other => fail(s"expected (merge-error (storage-error (message _))), got: ${other.render}")
      }
    }
  }

  test("sublanguage-error(cursor-error): SCL (lib/scl/executor.ml:28)") {
    withServer { (out, in) =>
      bootstrap(out, in)
      val r = request(out, in, "(scl (Fetch (cursor deadbeef)))")
      assert(innerTag(r) == "cursor-error", r.render)
    }
  }

  test("storage-error: a physical-layer throw surfaces tagged, and the connection survives") {
    // a catalog whose resolution THROWS (a missing parquet path does) —
    // the listener's catch-all must render the tagged storage form, not
    // kill the socket
    val listener = new Listener(spark, external = Some(new graft.catalog.Catalog {
      def resolve(name: String) =
        Right(spark.read.parquet(s"/nonexistent-${name}/x.parquet"))
    })).start()
    val sock = new Socket("127.0.0.1", listener.localPort)
    val out = new PrintWriter(sock.getOutputStream, true, StandardCharsets.UTF_8)
    val in = new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
    try {
      request(out, in, "(ddl (CreateDatabase g))")
      val r = request(out, in, "(drl (Base anything))")
      assert(payloadTag(r) == "storage-error", r.render)
      // connection still usable
      val ok = request(out, in, "(ddl (CreateRelation (name t) (schema ((x integer)))))")
      assert(ok.render.startsWith("(ok"), ok.render)
    } finally { sock.close(); listener.close() }
  }

  test("conflict: the CAS loss is top-level, never wrapped (lib/listener.ml:53-59)") {
    val listener = newListener()
    val s1 = new Socket("127.0.0.1", listener.localPort)
    val s2 = new Socket("127.0.0.1", listener.localPort)
    def io(s: Socket) = (new PrintWriter(s.getOutputStream, true, StandardCharsets.UTF_8),
      new BufferedReader(new InputStreamReader(s.getInputStream, StandardCharsets.UTF_8)))
    val (out1, in1) = io(s1); val (out2, in2) = io(s2)
    try {
      request(out1, in1, "(ddl (CreateDatabase cas))")
      request(out1, in1, "(ddl (CreateRelation (name t) (schema ((x integer)))))")
      request(out2, in2, "(drl (Base t))") // pin conn2's snapshot
      request(out1, in1, "(dml (InsertTuple (relation t) (attributes ((x (Int 1))))))")
      val r = request(out2, in2, "(dml (InsertTuple (relation t) (attributes ((x (Int 2))))))")
      assert(payloadTag(r) == "conflict", r.render)
      val p = errorPayload(r)
      assert(keyed(p, "old-hash").length == 64 && keyed(p, "new-hash").length == 64, r.render)
    } finally { s1.close(); s2.close(); listener.close() }
  }
}

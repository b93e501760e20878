package graft.server

import java.net.Socket
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.nio.charset.StandardCharsets
import graft.SparkTestBase
import graft.sexp.Sexp
import graft.sexp.Sexp.{Atom, SList}

/** End-to-end protocol test over a real loopback socket (the reference's
  * full request path: TCP → sexp → sublanguage dispatch → rendered
  * response, lib/listener.ml:156-187). */
class ListenerSpec extends SparkTestBase {
  import spark.implicits._

  private def newListener(): Listener =
    new Listener(spark, external = Some(new graft.catalog.Catalog {
      def resolve(name: String) = name match {
        case "nums" => Right((1L to 25L).map(i => (i, s"row$i")).toDF("n", "label"))
        case other  => Left(graft.Err.RelationNotFoundBare(other))
      }
    })).start()

  private def connect(l: Listener): (Socket, PrintWriter, BufferedReader) = {
    val sock = new Socket("127.0.0.1", l.localPort)
    (sock,
      new PrintWriter(sock.getOutputStream, true, StandardCharsets.UTF_8),
      new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8)))
  }

  private def withServer[A](f: (PrintWriter, BufferedReader) => A): A = {
    val listener = newListener()
    val (sock, out, in) = connect(listener)
    try f(out, in) finally { sock.close(); listener.close() }
  }

  private def request(out: PrintWriter, in: BufferedReader, req: String): Sexp = {
    out.println(req)
    val line = in.readLine()
    assert(line != null, s"no response for $req")
    Sexp.parse(line).fold(e => fail(s"unparseable response '$line': $e"), identity)
  }

  private def field(resp: Sexp, name: String): Option[Sexp] = resp match {
    case SList(_ :: fields) => fields.collectFirst {
      case SList(List(Atom(`name`), v)) => v
    }
    case _ => None
  }

  private def tag(resp: Sexp): String = resp match {
    case SList(Atom(t) :: _) => t
    case other => fail(s"untagged response: ${other.render}")
  }

  test("full protocol session: ddl, dml, query, error, cursor, branch") {
    withServer { (out, in) =>
      // errors before a database exists are protocol errors, not crashes
      assert(tag(request(out, in, "(dml (InsertTuple (relation r) (attributes ((x (Int 1))))))")) == "error")

      assert(tag(request(out, in, "(ddl (CreateDatabase shop))")) == "ok")
      val created = request(out, in,
        "(ddl (CreateRelation (name items) (schema ((sku integer) (name string)))))")
      assert(tag(created) == "ok")
      assert(field(created, "db_name").contains(Atom("shop")))

      assert(tag(request(out, in,
        "(dml (InsertTuple (relation items) (attributes ((sku (Int 1)) (name (Str Widget))))))")) == "ok")
      // duplicate insert → error response
      assert(tag(request(out, in,
        "(dml (InsertTuple (relation items) (attributes ((sku (Int 1)) (name (Str Widget))))))")) == "error")

      val q = request(out, in, "(drl (Base items))")
      assert(tag(q) == "relation")
      assert(field(q, "row_count").contains(Atom("1")))
      assert(field(q, "truncated").contains(Atom("false")))
      assert(field(q, "rows").exists(_.render.contains("(sku (Int 1))")))
      assert(field(q, "schema").contains(
        Sexp.list(Sexp.list(Atom("sku"), Atom("integer")), Sexp.list(Atom("name"), Atom("string")))))

      // 16-row cap over the external catalog (25 rows)
      val big = request(out, in, "(drl (Base nums))")
      assert(field(big, "row_count").contains(Atom("16")))
      assert(field(big, "truncated").contains(Atom("true")))

      // SCL cursor over the same table pages beyond the cap
      val cur = request(out, in, "(scl (Begin (query (Base nums)) (limit 20)))")
      assert(tag(cur) == "cursor")
      assert(field(cur, "row_count").contains(Atom("20")))
      assert(field(cur, "has_more").contains(Atom("true")))
      val curId = field(cur, "id").collect { case Atom(v) => v }.get
      val rest = request(out, in, s"(scl (Fetch (cursor $curId)))")
      assert(field(rest, "row_count").contains(Atom("5")))
      assert(field(rest, "has_more").contains(Atom("false")))

      // DCL: branch bookkeeping is visible in responses
      assert(tag(request(out, in, "(dcl (CreateBranch (name main)))")) == "ok")
      assert(tag(request(out, in, "(dcl (Checkout main))")) == "ok")
      val afterIns = request(out, in,
        "(dml (InsertTuple (relation items) (attributes ((sku (Int 2)) (name (Str Gadget))))))")
      assert(field(afterIns, "branch").contains(Atom("main")))

      // malformed input → parse error, connection stays usable
      assert(tag(request(out, in, "(drl (NoSuchNode x))")) == "error")
      assert(tag(request(out, in, "(drl (Base items))")) == "relation")
    }
  }

  test("concurrent writers serialize: every successful insert is distinct and durable") {
    val listener = newListener()
    val conns = (1 to 4).map(_ => connect(listener))
    try {
      val (_, out0, in0) = conns.head
      request(out0, in0, "(ddl (CreateDatabase hammer))")
      request(out0, in0, "(ddl (CreateRelation (name t) (schema ((x integer)))))")
      // 4 connections × 10 inserts of disjoint keys, racing. A writer
      // whose head snapshot was raced past answers Conflict (the
      // reference's CAS loss, lib/listener.ml:54-59) and the client
      // re-sends — the reference client's retry loop. Every insert must
      // eventually land exactly once.
      val threads = conns.zipWithIndex.map { case ((_, out, in), c) =>
        new Thread(() => {
          for (i <- 0 until 10) {
            val stmt = s"(dml (InsertTuple (relation t) (attributes ((x (Int ${c * 100 + i}))))))"
            var attempts = 0
            var done = false
            while (!done && attempts < 50) {
              val r = request(out, in, stmt)
              attempts += 1
              if (tag(r) == "ok") done = true
              else assert(r.render.contains("(conflict"), s"unexpected failure: ${r.render}")
            }
            assert(done, s"insert never landed after $attempts attempts: $stmt")
          }
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(60000))
      val q = request(out0, in0, "(drl (Base t))")
      // all 40 rows landed (16-row response cap, so count via row set size
      // through a cursor instead)
      val cur = request(out0, in0, "(scl (Begin (query (Base t)) (limit 50)))")
      assert(field(cur, "row_count").contains(Atom("40")))
      assert(field(cur, "has_more").contains(Atom("false")))
      assert(tag(q) == "relation")
    } finally { conns.foreach(_._1.close()); listener.close() }
  }

  test("concurrent cursors keep their begin-time snapshots while a writer advances the head") {
    val listener = newListener()
    val readers = (1 to 3).map(_ => connect(listener))
    val writer = connect(listener)
    try {
      val (_, wOut, wIn) = writer
      request(wOut, wIn, "(ddl (CreateDatabase iso))")
      request(wOut, wIn, "(ddl (CreateRelation (name t) (schema ((x integer)))))")
      for (i <- 0 until 8)
        request(wOut, wIn, s"(dml (InsertTuple (relation t) (attributes ((x (Int $i))))))")
      // every reader BEGINS its cursor on the 8-row state (page 1 = 3
      // rows), THEN the writer commits more rows, THEN the readers page
      // to exhaustion concurrently. The registry pins the begin-time
      // DataFrame (reference session.ml:11 pins the db snapshot), so
      // each cursor must return EXACTLY its 8 rows — never 14 — while a
      // fresh query on the writer sees all 14. Threaded fetches also
      // race the registry under the session lock.
      val firstPages = readers.map { case (_, out, in) =>
        val r = request(out, in, "(scl (Begin (query (Base t)) (limit 3)))")
        assert(field(r, "row_count").contains(Atom("3")), r.render)
        field(r, "id").collect { case Atom(id) => id }.get
      }
      for (i <- 100 until 106)
        request(wOut, wIn, s"(dml (InsertTuple (relation t) (attributes ((x (Int $i))))))")
      val totals = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
      val threads = readers.zip(firstPages).zipWithIndex.map { case (((_, out, in), id), n) =>
        new Thread(() => {
          var rows = 3
          var more = true
          while (more) {
            val r = request(out, in, s"(scl (Fetch (cursor $id) (limit 3)))")
            rows += field(r, "row_count").collect { case Atom(c) => c.toInt }.get
            more = field(r, "has_more").contains(Atom("true"))
          }
          totals.put(n, rows)
        })
      }
      threads.foreach(_.start())
      threads.foreach(_.join(60000))
      assert((0 until 3).forall(totals.get(_) == 8),
        s"a cursor leaked post-begin commits: $totals")
      val fresh = request(wOut, wIn, "(scl (Begin (query (Base t)) (limit 20)))")
      assert(field(fresh, "row_count").contains(Atom("14")))
    } finally { (readers :+ writer).foreach(_._1.close()); listener.close() }
  }

  test("a second connection shares the serialized head database") {
    val listener = newListener()
    val (s1, out1, in1) = connect(listener)
    val (s2, out2, in2) = connect(listener)
    try {
      request(out1, in1, "(ddl (CreateDatabase shared))")
      request(out1, in1, "(ddl (CreateRelation (name t) (schema ((x integer)))))")
      // connection 2 sees connection 1's state and can mutate it
      val r2 = request(out2, in2, "(dml (InsertTuple (relation t) (attributes ((x (Int 1))))))")
      assert(tag(r2) == "ok")
      // connection 1's FIRST read runs against its loop-top snapshot,
      // taken before conn2's commit — the reference's per-iteration
      // `Atomic.get` staleness (lib/listener.ml:160-163), pinned here
      val stale = request(out1, in1, "(drl (Base t))")
      assert(field(stale, "row_count").contains(Atom("0")))
      // ...and its NEXT request observes the shared head's mutation
      val q = request(out1, in1, "(drl (Base t))")
      assert(field(q, "row_count").contains(Atom("1")))
    } finally { s1.close(); s2.close(); listener.close() }
  }

  test("a stale head snapshot answers Conflict; the retry lands (reference CAS loss)") {
    val listener = newListener()
    val (s1, out1, in1) = connect(listener)
    val (s2, out2, in2) = connect(listener)
    try {
      request(out1, in1, "(ddl (CreateDatabase cas))")
      request(out1, in1, "(ddl (CreateRelation (name t) (schema ((x integer)))))")
      // conn2 pins its snapshot at the current head with a read...
      assert(tag(request(out2, in2, "(drl (Base t))")) == "relation")
      // ...conn1 advances the head past it...
      assert(tag(request(out1, in1,
        "(dml (InsertTuple (relation t) (attributes ((x (Int 1))))))")) == "ok")
      // ...so conn2's mutation on the stale snapshot MUST conflict, and
      // must have applied nothing
      val conflicted = request(out2, in2,
        "(dml (InsertTuple (relation t) (attributes ((x (Int 2))))))")
      assert(tag(conflicted) == "error", conflicted.render)
      assert(conflicted.render.contains("(conflict"), conflicted.render)
      val afterConflict = request(out1, in1, "(scl (Begin (query (Base t)) (limit 10)))")
      assert(field(afterConflict, "row_count").contains(Atom("1")))
      // the retry executes against the head that won and lands once
      // (read from conn2 — its snapshot is fresh after its own commit;
      // conn1 would need a snapshot-refreshing request first)
      assert(tag(request(out2, in2,
        "(dml (InsertTuple (relation t) (attributes ((x (Int 2))))))")) == "ok")
      val afterRetry = request(out2, in2, "(scl (Begin (query (Base t)) (limit 10)))")
      assert(field(afterRetry, "row_count").contains(Atom("2")))
    } finally { s1.close(); s2.close(); listener.close() }
  }

  test("malformed wire input gets an error response and never kills the connection") {
    withServer { (out, in) =>
      val garbage = Seq(
        "((((",                            // unbalanced
        ")",                               // stray close
        "hello world",                     // bare atoms, not a form
        "(unknown_language (Base nums))",  // bad dispatch tag
        "(drl)",                           // arity error
        "(\u0001\u0002\u0003)",            // control bytes inside a form
        "(" + "a " * 2000 + ")",           // long line
      )
      for (g <- garbage) {
        val resp = request(out, in, g)
        assert(tag(resp) == "error", s"input ${g.take(30)} -> ${resp.render.take(80)}")
      }
      // the SAME connection still serves a real query afterwards
      val ok = request(out, in, "(drl (Take 3 (Base nums)))")
      assert(tag(ok) == "relation")
    }
  }

  test("WireClient round-trips a full relation through the cursor protocol") {
    val listener = newListener()
    val conn = new WireClient.Conn(listener.localPort)
    try {
      val rows = WireClient.streamQuery(conn, "(Base nums)", pageSize = 4)
      assert(rows.length == 25)
      assert(rows.map(_.head.asInstanceOf[Long]).sorted == (1L to 25L))
      assert(rows.forall(r => r(1).asInstanceOf[String].startsWith("row")))
    } finally { conn.close(); listener.close() }
  }
}

package graft.server

import java.net.{InetAddress, InetSocketAddress, StandardProtocolFamily, UnixDomainSocketAddress}
import java.nio.channels.{Channels, ServerSocketChannel, SocketChannel}
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.nio.charset.StandardCharsets
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import graft.Err
import graft.catalog.Catalog
import graft.sexp.Sexp
import graft.sexp.Sexp.{Atom, SList}

/** TCP sexp listener — the reference's wire protocol surface
  * (reference lib/listener.ml:95-187): one OS thread per connection, a
  * shared head database, responses rendered as tagged sexps with the
  * 16-row query cap.
  *
  * Response forms mirror lib/listener.ml:95-130:
  *  - `(error <message>)`
  *  - `(relation (schema ((attr type)...)) (rows (((attr (Tag v))...)...))
  *     (row_count n) (truncated bool) (db_hash h) (db_name n) (branch b))`
  *  - `(ok (message m) (db_hash h) (db_name n) (branch b))`
  *  - `(cursor (id c) (rows ...) (row_count n) (has_more bool)
  *     (db_hash h) (db_name n) (branch b))`
  *
  * Concurrency: the reference CASes a process-global head database
  * (lib/listener.ml:53-59,174-181); here each connection snapshots the
  * head BEFORE blocking on its next command (the reference's loop-top
  * `Atomic.get`), executes against that snapshot under the session lock,
  * and the commit conflict-checks the snapshot against the live head —
  * so a head advanced by ANOTHER connection since the snapshot makes the
  * request fail with the reference's `Conflict` error and the client
  * retries. Execution itself is serialized by the session lock (the
  * shared store/cursor registries are not thread-safe), which narrows
  * but does not close the CAS window — the observable wire semantics
  * are the reference's. Framing is one request sexp per line (a documented
  * divergence: the reference streams raw sexps; newline framing keeps
  * clients trivial).
  *
  * Bind surface mirrors the reference transport (lib/transport.ml:23-28):
  * an inet socket at (`bindAddress`, `port`) — loopback when no address
  * is given — or an AF_UNIX socket at `unixPath` (`Unix.ADDR_UNIX`; the
  * JVM side is a ServerSocketChannel opened with
  * StandardProtocolFamily.UNIX). The unix socket file is removed on
  * close.
  */
final class Listener(spark: SparkSession, external: Option[Catalog] = None, port: Int = 0,
    persistDir: Option[String] = None, bindAddress: Option[String] = None,
    unixPath: Option[String] = None) {
  /** Query response row cap (reference current_limit, lib/listener.ml:64). */
  val RowCap = 16

  private val session = new EngineSession(spark, external, persistDir)
  private val serverChannel: ServerSocketChannel = unixPath match {
    case Some(p) =>
      // Bind first — unlink ONLY a provably stale socket file. The
      // reference's Unix bind fails EADDRINUSE when a live server holds
      // the path (Unix.bind, lib/transport.ml:44-48); an unconditional
      // pre-unlink would silently delete that live server's socket and
      // steal the address. A file left by a killed process fails the
      // bind too, so on bind failure we probe with a connect: refused ⇒
      // stale (safe to unlink and rebind), accepted ⇒ live (boot fails).
      val addr = UnixDomainSocketAddress.of(p)
      def openBind(): ServerSocketChannel = {
        val ch = ServerSocketChannel.open(StandardProtocolFamily.UNIX)
        try { ch.bind(addr, 50); ch }
        catch { case e: Throwable => ch.close(); throw e }
      }
      try openBind()
      catch {
        case _: java.net.BindException =>
          val live =
            try {
              val probe = SocketChannel.open(StandardProtocolFamily.UNIX)
              try probe.connect(addr)
              finally probe.close()
            } catch { case _: Throwable => false }
          if (live)
            throw new IllegalStateException(
              s"unix socket $p: address already in use (a live listener holds it)")
          java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p))
          openBind()
      }
    case None =>
      val addr = bindAddress.map(InetAddress.getByName)
        .getOrElse(InetAddress.getLoopbackAddress)
      val ch = ServerSocketChannel.open()
      ch.bind(new InetSocketAddress(addr, port), 50)
      ch
  }
  @volatile private var running = true

  def localPort: Int = serverChannel.getLocalAddress match {
    case a: InetSocketAddress => a.getPort
    case _                    => -1 // unix socket — address is the path
  }

  /** Where the listener is reachable (diagnostics/boot banner). */
  def boundAddress: String = serverChannel.getLocalAddress.toString

  /** Accept loop on a daemon thread; one daemon thread per connection
    * (reference spawns one Domain per connection, lib/listener.ml:174-176). */
  def start(): Listener = {
    val t = new Thread(() => {
      while (running) {
        try {
          val sock = serverChannel.accept()
          val h = new Thread(() => handleConnection(sock))
          h.setDaemon(true)
          h.start()
        } catch { case _: Throwable => () /* socket closed on shutdown */ }
      }
    })
    t.setDaemon(true)
    t.start()
    this
  }

  def close(): Unit = {
    running = false
    serverChannel.close()
    unixPath.foreach(p => java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p)))
  }

  private def handleConnection(sock: SocketChannel): Unit = {
    val in = new BufferedReader(new InputStreamReader(
      Channels.newInputStream(sock), StandardCharsets.UTF_8))
    val out = new PrintWriter(Channels.newOutputStream(sock), true, StandardCharsets.UTF_8)
    try {
      // Each request executes against the head THIS connection last
      // observed (reference loop top `Atomic.get`, lib/listener.ml:
      // 160-163): the snapshot for the next request is read under the
      // SAME lock that finished the previous one, so any commit another
      // socket lands while this connection is idle deterministically
      // surfaces as Conflict — never as silent last-writer-wins. The
      // FIRST request starts from None = "no observation yet" and
      // resolves to the live head under the lock (handleAdvancing) — a
      // lock-free read here could pin a stale mid-bootstrap head the
      // connection never actually observed.
      var snap: Option[graft.engine.Database] = None
      var line = in.readLine()
      while (line != null && running) {
        if (line.trim.nonEmpty) {
          val (resp, next) = handleAdvancing(line, snap)
          snap = next
          out.println(resp)
        }
        line = in.readLine()
      }
    } catch { case _: Throwable => () } finally sock.close()
  }

  /** Execute one request against the current head and render the response
    * sexp (snapshot taken under the lock — the single-connection entry,
    * never conflicts with itself). */
  def handle(request: String): String =
    session.synchronized(handle(request, session.headSnapshot))

  /** [[handle]] plus the snapshot for the connection's NEXT request, read
    * under the same lock — a post-Conflict retry then sees the head that
    * beat it, exactly once. A connection with NO observation yet (fresh
    * socket before its first response) executes against the live head:
    * the reference boots with a database so its loop-top snapshot always
    * observes one, while this server is bootstrapped over the wire — a
    * pre-bootstrap `None` snapshot would render every first request
    * `NoDatabase` even though the database exists, which is neither the
    * reference's behavior nor useful to a client. */
  private def handleAdvancing(request: String,
      snap: Option[graft.engine.Database]): (String, Option[graft.engine.Database]) =
    session.synchronized(
      (handle(request, snap.orElse(session.headSnapshot)), session.headSnapshot))

  /** Execute one request against an explicit head snapshot (synchronized —
    * execution serialization; the COMMIT conflict-checks the snapshot). */
  def handle(request: String, snap: Option[graft.engine.Database]): String = session.synchronized {
    val rendered =
      try session.executeAgainst(snap, request) match {
        case Left(err) => errorSexp(err)
        case Right(QueryResult(df)) => relationSexp(df)
        case Right(Transition(msg)) => okSexp(msg)
        case Right(CursorBatch(batch)) => cursorSexp(batch)
      } catch { case e: Throwable =>
        // an escaped exception is a physical-layer failure on the wire
        errorSexp(Err.StorageError(s"${e.getClass.getSimpleName}: ${e.getMessage}"))
      }
    rendered.render
  }

  /** `(error <tagged form>)` — the reference's serializer nests the typed
    * error's own sexp under `error` (lib/listener.ml:98 over
    * lib/error.ml:18-33); clients pattern-match the tag to distinguish
    * retry (conflict) from fix-your-query (sublanguage-error …) from
    * duplicate-tuple, never parsing prose. */
  private def errorSexp(err: Err): Sexp = Sexp.list(Atom("error"), err.sexp)

  private def stateFields: List[Sexp] = {
    val (hash, name) = session.current.map(d => (d.hash, d.name)).getOrElse(("", "--"))
    List(
      Sexp.list(Atom("db_hash"), Atom(hash)),
      Sexp.list(Atom("db_name"), Atom(name)),
      Sexp.list(Atom("branch"), Atom(session.store.head.getOrElse("--"))))
  }

  private def valueSexp(dt: DataType, v: Any): Sexp = (dt, v) match {
    case (_, null)          => Sexp.list(Atom("Null"))
    case (LongType, x)      => Sexp.list(Atom("Int"), Atom(x.toString))
    case (IntegerType, x)   => Sexp.list(Atom("Int"), Atom(x.toString))
    case (DoubleType, x)    => Sexp.list(Atom("Float"), Atom(x.toString))
    case (FloatType, x)     => Sexp.list(Atom("Float"), Atom(x.toString))
    case (BooleanType, x)   => Sexp.list(Atom("Bool"), Atom(x.toString))
    case (_, x)             => Sexp.list(Atom("Str"), Atom(x.toString))
  }

  private def rowSexp(schema: StructType, r: Row): Sexp =
    SList(schema.fields.toList.zipWithIndex.map { case (f, i) =>
      Sexp.list(Atom(f.name), valueSexp(f.dataType, r.get(i)))
    })

  private def typeName(dt: DataType): String = dt match {
    case LongType | IntegerType => "integer"
    case DoubleType | FloatType => "rational"
    case BooleanType            => "boolean"
    case _                      => "string"
  }

  /** Query response: ≤ RowCap rows + truncation flag (the reference pulls
    * limit+? through the generator; here limit(RowCap+1) pushes the bound
    * into the plan). */
  private def relationSexp(df: DataFrame): Sexp = {
    val rows = df.limit(RowCap + 1).collect()
    val truncated = rows.length > RowCap
    val shown = rows.take(RowCap)
    val schemaSexp = SList(df.schema.fields.toList.map(f =>
      Sexp.list(Atom(f.name), Atom(typeName(f.dataType)))))
    SList(List(
      Atom("relation"),
      Sexp.list(Atom("schema"), schemaSexp),
      Sexp.list(Atom("rows"), SList(shown.toList.map(rowSexp(df.schema, _)))),
      Sexp.list(Atom("row_count"), Atom(shown.length.toString)),
      Sexp.list(Atom("truncated"), Atom(truncated.toString))) ++ stateFields)
  }

  private def okSexp(msg: String): Sexp =
    SList(List(Atom("ok"), Sexp.list(Atom("message"), Atom(msg))) ++ stateFields)

  /** Tag by runtime class (cursor batches carry column names only). */
  private def dynValueSexp(v: Any): Sexp = v match {
    case null                   => Sexp.list(Atom("Null"))
    case x: Long                => Sexp.list(Atom("Int"), Atom(x.toString))
    case x: Int                 => Sexp.list(Atom("Int"), Atom(x.toString))
    case x: Double              => Sexp.list(Atom("Float"), Atom(x.toString))
    case x: Float               => Sexp.list(Atom("Float"), Atom(x.toString))
    case x: Boolean             => Sexp.list(Atom("Bool"), Atom(x.toString))
    case x                      => Sexp.list(Atom("Str"), Atom(x.toString))
  }

  private def cursorSexp(b: graft.scl.Batch): Sexp = {
    val rowSexps = b.rows.toList.map { r =>
      SList(b.schema.toList.zipWithIndex.map { case (name, i) =>
        Sexp.list(Atom(name), dynValueSexp(r.get(i)))
      })
    }
    SList(List(
      Atom("cursor"),
      Sexp.list(Atom("id"), Atom(b.cursorId)),
      Sexp.list(Atom("rows"), SList(rowSexps)),
      Sexp.list(Atom("row_count"), Atom(b.rows.length.toString)),
      Sexp.list(Atom("has_more"), Atom(b.hasMore.toString))) ++ stateFields)
  }
}

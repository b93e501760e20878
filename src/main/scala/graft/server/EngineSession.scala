package graft.server

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.catalog.Catalog
import graft.dcl.Store
import graft.engine.{Database, DbCatalog}
import graft.scl.Cursors
import graft.sexp.Sexp
import graft.sexp.Sexp.{Atom, SList}

/** The listener-equivalent session: one mutable head database, a snapshot
  * store + branch registry, a cursor registry, and a dispatcher over the
  * six sublanguages (reference lib/listener.ml:17-59,156-187).
  *
  * The reference holds the head in a process-global Atomic and CASes it
  * per mutation (whole-database optimistic concurrency); a session here is
  * single-threaded by construction — mutations are serialized exactly as
  * the reference's effectively-single-writer design. Every successful
  * transition stores the new snapshot and advances the HEAD branch tip
  * (lib/listener.ml:47-51). */
sealed trait Response
final case class QueryResult(df: DataFrame) extends Response
final case class Transition(message: String) extends Response
final case class CursorBatch(batch: graft.scl.Batch) extends Response

final class EngineSession(spark: SparkSession, external: Option[Catalog] = None,
    persistDir: Option[String] = None) {
  val store = new Store
  val cursors = new Cursors
  private var dbOpt: Option[Database] = None

  // Snapshot hashes known to be fully on disk — saveSnapshot probes the
  // filesystem per call, so an unbounded history would cost O(history)
  // exists() round-trips per mutation without this cache.
  private val persisted = scala.collection.mutable.Set[String]()

  // disk storage backend: restore the persisted session at construction
  // (reference boots its storage from config the same way, bin/server.ml:
  // 3-12); write-through happens on every successful transition below
  for (dir <- persistDir if graft.engine.Persist.exists(spark, dir)) {
    dbOpt = graft.engine.Persist.restoreStore(spark, dir, store)
      .fold(e => throw new IllegalStateException(s"corrupt persisted store at $dir: $e"), identity)
    store.allSnapshots.foreach(d => persisted += d.hash)
    dbOpt.foreach(d => persisted += d.hash)
  }

  /** Write-through + durable chain checkpoint. Only snapshots not yet
    * known on disk are saved (one changed snapshot per transition in
    * steady state); then the current database is re-anchored on the
    * objects the save just wrote ([[graft.engine.Persist.reopen]]) —
    * each Dist relation's lineage is truncated at its content-addressed
    * parquet object, so per-save cost stays O(one mutation) instead of
    * re-executing a plan that grows with the chain, and a JVM crash at
    * any point loses at most the in-flight statement. */
  private def persist(): Unit =
    for (dir <- persistDir) {
      val fresh = (store.allSnapshots ++ dbOpt)
        .filterNot(d => persisted.contains(d.hash)).distinctBy(_.hash)
      fresh.foreach(graft.engine.Persist.saveSnapshot(spark, dir, _))
      fresh.foreach(d => persisted += d.hash)
      graft.engine.Persist.writeStoreFile(spark, dir, store, dbOpt)
      dbOpt = dbOpt.map { d =>
        val reopened = graft.engine.Persist.reopen(spark, dir, d)
        store.replace(reopened)
        reopened
      }
    }

  def db: Database = dbOpt.getOrElse(
    throw new IllegalStateException("no database; run (ddl (CreateDatabase name)) first"))

  /** Current database, if one has been created (listener rendering). */
  def current: Option[Database] = dbOpt

  /** Statements other than CreateDatabase need a current database; report
    * its absence as a Left (the execute contract), never an exception. */
  private def requireDb: Either[String, Database] =
    dbOpt.toRight("NoDatabase: run (ddl (CreateDatabase name)) first")

  /** Catalog layering: engine relations shadow the store-backed
    * sakura:branch / sakura:head generators, which shadow the external
    * (parquet) tables. */
  def catalog: Catalog = new Catalog {
    def resolve(name: String): Either[String, DataFrame] = name match {
      case "sakura:branch" => Right(store.branchDf(spark))
      case "sakura:head"   => Right(store.headDf(spark))
      case _ =>
        dbOpt match {
          case Some(d) => new DbCatalog(d, external).resolve(name)
          case None => external.toRight(s"RelationNotFound: $name").flatMap(_.resolve(name))
        }
    }
  }

  private def transition(newDb: Database, msg: String): Response = {
    dbOpt = Some(newDb)
    store.save(newDb)
    store.advanceHead(newDb.hash)
    persist()
    Transition(msg)
  }

  /** Dispatch one request (reference listener execute_command,
    * lib/listener.ml:40-45). Accepts `(tag stmt)` with tag ∈
    * drl|ddl|dml|icl|dcl|scl, or a bare statement (tried in that order). */
  def execute(text: String): Either[String, Response] =
    Sexp.parse(text).flatMap {
      case SList(List(Atom("drl"), q)) => runDrl(q)
      case SList(List(Atom("ddl"), s)) => runDdl(s)
      case SList(List(Atom("dml"), s)) => runDml(s)
      case SList(List(Atom("icl"), s)) => runIcl(s)
      case SList(List(Atom("dcl"), s)) => runDcl(s)
      case SList(List(Atom("scl"), s)) => runScl(s)
      case bare =>
        // decide by which parser ACCEPTS the form, so an execution error is
        // reported by the sublanguage that owns the statement rather than
        // masked by a later parser's parse error
        if (graft.ddl.Parser.ofSexp(bare).isRight) runDdl(bare)
        else if (graft.dml.Parser.ofSexp(bare).isRight) runDml(bare)
        else if (graft.icl.Parser.ofSexp(bare).isRight) runIcl(bare)
        else if (graft.dcl.Parser.ofSexp(bare).isRight) runDcl(bare)
        else if (graft.scl.Parser.ofSexp(bare).isRight) runScl(bare)
        else runDrl(bare)
    }

  private def runDrl(s: Sexp): Either[String, Response] =
    graft.drl.Parser.ofSexp(s).flatMap { q =>
      for {
        _ <- graft.drl.Gate.admit(catalog, q)
        df <- graft.drl.Compiler.compile(spark, catalog, q)
      } yield QueryResult(df)
    }

  private def runDdl(s: Sexp): Either[String, Response] =
    graft.ddl.Parser.ofSexp(s).flatMap {
      case stmt @ graft.ddl.Statement.CreateDatabase(_) =>
        graft.ddl.Executor.execute(spark, None, stmt).map(transition(_, s"ok"))
      case stmt =>
        requireDb.flatMap(cur => graft.ddl.Executor.execute(spark, Some(cur), stmt))
          .map(transition(_, s"ok"))
    }

  private def runDml(s: Sexp): Either[String, Response] =
    graft.dml.Parser.ofSexp(s).flatMap(stmt =>
      requireDb.flatMap(cur => graft.dml.Executor.execute(spark, cur, stmt, external))
        .map(transition(_, "ok")))

  private def runIcl(s: Sexp): Either[String, Response] =
    graft.icl.Parser.ofSexp(s).flatMap(stmt =>
      requireDb.flatMap(cur => graft.icl.Executor.execute(spark, cur, stmt))
        .map(transition(_, "ok")))

  private def runDcl(s: Sexp): Either[String, Response] =
    graft.dcl.Parser.ofSexp(s).flatMap(stmt =>
      requireDb.flatMap(cur => graft.dcl.Executor.execute(spark, store, cur, stmt)).map { case (newDb, msg) =>
        // branch ops switch/advance state but are not themselves content
        // mutations; Checkout/Merge change the current db
        dbOpt = Some(newDb)
        store.save(newDb)
        persist()
        Transition(msg)
      })

  private def runScl(s: Sexp): Either[String, Response] =
    graft.scl.Parser.ofSexp(s).flatMap(stmt =>
      graft.scl.Executor.execute(spark, catalog, cursors, dbOpt.map(_.hash).getOrElse(""), stmt)
        .map(CursorBatch(_)))
}

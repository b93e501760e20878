package graft.server

import org.apache.spark.sql.SparkSession
import graft.catalog.{Catalog, ParquetCatalog}
import graft.sexp.Sexp
import graft.sexp.Sexp.{Atom, SList}

/** Server boot from a configuration sexp — the reference's entry path
  * (reference bin/server.ml:3-12 → System.run_from_config,
  * lib/system.ml:106-111; config grammar lib/configuration.ml:35-61):
  *
  * {{{
  * (server
  *   (storage (memory))            ; engine state store: (memory) — the
  *                                 ;   reference's default backend — or
  *                                 ;   (disk /path/to/root) for durable
  *                                 ;   content-addressed state (Persist)
  *   (transport (tcp (port 4422))) ; port 0 = ephemeral
  *   (external /path/to/parquet))  ; OPTIONAL extension: a parquet
  *                                 ;   directory served as base tables
  * }}}
  *
  * The reference instantiates storage and transport from registries; the
  * Spark build has two storage regimes (in-process, and write-through
  * disk persistence via [[graft.engine.Persist]]) and one transport (the
  * TCP sexp listener); the config surface validates the same shape and
  * rejects unknown backends the same way (`Unknown storage/transport`).
  */
object Server {

  final case class Config(storage: String, port: Int, external: Option[String],
      storageDir: Option[String] = None)

  def parseConfig(text: String): Either[String, Config] =
    Sexp.parse(text).flatMap {
      case SList(Atom("server") :: fields) =>
        val fm = fields.collect { case SList(Atom(k) :: v) => k -> v }.toMap
        for {
          storagePair <- fm.get("storage").toRight("missing field: storage").flatMap {
            case List(SList(List(Atom("disk"), Atom(dir)))) => Right(("disk", Some(dir)))
            case List(SList(Atom("disk") :: _)) => Left("disk storage needs a root path: (disk /path)")
            case List(SList(Atom(kind) :: _)) => Right((kind, None))
            case List(Atom(kind))             => Right((kind, None))
            case o => Left(s"bad storage: ${SList(o).render}")
          }
          (storage, storageDir) = storagePair
          _ <- if (storage == "memory" || storage == "disk") Right(())
               else Left(s"Unknown storage backend: $storage")
          port <- fm.get("transport").toRight("missing field: transport").flatMap {
            case List(SList(Atom("tcp") :: tcpFields)) =>
              tcpFields.collectFirst { case SList(List(Atom("port"), Atom(p))) => p } match {
                case Some(p) => p.toIntOption.toRight(s"bad port: $p")
                case None    => Right(0) // ephemeral, as the test transports use
              }
            case o => Left(s"Unknown transport: ${SList(o).render}")
          }
          external = fm.get("external").collectFirst { case List(Atom(dir)) => dir }
        } yield Config(storage, port, external, storageDir)
      case other => Left(s"config must be a (server ...) form, got: ${other.render}")
    }

  /** Boot a listener from a config string on an existing session. A
    * corrupt persisted store surfaces on the SAME error channel as a
    * bad config — callers handle one Either, not an Either plus an
    * escaping constructor exception. */
  def boot(spark: SparkSession, configText: String): Either[String, Listener] =
    parseConfig(configText).flatMap { cfg =>
      val external: Option[Catalog] = cfg.external.map(new ParquetCatalog(spark, _))
      try Right(new Listener(spark, external, cfg.port, cfg.storageDir).start())
      catch { case e: IllegalStateException => Left(e.getMessage) }
    }

  /** `runMain graft.Server <config-file | config-sexp>`; with no args,
    * a memory/tcp default on an ephemeral port. Blocks forever. */
  def main(args: Array[String]): Unit = {
    val configText = args.headOption match {
      case Some(a) if new java.io.File(a).isFile =>
        new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(a)), "UTF-8")
      case Some(a) => a
      case None => "(server (storage (memory)) (transport (tcp (port 0))))"
    }
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_MASTER", "local[*]"))
      .appName("graft-server")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    boot(spark, configText) match {
      case Left(err) =>
        System.err.println(s"config error: $err")
        sys.exit(2)
      case Right(listener) =>
        println(s"graft server listening on port ${listener.localPort}")
        Thread.currentThread.join() // serve until killed
    }
  }
}

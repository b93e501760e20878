package graft.server

import java.net.Socket
import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.nio.charset.StandardCharsets
import graft.SparkTestBase

/** Config-sexp boot (reference bin/server.ml + lib/configuration.ml):
  * parse, reject unknown backends, and round-trip a query over the TCP
  * listener the config produced. */
class ServerSpec extends SparkTestBase {

  test("config parsing: shapes, defaults, unknown backends") {
    assert(Server.parseConfig("(server (storage (memory)) (transport (tcp (port 4422))))") ==
      Right(Server.Config("memory", 4422, None)))
    assert(Server.parseConfig("(server (storage (memory)) (transport (tcp)))") ==
      Right(Server.Config("memory", 0, None)))
    assert(Server.parseConfig(
      "(server (storage (memory)) (transport (tcp (port 0))) (external /data/sf1))") ==
      Right(Server.Config("memory", 0, Some("/data/sf1"))))
    assert(Server.parseConfig("(server (storage (disk /var/graft)) (transport (tcp (port 1))))") ==
      Right(Server.Config("disk", 1, None, Some("/var/graft"))))
    assert(Server.parseConfig("(server (storage (disk)) (transport (tcp)))")
      .left.exists(_.contains("root path")))
    assert(Server.parseConfig("(server (storage (sqlite)) (transport (tcp (port 1))))")
      .left.exists(_.startsWith("Unknown storage")))
    assert(Server.parseConfig("(server (storage (memory)) (transport (carrier-pigeon)))")
      .left.exists(_.startsWith("Unknown transport")))
    assert(Server.parseConfig("(client)").isLeft)
    assert(Server.parseConfig("(server (transport (tcp)))")
      .left.exists(_.contains("storage")))
  }

  test("boot from a config string and round-trip a session over TCP") {
    val listener = Server.boot(spark,
      "(server (storage (memory)) (transport (tcp (port 0))))")
      .fold(e => fail(e), identity)
    val sock = new Socket("127.0.0.1", listener.localPort)
    try {
      val out = new PrintWriter(sock.getOutputStream, true, StandardCharsets.UTF_8)
      val in = new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
      def req(s: String): String = { out.println(s); in.readLine() }
      assert(req("(ddl (CreateDatabase g))").startsWith("(ok"))
      assert(req("(ddl (CreateRelation (name t) (schema ((k integer)))))").startsWith("(ok"))
      assert(req("(dml (InsertTuple (relation t) (attributes ((k (Int 7))))))").startsWith("(ok"))
      val resp = req("(drl (Base t))")
      assert(resp.startsWith("(relation") && resp.contains("(Int 7)"), resp)
    } finally { sock.close(); listener.close() }
  }

  test("disk storage backend: state written by one server boot serves the next") {
    val dir = java.nio.file.Files.createTempDirectory("graft-server-disk").toString
    val cfg = s"(server (storage (disk $dir)) (transport (tcp (port 0))))"
    def roundTrip(reqs: Seq[String]): Seq[String] = {
      val listener = Server.boot(spark, cfg).fold(e => fail(e), identity)
      val sock = new Socket("127.0.0.1", listener.localPort)
      try {
        val out = new PrintWriter(sock.getOutputStream, true, StandardCharsets.UTF_8)
        val in = new BufferedReader(new InputStreamReader(sock.getInputStream, StandardCharsets.UTF_8))
        reqs.map { r => out.println(r); in.readLine() }
      } finally { sock.close(); listener.close() }
    }
    val first = roundTrip(Seq(
      "(ddl (CreateDatabase g))",
      "(ddl (CreateRelation (name t) (schema ((k integer)))))",
      "(dml (InsertTuple (relation t) (attributes ((k (Int 7))))))"))
    assert(first.forall(_.startsWith("(ok")), first)
    // a BRAND NEW listener over the same storage root sees the state
    val second = roundTrip(Seq("(drl (Base t))"))
    assert(second.head.startsWith("(relation") && second.head.contains("(Int 7)"), second.head)
  }
}

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
}

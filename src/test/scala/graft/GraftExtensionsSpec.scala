package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The extensions entry point drives a REAL session build: functions
  * must resolve from SQL text with no runtime registration call. The
  * spec builds a FRESH session instance (sharing the JVM's
  * SparkContext) so resolution cannot ride on another suite's runtime
  * registration, and restores the shared session afterwards. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("spark.sql.extensions=graft.GraftExtensions resolves the native functions in SQL") {
    val shared = SparkTestBase.spark // ensure the context exists
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // Spark 4 resolves spark.sql.extensions from the SparkContext conf
    // (immutable once launched), so the spec drives the SAME entry
    // point programmatically: withExtensions applies the identical
    // Function1 the config path class-loads at cluster launch
    try {
      val fresh = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new GraftExtensions())
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate() // new session instance on the existing context
      assert(fresh ne shared, "builder must create a fresh session for extensions to apply")
      val dot = fresh.sql(
        "SELECT graft_dot(array(1.0D, 2.0D, 3.0D), array(4.0D, 5.0D, 6.0D)) AS d")
        .collect().head.getDouble(0)
      assert(dot == 32.0)
      val code = fresh.sql(
        """SELECT graft_pq_encode(array(CAST(0.9 AS FLOAT), CAST(0.1 AS FLOAT)),
          |  array(array(1.0D, 0.0D), array(0.0D, 1.0D)), array(7, 3)) AS c""".stripMargin)
        .collect().head.getInt(0)
      assert(code == 7)
      // SOI + APP0(len 4) + SOF0 at 1-based offset 9
      val sof = fresh.sql(
        "SELECT graft_jpeg_sof(X'FFD8FFE00004AAAAFFC0', 8) AS s")
        .collect().head.getLong(0)
      assert(sof == 9L)
      // the shared session (no extensions, no prior runtime registration
      // in THIS suite) must not see the injected function spuriously —
      // unless another suite already registered it at runtime, which is
      // exactly the dual path the production code supports; so only
      // assert the fresh session's resolution, not the shared one's.
    } finally {
      // do NOT stop the fresh session (it shares the SparkContext);
      // restore the shared session as active/default for later suites
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}

package graft.server

import graft.SparkTestBase

/** Contract of the multi-writer CAS measurement harness
  * ([[CasLadder]], run as `scaleprobe_caswriters_x{1,4,8}`):
  * exactly-once convergence at every writer count, zero retries when
  * there is no contention, and retries only ever the CONTENTION signal
  * — never lost or doubled commits. */
class CasLadderSpec extends SparkTestBase {

  private val sfDir = "/root/testdata/sf0.001"

  test("single writer: zero conflicts, every insert lands exactly once") {
    val r = CasLadder.run(spark, sfDir, writers = 1, totalInserts = 24)
    assert(r.rowsLanded == 24L)
    assert(r.retries == 0L,
      s"a lone writer conflicted ${r.retries} times — snapshots are going stale without cause")
  }

  test("contended writers: exactly-once convergence; retries counted, not hidden") {
    val r = CasLadder.run(spark, sfDir, writers = 8, totalInserts = 48)
    assert(r.rowsLanded == 48L,
      s"converged set ${r.rowsLanded} != 48 — atomicity or exactly-once broke under contention")
    info(s"8 writers x 6 inserts: ${r.retries} conflict retries")
  }
}

package graft.scl

import graft.SparkTestBase
import graft.server.EngineSession

/** SCL cursor behavior (reference lib/session.ml tests + scl executor). */
class SclSpec extends SparkTestBase {

  private def session: EngineSession = {
    val s = new EngineSession(spark)
    def run(t: String) = s.execute(t).fold(e => fail(s"$t -> $e"), identity)
    run("(CreateDatabase scltest)")
    run("(CreateRelation (name nums) (schema ((n integer))))")
    run("(InsertTuples (relation nums) (tuples " +
      (1 to 12).map(i => s"((n (Int $i)))").mkString("(", " ", ")") + "))")
    s
  }

  private def batchOf(s: EngineSession, r: Either[graft.Err, graft.server.Response]): graft.scl.Batch =
    r.fold(e => fail(e.message), {
      case graft.server.CursorBatch(b) => b
      case o => fail(s"expected CursorBatch, got $o")
    })

  test("Begin returns the first batch and a cursor id; Fetch continues; exhaustion auto-closes") {
    val s = session
    val b1 = batchOf(s, s.execute("(scl (Begin (query (Base nums)) (limit 5)))"))
    assert(b1.rows.length == 5 && b1.hasMore)
    assert(b1.cursorId.length == 64)
    val b2 = batchOf(s, s.execute(s"(Fetch (cursor ${b1.cursorId}) (limit 5))"))
    assert(b2.rows.length == 5 && b2.hasMore)
    val b3 = batchOf(s, s.execute(s"(Fetch (cursor ${b1.cursorId}) (limit 5))"))
    assert(b3.rows.length == 2 && !b3.hasMore)
    assert(s.cursors.open == 0) // auto-removed on exhaustion
    assert(s.execute(s"(Fetch (cursor ${b1.cursorId}))").isLeft)
    // all 12 values streamed exactly once
    assert((b1.rows ++ b2.rows ++ b3.rows).map(_.getLong(0)).sorted == (1L to 12L))
  }

  test("default batch is 50 (reference scl/executor.ml:1)") {
    val s = session
    val b = batchOf(s, s.execute("(Begin (query (Base nums)))"))
    assert(b.rows.length == 12 && !b.hasMore)
  }

  test("cursors pin the snapshot they were begun on (reference session.ml:11)") {
    val s = session
    val b1 = batchOf(s, s.execute("(Begin (query (Base nums)) (limit 3))"))
    // mutate AFTER the cursor was opened
    s.execute("(InsertTuple (relation nums) (attributes ((n (Int 99)))))")
      .fold(e => fail(e.message), identity)
    var rows = b1.rows.map(_.getLong(0))
    var cur = b1
    while (cur.hasMore) {
      cur = batchOf(s, s.execute(s"(Fetch (cursor ${b1.cursorId}) (limit 3))"))
      rows = rows ++ cur.rows.map(_.getLong(0))
    }
    assert(rows.sorted == (1L to 12L)) // 99 is invisible to the open cursor
  }

  test("Close removes the cursor") {
    val s = session
    val b = batchOf(s, s.execute("(Begin (query (Base nums)) (limit 2))"))
    s.execute(s"(Close (cursor ${b.cursorId}))").fold(e => fail(e.message), identity)
    assert(s.cursors.open == 0)
    assert(s.execute(s"(Fetch (cursor ${b.cursorId}))").isLeft)
  }

  test("Begin applies the finiteness gate") {
    val s = session
    assert(s.execute("(Begin (query (Base natural_plus)))").isLeft)
  }
}

package graft.operators

import graft.SparkTestBase

class CompactionSpec extends SparkTestBase {
  import spark.implicits._

  private def plan(rows: Seq[(String, Long, Long)], target: Long) =
    Layout.compactionPlan(rows.toDF("grp", "ord", "sz"), "grp", "ord", "sz", target)
      .collect()
      .map(r => ((r.getString(0), r.getLong(1)),
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap

  test("files pack in order until the target, then a new bin opens") {
    // sizes 60,60,60 at target 100: file2 starts at bytes-before=60 → bin 0
    // (first-fit: the bin a file STARTS in), file3 at 120 → bin 1
    val p = plan(Seq(("a", 1L, 60L), ("a", 2L, 60L), ("a", 3L, 60L)), 100L)
    assert(p(("a", 0L)) === ((2L, 120L, 1L, 2L)))
    assert(p(("a", 1L)) === ((1L, 60L, 3L, 3L)))
  }

  test("groups pack independently and key ranges never interleave") {
    // group a: starts at 0, 90, 180 → bins 0, 0, 1 (a file lands in the
    // bin its START falls in); group b is untouched by a's fill level
    val p = plan(Seq(
      ("a", 1L, 90L), ("a", 2L, 90L), ("a", 3L, 90L),
      ("b", 1L, 10L), ("b", 2L, 10L)), 100L)
    assert(p.keySet === Set(("a", 0L), ("a", 1L), ("b", 0L)))
    // within a group, bin n's last_key < bin n+1's first_key (order kept)
    assert(p(("a", 0L))._4 < p(("a", 1L))._3)
    assert(p(("b", 0L)) === ((2L, 20L, 1L, 2L)))
  }

  test("an oversized single file gets its own bin and displaces the next") {
    val p = plan(Seq(("a", 1L, 250L), ("a", 2L, 10L)), 100L)
    // file1 starts at 0 → bin 0 (even though it alone exceeds target);
    // file2 starts at 250 → bin 2 — the fill-level rule, not a file count
    assert(p(("a", 0L)) === ((1L, 250L, 1L, 1L)))
    assert(p(("a", 2L)) === ((1L, 10L, 2L, 2L)))
  }

  test("plan totals conserve every byte and every file") {
    val files = (1L to 100L).map(i => ("g", i, (i * 37) % 90 + 1))
    val p = plan(files, 256L)
    assert(p.values.map(_._1).sum === 100L)
    assert(p.values.map(_._2).sum === files.map(_._3).sum)
  }

  test("non-positive target is refused") {
    intercept[IllegalArgumentException] {
      Layout.compactionPlan(Seq(("a", 1L, 1L)).toDF("g", "o", "s"), "g", "o", "s", 0L)
    }
  }
}

package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Incremental connected components over streaming edge batches: the
  * hand-traced cross-batch merge (FIXTURES §4). Orders arrive one per
  * micro-batch (ok-range chunking, width 1): batch 0 creates component
  * {1,2}, batch 1 creates {3,4}, batch 2's edge (2,3) must MERGE the two
  * existing components through the label forest — the case that
  * distinguishes incremental maintenance from per-batch recompute — and
  * batch 3's single-part order contributes the isolated vertex 9. */
class StreamComponentsSpec extends SparkTestBase {
  import spark.implicits._

  test("cross-batch component merge lands on the batch answer (hand-traced)") {
    val work = Files.createTempDirectory("graft-streamcc-spec").toString
    val sfDir = s"$work/sf"
    Seq(
      (1L, 50L, 1L), (1L, 50L, 2L),   // batch 0: edge 1-2
      (2L, 50L, 3L), (2L, 50L, 4L),   // batch 1: edge 3-4
      (3L, 50L, 2L), (3L, 50L, 3L),   // batch 2: edge 2-3 merges both
      (4L, 50L, 9L),                  // batch 3: isolated vertex
      (5L, 10L, 7L))                  // filtered out (quantity ≤ 45)
      .toDF("l_orderkey", "l_quantity", "l_partkey")
      .write.parquet(s"$sfDir/lineitem.parquet")
    val got = StreamOracle.incrementalComponents(spark, sfDir, s"$work/cc")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 1L), (2L, 1L), (3L, 1L), (4L, 1L), (9L, 9L)))
  }
}

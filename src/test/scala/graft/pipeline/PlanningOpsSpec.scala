package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Specs for the planning/profiling operators added in round 10:
  * FK-candidate discovery, range-partition boundaries, and the
  * padding census. */
class PlanningOpsSpec extends SparkTestBase {
  import spark.implicits._

  test("fkCandidates: a true FK reads 1.0/1.0, a violated one and a non-key discriminate") {
    val dim = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "name")
    val factOk = Seq((10L, 1L), (11L, 2L), (12L, 2L), (13L, 3L)).toDF("fid", "ref")
    val factBad = Seq((20L, 1L), (21L, 9L)).toDF("fid", "ref") // 9 dangles
    val dupDim = Seq((1L, "x"), (1L, "y"), (2L, "z"), (3L, "w")).toDF("id", "name") // non-unique
    val r = Profile.fkCandidates(Seq(
        ("factOk", factOk, "ref", "dim", dim, "id"),
        ("factBad", factBad, "ref", "dim", dim, "id"),
        ("factOk", factOk, "ref", "dupDim", dupDim, "id")))
      .collect().map(x => x.getString(0) + "->" + x.getString(1) ->
        ((x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5), x.getDouble(6)))).toMap
    assert(r("factOk.ref->dim.id") == ((3L, 3L, 3L, 1.0, 1.0)))
    assert(r("factBad.ref->dim.id") == ((2L, 3L, 1L, 0.5, 1.0)))
    // containment still 1.0 but uniqueness flags the dup dimension
    val dup = r("factOk.ref->dupDim.id")
    assert(dup._4 == 1.0 && dup._5 < 1.0)
  }

  test("rangeBounds: cut points are the exact sample quantiles, in order") {
    // rate 1.0 => every row sampled: quantiles over 0..99 are exact
    val df = (0L until 100L).map(i => (i, i * 10L)).toDF("id", "k")
    val r = graft.operators.Layout.rangeBounds(df, col("id"), col("k"),
        numPartitions = 4, rate = 1.0)
      .collect().map(x => (x.getInt(0), x.getDouble(1), x.getDouble(2))).sortBy(_._1)
    assert(r.map(_._1).toSeq == Seq(1, 2, 3))
    assert(r.map(_._2).toSeq == Seq(0.25, 0.5, 0.75))
    // (n-1)*q interpolation over 0,10,...,990: q=0.25 -> 247.5
    assert(r.map(_._3).toSeq == Seq(247.5, 495.0, 742.5))
    // boundaries from a real Bernoulli sample are monotone too
    val s = graft.operators.Layout.rangeBounds(df, col("id"), col("k"),
        numPartitions = 8, rate = 0.5)
      .collect().map(x => (x.getInt(0), x.getDouble(2))).sortBy(_._1).map(_._2)
    assert(s.length == 7 && s.zip(s.tail).forall { case (a, b) => a <= b })
  }

  test("paddingCensus: bucket edges, masses, and waste ratios match by hand") {
    val df = Seq(
      (1L, (1 to 10).map(i => s"t$i").mkString(" ")),   // 10 -> bucket 16
      (2L, (1 to 16).map(i => s"t$i").mkString(" ")),   // 16 -> bucket 16
      (3L, (1 to 17).map(i => s"t$i").mkString(" ")),   // 17 -> bucket 32
      (4L, (1 to 5000).map(i => s"t$i").mkString(" ")), // 5000 -> top bucket 4096
    ).toDF("doc_id", "text")
    val r = Packing.paddingCensus(df, "doc_id", "text").collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getDouble(4)))).toMap
    assert(r(16L) == ((2L, 26L, 32L, math.rint((32 - 26) / 32.0 * 10000) / 10000)))
    assert(r(32L) == ((1L, 17L, 32L, math.rint((32 - 17) / 32.0 * 10000) / 10000)))
    // over-length docs land in the top bucket (waste can be negative —
    // the census SHOWS that the top edge truncates nothing, it just
    // under-pads; the consumer picks edges so this bucket is empty)
    assert(r(4096L)._1 == 1L && r(4096L)._2 == 5000L)
  }
}

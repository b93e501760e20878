package graft.pipeline

import graft.SparkTestBase

class ProfileSpec extends SparkTestBase {
  import spark.implicits._

  private def profile(df: org.apache.spark.sql.DataFrame): Map[String, (Long, Long)] =
    Profile.columns(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("null and distinct counts per column; NULL is not a distinct value") {
    val df = Seq(
      (Some(1L), Some("a")), (Some(1L), None), (Some(2L), Some("a")), (None, Some("b")))
      .toDF("x", "s")
    assert(profile(df) === Map("x" -> (1L, 2L), "s" -> (1L, 2L)))
  }

  test("doubles profile by value (string cast is injective)") {
    val df = Seq(1.0, 1.5, 1.5, -1.5).toDF("d")
    assert(profile(df) === Map("d" -> (0L, 3L)))
  }

  test("an all-null column reports zero distinct; a constant column one") {
    val df = Seq((None: Option[Long], "k"), (None, "k")).toDF("n", "c")
    assert(profile(df) === Map("n" -> (2L, 0L), "c" -> (0L, 1L)))
  }

  test("empty input: one row per column with zero counts is NOT emitted (no groups)") {
    val df = Seq.empty[(Long, String)].toDF("x", "s")
    assert(Profile.columns(df).count() === 0L)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

class GlobalRankSpec extends SparkTestBase {
  import spark.implicits._

  // deliberately non-divisible sizes: the remainder distribution (first
  // n mod b tiles get the extra row) is where a naive formula diverges
  // from SQL ntile
  private val sizes = Seq(1, 7, 10, 23, 100, 101)

  test("withRank matches the single-partition row_number on a total order") {
    val df = (1 to 97).map(i => (i.toLong, (i * 37 % 89).toLong)).toDF("id", "v")
    val got = GlobalRank.withRank(df, Seq("v", "id"), "r")
      .select("id", "r").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val want = df.withColumn("r", row_number().over(Window.orderBy($"v", $"id")))
      .select("id", "r").collect().map(r => (r.getLong(0), r.getInt(1).toLong)).toMap
    assert(got === want)
  }

  test("withNtile matches SQL ntile for every size × bucket combination") {
    for (n <- sizes; b <- Seq(1, 3, 10)) {
      val df = (1 to n).map(i => (i.toLong, (i * 13 % 31).toLong)).toDF("id", "v")
      val got = GlobalRank.withNtile(df, Seq("v", "id"), b, "t")
        .select("id", "t").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      val want = df.withColumn("t", ntile(b).over(Window.orderBy($"v", $"id")))
        .select("id", "t").collect().map(r => (r.getLong(0), r.getInt(1))).toMap
      assert(got === want, s"n=$n b=$b")
    }
  }

  test("plan: parallel range exchange, window partitioned — no global sort task") {
    val df = (1 to 500).map(i => (i.toLong, (i * 7 % 97).toLong)).toDF("id", "v")
    val out = GlobalRank.withNtile(df, Seq("v", "id"), 10)
    out.count()
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan)
    // every Window node keys on the partition id — none runs one-task
    plan.split("\n").filter(_.contains("Window ")).foreach(l =>
      assert(l.contains("__pid"), s"unpartitioned window: $l"))
  }
}

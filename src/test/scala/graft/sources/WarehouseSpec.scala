package graft.sources

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WarehouseSpec extends SparkTestBase {
  import spark.implicits._

  test("same-key same-count bucketed tables join with ZERO exchange") {
    val facts = (1L to 2000L).map(i => (i % 97, i)).toDF("k", "fv")
    val dims = (0L until 97L).map(k => (k, s"d$k")).toDF("k", "dv")
    Warehouse.writeBucketed(facts, "wh_facts", "k", buckets = 8)
    Warehouse.writeBucketed(dims, "wh_dims", "k", buckets = 8)
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force the shuffle-join path so the assertion is about bucketing,
      // not about the dim side happening to broadcast
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("wh_facts").join(spark.table("wh_dims"), "k")
      assert(joined.count() === 2000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffled:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
      spark.sql("DROP TABLE IF EXISTS wh_facts")
      spark.sql("DROP TABLE IF EXISTS wh_dims")
    }
  }

  test("mismatched bucket counts fall back to a correct (shuffled) join") {
    val a = (1L to 100L).map(i => (i % 7, i)).toDF("k", "av")
    val b = (0L until 7L).map(k => (k, k * 10)).toDF("k", "bv")
    Warehouse.writeBucketed(a, "wh_a", "k", buckets = 4)
    Warehouse.writeBucketed(b, "wh_b", "k", buckets = 3)
    try {
      val joined = spark.table("wh_a").join(spark.table("wh_b"), "k")
      assert(joined.count() === 100) // correctness never depends on layout
    } finally {
      spark.sql("DROP TABLE IF EXISTS wh_a")
      spark.sql("DROP TABLE IF EXISTS wh_b")
    }
  }

  test("partitioned parquet prunes non-matching partitions at planning time") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = Seq(
      (1L, "en", "aaa"), (2L, "en", "bbb"), (3L, "de", "ccc"), (4L, "fr", "ddd"))
      .toDF("doc_id", "lang", "text")
    Warehouse.writePartitioned(docs, dir, Seq("lang"))
    val en = spark.read.parquet(dir).filter(col("lang") === "en")
    assert(en.count() === 2)
    val plan = en.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("lang"),
      s"no partition pruning in plan:\n$plan")
    // the predicate lives in PartitionFilters (resolved from directory
    // names at planning time), NOT in DataFilters/PushedFilters
    val scanLine = plan.split("\n").find(_.contains("PartitionFilters")).getOrElse("")
    assert("""PartitionFilters: \[[^\]]*\(lang#\d+ = en\)""".r.findFirstIn(scanLine).isDefined,
      s"partition predicate missing from PartitionFilters:\n$scanLine")
    assert(scanLine.contains("DataFilters: []"),
      s"lang predicate leaked into DataFilters:\n$scanLine")
    // directory layout on disk: one subdir per lang
    val subdirs = new java.io.File(dir).list().filter(_.startsWith("lang=")).sorted
    assert(subdirs.toSeq === Seq("lang=de", "lang=en", "lang=fr"))
  }
}

package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class FuzzySpec extends SparkTestBase {
  import spark.implicits._

  private def pairs(names: Seq[String], maxDist: Int, maxBlock: Long = 10000L): Set[(String, String, Long)] =
    Fuzzy.blockedPairs(names.toDF("s"), "s", n => substring(n, 1, 1),
      maxDist, maxBlock)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

  test("within-block pairs under the bound, with exact distances") {
    // block 'c': cat/car dist 1, cat/cart 1, car/cart 1; block 'd': dog alone
    assert(pairs(Seq("cat", "car", "cart", "dog"), 1) === Set(
      ("car", "cat", 1L), ("car", "cart", 1L), ("cart", "cat", 1L)))
  }

  test("cross-block near-misses are not candidates (blocking is the contract)") {
    // "bat" vs "cat" is dist 1 but blocks differ — by design, absent
    assert(pairs(Seq("bat", "cat"), 1) === Set.empty)
  }

  test("duplicates collapse before pairing; left < right exactly once") {
    val ps = pairs(Seq("cat", "cat", "car", "car"), 1)
    assert(ps === Set(("car", "cat", 1L)))
  }

  test("length pre-filter keeps the |len diff| == maxDist boundary pair") {
    // "ca" -> "cart" needs 2 inserts: dist 2 with len diff exactly 2
    assert(pairs(Seq("ca", "cart"), 2).contains(("ca", "cart", 2L)))
  }

  test("an oversized block is dropped whole") {
    val names = (1 to 6).map(i => s"aa$i") :+ "bat" :+ "bit"
    assert(pairs(names, 2, maxBlock = 5L) === Set(("bat", "bit", 1L)))
  }

  test("nulls are ignored") {
    val df = Seq(Some("cat"), None, Some("car")).toDF("s")
    val out = Fuzzy.blockedPairs(df, "s", n => substring(n, 1, 1), 1)
    assert(out.collect().length === 1)
  }

  test("plan: candidates come from an equi-join on the block key") {
    val df = Seq("cat", "car").toDF("s")
    val plan = Fuzzy.blockedPairs(df, "s", n => substring(n, 1, 1), 1)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}

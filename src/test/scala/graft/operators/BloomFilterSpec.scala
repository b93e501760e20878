package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class BloomFilterSpec extends SparkTestBase {
  import spark.implicits._

  test("no false negatives: every dim key passes its own filter") {
    val dim = (1L to 500L).map(k => Tuple1(k * 7)).toDF("k")
    val words = BloomFilter.build(dim, "k").toSeq
    val misses = dim.filter(!BloomFilter.mightContain(col("k"), words)).count()
    assert(misses == 0L)
  }

  test("false positives are rare and bounded; stats row is consistent") {
    val dim = (1L to 100L).map(Tuple1(_)).toDF("k")
    val fact = (1L to 10000L).map(Tuple1(_)).toDF("k")
    val r = BloomFilter.semiJoinStats(fact, "k", dim, "k").collect().head
    val (nFact, nExact, nPass, nFp) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(nFact == 10000L && nExact == 100L)
    assert(nPass >= nExact && nPass <= nFact) // no false negatives, sane bound
    assert(nFp == nPass - nExact)
    // 300 set bits in 65536 → per-probe hit ~0.5%, 3 probes → fpp ~1e-7;
    // allow vast slack so the spec never flakes on hash coincidence
    assert(nFp <= 50L)
  }

  test("bloom probe lands in the parquet scan's DataFilters, not post-scan") {
    val fact = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val dim = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderpriority") === "1-URGENT")
    val words = BloomFilter.build(dim, "o_orderkey").toSeq
    val plan = fact.filter(BloomFilter.mightContain(col("l_orderkey"), words))
      .queryExecution.executedPlan.toString
    val scanLine = plan.split("\n").find(_.contains("DataFilters")).getOrElse("")
    assert(scanLine.contains("shiftright"), s"probe not pushed into scan: $scanLine")
  }

  test("build emits exactly m/64 words with at most k bits per key") {
    val dim = Seq(Tuple1(42L)).toDF("k")
    val words = BloomFilter.build(dim, "k", mBits = 256, kHashes = 3)
    assert(words.length == 4)
    assert(words.map(java.lang.Long.bitCount).sum <= 3) // ≤ k (collisions allowed)
    // determinism: same input, same bitset
    assert(BloomFilter.build(dim, "k", mBits = 256, kHashes = 3).toSeq == words.toSeq)
  }

  test("null dim keys are dropped at build, not a driver NPE") {
    val dim = Seq(Some(5L), None, Some(9L)).toDF("k")
    val words = BloomFilter.build(dim, "k")
    val fact = Seq(Some(5L), Some(9L), Some(6L), None).toDF("k")
    val pass = fact.filter(BloomFilter.mightContain(col("k"), words))
      .collect().flatMap(r => Option(r.get(0)))
    assert(pass.toSet.intersect(Set[Any](5L, 9L)) == Set[Any](5L, 9L)) // no false negatives
    assert(!pass.contains(null)) // null probe yields null predicate -> filtered
  }

  test("empty dimension set: all-zero bitset admits nothing") {
    val dim = Seq.empty[Tuple1[Long]].toDF("k")
    val words = BloomFilter.build(dim, "k")
    assert(words.forall(_ == 0L))
    val fact = (1L to 50L).map(Tuple1(_)).toDF("k")
    assert(fact.filter(BloomFilter.mightContain(col("k"), words)).count() == 0L)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean

class SaltedJoinSpec extends SparkTestBase {
  import spark.implicits._

  test("salted join equals the plain join on a pathologically skewed key") {
    // 5000 probe rows, 90% on one key — the shape that melts one reducer
    val probe = (1L to 5000L).map(i => (if (i % 10 == 0) i % 7 else 1L, i))
      .toDF("k", "pv")
    val build = (0L to 7L).map(k => (k, s"dim$k")).toDF("k", "bv")
    val plain = probe.join(build, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    val salted = SaltedJoin.inner(probe, build, Seq("k"), saltFactor = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted.toSeq
    assert(salted === plain)
  }

  test("the salt genuinely splits a hot key across reducers") {
    val probe = Seq.fill(1000)(1L).zipWithIndex.map { case (k, i) => (k, i.toLong) }
      .toDF("k", "pv")
    val build = Seq((1L, "x")).toDF("k", "bv")
    val salted = probe.withColumn("__salt",
      pmod(xxhash64(col("k"), col("pv")), lit(8)).cast("int"))
    val buckets = salted.groupBy("__salt").count().collect().map(_.getLong(1))
    assert(buckets.length > 4, s"hot key not split: ${buckets.toSeq}")
    assert(buckets.max < 1000, "all rows landed in one salt bucket")
  }

  test("build-side duplicates and probe-side duplicates keep join multiplicity") {
    val checkParams = org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(20)
    val genProbe = Gen.listOfN(30, Gen.zip(Gen.choose(1L, 4L), Gen.choose(1L, 5L)))
    val genBuild = Gen.listOfN(10, Gen.zip(Gen.choose(1L, 6L), Gen.choose(1L, 3L)))
    val prop = Prop.forAll(genProbe, genBuild, Gen.choose(1, 6)) { (ps, bs, salt) =>
      (ps.nonEmpty && bs.nonEmpty) ==> {
        val p = ps.toDF("k", "pv")
        val b = bs.toDF("k", "bv")
        def multiset(rows: Array[org.apache.spark.sql.Row]) =
          rows.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
            .groupBy(identity).view.mapValues(_.size).toMap
        multiset(SaltedJoin.inner(p, b, Seq("k"), salt).collect()) ==
          multiset(p.join(b, Seq("k")).collect())
      }
    }
    val res = org.scalacheck.Test.check(checkParams, prop)
    assert(res.passed, res.status.toString)
  }
}

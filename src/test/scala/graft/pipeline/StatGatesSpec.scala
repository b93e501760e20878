package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Planted-fixture semantics for the statistical gate operators added
  * in the round-10 closing session (testdata-scale behavior is pinned
  * by their DuckDB oracle rows at two scale factors). */
class StatGatesSpec extends SparkTestBase {
  import spark.implicits._

  test("cramersV: perfect association scores 1, independence scores 0") {
    val perfect = (Seq.fill(5)(("x", "u")) ++ Seq.fill(5)(("y", "v")))
      .toDF("a", "b")
    val p = Profile.cramersV(perfect, "a", Seq("x", "y"), "b", Seq("u", "v"))
      .collect()(0)
    assert(p.getLong(0) == 10L && p.getDouble(2) == 1.0)
    val indep = (for (a <- Seq("x", "y"); b <- Seq("u", "v"); _ <- 1 to 3)
      yield (a, b)).toDF("a", "b")
    val i = Profile.cramersV(indep, "a", Seq("x", "y"), "b", Seq("u", "v"))
      .collect()(0)
    assert(i.getDouble(1) == 0.0 && i.getDouble(2) == 0.0)
  }

  test("ksDrift: identical distributions score 0, disjoint score 1") {
    val same = (1 to 4).flatMap(v => Seq((v.toLong, "a"), (v.toLong, "b")))
      .toDF("v", "side")
    val s = Profile.ksDrift(same, col("v"), col("side") === "a", col("side") === "b")
      .collect()(0)
    assert(s.getLong(2) == 0L && s.getDouble(3) == 0.0)
    val disj = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "b")).toDF("v", "side")
    val d = Profile.ksDrift(disj, col("v"), col("side") === "a", col("side") === "b")
      .collect()(0)
    assert(d.getLong(0) == 2L && d.getLong(1) == 2L)
    assert(d.getLong(2) == 4L && d.getDouble(3) == 1.0) // D·n_a·n_b = n_a·n_b
  }

  test("benford: digit ladder extracts leading digits arithmetically") {
    // one value per leading digit → every cell count is 1
    val vals = (1 to 9).map(d => Tuple1(d * 1.0)).toDF("x")
    val r = Profile.benford(vals, col("x")).collect()(0)
    assert(r.getLong(0) == 9L)
    // the chi2 the operator must produce, same constants, same order
    val expected = (1 to 9).map { d =>
      val e = 9.0 * Profile.BenfordP(d - 1)
      (1.0 - e) * (1.0 - e) / e
    }.reduce(_ + _)
    assert(r.getDouble(1) == math.rint(expected * 1e4) / 1e4)
    // magnitudes beyond one digit still extract the LEADING digit
    val big = Seq(123.45, 9876.0, 0.07).map(Tuple1(_)).toDF("x")
    // 123.45 → 1, 9876 → 9, 0.07 → digit 7 (cents = 7)
    val b = Profile.benford(big, col("x")).collect()(0)
    assert(b.getLong(0) == 3L)
  }

  test("kAnonymity and lDiversity censuses on a planted leak") {
    // class (1): three rows, sensitive values {a, b}; class (2): one row
    val d = Seq((1L, "a"), (1L, "a"), (1L, "b"), (2L, "a")).toDF("qi", "s")
    val k = Profile.kAnonymity(d, Seq(col("qi")), bar = 2).collect()(0)
    assert((k.getLong(0), k.getLong(1), k.getLong(2), k.getLong(3), k.getLong(4)) ==
      ((4L, 2L, 1L, 1L, 1L)))
    val l = Profile.lDiversity(d, Seq(col("qi")), col("s"), bar = 2).collect()(0)
    // class (2) has l = 1 → below the bar with its 1 row
    assert((l.getLong(0), l.getLong(1), l.getLong(2), l.getLong(3)) ==
      ((2L, 1L, 1L, 1L)))
  }

  test("dictEstimate: a constant column compresses, a unique column does not") {
    val d = (1 to 4).map(i => ("aaaa", s"v$i")).toDF("const", "uniq")
    val r = Profile.dictEstimate(d, Seq("const", "uniq")).collect()
      .map(x => x.getString(0) -> ((x.getLong(1), x.getLong(2), x.getLong(3), x.getLong(4), x.getDouble(5)))).toMap
    // const: raw = 4·4·8 = 128 bits; dict = 4·8 + 4·1 = 36 bits
    assert(r("const") == ((4L, 1L, 128L, 36L, 0.2813)))
    // uniq: dictionary stores all 4 values AND pays 2-bit codes → ratio > 1
    val (n, ndv, raw, dict, ratio) = r("uniq")
    assert(n == 4L && ndv == 4L && dict > raw && ratio > 1.0)
  }

  test("autocorr: a perfect alternation has lag-1 acf −1") {
    val d = (1L to 8L).map(t => (t, if (t % 2 == 0) 20L else 10L)).toDF("day", "y")
    val r = graft.operators.Series.autocorr(d, lags = Seq(1)).collect()(0)
    assert(r.getLong(0) == 1L && r.getLong(1) == 7L && r.getDouble(2) == -1.0)
  }
}

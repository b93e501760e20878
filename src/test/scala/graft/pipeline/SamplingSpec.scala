package graft.pipeline

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = (1L to 2000L).map(i =>
    (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr"))
    .toDF("doc_id", "lang")

  test("unlisted strata keep every row; rate-1.0 strata keep every row") {
    val out = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 1.0))
    assert(out.count() === 2000)
  }

  test("rate 0 drops the whole stratum") {
    val out = Sampling.stratified(docs, "doc_id", "lang", Map("de" -> 0.0))
    assert(out.filter(col("lang") === "de").count() === 0)
    assert(out.filter(col("lang") =!= "de").count() === docs.filter(col("lang") =!= "de").count())
  }

  test("sampled fraction lands near the rate and is deterministic") {
    val out = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 0.5, "de" -> 0.1))
    val en = out.filter(col("lang") === "en").count().toDouble /
      docs.filter(col("lang") === "en").count()
    val de = out.filter(col("lang") === "de").count().toDouble /
      docs.filter(col("lang") === "de").count()
    assert(math.abs(en - 0.5) < 0.08, s"en fraction $en")
    assert(math.abs(de - 0.1) < 0.05, s"de fraction $de")
    // determinism: same ids survive on a different partitioning
    val again = Sampling.stratified(docs.repartition(7), "doc_id", "lang",
      Map("en" -> 0.5, "de" -> 0.1))
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ===
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("membership is a function of (id, salt): salts draw independent samples") {
    val a = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 0.5), salt = "a")
      .filter(col("lang") === "en").select("doc_id").collect().map(_.getLong(0)).toSet
    val b = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 0.5), salt = "b")
      .filter(col("lang") === "en").select("doc_id").collect().map(_.getLong(0)).toSet
    assert(a !== b)
  }

  test("hexBound boundaries sit on the 4-hex grid") {
    assert(Sampling.hexBound(0.0) === "0000")
    assert(Sampling.hexBound(0.5) === "8000")
    assert(Sampling.hexBound(1.0) === "ffff")
    assert(Sampling.hexBound(0.1) === "1999")
  }

  test("capPerStratum keeps exactly k rows per stratum, by score then id") {
    val rows = (1L to 100L).map(i => (i, if (i % 2 == 0) "a" else "b", (i % 10).toDouble))
    val df = rows.toDF("doc_id", "source", "score")
    val out = Sampling.capPerStratum(df, "doc_id", "source", "score", 3)
      .collect().map(r => (r.getString(1), r.getLong(0))).toSet
    // stratum a (even ids): score 9 never occurs (even%10 even); best score 8
    // at ids 8,18,...,98 → tie-break keeps smallest ids 8,18,28
    assert(out === Set(("a", 8L), ("a", 18L), ("a", 28L), ("b", 9L), ("b", 19L), ("b", 29L)))
  }

  test("capPerStratum leaves small strata whole") {
    val df = Seq((1L, "x", 1.0), (2L, "x", 2.0)).toDF("doc_id", "source", "score")
    assert(Sampling.capPerStratum(df, "doc_id", "source", "score", 10).count() === 2)
  }

  test("uniformPerStratum draws exactly k per stratum, stable across partitioning") {
    val out = Sampling.uniformPerStratum(docs, "doc_id", "lang", k = 5)
    val counts = out.groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.forall(_ === 5L), counts.toString)
    val again = Sampling.uniformPerStratum(docs.repartition(11), "doc_id", "lang", k = 5)
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ===
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
    // a different salt draws a different sample
    val other = Sampling.uniformPerStratum(docs, "doc_id", "lang", k = 5, salt = "other")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet !==
      other.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("weightedBernoulli: keep probability tracks the weight; max-weight row scale") {
    val weighted = (1L to 4000L).map(i => (i, (i % 4) * 100L)).toDF("doc_id", "w")
    val out = Sampling.weightedBernoulli(weighted, "doc_id", "w")
    val kept = out.groupBy("w").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // weight 0 rows can never satisfy cell·wmax < 0·65536
    assert(!kept.contains(0L), s"weight-0 rows survived: $kept")
    // expected keep fractions are w/wmax = 1/3 and 2/3 of 1000 rows each;
    // weight == wmax keeps everything except cells ≥ 65536·w/wmax — i.e. all
    val f1 = kept.getOrElse(100L, 0L).toDouble / 1000
    val f2 = kept.getOrElse(200L, 0L).toDouble / 1000
    assert(math.abs(f1 - 1.0 / 3) < 0.06, s"w=100 fraction $f1")
    assert(math.abs(f2 - 2.0 / 3) < 0.06, s"w=200 fraction $f2")
    assert(kept.getOrElse(300L, 0L) === 1000L, "max-weight rows must all survive")
    // deterministic across partitioning
    val again = Sampling.weightedBernoulli(weighted.repartition(13), "doc_id", "w")
    assert(out.select("doc_id").collect().map(_.getLong(0)).toSet ===
      again.select("doc_id").collect().map(_.getLong(0)).toSet)
  }

  test("weightedBernoulli draws independently of the stratified gate") {
    val df = (1L to 2000L).map(i => (i, 1L)).toDF("doc_id", "w")
    // uniform weight 1 == wmax keeps ALL rows (p = 1): the degenerate case
    assert(Sampling.weightedBernoulli(df, "doc_id", "w").count() === 2000)
  }

  test("vocab ranks tokens by corpus frequency with doc frequency") {
    val df = Seq(
      (1L, "a a a b c"),
      (2L, "a b b"),
      (3L, "c")).toDF("doc_id", "text")
    val got = TextPipeline.vocab(df, "doc_id", "text", topK = 2)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("a", 4L, 2L), ("b", 3L, 2L)))
  }

  test("bpePairs counts adjacent pairs with repeats, short docs yield none") {
    val df = Seq(
      (1L, "a b a b"),   // pairs: "a b" ×2, "b a" ×1
      (2L, "a b"),       // "a b" ×1
      (3L, "solo"),      // 1 token → no pairs
      (4L, "  ")).toDF("doc_id", "text") // whitespace-only → [""] → no pairs
    val got = TextPipeline.bpePairs(df, "doc_id", "text", topK = 10)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === Seq(("a b", 3L), ("b a", 1L)))
  }

  test("classBalance: every class cut to the smallest class's size, reproducibly") {
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "a"), (3L, "a"), (4L, "b"), (5L, "b"), (6L, "c"))
      .toDF("id", "cls")
    val out = Sampling.classBalance(df, "id", "cls").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.groupBy(_._2).view.mapValues(_.size).toMap == Map("a" -> 1, "b" -> 1, "c" -> 1),
      "quota = |smallest class| = 1")
    val again = Sampling.classBalance(df, "id", "cls").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(out.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq, "same draw every run")
  }

  test("no shuffle: the sampling plan is scan → filter/project only") {
    val plan = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stratified sampling shuffled:\n$plan")
  }
}

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

  test("no shuffle: the sampling plan is scan → filter/project only") {
    val plan = Sampling.stratified(docs, "doc_id", "lang", Map("en" -> 0.5))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"stratified sampling shuffled:\n$plan")
  }
}

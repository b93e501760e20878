package graft.core

import graft.SparkTestBase
import graft.types.Value
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Mirrors the reference's algebra test block
  * (reference test/test_relational_engine.ml:1284-1583). */
class AlgebraSpec extends SparkTestBase {
  import spark.implicits._

  private def users = Seq((18L, "Alice"), (25L, "Bob")).toDF("age", "name")

  test("constRelation builds a single-tuple relation") {
    val df = Algebra.constRelation(spark, Seq("age" -> Value.IntV(18), "name" -> Value.StrV("Alice")))
    assert(df.columns.toSeq == Seq("age", "name"))
    assert(df.collect().toSeq == Seq(Row(18L, "Alice")))
  }

  test("selectFn filters by predicate") {
    assert(Algebra.selectFn(col("age") > 20)(users).collect().toSeq == Seq(Row(25L, "Bob")))
  }

  test("project keeps listed attrs in order, bag semantics") {
    val df = Seq((1L, "x"), (2L, "x")).toDF("id", "tag")
    val p = Algebra.project(Seq("tag"))(df)
    assert(p.columns.toSeq == Seq("tag"))
    assert(p.collect().length == 2) // no dedup
  }

  test("rename by pairs") {
    val r = Algebra.rename(Seq("age" -> "years"))(users)
    assert(r.columns.toSeq == Seq("years", "name"))
  }

  test("equijoin matches on named attrs; left schema order then right remainder") {
    val l = Seq((1L, "a"), (2L, "b")).toDF("k", "lv")
    val r = Seq((1L, "x"), (3L, "y")).toDF("k", "rv")
    val j = Algebra.equijoin(Seq("k"), l, r)
    assert(j.columns.toSeq == Seq("k", "lv", "rv")) // left order, join col NOT first-by-spark
    assert(j.collect().toSeq == Seq(Row(1L, "a", "x")))
  }

  test("equijoin left value wins on non-join collision") {
    val l = Seq((1L, "left")).toDF("k", "v")
    val r = Seq((1L, "right")).toDF("k", "v")
    val j = Algebra.equijoin(Seq("k"), l, r)
    assert(j.columns.toSeq == Seq("k", "v"))
    assert(j.collect().toSeq == Seq(Row(1L, "left")))
  }

  test("equijoin with no matches is empty") {
    val l = Seq((1L, "a")).toDF("k", "lv")
    val r = Seq((9L, "x")).toDF("k", "rv")
    assert(Algebra.equijoin(Seq("k"), l, r).collect().isEmpty)
  }

  test("equijoin on empty attr list degenerates to cartesian") {
    val l = Seq(Tuple1(1L)).toDF("a")
    val r = Seq(Tuple1("x"), Tuple1("y")).toDF("b")
    assert(Algebra.equijoin(Nil, l, r).collect().length == 2)
  }

  test("cartesian drops colliding right columns") {
    val l = Seq((1L, "a")).toDF("k", "v")
    val r = Seq((2L, "z")).toDF("k", "w")
    val c = Algebra.cartesian(l, r)
    assert(c.columns.toSeq == Seq("k", "v", "w"))
    assert(c.collect().toSeq == Seq(Row(1L, "a", "z")))
  }

  test("select keeps source rows agreeing with filter on common attrs") {
    val filter = Algebra.constRelation(spark, Seq("age" -> Value.IntV(18)))
    val s = Algebra.select(filter, users)
    assert(s.columns.toSeq == Seq("age", "name"))
    assert(s.collect().toSeq == Seq(Row(18L, "Alice")))
  }

  test("select with duplicate filter rows multiplies matches (bag semantics)") {
    val filter = Seq(18L, 18L).toDF("age")
    assert(Algebra.select(filter, users).collect().length == 2)
  }

  test("select with no common attrs multiplies by |filter|") {
    val filter = Seq("u", "v").toDF("other")
    assert(Algebra.select(filter, users).collect().length == 4)
    assert(Algebra.select(spark.emptyDataset[String].toDF("other"), users).collect().isEmpty)
  }

  test("union is bag union with left schema") {
    val l = Seq(1L, 2L).toDF("v")
    val r = Seq(2L, 3L).toDF("v")
    val u = Algebra.union(l, r)
    assert(u.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 2L, 2L, 3L))
  }

  test("union aligns right columns by name") {
    val l = Seq((1L, "a")).toDF("k", "v")
    val r = Seq(("b", 2L)).toDF("v", "k") // swapped order
    val u = Algebra.union(l, r)
    assert(u.columns.toSeq == Seq("k", "v"))
    assert(u.collect().toSet == Set(Row(1L, "a"), Row(2L, "b")))
  }

  test("diff preserves left duplicates and removes exact matches") {
    val l = Seq(1L, 1L, 2L, 3L).toDF("v")
    val r = Seq(2L).toDF("v")
    val d = Algebra.diff(l, r)
    assert(d.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 1L, 3L))
  }

  test("diff with mismatched right schema removes nothing (attrs_equal)") {
    val l = Seq((1L, "a")).toDF("k", "v")
    val r = Seq(Tuple1(1L)).toDF("k")
    assert(Algebra.diff(l, r).collect().toSeq == Seq(Row(1L, "a")))
  }

  test("diff treats null as equal to null (structural tuple equality)") {
    val l = Seq[(java.lang.Long, String)]((1L, null), (2L, "b")).toDF("k", "v")
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("k", "v")
    assert(Algebra.diff(l, r).collect().toSeq == Seq(Row(2L, "b")))
  }

  test("diff with same names but differing types coerces instead of digest-matching") {
    // left double vs right long: the digest would render '5.0' vs '5' and
    // remove nothing — the coercing null-safe conjunction must kick in
    val l = Seq(5.0, 6.0).toDF("x")
    val r = Seq(5L).toDF("x")
    assert(Algebra.diff(l, r).collect().map(_.getDouble(0)).toSeq == Seq(6.0))
  }

  test("take bounds the result") {
    val df = Seq(1L, 2L, 3L).toDF("v")
    assert(Algebra.take(2)(df).collect().length == 2)
    assert(Algebra.take(0)(df).collect().isEmpty)
  }
}

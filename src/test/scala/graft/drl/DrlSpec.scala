package graft.drl

import graft.SparkTestBase
import graft.catalog.Catalog
import graft.types.{Cardinality, Value}
import org.apache.spark.sql.{DataFrame, Row}

/** Mirrors the reference's DRL test block
  * (reference test/test_relational_engine.ml:1585-1686) plus gate cases. */
class DrlSpec extends SparkTestBase {
  import Query._
  import spark.implicits._

  /** In-memory catalog over fixture DataFrames (FIXTURES.md §1). */
  private final class TestCatalog(tables: Map[String, DataFrame]) extends Catalog {
    def resolve(name: String): Either[graft.Err, DataFrame] =
      if (graft.virtual.Virtual.isVirtual(name))
        Left(graft.Err.GeneratorError(s"virtual relation: $name"))
      else tables.get(name).toRight(graft.Err.RelationNotFoundBare(name))
  }

  private lazy val cat = new TestCatalog(Map(
    "users" -> Seq((18L, "Alice"), (25L, "Bob")).toDF("age", "name"),
    "items" -> Seq(10L, 20L).toDF("v"),
  ))

  private def run(sexp: String): Seq[Row] =
    Compiler.run(spark, cat, sexp).fold(e => fail(e.message), _.collect().toSeq)

  // ---- parser ----

  test("parses Base / Const / Join / Select (reference test:1585-1628)") {
    assert(Parser.parse("(Base users)") == Right(Base("users")))
    assert(Parser.parse("(Base \"users\")") == Right(Base("users")))
    assert(Parser.parse("(Const ((age (Int 18))))") ==
      Right(Const(List("age" -> Value.IntV(18)))))
    assert(Parser.parse("(Join (k) (Base a) (Base b))") ==
      Right(Join(List("k"), Base("a"), Base("b"))))
    assert(Parser.parse("(Select (Const ((age (Int 18)))) (Base users))") ==
      Right(Select(Const(List("age" -> Value.IntV(18))), Base("users"))))
    assert(Parser.parse("(drl (Base users))") == Right(Base("users")))
  }

  test("parses every node shape and round-trips through toSexp") {
    val qs: List[String] = List(
      "(Base users)",
      "(Const ((a (Int 1)) (b (Float 1.5)) (c (Str x)) (d (Bool true))))",
      "(Select (Base a) (Base b))",
      "(Join (x y) (Base a) (Base b))",
      "(Cartesian (Base a) (Base b))",
      "(Project (x) (Base a))",
      "(Rename ((x y)) (Base a))",
      "(Union (Base a) (Base b))",
      "(Diff (Base a) (Base b))",
      "(Take 5 (Base a))",
      "(Sort ((x Asc) (y Desc)) (Base a))",
      "(Aggregate (group (x)) (aggs ((count n) (sum y total) (min y lo) (max y hi) (avg y mean))) (Base a))",
      "(ThetaJoin ((lt x y) (neq a b)) (Base l) (Base r))",
      "(Window (partition (k)) (order ((x Asc) (y Desc))) (fn (row_number)) (as rn) (Base a))",
      "(Window (partition (k j)) (order ((x Asc))) (fn (running_sum v)) (as rs) (Base a))",
      "(Window (partition (k)) (order ((x Desc))) (fn (lag v)) (as prev) (Base a))",
    )
    qs.foreach { s =>
      val q = Parser.parse(s).fold(e => fail(s"$s: $e"), identity)
      assert(Parser.parse(Parser.toSexp(q).render) == Right(q), s"round-trip failed: $s")
    }
  }

  test("rejects malformed queries") {
    assert(Parser.parse("(Bogus users)").isLeft)
    assert(Parser.parse("(Take x (Base a))").isLeft)
    assert(Parser.parse("(Const ((age 18)))").isLeft) // untagged literal
  }

  // ---- gate ----

  test("gate admits finite queries and rejects bare virtual scans") {
    assert(Gate.admit(cat, Base("users")).isRight)
    assert(Gate.admit(cat, Base("natural_plus")) == Left(Gate.rejection))
    assert(Gate.admit(cat, Join(List("v"), Base("items"), Base("natural_plus"))) ==
      Left(Gate.rejection))
    // Select's FILTER may be infinite; its source must be finite.
    assert(Gate.admit(cat, Select(Base("natural_natural_less_than"), Base("users"))).isRight)
    assert(Gate.admit(cat, Select(Base("users"), Base("natural_plus"))) == Left(Gate.rejection))
    // Take bounds anything; Diff needs only the left side finite.
    assert(Gate.admit(cat, Take(5, Base("natural_plus"))).isRight)
    assert(Gate.admit(cat, Diff(Base("users"), Base("users"))).isRight)
  }

  test("gate cardinality classes") {
    assert(Gate.cardinality(cat, Const(List("a" -> Value.IntV(1)))) ==
      Right(Cardinality.Finite(1)))
    assert(Gate.cardinality(cat, Take(7, Base("natural_plus"))) ==
      Right(Cardinality.Finite(7)))
    assert(Gate.cardinality(cat, Base("nope")).isLeft)
  }

  // ---- compiler / end-to-end ----

  test("executes Base (reference test:1610-1628)") {
    assert(run("(Base items)").map(_.getLong(0)).sorted == Seq(10L, 20L))
  }

  test("executes Select+Const semijoin (reference test:1630-1686)") {
    assert(run("(Select (Const ((age (Int 18)))) (Base users))") == Seq(Row(18L, "Alice")))
  }

  test("executes Project, Rename, Union, Diff, Take, Cartesian, Join") {
    assert(run("(Project (name) (Base users))").map(_.getString(0)).sorted ==
      Seq("Alice", "Bob"))
    val renamed = Compiler.run(spark, cat, "(Rename ((age years)) (Base users))")
      .fold(e => fail(e.message), identity)
    assert(renamed.columns.toSeq == Seq("years", "name"))
    assert(run("(Union (Base items) (Base items))").length == 4)
    assert(run("(Diff (Base users) (Select (Const ((age (Int 18)))) (Base users)))") ==
      Seq(Row(25L, "Bob")))
    assert(run("(Take 1 (Base items))").length == 1)
    assert(run("(Cartesian (Base users) (Base items))").length == 4)
    assert(run("(Join (age) (Base users) (Rename ((v age)) (Base items)))").isEmpty)
  }

  test("extension nodes: Sort/Take top-k, Aggregate, ThetaJoin") {
    // top-1 by age descending: Bob
    assert(run("(Take 1 (Sort ((age Desc)) (Base users)))") == Seq(Row(25L, "Bob")))
    // grouped aggregate over items joined... simple global aggregate
    assert(run("(Aggregate (group ()) (aggs ((count n) (sum v total) (min v lo) (max v hi))) (Base items))") ==
      Seq(Row(2L, 30L, 10L, 20L)))
    // grouped by name over users
    val g = run("(Aggregate (group (name)) (aggs ((count n) (max age oldest))) (Base users))")
    assert(g.toSet == Set(Row("Alice", 1L, 18L), Row("Bob", 1L, 25L)))
    // theta join: users × items where age < v (only 18 < 20)
    val t = run("(ThetaJoin ((lt age v)) (Base users) (Base items))")
    assert(t.toSet == Set(Row(18L, "Alice", 20L)))
    // gate: extension nodes pass finiteness through
    assert(Gate.admit(cat, Parser.parse("(Sort ((age Asc)) (Base users))").toOption.get).isRight)
    assert(Gate.admit(cat, Parser.parse("(Sort ((a Asc)) (Base natural_plus))").toOption.get) ==
      Left(Gate.rejection))
    assert(Gate.admit(cat,
      Parser.parse("(ThetaJoin ((lt a left)) (Base users) (Base natural_natural_less_than))").toOption.get) ==
      Left(Gate.rejection))
  }

  test("extension node Window: row_number, running_sum, lag; empty partition rejected") {
    val c = new TestCatalog(Map(
      "m" -> Seq((1L, 1L, 10L), (1L, 2L, 20L), (1L, 3L, 5L), (2L, 1L, 7L))
        .toDF("k", "t", "v")))
    def runC(s: String): Seq[Row] =
      Compiler.run(spark, c, s).fold(e => fail(e.message), _.collect().toSeq)
    val rn = runC("(Window (partition (k)) (order ((t Asc))) (fn (row_number)) (as rn) (Base m))")
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(3))).toSet
    assert(rn == Set((1L, 1L, 1), (1L, 2L, 2), (1L, 3L, 3), (2L, 1L, 1)))
    val rs = runC("(Window (partition (k)) (order ((t Asc))) (fn (running_sum v)) (as rs) (Base m))")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(rs == Set((1L, 1L, 10L), (1L, 2L, 30L), (1L, 3L, 35L), (2L, 1L, 7L)))
    val lg = runC("(Window (partition (k)) (order ((t Asc))) (fn (lag v)) (as prev) (Base m))")
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(3)) -1L else r.getLong(3))).toSet
    assert(lg == Set((1L, 1L, -1L), (1L, 2L, 10L), (1L, 3L, 20L), (2L, 1L, -1L)))
    // scale guard: the unpartitioned window is refused at compile
    val bad = Compiler.run(spark, c,
      "(Window (partition ()) (order ((t Asc))) (fn (row_number)) (as rn) (Base m))")
    assert(bad.isLeft && bad.swap.exists(_.message.contains("GlobalRank")))
    // gate: cardinality passes through; infinite source still rejected
    assert(Gate.admit(cat, Parser.parse(
      "(Window (partition (name)) (order ((age Asc))) (fn (row_number)) (as rn) (Base users))").toOption.get).isRight)
    assert(Gate.admit(cat, Parser.parse(
      "(Window (partition (a)) (order ((b Asc))) (fn (row_number)) (as rn) (Base natural_plus))").toOption.get) ==
      Left(Gate.rejection))
  }

  test("virtual filter compiles to a Column predicate") {
    // users where age < age is empty; age > 20 via greater_than against a const right
    val r = run(
      """(Select (Rename ((left age) (right age2)) (Base natural_natural_less_than))
        |  (Cartesian (Base users) (Rename ((v age2)) (Base items))))""".stripMargin)
    // pairs: (18,Alice)x(10,20), (25,Bob)x(10,20); keep age < age2
    assert(r.map(row => (row.getLong(0), row.getString(1), row.getLong(2))).sorted ==
      Seq((18L, "Alice", 20L)))
  }

  test("virtual arithmetic filter natural_plus") {
    val c = new TestCatalog(Map(
      "triples" -> Seq((1L, 2L, 3L), (2L, 2L, 5L), (-1L, 4L, 3L)).toDF("a", "b", "sum")))
    val r = Compiler.run(spark, c, "(Select (Base natural_plus) (Base triples))")
      .fold(e => fail(e.message), _.collect().toSeq)
    // (-1,4,3) sums correctly but violates the natural (non-negative) domain
    assert(r == Seq(Row(1L, 2L, 3L)))
  }

  test("Take over a virtual base enumerates in the reference's order") {
    // natural_plus enumerates via Cantor pairing (reference
    // lib/prelude/standard.ml:163-199): positions 0,1,2 → (0,0,0),(1,0,1),(0,1,1)
    assert(run("(Take 3 (Base natural_plus))") ==
      Seq(Row(0L, 0L, 0L), Row(1L, 0L, 1L), Row(0L, 1L, 1L)))
    // less_than uses triangular indexing (standard.ml:36-41,53-70)
    assert(run("(Take 3 (Base natural_natural_less_than))") ==
      Seq(Row(0L, 1L), Row(0L, 2L), Row(1L, 2L)))
    // column shaping above the virtual base still works
    assert(run("(Project (sum) (Rename ((a x)) (Take 2 (Base natural_plus))))") ==
      Seq(Row(0L), Row(1L)))
    // every enumerated tuple satisfies the relation's own membership predicate
    val vr = graft.virtual.Virtual.relations("natural_divide")
    vr.enumerate(50).foreach(t => assert(vr.ground(t), s"bad tuple $t"))
  }

  test("Take over Select-of-virtual is rejected with a clear error") {
    val res = Compiler.run(spark, cat,
      "(Take 3 (Select (Const ((a (Int 1)))) (Base natural_plus)))")
    assert(res.isLeft)
    assert(res.swap.exists(_.message.contains("virtual")))
  }

  test("unknown base relation is a compile error") {
    assert(Compiler.run(spark, cat, "(Base missing)").isLeft)
  }
}

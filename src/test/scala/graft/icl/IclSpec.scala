package graft.icl

import graft.SparkTestBase
import graft.engine.{Database, Engine}
import graft.types.{RelSchema, Value}

/** Mirrors the reference's constraint unit + scenario blocks
  * (reference test/test_relational_engine.ml:1688-2587, 3487-4589). */
class IclSpec extends SparkTestBase {
  import Binding.{Const, Var}
  import Body._

  private def iv(i: Long) = Value.IntV(i)
  private def fkBody = // Exists d in Department, MemberOf Department (dept_id = Var dept_id)
    Exists("d", "Department",
      MemberOf("Department", List("dept_id" -> Var("dept_id"))))

  private def hrDb: Database = {
    val db0 = Engine.createDatabase(spark, "hr")
    val db1 = Engine.createRelation(spark, db0, "Department",
      RelSchema(List("dept_id" -> "natural"))).fold(e => fail(e.message), identity)
    val db2 = Engine.createRelation(spark, db1, "Employee",
      RelSchema(List("emp_id" -> "natural", "dept_id" -> "natural"))).fold(e => fail(e.message), identity)
    Engine.createTuple(spark, db2, "Department", Seq("dept_id" -> iv(1))).fold(e => fail(e.message), identity)
  }

  // ---- unit: analyses (reference test:1688-2012, 3487-3975) ----

  test("varsIn and relationsIn walk the whole body") {
    val b = And(List(
      MemberOf("t1", List("a" -> Var("x"), "b" -> Const(iv(1)))),
      Not(MemberOf("t2", List("c" -> Var("y"))), "u"),
      Exists("d", "q", MemberOf("t3", List("e" -> Var("d.z"))))))
    assert(Body.varsIn(b) == Set("x", "y", "d.z"))
    assert(Body.relationsIn(b) == Set("t1", "t2", "u", "t3", "q"))
  }

  test("polarity table incl. double negation (reference test:3487+)") {
    import Analysis._
    assert(polarityOf(MemberOf("t", Nil)) == Map("t" -> Positive))
    assert(polarityOf(Not(MemberOf("t", Nil), "u")) == Map("t" -> Negative))
    assert(polarityOf(Not(Not(MemberOf("t", Nil), "u"), "u")) == Map("t" -> Positive))
    assert(polarityOf(Forall("x", "q", MemberOf("t", Nil))) ==
      Map("q" -> Negative, "t" -> Positive))
    assert(polarityOf(Exists("x", "q", MemberOf("t", Nil))) ==
      Map("q" -> Positive, "t" -> Positive))
    assert(polarityOf(And(List(MemberOf("t", Nil), Not(MemberOf("t", Nil), "u")))) ==
      Map("t" -> Both))
    assert(triggeredBy("insert", Negative) && triggeredBy("delete", Positive))
    assert(!triggeredBy("insert", Positive) && !triggeredBy("delete", Negative))
    assert(triggeredBy("insert", Both) && triggeredBy("delete", Both))
  }

  test("focusedFilter extracts Var-bound transition values") {
    val fk = MemberOf("Department", List("dept_id" -> Var("dept_id")))
    assert(Analysis.focusedFilter(fk, "Department", Seq("dept_id" -> iv(7))) ==
      List(("dept_id", iv(7))))
    assert(Analysis.focusedFilter(fk, "Other", Seq("dept_id" -> iv(7))).isEmpty)
    val constOnly = MemberOf("Department", List("dept_id" -> Const(iv(1))))
    assert(Analysis.focusedFilter(constOnly, "Department", Seq("dept_id" -> iv(7))).isEmpty)
  }

  test("triggerConstants extracts Const bindings for the dep relation") {
    val b = And(List(
      MemberOf("t", List("k" -> Const(iv(5)), "v" -> Var("x"))),
      MemberOf("other", List("k" -> Const(iv(9))))))
    assert(Analysis.triggerConstants(b, "t") == List(("k", iv(5))))
  }

  test("substituteTransition rewrites namespaced vars inside quantifiers over depRel") {
    val body = Forall("e", "Employee",
      MemberOf("Department", List("dept_id" -> Var("e.dept_id"), "x" -> Var("plain"))))
    val sub = Analysis.substituteTransition(body, "Employee", Seq("dept_id" -> iv(3)))
    assert(sub == Forall("e", "Employee",
      MemberOf("Department", List("dept_id" -> Const(iv(3)), "x" -> Var("plain")))))
    // quantifier over a different relation: untouched
    assert(Analysis.substituteTransition(body, "Other", Seq("dept_id" -> iv(3))) == body)
  }

  test("filterByAttrs keeps only parts whose vars survive projection") {
    val b = And(List(
      MemberOf("t", List("a" -> Var("x"))),
      MemberOf("t", List("a" -> Var("gone")))))
    assert(Analysis.filterByAttrs(List("x"), b) ==
      Some(And(List(MemberOf("t", List("a" -> Var("x")))))))
    // Or requires all branches to survive
    val o = Or(List(
      MemberOf("t", List("a" -> Var("x"))),
      MemberOf("t", List("a" -> Var("gone")))))
    assert(Analysis.filterByAttrs(List("x"), o).isEmpty)
  }

  test("mergeNamed AND-merges on name collision") {
    val m1 = MemberOf("a", Nil); val m2 = MemberOf("b", Nil)
    assert(Analysis.mergeNamed(Seq("c" -> m1), Seq("c" -> m2)) == Seq("c" -> And(List(m1, m2))))
    assert(Analysis.mergeNamed(Seq("c1" -> m1), Seq("c2" -> m2)).toMap ==
      Map("c1" -> m1, "c2" -> m2))
  }

  // ---- unit: evaluation (reference test:1688-2012) ----

  private val tinyCtx = Eval.Ctx(
    checkMembership = (rel, bound) => rel match {
      case "evens" => bound.forall { case (_, Value.IntV(i)) => i % 2 == 0; case _ => false }
      case _       => false
    },
    iterateFinite = {
      case "pool"     => Some(Seq(Seq("v" -> iv(2)), Seq("v" -> iv(3))))
      case "infinite" => None
      case _          => Some(Nil)
    })

  test("evaluate: MemberOf / Not / And / Or (reference test:1688+)") {
    val t = Map("x" -> iv(2), "y" -> iv(3))
    assert(Eval.evaluate(tinyCtx, t, MemberOf("evens", List("a" -> Var("x")))) == Right(true))
    assert(Eval.evaluate(tinyCtx, t, MemberOf("evens", List("a" -> Var("y")))).isLeft)
    assert(Eval.evaluate(tinyCtx, t, Not(MemberOf("evens", List("a" -> Var("y"))), "u")) == Right(true))
    assert(Eval.evaluate(tinyCtx, t, Not(MemberOf("evens", List("a" -> Var("x"))), "u")) == Right(false))
    assert(Eval.evaluate(tinyCtx, t, And(List(
      MemberOf("evens", List("a" -> Var("x"))),
      Not(MemberOf("evens", List("a" -> Var("y"))), "u")))) == Right(true))
    assert(Eval.evaluate(tinyCtx, t, Or(List(
      MemberOf("evens", List("a" -> Var("y"))),
      MemberOf("evens", List("a" -> Var("x")))))) == Right(true))
    assert(Eval.evaluate(tinyCtx, t, Or(List(
      MemberOf("evens", List("a" -> Var("y")))))) == Right(false))
  }

  test("evaluate: Exists / Forall incl. unbounded error (reference test:1924+)") {
    val t = Map.empty[String, Value]
    val evenBody = MemberOf("evens", List("a" -> Var("p.v")))
    assert(Eval.evaluate(tinyCtx, t, Exists("p", "pool", evenBody)) == Right(true))
    assert(Eval.evaluate(tinyCtx, t, Forall("p", "pool", evenBody)) == Right(false))
    assert(Eval.evaluate(tinyCtx, t, Exists("p", "infinite", evenBody)) ==
      Left(Eval.UnboundedQuantifier("p", "infinite")))
    // missing Var silently dropped -> empty binding -> membership of evens true
    assert(Eval.bind(List("a" -> Var("nope")), t).isEmpty)
  }

  // ---- integration: enforcement on insert (reference test:2015-2109, 3076) ----

  test("FK (MemberOf form) enforced on insert — presence semantics") {
    val db = Engine.registerConstraint(spark, hrDb, "fk_dept", "Employee",
      MemberOf("Department", List("dept_id" -> Var("dept_id")))).fold(e => fail(e.message), identity)
    assert(Engine.createTuple(spark, db, "Employee",
      Seq("emp_id" -> iv(10), "dept_id" -> iv(1))).isRight)
    val bad = Engine.createTuple(spark, db, "Employee",
      Seq("emp_id" -> iv(11), "dept_id" -> iv(99)))
    assert(bad.left.exists(_.message.startsWith("ConstraintViolation")))
  }

  test("FK (Exists form) enforced on insert") {
    val db = Engine.registerConstraint(spark, hrDb, "fk_dept", "Employee", fkBody)
      .fold(e => fail(e.message), identity)
    assert(Engine.createTuple(spark, db, "Employee",
      Seq("emp_id" -> iv(10), "dept_id" -> iv(1))).isRight)
    assert(Engine.createTuple(spark, db, "Employee",
      Seq("emp_id" -> iv(11), "dept_id" -> iv(2))).isLeft)
  }

  test("registration records sakura:constraint and AND-merges by name") {
    val db = Engine.registerConstraint(spark, hrDb, "fk_dept", "Employee", fkBody)
      .fold(e => fail(e.message), identity)
    val cat = db.relations("sakura:constraint").df.collect()
      .map(r => (r.getString(0), r.getString(1))).toSet
    assert(cat.contains(("fk_dept", "Employee")))
    val db2 = Engine.registerConstraint(spark, db, "fk_dept", "Employee",
      MemberOf("Department", List("dept_id" -> Var("dept_id"))))
      .fold(e => fail(e.message), identity)
    db2.relations("Employee").constraints("fk_dept") match {
      case And(cs) => assert(cs.length == 2)
      case other   => fail(s"expected And-merge, got $other")
    }
  }

  test("range check via virtual comparison relation (docs/icl.org:59-69)") {
    val db0 = Engine.createRelation(spark, Engine.createDatabase(spark, "school"), "Result",
      RelSchema(List("student_id" -> "natural", "score" -> "natural"))).fold(e => fail(e.message), identity)
    val db = Engine.registerConstraint(spark, db0, "score_range", "Result",
      MemberOf("natural_natural_less_than_or_equal",
        List("left" -> Var("score"), "right" -> Const(iv(100))))).fold(e => fail(e.message), identity)
    assert(Engine.createTuple(spark, db, "Result",
      Seq("student_id" -> iv(1), "score" -> iv(85))).isRight)
    assert(Engine.createTuple(spark, db, "Result",
      Seq("student_id" -> iv(2), "score" -> iv(150))).isLeft)
  }

  test("mutual exclusion via Not (docs/constraints.org:366-383)") {
    val d0 = Engine.createDatabase(spark, "tickets")
    val d1 = Engine.createRelation(spark, d0, "open_ticket",
      RelSchema(List("ticket_id" -> "natural"))).fold(e => fail(e.message), identity)
    val d2 = Engine.createRelation(spark, d1, "closed_ticket",
      RelSchema(List("ticket_id" -> "natural"))).fold(e => fail(e.message), identity)
    val db = Engine.registerConstraint(spark, d2, "not_closed", "open_ticket",
      Not(MemberOf("closed_ticket", List("ticket_id" -> Var("ticket_id"))), "open_ticket"))
      .fold(e => fail(e.message), identity)
    val db2 = Engine.createTuple(spark, db, "closed_ticket", Seq("ticket_id" -> iv(5)))
      .fold(e => fail(e.message), identity)
    assert(Engine.createTuple(spark, db2, "open_ticket", Seq("ticket_id" -> iv(6))).isRight)
    assert(Engine.createTuple(spark, db2, "open_ticket", Seq("ticket_id" -> iv(5))).isLeft)
  }

  // ---- cascade (reference test:3976-4189) ----

  test("cascade: deleting a referenced department is rejected (FK delete)") {
    val db0 = Engine.registerConstraint(spark, hrDb, "fk_dept", "Employee", fkBody)
      .fold(e => fail(e.message), identity)
    val db1 = Engine.createTuple(spark, db0, "Department", Seq("dept_id" -> iv(2)))
      .fold(e => fail(e.message), identity)
    val db = Engine.createTuple(spark, db1, "Employee",
      Seq("emp_id" -> iv(10), "dept_id" -> iv(1))).fold(e => fail(e.message), identity)
    // dept 1 is referenced -> delete must cascade-fail
    val rejected = Engine.retractTuple(spark, db, "Department", Seq("dept_id" -> iv(1)))
    assert(rejected.left.exists(_.message.contains("cascade")))
    // dept 2 is unreferenced -> delete passes
    assert(Engine.retractTuple(spark, db, "Department", Seq("dept_id" -> iv(2))).isRight)
  }

  test("cascade: insert into quantifier relation does not trigger Positive-only recheck") {
    val db0 = Engine.registerConstraint(spark, hrDb, "fk_dept", "Employee", fkBody)
      .fold(e => fail(e.message), identity)
    // Department has Positive polarity -> inserts into it never violate
    assert(Engine.createTuple(spark, db0, "Department", Seq("dept_id" -> iv(3))).isRight)
  }

  // ---- deferred (reference test:4191-4589) ----

  test("deferred FK: retract passes, commit catches, commit clears") {
    val db0 = Engine.registerConstraint(spark, hrDb, "fk_deferred", "Employee", fkBody,
      Timing.Deferred).fold(e => fail(e.message), identity)
    val db1 = Engine.createTuple(spark, db0, "Employee",
      Seq("emp_id" -> iv(10), "dept_id" -> iv(1))).fold(e => fail(e.message), identity)
    // deferred: deleting the referenced department passes the mutation
    val db2 = Engine.retractTuple(spark, db1, "Department", Seq("dept_id" -> iv(1)))
      .fold(e => fail(e.message), identity)
    // ...but commit catches the violation
    val failed = Engine.commit(spark, db2)
    assert(failed.left.exists(_.message.contains("deferred")))
    // fix the violation, then commit passes and clears the deferral window
    val db3 = Engine.createTuple(spark, db2, "Department", Seq("dept_id" -> iv(1)))
      .fold(e => fail(e.message), identity)
    val committed = Engine.commit(spark, db3)
    assert(committed.exists(_.deferred.isEmpty))
  }

  // ---- parser ----

  test("3-wise nested quantification rejects the short-building suite (docs/n-way-binding.org)") {
    // ∃ r ∈ Room: ∃ b ∈ Building: suite.room_id = r.room_id ∧
    // r.building_id = b.building_id ∧ b.floors > 3
    val tall = Exists("r", "Room", Exists("b", "Building", And(List(
      MemberOf("natural_natural_equal",
        List("left" -> Var("room_id"), "right" -> Var("r.room_id"))),
      MemberOf("natural_natural_equal",
        List("left" -> Var("r.building_id"), "right" -> Var("b.building_id"))),
      MemberOf("natural_natural_greater_than",
        List("left" -> Var("b.floors"), "right" -> Const(iv(3))))))))
    var db = Engine.createDatabase(spark, "hotel")
    db = Engine.createRelation(spark, db, "Building",
      RelSchema(List("building_id" -> "natural", "floors" -> "natural"))).fold(e => fail(e.message), identity)
    db = Engine.createTuples(spark, db, "Building", Seq(
      Seq("building_id" -> iv(1), "floors" -> iv(10)),
      Seq("building_id" -> iv(2), "floors" -> iv(2)))).fold(e => fail(e.message), identity)
    db = Engine.createRelation(spark, db, "Room",
      RelSchema(List("room_id" -> "natural", "building_id" -> "natural"))).fold(e => fail(e.message), identity)
    db = Engine.createTuples(spark, db, "Room", Seq(
      Seq("room_id" -> iv(101), "building_id" -> iv(1)),
      Seq("room_id" -> iv(201), "building_id" -> iv(2)))).fold(e => fail(e.message), identity)
    db = Engine.createRelation(spark, db, "Suite",
      RelSchema(List("suite_id" -> "natural", "room_id" -> "natural"))).fold(e => fail(e.message), identity)
    db = Engine.registerConstraint(spark, db, "suite_in_tall_building", "Suite", tall)
      .fold(e => fail(e.message), identity)
    // room 101 is in the 10-floor tower: accepted
    val ok = Engine.createTuple(spark, db, "Suite",
      Seq("suite_id" -> iv(1001), "room_id" -> iv(101)))
    assert(ok.isRight)
    // room 201 is in the 2-floor tower: no (r, b) witness exists
    val rejected = Engine.createTuple(spark, ok.toOption.get, "Suite",
      Seq("suite_id" -> iv(1003), "room_id" -> iv(201)))
    assert(rejected.left.exists(_.message.startsWith("ConstraintViolation")))
    // and a dangling room id fails the same way (no r at all)
    assert(Engine.createTuple(spark, ok.toOption.get, "Suite",
      Seq("suite_id" -> iv(1004), "room_id" -> iv(999)))
      .left.exists(_.message.startsWith("ConstraintViolation")))
  }

  test("ICL parser round-trips constraint bodies") {
    val s = """(RegisterConstraint (constraint_name fk_order) (relation_name order_items)
              |  (body (MemberOf (target orders) (binding ((id (Var order_id)))))))""".stripMargin
    assert(Parser.parse(s) == Right(Statement.RegisterConstraint("fk_order", "order_items",
      MemberOf("orders", List("id" -> Var("order_id"))))))
    val nested = """(RegisterConstraint (constraint_name c) (relation_name r) (timing Deferred)
                   |  (body (And ((Not (body (MemberOf (target t) (binding ((k (Const (Int 5))))))) (universe u))
                   |              (Exists (variable d) (quantifier q) (body (Or ((MemberOf (target t2) (binding ()))))))))))""".stripMargin
    val parsed = Parser.parse(nested)
    assert(parsed == Right(Statement.RegisterConstraint("c", "r",
      And(List(
        Not(MemberOf("t", List("k" -> Const(iv(5)))), "u"),
        Exists("d", "q", Or(List(MemberOf("t2", Nil)))))),
      Timing.Deferred)))
    assert(Parser.parse("(Commit)") == Right(Statement.Commit))
    assert(Parser.parse("(RegisterConstraint (constraint_name c))").isLeft)
  }

  test("virtual ground membership agrees with Column predicates") {
    import graft.virtual.Virtual
    assert(Virtual.lessThan.ground(Map("left" -> 1L, "right" -> 2L)))
    assert(!Virtual.lessThan.ground(Map("left" -> 2L, "right" -> 2L)))
    assert(!Virtual.lessThan.ground(Map("left" -> -1L, "right" -> 2L))) // not natural
    assert(Virtual.plus.ground(Map("a" -> 2L, "b" -> 3L, "sum" -> 5L)))
    assert(!Virtual.plus.ground(Map("a" -> 2L, "b" -> 3L, "sum" -> 6L)))
    assert(Virtual.divide.ground(Map("a" -> 7L, "b" -> 2L, "quotient" -> 3L, "remainder" -> 1L)))
    assert(!Virtual.divide.ground(Map("a" -> 7L, "b" -> 2L, "quotient" -> 2L, "remainder" -> 3L)))
    assert(!Virtual.lessThan.ground(Map("left" -> 1L))) // partial binding
  }
}

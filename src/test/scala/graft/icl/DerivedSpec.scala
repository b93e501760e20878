package graft.icl

import graft.SparkTestBase
import graft.engine.Engine
import graft.types.{RelSchema, Value}

/** Constraint propagation through the algebra — mirrors the reference's
  * propagation-through-select/project scenarios
  * (test_relational_engine.ml:2110-2587, rules lib/algebra.ml:112-124,
  * 158-166,237-241,261,303,321). */
class DerivedSpec extends SparkTestBase {
  import Binding.{Const, Var}
  import Body._

  private def iv(i: Long) = Value.IntV(i)
  private val fk = MemberOf("Department", List("dept_id" -> Var("dept_id")))
  private val cap = MemberOf("natural_natural_less_than_or_equal",
    List("left" -> Var("emp_id"), "right" -> Const(iv(1000))))

  private lazy val emp: Derived = {
    var db = Engine.createDatabase(spark, "dv")
    db = Engine.createRelation(spark, db, "Department",
      RelSchema(List("dept_id" -> "natural"))).fold(e => fail(e.message), identity)
    db = Engine.createTuple(spark, db, "Department",
      Seq("dept_id" -> iv(1))).fold(e => fail(e.message), identity)
    db = Engine.createRelation(spark, db, "Employee",
      RelSchema(List("emp_id" -> "natural", "dept_id" -> "natural"))).fold(e => fail(e.message), identity)
    db = Engine.registerConstraint(spark, db, "fk_dept", "Employee", fk).fold(e => fail(e.message), identity)
    db = Engine.registerConstraint(spark, db, "emp_cap", "Employee", cap).fold(e => fail(e.message), identity)
    db = Engine.createTuple(spark, db, "Employee",
      Seq("emp_id" -> iv(1), "dept_id" -> iv(1))).fold(e => fail(e.message), identity)
    Derived.ofStored(db.relations("Employee"))
  }

  test("select preserves constraints; take preserves; union drops") {
    val sel = emp.select(graft.core.Algebra.constRelation(spark, Seq("dept_id" -> iv(1))))
    assert(sel.constraints.map(_._1) == Seq("fk_dept", "emp_cap"))
    assert(emp.take(1).constraints.map(_._1) == Seq("fk_dept", "emp_cap"))
    assert(emp.union(emp).constraints.isEmpty)
    assert(emp.diff(emp.take(0)).constraints.map(_._1) == Seq("fk_dept", "emp_cap"))
  }

  test("project keeps only constraints whose vars survive (reference filter_by_attrs)") {
    val p = emp.project(List("dept_id"))
    assert(p.constraints == Seq("fk_dept" -> fk)) // emp_cap references emp_id → dropped
    assert(p.df.columns.toSeq == Seq("dept_id"))
    assert(emp.project(List("emp_id")).constraints.map(_._1) == Seq("emp_cap"))
  }

  test("rename carries Var references along (reference rename_vars)") {
    val r = emp.rename(Seq("dept_id" -> "division_id"))
    assert(r.constraints.toMap.apply("fk_dept") ==
      MemberOf("Department", List("dept_id" -> Var("division_id"))))
    assert(r.constraints.toMap.apply("emp_cap") == cap) // untouched vars stay
    // quantifier-namespaced vars are scoped, not renamed
    val q = Exists("d", "Department", MemberOf("Department",
      List("dept_id" -> Var("d.dept_id"), "x" -> Var("dept_id"))))
    assert(Analysis.renameVars(Map("dept_id" -> "division_id"), q) ==
      Exists("d", "Department", MemberOf("Department",
        List("dept_id" -> Var("d.dept_id"), "x" -> Var("division_id")))))
  }

  test("join AND-merges both sides' constraints by name") {
    val other = Derived(emp.df, Seq("fk_dept" -> cap, "extra" -> cap))
    val j = emp.join(Seq("emp_id", "dept_id"), other)
    val merged = j.constraints.toMap
    assert(merged("fk_dept") == And(List(fk, cap))) // name collision → AND
    assert(merged("emp_cap") == cap && merged("extra") == cap)
  }
}

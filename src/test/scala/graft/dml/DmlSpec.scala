package graft.dml

import graft.SparkTestBase
import graft.engine.Engine
import graft.types.{RelSchema, Value}
import org.apache.spark.sql.Row

/** Mirrors the reference's DML parse/execute round-trips
  * (reference test/test_relational_engine.ml:2673-3161). */
class DmlSpec extends SparkTestBase {

  private def usersDb = {
    val db = Engine.createRelation(spark, Engine.createDatabase(spark, "d"), "users",
      RelSchema(List("age" -> "integer", "name" -> "string"))).fold(e => fail(e.message), identity)
    Engine.createTuples(spark, db, "users", Seq(
      Seq("age" -> Value.IntV(18), "name" -> Value.StrV("Alice")),
      Seq("age" -> Value.IntV(25), "name" -> Value.StrV("Bob")),
    )).fold(e => fail(e.message), identity)
  }

  private def rows(db: graft.engine.Database, rel: String): Set[Row] =
    db.relations(rel).df.collect().toSet

  test("parser round-trips all six statements") {
    val stmts = List(
      "(InsertTuple (relation users) (attributes ((age (Int 30)) (name (Str Carol)))))",
      "(InsertTuples (relation users) (tuples (((age (Int 1)) (name (Str A))) ((age (Int 2)) (name (Str B))))))",
      "(DeleteTuple (relation users) (attributes ((age (Int 18)) (name (Str Alice)))))",
      "(Assign (target users) (body (Base others)))",
      "(InsertFrom (target users) (source (Base others)))",
      "(DeleteWhere (target users) (predicate (Const ((age (Int 18))))))",
      "(dml (InsertTuple (relation users) (attributes ((age (Int 30)) (name (Str Carol))))))",
    )
    stmts.foreach(s => assert(Parser.parse(s).isRight, s))
    assert(Parser.parse("(Bogus (relation users))").isLeft)
    assert(Parser.parse("(InsertTuple (attributes ()))").isLeft) // missing relation
  }

  test("InsertTuple adds a row through the full pipeline") {
    val db = Executor.run(spark, usersDb,
      "(InsertTuple (relation users) (attributes ((age (Int 30)) (name (Str Carol)))))")
      .fold(e => fail(e.message), identity)
    assert(rows(db, "users") == Set(Row(18L, "Alice"), Row(25L, "Bob"), Row(30L, "Carol")))
  }

  test("InsertTuples is a sequential fold: duplicate within batch aborts") {
    val res = Executor.run(spark, usersDb,
      "(InsertTuples (relation users) (tuples (((age (Int 1)) (name (Str X))) ((age (Int 1)) (name (Str X))))))")
    assert(res.left.exists(_.message.startsWith("DuplicateTuple")))
  }

  test("DeleteTuple removes exactly the named tuple") {
    val db = Executor.run(spark, usersDb,
      "(DeleteTuple (relation users) (attributes ((age (Int 18)) (name (Str Alice)))))")
      .fold(e => fail(e.message), identity)
    assert(rows(db, "users") == Set(Row(25L, "Bob")))
  }

  test("DeleteWhere deletes semijoin matches of the predicate query") {
    val db = Executor.run(spark, usersDb,
      "(DeleteWhere (target users) (predicate (Const ((age (Int 18))))))")
      .fold(e => fail(e.message), identity)
    assert(rows(db, "users") == Set(Row(25L, "Bob")))
    // hash reflects the deletion: rebuild same content independently
    val fresh = Engine.createRelation(spark, Engine.createDatabase(spark, "d"), "users",
      RelSchema(List("age" -> "integer", "name" -> "string"))).fold(e => fail(e.message), identity)
    val fresh2 = Engine.createTuple(spark, fresh, "users",
      Seq("age" -> Value.IntV(25), "name" -> Value.StrV("Bob"))).fold(e => fail(e.message), identity)
    assert(db.relations("users").relHash == fresh2.relations("users").relHash)
  }

  test("Assign replaces contents with the query result") {
    val db0 = Engine.createRelation(spark, usersDb, "adults",
      RelSchema(List("age" -> "integer", "name" -> "string"))).fold(e => fail(e.message), identity)
    val db = Executor.run(spark, db0,
      "(Assign (target adults) (body (Select (Const ((age (Int 25)))) (Base users))))")
      .fold(e => fail(e.message), identity)
    assert(rows(db, "adults") == Set(Row(25L, "Bob")))
    // re-assign overwrites
    val db2 = Executor.run(spark, db,
      "(Assign (target adults) (body (Select (Const ((age (Int 18)))) (Base users))))")
      .fold(e => fail(e.message), identity)
    assert(rows(db2, "adults") == Set(Row(18L, "Alice")))
  }

  test("InsertFrom appends the query result; colliding rows abort") {
    val db0 = Engine.createRelation(spark, usersDb, "copy",
      RelSchema(List("age" -> "integer", "name" -> "string"))).fold(e => fail(e.message), identity)
    val db = Executor.run(spark, db0,
      "(InsertFrom (target copy) (source (Base users)))").fold(e => fail(e.message), identity)
    assert(rows(db, "copy") == rows(db, "users"))
    val again = Executor.run(spark, db, "(InsertFrom (target copy) (source (Base users)))")
    assert(again.left.exists(_.message.contains("DuplicateTuple")))
  }

  test("InsertFrom enforces schema conformance and domain checks") {
    val db0 = Engine.createRelation(spark, usersDb, "naturals",
      RelSchema(List("n" -> "natural"))).fold(e => fail(e.message), identity)
    // wrong attribute set
    assert(Executor.run(spark, db0, "(InsertFrom (target naturals) (source (Base users)))").isLeft)
    // negative value violates natural
    val bad = Executor.run(spark, db0,
      "(InsertFrom (target naturals) (source (Rename ((age n)) (Project (age) (Diff (Base users) (Base users))))))")
    assert(bad.isRight) // empty result is fine
  }

  test("gate applies to embedded DRL bodies") {
    val res = Executor.run(spark, usersDb,
      "(InsertFrom (target users) (source (Base natural_plus)))")
    assert(res.isLeft)
  }
}

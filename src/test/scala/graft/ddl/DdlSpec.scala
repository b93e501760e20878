package graft.ddl

import graft.SparkTestBase
import graft.engine.Engine
import graft.types.Cardinality

/** DDL parse + execute round-trips (reference test:2673-3161 DDL block). */
class DdlSpec extends SparkTestBase {

  test("parser handles all five statements") {
    assert(Parser.parse("(CreateDatabase mydb)").isRight)
    assert(Parser.parse("(CreateRelation (name t) (schema ((id integer) (name string))))").isRight)
    assert(Parser.parse("(RetractRelation t)").isRight)
    assert(Parser.parse("(ClearRelation t)").isRight)
    assert(Parser.parse("(RegisterDomain (name money) (cardinality AlephZero))").isRight)
    assert(Parser.parse("(RegisterDomain (name tiny) (cardinality (Finite 3)))") ==
      Right(Statement.RegisterDomain("tiny", Cardinality.Finite(3))))
    assert(Parser.parse("(RegisterDomain (name r) (cardinality Continuum) (base rational))") ==
      Right(Statement.RegisterDomain("r", Cardinality.Continuum, "rational")))
    assert(Parser.parse("(ddl (ClearRelation t))").isRight)
    assert(Parser.parse("(DropTable t)").isLeft)
  }

  test("CreateDatabase → CreateRelation → insert → ClearRelation → RetractRelation") {
    val db0 = Executor.run(spark, None, "(CreateDatabase g)").fold(e => fail(e.message), identity)
    val db1 = Executor.run(spark, Some(db0),
      "(CreateRelation (name t) (schema ((id integer) (label string))))").fold(e => fail(e.message), identity)
    assert(db1.relations.contains("t"))
    val db2 = graft.dml.Executor.run(spark, db1,
      "(InsertTuple (relation t) (attributes ((id (Int 1)) (label (Str a)))))").fold(e => fail(e.message), identity)
    assert(db2.relations("t").cardinality == 1)
    val db3 = Executor.run(spark, Some(db2), "(ClearRelation t)").fold(e => fail(e.message), identity)
    assert(db3.relations("t").cardinality == 0)
    val db4 = Executor.run(spark, Some(db3), "(RetractRelation t)").fold(e => fail(e.message), identity)
    assert(!db4.relations.contains("t"))
    assert(Executor.run(spark, Some(db4), "(ClearRelation t)").isLeft)
  }

  test("RegisterDomain makes the domain usable in CreateRelation") {
    val db0 = Engine.createDatabase(spark, "g")
    val db1 = Executor.run(spark, Some(db0),
      "(RegisterDomain (name money) (cardinality AlephZero) (base integer))").fold(e => fail(e.message), identity)
    val db2 = Executor.run(spark, Some(db1),
      "(CreateRelation (name prices) (schema ((amount money))))").fold(e => fail(e.message), identity)
    val db3 = graft.dml.Executor.run(spark, db2,
      "(InsertTuple (relation prices) (attributes ((amount (Int 99)))))").fold(e => fail(e.message), identity)
    assert(db3.relations("prices").df.collect().map(_.getLong(0)).toSeq == Seq(99L))
    // unknown domain still fails
    assert(Executor.run(spark, Some(db3), "(CreateRelation (name x) (schema ((y nope))))").isLeft)
  }

  test("system catalog relations cannot be retracted or cleared") {
    val db0 = Engine.createDatabase(spark, "g")
    assert(Engine.retractRelation(spark, db0, "sakura:relation").isLeft)
    assert(Engine.clearRelation(spark, db0, "sakura:domain").isLeft)
    assert(Executor.run(spark, Some(db0), "(RetractRelation sakura:constraint)").isLeft)
  }

  test("statements other than CreateDatabase need a current database") {
    assert(Executor.run(spark, None, "(ClearRelation t)").left.exists(_.message.startsWith("NoDatabase")))
  }
}

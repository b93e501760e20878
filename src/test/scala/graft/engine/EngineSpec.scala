package graft.engine

import graft.SparkTestBase
import graft.types.{RelSchema, Value}
import org.apache.spark.sql.Row

/** Mirrors the reference's manipulation + catalog test blocks
  * (reference test/test_relational_engine.ml:226-834). */
class EngineSpec extends SparkTestBase {

  private def freshDb = Engine.createDatabase(spark, "testdb")

  private val productsSchema = RelSchema(List(
    "id" -> "integer", "name" -> "string", "price" -> "integer"))

  private def withProducts = {
    val db = Engine.createRelation(spark, freshDb, "products", productsSchema)
      .fold(e => fail(e.message), identity)
    Engine.createTuples(spark, db, "products", Seq(
      Seq("id" -> Value.IntV(1), "name" -> Value.StrV("Apple"), "price" -> Value.IntV(100)),
      Seq("id" -> Value.IntV(2), "name" -> Value.StrV("Banana"), "price" -> Value.IntV(50)),
    )).fold(e => fail(e.message), identity)
  }

  test("createDatabase seeds the six catalog relations (reference test:662-834)") {
    val db = freshDb
    assert(db.relations.keySet == Engine.CatalogNames.toSet)
    val names = db.relations("sakura:relation").df.collect().map(_.getString(0)).toSet
    assert(names == Engine.CatalogNames.toSet)
    val domains = db.relations("sakura:domain").df.collect().map(_.getString(0)).toSet
    assert(domains == Set("integer", "natural", "rational", "string"))
    val events = db.relations("sakura:on").df.collect().map(_.getString(0)).toSet
    assert(events == Set("insert", "update", "delete"))
    val timings = db.relations("sakura:timing").df.collect().map(_.getString(0)).toSet
    assert(timings == Set("immediate", "deferred"))
    assert(db.hash.nonEmpty)
  }

  test("createRelation maintains sakura:relation and sakura:attribute") {
    val db = Engine.createRelation(spark, freshDb, "products", productsSchema)
      .fold(e => fail(e.message), identity)
    val rels = db.relations("sakura:relation").df.collect().map(_.getString(0)).toSet
    assert(rels.contains("products"))
    val attrs = db.relations("sakura:attribute").df.collect()
      .filter(_.getString(0) == "products")
      .map(r => (r.getString(1), r.getString(2))).toSet
    assert(attrs == Set(("id", "integer"), ("name", "string"), ("price", "integer")))
  }

  test("insert + duplicate rejection (reference test:226-659)") {
    val db = withProducts
    assert(db.relations("products").cardinality == 2)
    val dup = Engine.createTuple(spark, db, "products", Seq(
      "id" -> Value.IntV(1), "name" -> Value.StrV("Apple"), "price" -> Value.IntV(100)))
    assert(dup.left.exists(_.message.startsWith("DuplicateTuple")))
  }

  test("membership criteria: wrong attrs / wrong domain rejected") {
    val db = withProducts
    assert(Engine.createTuple(spark, db, "products",
      Seq("id" -> Value.IntV(3))).isLeft) // missing attrs
    assert(Engine.createTuple(spark, db, "products", Seq(
      "id" -> Value.StrV("x"), "name" -> Value.StrV("C"), "price" -> Value.IntV(1))).isLeft)
    assert(Engine.createTuple(spark, db, "nope", Seq("id" -> Value.IntV(1)))
      .left.exists(_.message.startsWith("RelationNotFound")))
  }

  test("natural domain rejects negatives") {
    val db = Engine.createRelation(spark, freshDb, "counts",
      RelSchema(List("n" -> "natural"))).fold(e => fail(e.message), identity)
    assert(Engine.createTuple(spark, db, "counts", Seq("n" -> Value.IntV(-1))).isLeft)
    assert(Engine.createTuple(spark, db, "counts", Seq("n" -> Value.IntV(0))).isRight)
  }

  test("retractTuple removes the row; absent tuple is TupleNotFound") {
    val db = withProducts
    val after = Engine.retractTuple(spark, db, "products", Seq(
      "id" -> Value.IntV(1), "name" -> Value.StrV("Apple"), "price" -> Value.IntV(100)))
      .fold(e => fail(e.message), identity)
    assert(after.relations("products").cardinality == 1)
    assert(after.relations("products").df.collect().toSeq == Seq(Row(2L, "Banana", 50L)))
    val missing = Engine.retractTuple(spark, after, "products", Seq(
      "id" -> Value.IntV(1), "name" -> Value.StrV("Apple"), "price" -> Value.IntV(100)))
    assert(missing.left.exists(_.message.startsWith("TupleNotFound")))
  }

  test("state hash changes on every mutation and history grows (reference test:136-215)") {
    val db0 = freshDb
    val db1 = Engine.createRelation(spark, db0, "products", productsSchema)
      .fold(e => fail(e.message), identity)
    assert(db1.hash != db0.hash)
    assert(db1.history.contains(db0.hash))
    val db2 = Engine.createTuple(spark, db1, "products", Seq(
      "id" -> Value.IntV(1), "name" -> Value.StrV("A"), "price" -> Value.IntV(1)))
      .fold(e => fail(e.message), identity)
    assert(db2.hash != db1.hash)
    assert(db2.history.head != db2.hash)
  }

  test("relation hash is content-determined: same rows, any insert order") {
    val t1 = Seq("id" -> Value.IntV(1), "name" -> Value.StrV("A"), "price" -> Value.IntV(1))
    val t2 = Seq("id" -> Value.IntV(2), "name" -> Value.StrV("B"), "price" -> Value.IntV(2))
    def build(order: Seq[Seq[(String, Value)]]) = {
      val db = Engine.createRelation(spark, freshDb, "products", productsSchema)
        .fold(e => fail(e.message), identity)
      Engine.createTuples(spark, db, "products", order).fold(e => fail(e.message), identity)
    }
    assert(build(Seq(t1, t2)).relations("products").relHash ==
      build(Seq(t2, t1)).relations("products").relHash)
  }

  test("insert then retract restores the relation hash (append-only identity)") {
    val db = withProducts
    val h0 = db.relations("products").relHash
    val t = Seq("id" -> Value.IntV(9), "name" -> Value.StrV("Cherry"), "price" -> Value.IntV(200))
    val db2 = Engine.createTuple(spark, db, "products", t).fold(e => fail(e.message), identity)
    assert(db2.relations("products").relHash != h0)
    val db3 = Engine.retractTuple(spark, db2, "products", t).fold(e => fail(e.message), identity)
    assert(db3.relations("products").relHash == h0)
  }

  test("retractRelation drops relation and cleans the catalog") {
    val db = withProducts
    val after = Engine.retractRelation(spark, db, "products").fold(e => fail(e.message), identity)
    assert(!after.relations.contains("products"))
    assert(!after.relations("sakura:relation").df.collect().map(_.getString(0)).contains("products"))
    assert(!after.relations("sakura:attribute").df.collect().map(_.getString(0)).contains("products"))
  }

  test("clearRelation truncates but keeps schema and catalog rows") {
    val db = withProducts
    val after = Engine.clearRelation(spark, db, "products").fold(e => fail(e.message), identity)
    assert(after.relations("products").cardinality == 0)
    assert(after.relations("products").df.collect().isEmpty)
    assert(after.relations("sakura:relation").df.collect().map(_.getString(0)).contains("products"))
  }

  test("registerDomain adds the domain and a sakura:domain row") {
    val db = Engine.registerDomain(spark, freshDb,
      graft.types.Domain("money", org.apache.spark.sql.types.LongType,
        graft.types.Cardinality.AlephZero)).fold(e => fail(e.message), identity)
    assert(db.domains.contains("money"))
    assert(db.relations("sakura:domain").df.collect().map(_.getString(0)).contains("money"))
  }

  test("duplicate relation name rejected") {
    val db = withProducts
    assert(Engine.createRelation(spark, db, "products", productsSchema)
      .left.exists(_.message.startsWith("RelationAlreadyExists")))
  }

  test("rational attributes carry float comparator/identity semantics (domains.ml:101-102)") {
    // the reference compares rational ATTRIBUTE VALUES as floats and
    // hashes the float rendering; the num/den pair form lives only in
    // the never-registered domain generator (see Domain.rational's
    // adjudication note)
    val schema = RelSchema(List("item" -> "integer", "price" -> "rational"))
    var db = Engine.createRelation(spark, freshDb, "priced", schema).fold(e => fail(e.message), identity)
    db = Engine.createTuples(spark, db, "priced", Seq(
      Seq("item" -> Value.IntV(1), "price" -> Value.FloatV(10.5)),
      Seq("item" -> Value.IntV(2), "price" -> Value.FloatV(-2.75)),
    )).fold(e => fail(e.message), identity)
    // identity IS the double value: re-inserting an equal float is a dup
    val dup = Engine.createTuple(spark, db, "priced",
      Seq("item" -> Value.IntV(1), "price" -> Value.FloatV(10.5)))
    assert(dup.left.exists(_.message.startsWith("DuplicateTuple")), s"got $dup")
    // a float-distinguishable value is a distinct tuple
    db = Engine.createTuple(spark, db, "priced",
      Seq("item" -> Value.IntV(1), "price" -> Value.FloatV(10.500001)))
      .fold(e => fail(e.message), identity)
    assert(db.relations("priced").cardinality == 3)
    // the non-rational type is rejected by membership criteria
    val bad = Engine.createTuple(spark, db, "priced",
      Seq("item" -> Value.IntV(9), "price" -> Value.StrV("ten")))
    assert(bad.isLeft)
    // comparisons over the column order as doubles (the float comparator)
    val sorted = db.relations("priced").df.orderBy(org.apache.spark.sql.functions.col("price"))
      .collect().map(_.getDouble(1)).toSeq
    assert(sorted == sorted.sorted)
    // driver hash = executor hash over the float rendering (the identity
    // dml_rational_hash's oracle re-derives in DuckDB)
    val rel = db.relations("priced")
    val hashed = rel.df.withColumn("h", rel.rowHash).collect()
      .map(r => graft.hashing.Hashing.tupleHash("priced",
        Engine.rowToAttrs(rel, r)) == r.getString(2))
    assert(hashed.forall(identity))
  }
}

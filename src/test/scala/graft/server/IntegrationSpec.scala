package graft.server

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** Full shop workflow across all six sublanguages through one
  * EngineSession — the reference's integration block (reference
  * test/test_relational_engine.ml:836-1003: insert/delete lifecycle,
  * append-only state identity, history tracking, hash bubbling) plus the
  * branch/merge epilogue. */
class IntegrationSpec extends SparkTestBase {

  private def run(s: EngineSession, stmt: String): Response =
    s.execute(stmt).fold(e => fail(s"$stmt -> $e"), identity)

  private def rows(s: EngineSession, q: String): Seq[Row] = run(s, q) match {
    case QueryResult(df) => df.collect().toSeq
    case other => fail(s"expected query result, got $other")
  }

  test("shop workflow: schema, stock mutations, constraints, cursor, branch, merge") {
    val s = new EngineSession(spark)
    run(s, "(ddl (CreateDatabase shop))")
    val h0 = s.db.hash

    run(s, "(ddl (CreateRelation (name product) (schema ((sku integer) (name string) (price rational)))))")
    run(s, "(ddl (CreateRelation (name stock) (schema ((sku integer) (qty natural)))))")
    // FK: every stocked sku must exist in product
    run(s, "(icl (RegisterConstraint (constraint_name stock_fk) (relation_name stock) " +
      "(body (MemberOf (target product) (binding ((sku (Var sku))))))))")

    // catalog reflects the schema (reference test:662-834 maintenance)
    assert(rows(s, "(drl (Project (name) (Base sakura:relation)))")
      .map(_.getString(0)).toSet.contains("product"))
    assert(rows(s, "(drl (Select (Const ((relation_name (Str stock)))) (Base sakura:attribute)))")
      .length == 2)

    // stock before product violates the FK; after inserting product it passes
    assert(s.execute("(dml (InsertTuple (relation stock) (attributes ((sku (Int 1)) (qty (Int 5))))))").isLeft)
    run(s, "(dml (InsertTuples (relation product) (tuples " +
      "(((sku (Int 1)) (name (Str Apple)) (price (Float 0.5))) " +
      "((sku (Int 2)) (name (Str Pear)) (price (Float 0.75)))))))")
    run(s, "(dml (InsertTuple (relation stock) (attributes ((sku (Int 1)) (qty (Int 5))))))")
    run(s, "(dml (InsertTuple (relation stock) (attributes ((sku (Int 2)) (qty (Int 0))))))")

    // history chain grows, hashes bubble (reference test:136-215)
    val h1 = s.db.hash
    assert(h1 != h0)
    assert(s.db.history.nonEmpty && s.db.history.head != h1)

    // deleting a referenced product cascades to a rejection; an
    // unreferenced delete passes (reference cascade block :3976+)
    assert(s.execute("(dml (DeleteTuple (relation product) (attributes ((sku (Int 1)) (name (Str Apple)) (price (Float 0.5))))))").isLeft)
    run(s, "(dml (DeleteWhere (target stock) (predicate (Const ((sku (Int 2)))))))")
    run(s, "(dml (DeleteTuple (relation product) (attributes ((sku (Int 2)) (name (Str Pear)) (price (Float 0.75))))))")

    // append-only identity: reinserting restores content, state hash moves on
    run(s, "(dml (InsertTuple (relation product) (attributes ((sku (Int 2)) (name (Str Pear)) (price (Float 0.75))))))")
    assert(rows(s, "(drl (Base product))").length == 2)

    // SCL cursor pages the product list on a pinned snapshot
    val batch = run(s, "(scl (Begin (query (Project (name) (Base product))) (limit 1)))") match {
      case CursorBatch(b) => b
      case other => fail(s"unexpected $other")
    }
    assert(batch.rows.length == 1 && batch.hasMore)

    // branch, diverge, merge (reference branch/merge blocks :3164-3485)
    run(s, "(dcl (CreateBranch (name main)))")
    run(s, "(dcl (Checkout main))")
    run(s, "(dcl (CreateBranch (name promo)))")
    run(s, "(dcl (Checkout promo))")
    run(s, "(dml (InsertTuple (relation product) (attributes ((sku (Int 3)) (name (Str Fig)) (price (Float 2.0))))))")
    run(s, "(dcl (Checkout main))")
    run(s, "(dml (InsertTuple (relation stock) (attributes ((sku (Int 2)) (qty (Int 9))))))")
    run(s, "(dcl (Merge (left main) (right promo) (strategy PreferLeft)))")
    assert(rows(s, "(drl (Base product))").length == 3)  // promo's fig arrived
    assert(rows(s, "(drl (Select (Const ((sku (Int 2)))) (Base stock)))").length == 1)

    // the merged state is immediately queryable through the full DRL path
    val joined = rows(s,
      "(drl (Project (name qty) (Join (sku) (Base product) (Base stock))))")
    assert(joined.map(r => (r.getString(0), r.getLong(1))).toSet ==
      Set(("Apple", 5L), ("Pear", 9L)))
  }

  test("scripted execute is thread-safe: concurrent callers on one session serialize, never self-conflict") {
    // execute takes the session monitor (the same one the listener's
    // wire path holds), so its snapshot-read and commit-CAS are one
    // critical section: N racing scripted inserts must ALL land —
    // a lost race would surface as Err.Conflict (snapshot != head)
    val s = new EngineSession(spark)
    run(s, "(ddl (CreateDatabase racedb))")
    run(s, "(ddl (CreateRelation (name t) (schema ((k integer)))))")
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val threads = (1 to 8).map { k =>
      new Thread(() =>
        s.execute(s"(dml (InsertTuple (relation t) (attributes ((k (Int $k))))))")
          .left.foreach(e => errs.add(s"insert $k: $e")))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    assert(errs.isEmpty, s"racing scripted inserts failed: $errs")
    assert(rows(s, "(drl (Base t))").length == 8)
  }
}

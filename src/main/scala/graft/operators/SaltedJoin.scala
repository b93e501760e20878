package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join — the skew-mitigation tool for the case AQE's
  * skew-join split cannot reach (a single join key so hot that one
  * shuffle partition holds it entirely, and the build side is too large
  * to broadcast). Spark's shuffled hash/sort-merge join routes every row
  * of a key to ONE reducer; a key holding 10% of 100 TB makes that
  * reducer the job. Salting splits each skewed key's rows across
  * `saltFactor` reducers by widening the join key with a salt column:
  * the probe side gets a content-derived salt in [0, saltFactor), the
  * build side is replicated once per salt value, and the join key
  * becomes (keys..., salt). Result multiset is IDENTICAL to the plain
  * join — each probe row meets each matching build row exactly once, at
  * exactly one salt value.
  *
  * Cost model: build-side size × saltFactor extra shuffle volume buys a
  * saltFactor-way split of the hottest key. Use when probe ≫ build and
  * the probe's key histogram is heavy-tailed; prefer broadcast when the
  * build side fits, and plain shuffle + AQE otherwise.
  */
object SaltedJoin {

  /** Inner equi-join of `probe` ⋈ `build` on `keys`, with the probe side
    * salted `saltFactor` ways and the build side replicated to match.
    * The salt is a pure function of the probe row's content (xxhash64 of
    * all columns), so the plan stays deterministic and re-runnable. */
  def inner(probe: DataFrame, build: DataFrame, keys: Seq[String],
      saltFactor: Int): DataFrame = {
    require(saltFactor >= 1, s"saltFactor must be >= 1, got $saltFactor")
    require(keys.nonEmpty, "salted join needs at least one equality key")
    def q(c: String): Column = col(s"`$c`")

    val salted = probe.withColumn("__salt",
      pmod(xxhash64(probe.columns.toIndexedSeq.map(q): _*), lit(saltFactor)).cast("int"))
    val replicated = build.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, keys :+ "__salt").drop("__salt")
  }
}

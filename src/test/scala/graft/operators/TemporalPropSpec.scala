package graft.operators

import graft.SparkTestBase
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean

/** Randomized parity: the distributed temporal-join formulations against
  * brute-force in-memory references, over generated event sets with
  * deliberately colliding timestamps and keys. */
class TemporalPropSpec extends SparkTestBase {
  import spark.implicits._

  /** Run a scalacheck property under ScalaTest (no scalatestplus bridge
    * in the dependency set; 30 cases keeps the Spark-job cost sane). */
  private def checkProp(p: Prop): Unit = {
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(30), p)
    assert(res.passed, res.status.toString)
  }

  // small dense domains force key/ts collisions — the interesting cases
  private val genLeft = Gen.listOfN(12, for {
    id <- Gen.choose(1L, 1000L); user <- Gen.choose(1L, 3L); ts <- Gen.choose(0L, 30L)
  } yield (id, user, ts)).map(_.distinctBy(_._1))
  private val genRight = Gen.listOfN(12, for {
    id <- Gen.choose(1001L, 2000L); user <- Gen.choose(1L, 3L); ts <- Gen.choose(0L, 30L)
    v <- Gen.option(Gen.choose(0, 100).map(_ / 10.0)) // nulls exercise the struct fill
  } yield (user, ts, id, v)).map(_.distinctBy(_._3))

  test("as-of join matches the brute-force latest-at-or-before reference") {
    checkProp(Prop.forAll(genLeft, genRight) { (ls, rs) =>
      (ls.nonEmpty && rs.nonEmpty) ==> {
        val rdf = rs.map { case (u, t, id, v) =>
          (u, t, id, v.map(java.lang.Double.valueOf).orNull)
        }.toDF("user_id", "ts", "event_id", "value")
        val got = AsofJoin.backward(
          ls.toDF("event_id", "user_id", "ts"), rdf,
          Seq("user_id"), "ts", Seq("event_id", "value"), "event_id")
          .select("event_id", "asof_event_id", "asof_value")
          .collect().map(r => r.getLong(0) ->
            (if (r.isNullAt(1)) None
             else Some((r.getLong(1), if (r.isNullAt(2)) None else Some(r.getDouble(2)))))).toMap
        val want = ls.map { case (lid, user, lts) =>
          val cands = rs.filter(r => r._1 == user && r._2 <= lts)
          // latest ts wins; among equal ts, the greatest tiebreak (event_id);
          // the winner's value comes through verbatim, nulls included
          lid -> cands.sortBy(r => (r._2, r._3)).lastOption.map(r => (r._3, r._4))
        }.toMap
        got == want
      }
    })
  }

  test("banded range join matches the brute-force band filter") {
    val genBounds = for {
      lo <- Gen.choose(-10L, 10L); w <- Gen.choose(0L, 15L)
    } yield (lo, lo + w)
    checkProp(Prop.forAll(genLeft, genRight, genBounds) { case (ls, rs, (lo, hi)) =>
      (ls.nonEmpty && rs.nonEmpty) ==> {
        val got = RangeJoin.band(
          ls.toDF("lid", "user_id", "ts"), rs.toDF("user_id", "ts", "rid", "v"),
          Seq("user_id"), "ts", lo, hi, Seq("rid"))
          .select("lid", "r_rid").collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
        val want = for {
          l <- ls; r <- rs
          if r._1 == l._2 && r._2 - l._3 >= lo && r._2 - l._3 <= hi
        } yield (l._1, r._3)
        // exactly-once emission: compare as multisets
        got.groupBy(identity).view.mapValues(_.size).toMap ==
          want.groupBy(identity).view.mapValues(_.size).toMap
      }
    })
  }

  test("packing offsets equal the sequential prefix sum for random corpora") {
    val gen = Gen.listOfN(40, for {
      id <- Gen.choose(1L, 500L); n <- Gen.choose(1, 30)
    } yield (id, n)).map(_.distinctBy(_._1))
    checkProp(Prop.forAll(gen, Gen.choose(5L, 100L)) { (docs, cap) =>
      docs.nonEmpty ==> {
        val df = docs.map { case (id, n) => (id, Seq.fill(n)("w").mkString(" ")) }
          .toDF("doc_id", "text")
        val got = graft.pipeline.Packing.pack(df, "doc_id", "text", cap)
          .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
        var offset = 0L
        val want = docs.sortBy(_._1).map { case (id, n) =>
          val o = offset; offset += n
          id -> ((n.toLong, o, o / cap))
        }.toMap
        got == want
      }
    })
  }
}

package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkTestBase {
  import spark.implicits._

  private def nfcOf(ss: Seq[String]): Seq[String] =
    ss.toDF("s")
      .select(Functions.nfc(spark, col("s")).as("n"))
      .collect().map(r => if (r.isNullAt(0)) null else r.getString(0)).toSeq

  test("combining sequences recompose; precomposed text is unchanged") {
    // e + COMBINING ACUTE → é; A + RING ABOVE → Å; ANGSTROM SIGN → Å
    assert(nfcOf(Seq("cafe\u0301", "caf\u00e9", "A\u030a", "\u212b")) ===
      Seq("caf\u00e9", "caf\u00e9", "\u00c5", "\u00c5"))
  }

  test("NFC is canonical, not compatibility: ligatures and full-width stay") {
    // LATIN SMALL LIGATURE FI and FULLWIDTH letters survive NFC (NFKC
    // would decompose them)
    assert(nfcOf(Seq("\ufb01sh", "\uff28\uff29")) === Seq("\ufb01sh", "\uff28\uff29"))
  }

  test("ascii and empty strings pass through; null stays null") {
    assert(nfcOf(Seq("plain ascii", "", null)) === Seq("plain ascii", "", null))
  }

  test("interpreted tier agrees with codegen") {
    val e = NfcNormalize(org.apache.spark.sql.catalyst.expressions.Literal(
      org.apache.spark.unsafe.types.UTF8String.fromString("e\u0301A\u030a")))
    assert(e.eval(null).toString === "\u00e9\u00c5")
  }

  test("non-string input is a descriptive analysis error") {
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(Functions.nfc(spark, col("x"))).collect()
    }
    assert(err.getMessage.contains("graft_nfc"), err.getMessage)
  }

  test("normalization unifies dedup keys across encoder variants") {
    val docs = Seq((1L, "cafe\u0301 menu"), (2L, "caf\u00e9 menu")).toDF("doc_id", "text")
    val n = docs.select(col("doc_id"), Functions.nfc(spark, col("text")).as("text"))
    assert(n.select("text").distinct().count() === 1)
    assert(docs.select("text").distinct().count() === 2)
  }
}

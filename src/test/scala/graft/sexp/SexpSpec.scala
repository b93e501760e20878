package graft.sexp

import org.scalatest.funsuite.AnyFunSuite
import Sexp.{Atom, SList}

class SexpSpec extends AnyFunSuite {

  test("parses bare atoms") {
    assert(Sexp.parse("hello") == Right(Atom("hello")))
    assert(Sexp.parse("  42 ") == Right(Atom("42")))
  }

  test("parses quoted strings with escapes") {
    assert(Sexp.parse("\"a b\"") == Right(Atom("a b")))
    assert(Sexp.parse("\"l1\\nl2\"") == Right(Atom("l1\nl2")))
    assert(Sexp.parse("\"q\\\"q\"") == Right(Atom("q\"q")))
    assert(Sexp.parse("\"back\\\\slash\"") == Right(Atom("back\\slash")))
  }

  test("parses nested lists") {
    assert(Sexp.parse("(a (b c) ())") ==
      Right(SList(List(Atom("a"), SList(List(Atom("b"), Atom("c"))), SList(Nil)))))
  }

  test("skips line comments") {
    assert(Sexp.parse("; leading\n(a ; inline\n b)") ==
      Right(SList(List(Atom("a"), Atom("b")))))
  }

  test("rejects malformed input") {
    assert(Sexp.parse("(a").isLeft)
    assert(Sexp.parse(")").isLeft)
    assert(Sexp.parse("\"open").isLeft)
    assert(Sexp.parse("a b").isLeft) // trailing input
    assert(Sexp.parse("").isLeft)
  }

  test("parseMany returns all top-level forms") {
    assert(Sexp.parseMany("a (b) c") ==
      Right(List(Atom("a"), SList(List(Atom("b"))), Atom("c"))))
  }

  test("render round-trips plain and special atoms") {
    val cases = List(
      Atom("plain"),
      Atom("with space"),
      Atom("with(paren"),
      Atom("with\"quote"),
      Atom("a;b"), // ';' starts a comment — must be quoted on render
      Atom(""),
      SList(List(Atom("x"), SList(List(Atom("nested atom"), Atom("y"))))),
    )
    cases.foreach { s =>
      assert(Sexp.parse(s.render) == Right(s), s"round-trip failed for ${s.render}")
    }
  }

  test("render quotes the empty atom") {
    assert(Atom("").render == "\"\"")
  }

  test("parse never throws on arbitrary input (fuzz)") {
    import org.scalacheck.{Gen, Prop}
    // bias toward the parser's own metacharacters — random unicode alone
    // rarely exercises the quote/escape/comment machinery
    val genInput = Gen.frequency(
      2 -> Gen.asciiPrintableStr,
      2 -> Gen.listOf(Gen.oneOf('(', ')', '"', '\\', ';', ' ', '\n', 'a', '\t'))
        .map(_.mkString),
      1 -> Gen.listOf(Gen.oneOf(Gen.asciiPrintableChar, Gen.choose(Char.MinValue, Char.MaxValue)))
        .map(_.mkString))
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(500),
      Prop.forAll(genInput) { s =>
        Sexp.parse(s); Sexp.parseMany(s) // Either, never an exception
        true
      })
    assert(res.passed, res.status.toString)
  }

  test("render ∘ parse is identity on arbitrary trees (fuzz)") {
    import org.scalacheck.{Gen, Prop}
    val genLeaf: Gen[Sexp] = Gen.oneOf(
      Gen.asciiPrintableStr, Gen.alphaNumStr,
      Gen.listOf(Gen.oneOf('(', ')', '"', '\\', ';', ' ', 'é')).map(_.mkString)
    ).map(Atom(_))
    def genTree(depth: Int): Gen[Sexp] =
      if (depth == 0) genLeaf
      else Gen.frequency(
        3 -> genLeaf,
        2 -> Gen.choose(0, 4).flatMap(n =>
          Gen.listOfN(n, genTree(depth - 1)).map(SList(_))))
    val res = org.scalacheck.Test.check(
      org.scalacheck.Test.Parameters.default.withMinSuccessfulTests(300),
      Prop.forAll(genTree(3)) { t =>
        Sexp.parse(t.render) == Right(t)
      })
    assert(res.passed, res.status.toString)
  }
}

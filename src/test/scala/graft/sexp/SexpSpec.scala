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
}

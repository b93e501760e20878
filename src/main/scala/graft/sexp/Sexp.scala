package graft.sexp

/** Minimal s-expression reader/printer.
  *
  * The reference engine's entire wire surface is s-expressions (see
  * reference lib/listener.ml:17-28 — six sublanguages dispatched on a
  * leading tag). This is a from-scratch recursive-descent reader for the
  * subset we need: parenthesized lists, bare atoms, and double-quoted
  * strings with `\"` / `\\` / `\n` / `\t` escapes.
  */
sealed trait Sexp {
  def render: String = this match {
    case Sexp.Atom(v) =>
      if (v.isEmpty || v.exists(c => c.isWhitespace || c == '(' || c == ')' || c == '"' || c == ';'))
        "\"" + v.flatMap {
          case '"'  => "\\\""
          case '\\' => "\\\\"
          case '\n' => "\\n"
          case '\t' => "\\t"
          case c    => c.toString
        } + "\""
      else v
    case Sexp.SList(items) => items.map(_.render).mkString("(", " ", ")")
  }
}

object Sexp {
  final case class Atom(value: String) extends Sexp
  final case class SList(items: List[Sexp]) extends Sexp

  def list(items: Sexp*): SList = SList(items.toList)

  /** Parse a single s-expression; fails on trailing non-whitespace. */
  def parse(input: String): Either[String, Sexp] = {
    val p = new Parser(input)
    for {
      s <- p.parseOne()
      _ <- p.expectEnd()
    } yield s
  }

  /** Parse zero or more s-expressions until end of input. */
  def parseMany(input: String): Either[String, List[Sexp]] = {
    val p = new Parser(input)
    val buf = List.newBuilder[Sexp]
    var done = false
    var err: Option[String] = None
    while (!done && err.isEmpty) {
      p.skipWs()
      if (p.atEnd) done = true
      else p.parseOne() match {
        case Right(s) => buf += s
        case Left(e)  => err = Some(e)
      }
    }
    err.toLeft(buf.result())
  }

  private final class Parser(input: String) {
    private var pos = 0
    def atEnd: Boolean = pos >= input.length

    def skipWs(): Unit = {
      var go = true
      while (go) {
        while (!atEnd && input.charAt(pos).isWhitespace) pos += 1
        // line comments, ; to end of line
        if (!atEnd && input.charAt(pos) == ';') {
          while (!atEnd && input.charAt(pos) != '\n') pos += 1
        } else go = false
      }
    }

    def expectEnd(): Either[String, Unit] = {
      skipWs()
      if (atEnd) Right(()) else Left(s"trailing input at offset $pos: '${input.drop(pos).take(20)}'")
    }

    def parseOne(): Either[String, Sexp] = {
      skipWs()
      if (atEnd) Left("unexpected end of input")
      else input.charAt(pos) match {
        case '(' =>
          pos += 1
          val items = List.newBuilder[Sexp]
          var res: Either[String, Sexp] = null
          var done = false
          while (!done && res == null) {
            skipWs()
            if (atEnd) res = Left("unterminated list")
            else if (input.charAt(pos) == ')') { pos += 1; done = true }
            else parseOne() match {
              case Right(s) => items += s
              case Left(e)  => res = Left(e)
            }
          }
          if (res != null) res else Right(SList(items.result()))
        case ')' => Left(s"unexpected ')' at offset $pos")
        case '"' =>
          pos += 1
          val sb = new StringBuilder
          var res: Either[String, Sexp] = null
          while (res == null) {
            if (atEnd) res = Left("unterminated string")
            else input.charAt(pos) match {
              case '"' => pos += 1; res = Right(Atom(sb.toString))
              case '\\' =>
                pos += 1
                if (atEnd) res = Left("unterminated escape")
                else {
                  input.charAt(pos) match {
                    case 'n'   => sb += '\n'
                    case 't'   => sb += '\t'
                    case other => sb += other
                  }
                  pos += 1
                }
              case c => sb += c; pos += 1
            }
          }
          res
        case _ =>
          val start = pos
          while (!atEnd && { val c = input.charAt(pos); !c.isWhitespace && c != '(' && c != ')' && c != '"' && c != ';' })
            pos += 1
          Right(Atom(input.substring(start, pos)))
      }
    }
  }
}

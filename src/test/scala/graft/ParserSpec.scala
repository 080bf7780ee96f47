package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lang._
import graft.lang.Typing

/** Syntax-surface pins (SURVEY.md §2.10): comment handling, string
  * charset, operator precedence/associativity, unsigned-integer-only
  * literals. Pure front end — no SparkSession. */
class ParserSpec extends AnyFunSuite {

  private val header = "(:P {x int, s string})\n"

  private def whereExpr(src: String): Typing.TExpr =
    Typing.compile(src).instrs.collectFirst { case Typing.RWhere(e) => e }.get

  test("OCaml-style comments are skipped (lexer.mll:23)") {
    val tp = Typing.compile(
      header + "(* a comment (with parens inside) *)\ncreate (a:P) (* trailing *)\nreturn a")
    assert(tp.instrs.size == 2)
  }

  test("string literals admit letters, digits, and spaces (lexer.mll:26-27)") {
    val tp = Typing.compile(header + "create (a:P)\nset a.s = \"Abc 123 xyz\"")
    assert(tp.instrs.collect { case Typing.RSet(_, _, _, _, Typing.TConst(StringV(s))) => s }
      == List("Abc 123 xyz"))
  }

  test("precedence: or < and < cmp < +- < */mod, left-assoc (parser.mly:18-22)") {
    // 1 + 2 * 3 = 7  ⇒ parses as 1 + (2*3), not (1+2)*3
    val e1 = whereExpr(header + "create (a:P)\nwhere 1 + 2 * 3 = 7")
    assert(e1.isInstanceOf[Typing.TBin])
    // a or b and c  ⇒  a or (b and c): with x=1 the filter keeps the row
    // only under the correct grouping (true or (true and false)) = true
    val keep = Typing.compile(
      header + "create (a:P)\nset a.x = 1\nmatch (p:P)\nwhere p.x = 1 or p.x = 1 and p.x = 2\nreturn p")
    assert(keep.instrs.nonEmpty)
    // left associativity of subtraction: 10 - 4 - 3 = 3, not 9
    val e2 = whereExpr(header + "create (a:P)\nwhere 10 - 4 - 3 = 3")
    e2 match {
      case Typing.TBin(BCeq, Typing.TBin(BAsub, Typing.TBin(BAsub, _, _, _), _, _), _, _) => ()
      case other => fail(s"wrong shape: $other")
    }
  }

  test("integers are unsigned; negatives only via subtraction (lexer.mll:22,36)") {
    intercept[Exception](Typing.compile(header + "create (a:P)\nset a.x = -5"))
    val tp = Typing.compile(header + "create (a:P)\nset a.x = 0 - 5")
    assert(tp.instrs.size == 2)
  }

  test("type declarations may interleave with relation declarations (parser.mly:30-31)") {
    val tp = Typing.compile(
      "(:P {})\n(:P) -[:r]-> (:Q)\n(:Q {})\ncreate (a:P) -[:r]-> (b:Q)")
    assert(tp.schema.relTypes == Set(("P", "r", "Q")))
  }

  test("parse errors report position context") {
    val ex = intercept[Exception](Typing.compile(header + "create (a:P\nreturn a"))
    assert(ex.getMessage != null && ex.getMessage.nonEmpty)
  }
}

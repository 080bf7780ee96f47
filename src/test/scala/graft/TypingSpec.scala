package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.lang.Typing

/** Negative corpus (SURVEY.md §5.2(2)): one test per distinct analysis
  * error class of the reference type checker (typing.ml:57-98, 128-163,
  * 201-268) plus the doc/interf.ml scenarios. Pure driver-side — no
  * SparkSession. */
class TypingSpec extends AnyFunSuite {

  private def err(src: String): String =
    intercept[Typing.TypeError](Typing.compile(src)).getMessage

  private val header =
    """(:P {x int, s string})
      |(:Q {y int})
      |(:P) -[:r]-> (:Q)
      |""".stripMargin

  test("duplicate node type declaration") {
    assert(err("(:P {x int})\n(:P {y int})\ncreate (a:P)")
      .contains("duplicate node type"))
  }

  test("relation endpoint references undeclared label") {
    assert(err("(:P {})\n(:P) -[:r]-> (:Z)\ncreate (a:P)")
      .contains("undeclared target label Z"))
    assert(err("(:P {})\n(:Z) -[:r]-> (:P)\ncreate (a:P)")
      .contains("undeclared source label Z"))
  }

  test("duplicate relation type declaration") {
    assert(err("(:P {})\n(:P) -[:r]-> (:P)\n(:P) -[:r]-> (:P)\ncreate (a:P)")
      .contains("duplicate relation type"))
  }

  test("duplicate attribute in a node type") {
    assert(err("(:P {x int, x string})\ncreate (a:P)")
      .contains("duplicate attribute"))
  }

  test("undeclared node label in a pattern") {
    assert(err(header + "create (a:Z)").contains("undeclared node label Z"))
  }

  test("edge on unbound variable") {
    assert(err(header + "create (a:P)\ncreate (a) -[:r]-> (b)")
      .contains("variable b not bound"))
  }

  test("undeclared relation type between bound labels") {
    assert(err(header + "create (a:Q)\ncreate (b:Q)\nmatch (a) -[:r]-> (b)")
      .contains("undeclared relation type (:Q)-[:r]->(:Q)"))
  }

  test("delete of unbound variable") {
    assert(err(header + "create (a:P)\ndelete b").contains("unbound variable b"))
  }

  test("deleted variable is unbound afterwards (env restriction)") {
    assert(err(header + "create (a:P)\ndelete a\nreturn a")
      .contains("unbound"))
  }

  test("duplicate variables in return") {
    assert(err(header + "create (a:P)\nreturn a, a")
      .contains("duplicate variables in return"))
  }

  test("return of unbound variable") {
    assert(err(header + "create (a:P)\nreturn a, z")
      .contains("return of unbound variable(s): z"))
  }

  test("return restricts the environment (reference typing.ml:252)") {
    assert(err(header + "create (a:P)\ncreate (b:Q)\nreturn a\nreturn b")
      .contains("return of unbound variable(s): b"))
  }

  test("where expression must be bool") {
    assert(err(header + "create (a:P)\nset a.x = 1\nmatch (p:P)\nwhere p.x + 1")
      .contains("must be bool"))
  }

  test("attribute not declared for the variable's label") {
    assert(err(header + "create (a:P)\nwhere a.nope = 1")
      .contains("attribute nope not declared for label P"))
  }

  test("set type mismatch against the declared attribute type") {
    assert(err(header + "create (a:P)\nset a.x = \"hello\"")
      .contains("expression type"))
  }

  test("set of undeclared attribute") {
    assert(err(header + "create (a:P)\nset a.zz = 1")
      .contains("attribute zz not declared"))
  }

  test("arithmetic requires int operands") {
    assert(err(header + "create (a:P)\nset a.s = \"v\"\nwhere a.s + 1 = 2")
      .contains("arithmetic"))
  }

  test("ordering is int-only (stricter than =/<>, reference sem.ml:169-172)") {
    assert(err(header + "create (a:P)\nset a.s = \"v\"\nwhere a.s < \"w\"")
      .contains("ordering"))
  }

  test("equality is polymorphic but requires same-typed operands") {
    assert(err(header + "create (a:P)\nset a.x = 1\nwhere a.x = \"one\"")
      .contains("same-typed"))
  }

  test("logic requires bool operands") {
    assert(err(header + "create (a:P)\nset a.x = 1\nwhere a.x and true")
      .contains("logic"))
  }

  test("rebinding a variable is permitted and shadows (typing.ml:216 deviation)") {
    // must typecheck: `p` rebound from P to Q, set checks against Q
    val tp = Typing.compile(header + "create (p:P)\ncreate (p:Q)\nset p.y = 2")
    assert(tp.instrs.nonEmpty)
  }
}

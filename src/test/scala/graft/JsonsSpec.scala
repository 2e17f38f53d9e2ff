package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver parses oracle_sql.json with a strict JSON loader — every
  * escape class the SQL builders can emit must survive the round trip.
  */
class JsonsSpec extends AnyFunSuite {

  test("quote escapes backslash, quote, and every control char") {
    assert(Jsons.quote("""a"b\c""") === """"a\"b\\c"""")
    assert(Jsons.quote("a\nb\tc\rd") === """"a\nb\tc\rd"""")
    // a non-named control char (SOH) escapes as \u0001; the expected text
    // is built piecewise because scalac interprets \uXXXX even in triple
    // quotes
    assert(Jsons.quote("x" + 1.toChar + "y") === "\"x\\" + "u0001y\"")
    assert(Jsons.quote("plain, non-ASCII kept: é") === "\"plain, non-ASCII kept: é\"")
  }

  test("obj emits a flat object a strict parser accepts") {
    val json = Jsons.obj(Seq("q1" -> "SELECT\n1", "odd\"key" -> """back\slash"""))
    // cheap strictness check without a JSON lib: no raw control chars, and
    // the exact expected text
    assert(!json.exists(_ < ' '))
    assert(json === """{"q1": "SELECT\n1","odd\"key": "back\\slash"}""")
  }
}

package graft.sources

import org.scalatest.funsuite.AnyFunSuite

class NlocSpec extends AnyFunSuite {
  import Nloc._

  test("C-family: line + block comments stripped, code lines kept") {
    val src =
      """// header comment
        |int main() { // trailing comment still counts the line
        |  /* block
        |     comment */
        |  int x = 1; /* inline */ int y = 2;
        |
        |  return x + y;
        |}
        |""".stripMargin
    // main(+trailing comment), x/y line, return, closing brace
    assert(count(src, "main.c") == 4)
  }

  test("block comment closing mid-line leaves the remainder as code") {
    val src = "/* a\n   b */ int x;\nint y;\n"
    assert(count(src, "f.cpp") == 2)       // "int x" after close, "int y"
  }

  test("comment markers inside string literals do not truncate the line") {
    assert(count("""s = "not // a comment";""" + "\n", "f.java") == 1)
    assert(count("""u = "http://x.y";""" + "\n", "f.js") == 1)
    assert(count("""p = "# not a comment"""" + "\n", "f.py") == 1)
  }

  test("hash and dashdash languages") {
    val py = "# module docs\n\nx = 1  # inline\n\ndef f():\n    return x\n"
    assert(count(py, "m.py") == 3)          // x=1, def, return
    val sql = "-- header\nSELECT 1; -- trailing\n\n-- only\nFROM t\n"
    assert(count(sql, "q.sql") == 2)        // SELECT line, FROM line
  }

  test("unrecognized extension falls back to the non-blank superset") {
    val src = "// looks like a comment\n\nreal line\n"
    assert(count(src, "notes.xyz") == 2)    // superset keeps the marker line
    assert(langFor("notes.xyz").isEmpty && langFor("noext").isEmpty)
  }

  test("lineHasCode threads block state across lines") {
    val l = langFor("a.scala").get
    val (h1, b1) = lineHasCode("/* open", l, blockOpen = false)
    assert(!h1 && b1)
    val (h2, b2) = lineHasCode("   still comment", l, blockOpen = b1)
    assert(!h2 && b2)
    val (h3, b3) = lineHasCode(" end */ val x = 1", l, blockOpen = b2)
    assert(h3 && !b3)
  }
}

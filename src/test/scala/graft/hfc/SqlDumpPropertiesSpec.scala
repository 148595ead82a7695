package graft.hfc

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based round trips for the dump interop surfaces: the
  * writer's escaping must be the parser's exact inverse over
  * ADVERSARIAL strings (every escape-alphabet char, quotes of both
  * kinds, long runs of backslashes), and the Python-repr converter
  * must invert a CPython-faithful repr writer for the value shapes
  * the dumps actually carry. Seeded generators (the MergeProperties
  * discipline — the scalatest-scalacheck bridge isn't in the offline
  * cache) so failures reproduce exactly. */
class SqlDumpPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  // strings heavy in the characters that matter: the MySQL escape
  // alphabet, both quotes, backslash runs, unicode, and controls
  private val nastyChar: Gen[Char] = Gen.frequency(
    6 -> Gen.alphaNumChar,
    2 -> Gen.oneOf('\'', '"', '\\', '\n', '\r', '\t', '\u0000', '\u001A'),
    1 -> Gen.oneOf('é', '漢', '—', ';', ',', '(', ')', '`'),
    1 -> Gen.choose(1.toChar, 127.toChar))
  private val nastyString: Gen[String] =
    Gen.choose(0, 40).flatMap(n => Gen.listOfN(n, nastyChar).map(_.mkString))

  test("SqlQuote -> SqlInsertParse is the identity on 400 adversarial strings") {
    val strings = (1L to 400L).map(seed => sample(nastyString, seed))
    val df = strings.zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("id", "s")
    val dir = java.nio.file.Files.createTempDirectory("graft-dump-prop")
      .resolve("d").toString
    SqlDump.writeTable(df, "prop", dir)
    val back = SqlDump.loadAs(spark, dir, "prop", df.schema)
      .orderBy($"id").as[(Long, String)].collect().toSeq
    val want = df.orderBy($"id").as[(Long, String)].collect().toSeq
    assert(back == want)
  }

  // a CPython-faithful repr writer for the subset of shapes the dumps
  // carry (dict/list of str/int/bool/None). String rule mirrors
  // CPython: single quotes unless the string contains ' and not ";
  // escape \\ \n \r \t and the chosen quote; other controls as \xNN.
  private def pyStr(s: String): String = {
    val useDouble = s.contains('\'') && !s.contains('"')
    val q = if (useDouble) '"' else '\''
    val sb = new StringBuilder
    sb += q
    s.foreach {
      case '\\' => sb ++= "\\\\"
      case '\n' => sb ++= "\\n"
      case '\r' => sb ++= "\\r"
      case '\t' => sb ++= "\\t"
      case c if c == q => sb += '\\' += q
      case c if c < ' ' || c == '\u007F' => sb ++= f"\\x${c.toInt}%02x"
      case c => sb += c
    }
    (sb += q).toString
  }

  private sealed trait Py
  private case class PStr(v: String) extends Py
  private case class PInt(v: Long) extends Py
  private case class PBool(v: Boolean) extends Py
  private case object PNone extends Py
  private case class PList(v: List[Py]) extends Py
  private case class PDict(v: List[(String, Py)]) extends Py

  private def pyRepr(p: Py): String = p match {
    case PStr(s) => pyStr(s)
    case PInt(v) => v.toString
    case PBool(v) => if (v) "True" else "False"
    case PNone => "None"
    case PList(v) => v.map(pyRepr).mkString("[", ", ", "]")
    case PDict(v) =>
      v.map { case (k, x) => s"${pyStr(k)}: ${pyRepr(x)}" }.mkString("{", ", ", "}")
  }

  private def jsonOf(p: Py): String = p match {
    case PStr(s) =>
      val sb = new StringBuilder += '"'
      s.foreach {
        case '"' => sb ++= "\\\""
        case '\\' => sb ++= "\\\\"
        case '\n' => sb ++= "\\n"
        case '\r' => sb ++= "\\r"
        case '\t' => sb ++= "\\t"
        case '\b' => sb ++= "\\b"
        case '\f' => sb ++= "\\f"
        case c if c < ' ' => sb ++= f"\\u${c.toInt}%04x"
        case c => sb += c
      }
      (sb += '"').toString
    case PInt(v) => v.toString
    case PBool(v) => if (v) "true" else "false"
    case PNone => "null"
    case PList(v) => v.map(jsonOf).mkString("[", ",", "]")
    case PDict(v) =>
      v.map { case (k, x) => s"${jsonOf(PStr(k))}:${jsonOf(x)}" }.mkString("{", ",", "}")
  }

  private val pyLeaf: Gen[Py] = Gen.frequency(
    4 -> nastyString.map(PStr),
    2 -> Gen.choose(Long.MinValue / 2, Long.MaxValue / 2).map(PInt),
    1 -> Gen.oneOf(PBool(true), PBool(false), PNone))
  private def pyValue(depth: Int): Gen[Py] =
    if (depth <= 0) pyLeaf
    else Gen.frequency(
      3 -> pyLeaf,
      1 -> Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, pyValue(depth - 1)).map(PList(_))),
      2 -> Gen.choose(0, 4).flatMap(n =>
        Gen.listOfN(n, Gen.zip(nastyString, pyValue(depth - 1)))
          .map(kvs => PDict(kvs.map { case (k, v) => (k, v) }))))

  test("PyReprJson inverts a CPython-faithful repr on 400 generated values") {
    (1L to 400L).foreach { seed =>
      val v = sample(pyValue(3), seed)
      val repr = pyRepr(v)
      val got = graft.functions.expressions.PyReprJson.toJson(repr)
      assert(got == jsonOf(v), s"seed=$seed repr=$repr")
    }
  }
}

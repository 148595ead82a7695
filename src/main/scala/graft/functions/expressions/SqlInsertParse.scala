package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Parse one MariaDB/MySQL dump statement into its INSERT payload —
  * the distributed half of [[graft.hfc.SqlDump]].
  *
  * The reference's primary consumable artifact is a monthly mysqldump
  * of its 17-table database (HFCommunity `docs/download.html` dump
  * listing); a real user holds `dump_YYYYMMDD.sql`, not Hub API
  * credentials. mysqldump output is line-structured: every statement
  * ends with `;\n`, and real newlines never occur INSIDE a statement's
  * string values (the dump escapes them as the two characters `\n`),
  * so `spark.read.option("lineSep", ";\n")` yields exactly one
  * statement per row and this expression parses each statement
  * partition-locally — a 100 GB dump parses as an embarrassingly
  * parallel scan with zero shuffle.
  *
  * Input: one statement (leading `--` comment lines, blank lines and
  * `/*!...*/` conditional blocks tolerated — with `;\n` as the line
  * separator, the comment block above an INSERT shares its element).
  * Output (null when the statement is not an INSERT):
  *
  *   struct<tbl: string,
  *          cols: array<string>,   -- null when the dump has no column
  *                                 -- list (mysqldump default)
  *          rows: array<array<string>>>
  *
  * Values decode to raw SQL-literal text: quoted strings are
  * UNESCAPED (`\'`, `''`, `\\`, `\n`, `\r`, `\t`, `\0`, `\Z`, `\b`,
  * MySQL's "escape of any other char is the char"), `NULL` becomes a
  * SQL null element, numbers/hex/bare words keep their literal text —
  * typing is the projection's job ([[graft.hfc.SqlDump.load]] casts
  * per target StructType), so the parse stays schema-agnostic.
  *
  * CodegenFallback for the CdcChunks reason: one eval per statement
  * (≈1 MiB of text for mysqldump's extended INSERTs) amortizes the
  * call; the per-character work is a single imperative scan.
  *
  * Registered as SQL function `graft_sql_insert_parse` by
  * [[graft.GraftExtensions]].
  */
case class SqlInsertParse(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sql_insert_parse requires a string statement, got ${t.simpleString}")
  }

  override def dataType: DataType = SqlInsertParse.outType

  override def nullSafeEval(input: Any): Any =
    SqlInsertParse.parse(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_sql_insert_parse"
}

object SqlInsertParse {

  val outType: StructType = StructType(Seq(
    StructField("tbl", StringType, nullable = false),
    StructField("cols", ArrayType(StringType, containsNull = false)),
    StructField("rows",
      ArrayType(ArrayType(StringType, containsNull = true), containsNull = false),
      nullable = false)))

  /** null when `stmt` is not an INSERT; throws IllegalArgumentException
    * on a malformed INSERT (a torn dump must fail loudly, not load
    * partially — the F8 quarantine wrapper catches per-statement when
    * the caller opts into lenient mode). */
  def parse(stmt: String): InternalRow = {
    val s = stmt
    var i = skipNoise(s, 0)
    if (!wordAt(s, i, "INSERT")) return null
    i = skipWs(s, i + 6)
    if (wordAt(s, i, "IGNORE")) i = skipWs(s, i + 6)
    if (!wordAt(s, i, "INTO"))
      throw bad(s, i, "expected INTO after INSERT")
    i = skipWs(s, i + 4)
    val (tbl0, i1) = ident(s, i)
    var table = tbl0
    i = skipWs(s, i1)
    if (i < s.length && s.charAt(i) == '.') { // qualified `db`.`tbl`
      val (t2, i2) = ident(s, skipWs(s, i + 1))
      table = t2
      i = skipWs(s, i2)
    }
    var cols: Array[Any] = null
    if (i < s.length && s.charAt(i) == '(') {
      val b = scala.collection.mutable.ArrayBuffer.empty[Any]
      i += 1
      var done = false
      while (!done) {
        i = skipWs(s, i)
        val (c, in) = ident(s, i)
        b += UTF8String.fromString(c)
        i = skipWs(s, in)
        if (i >= s.length) throw bad(s, i, "unterminated column list")
        s.charAt(i) match {
          case ',' => i += 1
          case ')' => i += 1; done = true
          case _ => throw bad(s, i, "expected , or ) in column list")
        }
      }
      cols = b.toArray
      i = skipWs(s, i)
    }
    if (wordAt(s, i, "VALUES")) i = skipWs(s, i + 6)
    else if (wordAt(s, i, "VALUE")) i = skipWs(s, i + 5)
    else throw bad(s, i, "expected VALUES")
    val rows = scala.collection.mutable.ArrayBuffer.empty[Any]
    var more = true
    while (more) {
      if (i >= s.length || s.charAt(i) != '(') throw bad(s, i, "expected (")
      i += 1
      val row = scala.collection.mutable.ArrayBuffer.empty[Any]
      var rowDone = false
      while (!rowDone) {
        i = skipWs(s, i)
        val (v, in) = value(s, i)
        row += v
        i = skipWs(s, in)
        if (i >= s.length) throw bad(s, i, "unterminated row")
        s.charAt(i) match {
          case ',' => i += 1
          case ')' => i += 1; rowDone = true
          case _ => throw bad(s, i, "expected , or ) in row")
        }
      }
      rows += new GenericArrayData(row.toArray)
      i = skipWs(s, i)
      if (i < s.length && s.charAt(i) == ',') { i += 1; i = skipWs(s, i) }
      else more = false
    }
    if (i < s.length && s.charAt(i) == ';') i = skipWs(s, i + 1)
    i = skipNoise(s, i)
    if (i < s.length) throw bad(s, i, "trailing content after INSERT")
    InternalRow(
      UTF8String.fromString(table),
      if (cols == null) null else new GenericArrayData(cols),
      new GenericArrayData(rows.toArray))
  }

  /** one SQL literal starting at `i` → (decoded value or null, next index) */
  private def value(s: String, i0: Int): (Any, Int) = {
    var i = i0
    if (i >= s.length) throw bad(s, i, "expected value")
    s.charAt(i) match {
      case q @ ('\'' | '"') =>
        val sb = new java.lang.StringBuilder
        i += 1
        while (true) {
          if (i >= s.length) throw bad(s, i, "unterminated string")
          val c = s.charAt(i)
          if (c == '\\' && i + 1 < s.length) {
            // MySQL backslash escapes; unknown escape = the char itself
            s.charAt(i + 1) match {
              case 'n' => sb.append('\n'); case 'r' => sb.append('\r')
              case 't' => sb.append('\t'); case '0' => sb.append('\u0000')
              case 'Z' => sb.append('\u001A'); case 'b' => sb.append('\b')
              case other => sb.append(other)
            }
            i += 2
          } else if (c == q && i + 1 < s.length && s.charAt(i + 1) == q) {
            sb.append(q); i += 2 // '' doubling
          } else if (c == q) {
            return (UTF8String.fromString(sb.toString), i + 1)
          } else { sb.append(c); i += 1 }
        }
        throw bad(s, i, "unreachable")
      case _ =>
        // bare token: NULL, number, hex, true/false
        val start = i
        while (i < s.length && !",) \t\n\r".contains(s.charAt(i))) i += 1
        val tok = s.substring(start, i)
        if (tok.isEmpty) throw bad(s, i, "empty value token")
        if (tok.equalsIgnoreCase("NULL")) (null, i)
        else (UTF8String.fromString(tok), i)
    }
  }

  /** backquoted or bare identifier starting at `i` */
  private def ident(s: String, i0: Int): (String, Int) = {
    var i = i0
    if (i < s.length && s.charAt(i) == '`') {
      val sb = new java.lang.StringBuilder
      i += 1
      while (i < s.length && s.charAt(i) != '`') { sb.append(s.charAt(i)); i += 1 }
      if (i >= s.length) throw bad(s, i, "unterminated `identifier`")
      (sb.toString, i + 1)
    } else {
      val start = i
      while (i < s.length &&
        (s.charAt(i).isLetterOrDigit || s.charAt(i) == '_' || s.charAt(i) == '$')) i += 1
      if (i == start) throw bad(s, i, "expected identifier")
      (s.substring(start, i), i)
    }
  }

  private def wordAt(s: String, i: Int, w: String): Boolean =
    i + w.length <= s.length &&
      s.regionMatches(true, i, w, 0, w.length) &&
      (i + w.length == s.length || {
        val c = s.charAt(i + w.length)
        !(c.isLetterOrDigit || c == '_')
      })

  private def skipWs(s: String, i0: Int): Int = {
    var i = i0
    while (i < s.length && s.charAt(i).isWhitespace) i += 1
    i
  }

  /** whitespace, `-- ` line comments, and `/*...*/` blocks (incl.
    * mysqldump's `/*!40101 ... */` conditionals — executable in MySQL,
    * noise to us) */
  private def skipNoise(s: String, i0: Int): Int = {
    var i = skipWs(s, i0)
    var moved = true
    while (moved) {
      moved = false
      if (i + 1 < s.length && s.charAt(i) == '-' && s.charAt(i + 1) == '-') {
        while (i < s.length && s.charAt(i) != '\n') i += 1
        i = skipWs(s, i); moved = true
      } else if (i + 1 < s.length && s.charAt(i) == '/' && s.charAt(i + 1) == '*') {
        val end = s.indexOf("*/", i + 2)
        i = if (end < 0) s.length else end + 2
        i = skipWs(s, i); moved = true
      }
    }
    i
  }

  private def bad(s: String, i: Int, msg: String) =
    new IllegalArgumentException(
      s"malformed dump statement at offset $i: $msg " +
        s"(near '${s.slice(math.max(0, i - 20), math.min(s.length, i + 20))}')")
}

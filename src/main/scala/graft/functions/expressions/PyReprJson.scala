package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Python-`repr` literal → canonical JSON text.
  *
  * The reference stores `repository.card_data`, `model.config` and
  * `discussion_event.full_data` as Python `str()` of dicts
  * (`databaseImport.py:642,634,524`) — single-quoted strings,
  * `None`/`True`/`False`, `\x..` escapes — so the published dumps'
  * blobs do NOT parse as JSON and none of [[graft.hfc.HfcViews]]'
  * `from_json` views work on dump-loaded tables. This expression is
  * the compat shim (SURVEY §7.4.3): one recursive-descent parse per
  * row emitting JSON, after which the existing typed views apply
  * unchanged ([[graft.hfc.HfcViews.pyReprToJson]] composes them).
  *
  * Accepted grammar (everything `str()` can emit for API-shaped data):
  *  - dict / list / tuple / set → JSON object / array / array / array
  *  - str with `'`/`"` quoting and `\\ \' \" \n \r \t \b \f \v \a \0
  *    \xNN \uNNNN \UNNNNNNNN` escapes; `b'...'` bytes parse as text
  *  - int (arbitrary precision — emitted textually), float (repr text
  *    is already valid JSON; `inf`/`-inf`/`nan` → JSON null, same
  *    policy as Python's own `json.dumps(allow_nan=False)` refusal
  *    but non-fatal)
  *  - `True`/`False`/`None` → `true`/`false`/`null`
  *  - `datetime.date(y, m, d)` → `"y-m-d"`;
  *    `datetime.datetime(y, m, d[, h, mi, s[, micro]][, tzinfo=...utc])`
  *    → ISO-8601 string (`Z` suffix when a utc tzinfo is present) —
  *    YAML card_data dates survive the round trip
  *  - non-string dict keys stringify (JSON object keys must be strings)
  *
  * Anything else (torn repr, unsupported object repr like
  * `<class 'x'>`) returns NULL — the caller's quarantine discipline
  * (F8) counts those rather than failing the scan: a 100 TB dump load
  * must not abort on one exotic blob.
  *
  * CodegenFallback (the CdcChunks rationale): one eval per blob
  * amortizes the call; the work is a single left-to-right parse.
  *
  * Registered as SQL function `graft_pyrepr_json` by
  * [[graft.GraftExtensions]].
  */
case class PyReprJson(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_pyrepr_json requires a string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any = {
    val out = PyReprJson.toJson(input.asInstanceOf[UTF8String].toString)
    if (out == null) null else UTF8String.fromString(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_pyrepr_json"
}

object PyReprJson {

  /** null on any parse failure (never throws) */
  def toJson(repr: String): String =
    try {
      val p = new Parser(repr)
      val sb = new java.lang.StringBuilder(repr.length + 16)
      p.value(sb)
      p.skipWs()
      if (p.i < repr.length) null else sb.toString
    } catch { case _: ParseFail => null }

  private final class ParseFail extends RuntimeException(null, null, false, false)

  private final class Parser(s: String) {
    var i = 0
    private def fail(): Nothing = throw new ParseFail
    def skipWs(): Unit = { while (i < s.length && s.charAt(i).isWhitespace) i += 1 }
    private def peek: Char = { if (i >= s.length) fail(); s.charAt(i) }
    private def expect(c: Char): Unit = { if (peek != c) fail(); i += 1 }

    def value(out: java.lang.StringBuilder): Unit = {
      skipWs()
      peek match {
        case '{' => dictOrSet(out)
        case '[' => seq(out, '[', ']')
        case '(' => seq(out, '(', ')')
        case '\'' | '"' => jsonString(out, str())
        case 'b' | 'u' | 'r' | 'B' | 'U' | 'R'
          if i + 1 < s.length && (s.charAt(i + 1) == '\'' || s.charAt(i + 1) == '"') =>
          i += 1; jsonString(out, str())
        case 'T' => word("True"); out.append("true")
        case 'F' => word("False"); out.append("false")
        case 'N' => word("None"); out.append("null")
        case 'd' if s.startsWith("datetime.", i) => datetimeLit(out)
        case 'i' => word("inf"); out.append("null")
        case 'n' => word("nan"); out.append("null")
        case c if c == '-' || c == '+' || c.isDigit || c == '.' => number(out)
        case _ => fail()
      }
    }

    /** `{}` is a dict; `{v, ...}` (no colon after the first value) is a
      * set repr → JSON array */
    private def dictOrSet(out: java.lang.StringBuilder): Unit = {
      expect('{'); skipWs()
      if (peek == '}') { i += 1; out.append("{}"); return }
      // parse the first element into a scratch buffer to see what follows
      val scratch = new java.lang.StringBuilder
      value(scratch)
      skipWs()
      if (peek == ':') { // dict
        out.append('{')
        appendAsKey(out, scratch); out.append(':')
        i += 1
        value(out)
        skipWs()
        while (peek == ',') {
          i += 1; skipWs()
          if (peek == '}') { i += 1; out.append('}'); return } // trailing comma
          out.append(',')
          val k = new java.lang.StringBuilder
          value(k); appendAsKey(out, k)
          skipWs(); expect(':'); out.append(':')
          value(out)
          skipWs()
        }
        expect('}'); out.append('}')
      } else { // set
        out.append('[').append(scratch)
        while (peek == ',') {
          i += 1; skipWs()
          if (peek == '}') { i += 1; out.append(']'); return }
          out.append(',')
          value(out)
          skipWs()
        }
        expect('}'); out.append(']')
      }
    }

    /** JSON object keys must be strings: a key that parsed to a JSON
      * string passes through; any other key's JSON text is wrapped as a
      * string (Python allows int/tuple keys) */
    private def appendAsKey(out: java.lang.StringBuilder, k: java.lang.StringBuilder): Unit =
      if (k.length > 0 && k.charAt(0) == '"') out.append(k)
      else jsonString(out, k.toString)

    private def seq(out: java.lang.StringBuilder, open: Char, close: Char): Unit = {
      expect(open); skipWs()
      out.append('[')
      if (peek == close) { i += 1; out.append(']'); return }
      value(out)
      skipWs()
      while (peek == ',') {
        i += 1; skipWs()
        if (peek == close) { i += 1; out.append(']'); return } // (x,) trailing
        out.append(',')
        value(out)
        skipWs()
      }
      expect(close); out.append(']')
    }

    /** decoded Python string literal (cursor on the opening quote) */
    private def str(): String = {
      val q = peek; i += 1
      val sb = new java.lang.StringBuilder
      while (true) {
        if (i >= s.length) fail()
        val c = s.charAt(i)
        if (c == q) { i += 1; return sb.toString }
        else if (c == '\\') {
          if (i + 1 >= s.length) fail()
          s.charAt(i + 1) match {
            case 'n' => sb.append('\n'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'v' => sb.append('\u000B'); i += 2
            case 'a' => sb.append('\u0007'); i += 2
            case '0' => sb.append('\u0000'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '\'' => sb.append('\''); i += 2
            case '"' => sb.append('"'); i += 2
            case 'x' => sb.append(hex(i + 2, 2).toChar); i += 4
            case 'u' => sb.append(hex(i + 2, 4).toChar); i += 6
            case 'U' =>
              sb.appendCodePoint(hex(i + 2, 8)); i += 10
            case other => sb.append('\\').append(other); i += 2 // Python keeps unknown escapes
          }
        } else { sb.append(c); i += 1 }
      }
      fail()
    }

    private def hex(at: Int, len: Int): Int = {
      if (at + len > s.length) fail()
      var v = 0
      var j = 0
      while (j < len) {
        val d = Character.digit(s.charAt(at + j), 16)
        if (d < 0) fail()
        v = v * 16 + d
        j += 1
      }
      v
    }

    private def number(out: java.lang.StringBuilder): Unit = {
      val start = i
      if (peek == '+' || peek == '-') i += 1
      skipWs()
      if (s.startsWith("inf", i)) { i += 3; out.append("null"); return }
      if (s.startsWith("nan", i)) { i += 3; out.append("null"); return }
      var sawDigit = false
      while (i < s.length && (s.charAt(i).isDigit || s.charAt(i) == '_')) { sawDigit = true; i += 1 }
      var isFloat = false
      if (i < s.length && s.charAt(i) == '.') {
        isFloat = true; i += 1
        while (i < s.length && s.charAt(i).isDigit) { sawDigit = true; i += 1 }
      }
      if (!sawDigit) fail()
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        isFloat = true; i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        if (i >= s.length || !s.charAt(i).isDigit) fail()
        while (i < s.length && s.charAt(i).isDigit) i += 1
      }
      val tok = s.substring(start, i).replace("_", "")
      // JSON forbids a bare leading '.', '+', or '.5' forms — normalize
      val t2 = (if (tok.startsWith("+")) tok.substring(1) else tok)
      val t3 = if (t2.startsWith(".")) "0" + t2
               else if (t2.startsWith("-.")) "-0" + t2.substring(1)
               else t2
      out.append(if (isFloat && (t3.endsWith("."))) t3 + "0" else t3)
    }

    /** `datetime.date(...)` / `datetime.datetime(...)` → ISO string */
    private def datetimeLit(out: java.lang.StringBuilder): Unit = {
      val isDt = s.startsWith("datetime.datetime(", i)
      val isD = s.startsWith("datetime.date(", i)
      if (!isDt && !isD) fail()
      i += (if (isDt) "datetime.datetime(" else "datetime.date(").length
      val args = scala.collection.mutable.ArrayBuffer.empty[Long]
      var utc = false
      var done = false
      while (!done) {
        skipWs()
        if (peek == ')') { i += 1; done = true }
        else if (peek == ',') i += 1
        else if (peek.isDigit || peek == '-') {
          val st = i
          if (peek == '-') i += 1
          while (i < s.length && s.charAt(i).isDigit) i += 1
          args += java.lang.Long.parseLong(s.substring(st, i))
        } else {
          // keyword arg (tzinfo=...) — consume to the balanced ')'
          var depth = 0
          val st = i
          while (i < s.length && !(depth == 0 && s.charAt(i) == ')')) {
            if (s.charAt(i) == '(') depth += 1
            if (s.charAt(i) == ')') depth -= 1
            i += 1
          }
          if (i >= s.length) fail()
          utc = utc || s.substring(st, i).contains("utc")
          i += 1; done = true
        }
      }
      if (args.length < 3) fail()
      val d = f"${args(0)}%04d-${args(1)}%02d-${args(2)}%02d"
      val iso =
        if (isD) d
        else {
          val h = if (args.length > 3) args(3) else 0L
          val mi = if (args.length > 4) args(4) else 0L
          val sec = if (args.length > 5) args(5) else 0L
          val base = f"${d}T$h%02d:$mi%02d:$sec%02d"
          val withMicro =
            if (args.length > 6) base + f".${args(6)}%06d" else base
          if (utc) withMicro + "Z" else withMicro
        }
      jsonString(out, iso)
    }

    private def word(w: String): Unit = {
      if (!s.startsWith(w, i)) fail()
      val after = i + w.length
      if (after < s.length && (s.charAt(after).isLetterOrDigit || s.charAt(after) == '_')) fail()
      i = after
    }
  }

  /** JSON-escape `v` into `out` as a quoted string */
  private def jsonString(out: java.lang.StringBuilder, v: String): Unit = {
    out.append('"')
    var j = 0
    while (j < v.length) {
      v.charAt(j) match {
        case '"' => out.append("\\\"")
        case '\\' => out.append("\\\\")
        case '\n' => out.append("\\n")
        case '\r' => out.append("\\r")
        case '\t' => out.append("\\t")
        case '\b' => out.append("\\b")
        case '\f' => out.append("\\f")
        case c if c < ' ' => out.append(f"\\u${c.toInt}%04x")
        case c => out.append(c)
      }
      j += 1
    }
    out.append('"')
  }
}

package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MySQL/MariaDB string-literal quoting — the writer half of
  * [[graft.hfc.SqlDump]] (the exact inverse of [[SqlInsertParse]]'s
  * string lexer, round-trip pinned by SqlDumpSpec and the
  * qf03_sqldump_roundtrip gate).
  *
  * `s` → `'s'` with mysqldump's escape set: `\` → `\\`, `'` → `\'`,
  * newline → `\n`, CR → `\r`, tab → `\t`, NUL → `\0`, ctrl-Z → `\Z`.
  * Escaping the newline is what makes dump statements one-per-line and
  * the whole format splittable on `;\n` — a writer that left real
  * newlines in values would produce dumps no line-oriented reader
  * (ours included) could scan in parallel. Null in → null out (callers
  * emit the unquoted keyword via `coalesce(graft_sql_quote(c), 'NULL')`).
  *
  * Codegen'd as one static call per row (the UnicodeNormalize
  * discipline); the kernel is a single scan with a no-escape fast path.
  *
  * Registered as SQL function `graft_sql_quote` by
  * [[graft.GraftExtensions]].
  */
case class SqlQuote(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_sql_quote requires a string, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType

  override def nullSafeEval(input: Any): Any =
    SqlQuote.quote(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.expressions.SqlQuote.quote($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_sql_quote"
}

object SqlQuote {
  /** static per-row kernel (referenced by the generated code) */
  def quote(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    var needs = false
    var i = 0
    while (i < n && !needs) {
      val c = str.charAt(i)
      needs = c == '\\' || c == '\'' || c == '\n' || c == '\r' ||
        c == '\t' || c == '\u0000' || c == '\u001A'
      i += 1
    }
    if (!needs) return UTF8String.fromString("'" + str + "'")
    val sb = new java.lang.StringBuilder(n + 8)
    sb.append('\'')
    i = 0
    while (i < n) {
      str.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\'' => sb.append("\\'")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case '\u0000' => sb.append("\\0")
        case '\u001A' => sb.append("\\Z")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.append('\'')
    UTF8String.fromString(sb.toString)
  }
}

package graft.sources

/** Comment-aware line counting for git post-images — the lizard-parity
  * option behind `nloc` (the reference's nloc is PyDriller→lizard's
  * comment-stripped count, extractor/databaseImport.py:407; our default
  * stays the deterministic superset — every non-blank line — documented
  * in [[GitHistorySource]]).
  *
  * [[NlocMode.CommentStripped]] additionally drops comment-ONLY lines
  * for the common languages (C-family `//` + `/*…*/`, script `#`,
  * SQL/Lua/Haskell `--`), with enough string-literal awareness that a
  * comment marker inside a quoted literal does not truncate the line.
  * Unrecognized extensions fall back to the superset count, so the
  * divergence from lizard shrinks to exotic languages and tokenizer
  * corner cases (lizard fully tokenizes; this is a line machine).
  *
  * Scale shape: the state machine is per-line with one boolean of
  * cross-line state (inside block comment), so the walker still streams
  * — memory is one line, not one file.
  */
object Nloc {

  sealed trait NlocMode
  object NlocMode {
    /** every non-blank post-image line (default; deterministic superset) */
    case object Superset extends NlocMode
    /** minus comment-only lines, per-language syntax (lizard-like) */
    case object CommentStripped extends NlocMode
  }

  /** per-language comment syntax; `block` is (open, close) */
  final case class Lang(lineMarkers: Seq[String], block: Option[(String, String)])

  private val cFamily  = Lang(Seq("//"), Some(("/*", "*/")))
  private val hashOnly = Lang(Seq("#"), None)
  private val dashDash = Lang(Seq("--"), None)

  private val byExtension: Map[String, Lang] = {
    val c = Seq("c", "h", "cpp", "cc", "cxx", "hpp", "hh", "java", "js", "jsx",
      "ts", "tsx", "go", "rs", "scala", "kt", "kts", "cs", "swift", "m", "mm",
      "php", "css", "proto", "groovy", "dart").map(_ -> cFamily)
    val s = Seq("py", "rb", "sh", "bash", "pl", "pm", "r", "jl", "tcl", "awk",
      "nim", "cmake", "mk", "yaml", "yml", "toml").map(_ -> hashOnly)
    val d = Seq("sql", "lua", "hs", "elm", "adb", "ads").map(_ -> dashDash)
    (c ++ s ++ d).toMap
  }

  /** comment syntax for a path, None → count as superset */
  def langFor(path: String): Option[Lang] = {
    val dot = path.lastIndexOf('.')
    if (dot < 0 || dot == path.length - 1) None
    else byExtension.get(path.substring(dot + 1).toLowerCase)
  }

  /** Does `line` contain code under `lang`'s comment syntax, given
    * whether a block comment is open at line start? Returns
    * (hasCode, blockOpenAtLineEnd). String literals shield comment
    * markers; string state does not cross lines (so each interior line
    * of a multi-line literal is judged on its own text — matching
    * lizard, which counts docstring lines as code). */
  def lineHasCode(line: String, lang: Lang, blockOpen: Boolean): (Boolean, Boolean) = {
    var i = 0
    var hasCode = false
    var inBlock = blockOpen
    var strQuote: Char = 0
    var escaped = false
    def matchesAt(s: String, at: Int): Boolean =
      line.regionMatches(at, s, 0, s.length)
    while (i < line.length) {
      val ch = line.charAt(i)
      if (inBlock) {
        val close = lang.block.get._2
        if (matchesAt(close, i)) { inBlock = false; i += close.length }
        else i += 1
      } else if (strQuote != 0) {
        hasCode = true
        if (escaped) escaped = false
        else if (ch == '\\') escaped = true
        else if (ch == strQuote) strQuote = 0
        i += 1
      } else if (lang.block.exists(b => matchesAt(b._1, i))) {
        inBlock = true; i += lang.block.get._1.length
      } else if (lang.lineMarkers.exists(m => matchesAt(m, i))) {
        i = line.length // rest of line is comment
      } else {
        if (!Character.isWhitespace(ch)) hasCode = true
        if (ch == '"' || ch == '\'') strQuote = ch
        i += 1
      }
    }
    (hasCode, inBlock)
  }

  /** comment-stripped line count of full `content` for `path`;
    * falls back to non-blank count for unrecognized extensions */
  def count(content: String, path: String): Int = langFor(path) match {
    case None =>
      content.linesIterator.count(_.exists(c => !Character.isWhitespace(c)))
    case Some(lang) =>
      var n = 0
      var blockOpen = false
      content.linesIterator.foreach { line =>
        val (hasCode, next) = lineHasCode(line, lang, blockOpen)
        if (hasCode) n += 1
        blockOpen = next
      }
      n
  }
}

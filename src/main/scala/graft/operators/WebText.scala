package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Web-corpus ingestion plumbing: HTML→text extraction and URL
  * canonicalization as PURE Column expression chains.
  *
  * Why it exists: [[graft.sources.WarcSource]] lands raw crawl
  * RESPONSE records (HTML bytes); WET extracts exist only for crawls
  * that published them. Between a landed response and the `documents`
  * table a pipeline needs (a) the markup stripped to text it can
  * gate/dedup/tokenize and (b) a canonical URL key for url-level
  * dedup and the qt24/qp14 domain governance. Both are per-row string
  * work — implemented as `regexp_replace`/`split`/array expressions so
  * they run as ONE codegen'd scan projection, zero shuffle, and scale
  * exactly like the scan (the 100 TB cost is the bytes read, nothing
  * else).
  *
  * Determinism/parity rules (the qt09 planting discipline's engine
  * side): the regex subset is chosen to mean the same thing in Java
  * regex (Spark) and RE2 (DuckDB) — explicit whitespace classes (Java
  * `\s` includes `\x0B`, RE2's does not), non-greedy spans, no
  * backreferences, no lookarounds — so the oracle can replay
  * extraction verbatim.
  */
object WebText {

  /** Tag-blind HTML→text: drop comment/script/style subtrees
    * (non-greedy spans), replace every remaining tag with a space,
    * decode the six entities that matter for text statistics
    * (`&amp;` LAST, the standard one-level-decode order), collapse
    * whitespace runs, trim. This is the C4-grade extractor — no DOM,
    * no render; compose with [[anchorCount]] (link-density boilerplate
    * read) and the QualityRules line filters downstream. Unclosed
    * script/style blocks keep their content (the non-greedy span needs
    * a closing tag) — tags inside still strip, so malformed markup
    * degrades to extra text, never to lost text. */
  def htmlToText(html: Column): Column = {
    val noComment = regexp_replace(html, "(?s)<!--.*?-->", " ")
    val noScript  = regexp_replace(noComment, "(?is)<script\\b[^>]*>.*?</script>", " ")
    val noStyle   = regexp_replace(noScript, "(?is)<style\\b[^>]*>.*?</style>", " ")
    val noTags    = regexp_replace(noStyle, "<[^>]*>", " ")
    val decoded = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => regexp_replace(c, ent, ch) }
    trim(regexp_replace(decoded, "[ \\t\\n\\r\\f]+", " "))
  }

  /** Anchor-tag count on the RAW markup — with the extracted word
    * count this is the link-density read (nav/footer boilerplate has
    * high anchors-per-word; jusText's core signal) used as a
    * document-level gate next to the Gopher rules. */
  def anchorCount(html: Column): Column =
    size(regexp_extract_all(html, lit("(?i)<a\\b"), lit(0))).cast("long")

  /** href targets of anchor tags (double-quoted attributes), in
    * document order — the raw material of the crawl frontier and the
    * host link graph. One regexp projection, zero shuffle; relative
    * and garbage targets come through verbatim (resolve/filter with
    * [[hostOf]] / [[urlCanonicalize]] downstream). */
  def extractLinks(html: Column): Column =
    regexp_extract_all(html, lit("(?i)<a\\b[^>]*\\bhref=\"([^\"]*)\""), lit(1))

  /** Lowercased host of an absolute URI; '' when the input has no
    * scheme://host prefix (relative links, garbage) — a filterable
    * sentinel, not a row drop. Userinfo (`user:pw@`) is skipped: the
    * host is what identifies the domain, and `alice@example.com` must
    * never mint a graph node distinct from `example.com`. */
  def hostOf(url: Column): Column =
    lower(regexp_extract(url,
      "^[A-Za-z][A-Za-z0-9+.-]*://(?:[^/?#@]*@)?([^/:?#]+)", 1))

  /** robots.txt rules for the `User-agent: *` group —
    * `array<struct<allow:boolean, prefix:string>>` parsed from the raw
    * robots.txt body: the crawl plane's politeness gate. Semantics
    * (the RFC 9309 literal-prefix subset, chosen so the oracle can
    * replay it verbatim):
    *   - lines are `#`-comment-stripped and trimmed; directives match
    *     case-insensitively, rule VALUES keep their case (URL paths
    *     are case-sensitive);
    *   - consecutive `User-agent:` lines STACK onto one group; any
    *     allow/disallow directive closes the stack, so a later
    *     `User-agent:` starts a new group;
    *   - a group's rules are collected iff any of its agents is
    *     literally `*` (named-agent matching is out of scope — one
    *     engine, one oracle, one semantic);
    *   - empty-value rules (`Disallow:` = allow everything) add no
    *     rule; `*`/`$` wildcards are NOT interpreted (prefixes are
    *     literal — the documented subset).
    * Decision composition (qt47): candidate rules whose prefix starts
    * the url path, best = longest prefix, ties to allow (RFC order).
    *
    * Implementation note: the group logic is a stateful fold —
    * `aggregate()` over the line array, CodegenFallback territory —
    * but its input is the HOST-cardinality robots table, never the
    * per-document scan, so the interpreted per-row tax rides on the
    * corpus's smallest axis (the qm HOF lesson applied in the
    * direction it is safe). */
  def robotsStarRules(txt: Column): Column = {
    val init = struct(
      lit(false).as("col"), lit(false).as("act"),
      array().cast("array<struct<allow:boolean,prefix:string>>").as("rules"))
    aggregate(split(txt, "\n"), init, (st, line0) => {
      val line = trim(split_part(line0, lit("#"), lit(1)))
      val low = lower(line)
      val isUa = low.startsWith("user-agent:")
      val isAllow = low.startsWith("allow:")
      val isDis = low.startsWith("disallow:")
      val value = trim(line.substr(instr(line, ":") + lit(1), length(line)))
      val newCol = when(isUa, lit(true))
        .when(isAllow || isDis, lit(false))
        .otherwise(st.getField("col"))
      val newAct = when(isUa && !st.getField("col"), value === "*")
        .when(isUa && st.getField("col"), st.getField("act") || value === "*")
        .otherwise(st.getField("act"))
      val addRule = (isAllow || isDis) && st.getField("act") && value =!= ""
      val newRules = when(addRule,
          concat(st.getField("rules"),
            array(struct(isAllow.as("allow"), value.as("prefix")))))
        .otherwise(st.getField("rules"))
      struct(newCol.as("col"), newAct.as("act"), newRules.as("rules"))
    }, st => st.getField("rules"))
  }

  /** The `User-agent: *` group's `Crawl-delay` (whole seconds) from a
    * raw robots.txt body, or NULL when the star group states none —
    * the politeness knob a frontier SCHEDULER reads where
    * [[robotsStarRules]] reads the allow/disallow decision. Same fold
    * machinery and group semantics: comments stripped, consecutive
    * `User-agent` lines stack, any rule directive (allow, disallow,
    * crawl-delay) closes the stack. The FIRST syntactically valid
    * value in an active group wins (deterministic under repeated
    * directives); non-numeric values are ignored (a later valid one
    * still applies); values are capped at 9 digits so the cast can
    * never overflow. One divergence from [[robotsStarRules]] stated
    * honestly: there, a crawl-delay line is an unknown directive and
    * does NOT close a UA stack; here it does (it IS a rule this parser
    * understands) — on files that interleave crawl-delay between
    * User-agent lines the two parsers read group boundaries
    * differently, and such files are malformed under RFC 9309 anyway. */
  def robotsCrawlDelay(txt: Column): Column = {
    val init = struct(
      lit(false).as("col"), lit(false).as("act"), lit(-1L).as("delay"))
    aggregate(split(txt, "\n"), init, (st, line0) => {
      val line = trim(split_part(line0, lit("#"), lit(1)))
      val low = lower(line)
      val isUa = low.startsWith("user-agent:")
      val isCd = low.startsWith("crawl-delay:")
      val isRule = low.startsWith("allow:") || low.startsWith("disallow:") || isCd
      val value = trim(line.substr(instr(line, ":") + lit(1), length(line)))
      val newCol = when(isUa, lit(true))
        .when(isRule, lit(false))
        .otherwise(st.getField("col"))
      val newAct = when(isUa && !st.getField("col"), value === "*")
        .when(isUa && st.getField("col"), st.getField("act") || value === "*")
        .otherwise(st.getField("act"))
      val take = isCd && st.getField("act") &&
        st.getField("delay") === lit(-1L) && value.rlike("^[0-9]{1,9}$")
      val newDelay = when(take, value.cast("long")).otherwise(st.getField("delay"))
      struct(newCol.as("col"), newAct.as("act"), newDelay.as("delay"))
    }, st => when(st.getField("delay") >= 0, st.getField("delay")))
  }

  /** 60-bit integer key of a string — the EXACT-dedup store key for
    * canonical URLs and boilerplate-free body text: the first 15 hex
    * digits of md5 as a positive BIGINT. Cross-engine exact by
    * construction (DuckDB replay: [[key60Sql]]), which is what lets the
    * incremental web stores ([[graft.streaming.EventStreams.webPipelineStream]],
    * qx04) share one key function between the engine and the oracle.
    *
    * Collision honesty (birthday bound): expected colliding pairs ≈
    * n²/2^61, i.e. ~4×10⁻³ at n = 10⁸ keys — negligible through
    * hundred-million-key stores, but at BILLION-key scale collisions
    * are expected (a collision = a false exact-dup drop). The 100 TB
    * path is the crawler's natural one: shard the url store by host
    * (per-host politeness already partitions the frontier) so each
    * store stays ≤ ~10⁸ keys, or move the exact stage to [[key128]]
    * with the string-keyed store. Since r14 this bound is ENFORCED,
    * not just documented: the exact-regime store funnel
    * ([[IncrementalHashDedup.dedupBatch]] at maxHamming = 0) fails
    * loudly past its `maxExactStoreRows` cap and names both escape
    * hatches. NULL in → NULL out (the quarantine sentinel
    * propagates). */
  def key60(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** DuckDB twin of [[key60]] over a SQL expression string. */
  def key60Sql(expr: String): String =
    s"(('0x' || substr(md5($expr), 1, 15))::BIGINT)"

  /** Full-digest 128-bit string key — [[key60]]'s birthday-bound
    * escape hatch for billion-key exact stores
    * ([[IncrementalHashDedup.exactDedupBatchString]]). 32 hex chars:
    * 4× the store bytes of key60's BIGINT, zero collision risk at any
    * realistic scale; cost delta measured in NOTES_r14. Cross-engine
    * exact like key60 (md5 is md5 in both engines). */
  def key128(s: Column): Column = md5(s)

  /** DuckDB twin of [[key128]] over a SQL expression string. */
  def key128Sql(expr: String): String = s"md5($expr)"

  /** Canonical URL key for url-level dedup and domain governance.
    * Rules (each one a reproducible-key requirement, not cosmetics):
    * fragment dropped (never sent to the server); scheme + host
    * lowercased (case-insensitive by RFC 3986); default port stripped
    * (`:80` for http, `:443` for https); tracking params dropped
    * (`utm_*`, `gclid`, `fbclid` — session noise that splits identical
    * pages into distinct keys); remaining query params SORTED (param
    * order is server-insignificant for the overwhelming majority of
    * pages — the standard crawler trade: a tiny false-merge risk for
    * collapsing the dominant duplicate class); empty path → `/`; an
    * empty residual query drops its `?`. Path case and encoding are
    * preserved (paths ARE case-sensitive). Non-absolute-http(s) input
    * returns NULL — the quarantine sentinel, one filter away. */
  def urlCanonicalize(url: Column): Column = {
    val noFrag = split_part(url, lit("#"), lit(1))
    val base   = split_part(noFrag, lit("?"), lit(1))
    val query  = noFrag.substr(length(base) + lit(2), length(noFrag))
    val scheme = lower(split_part(base, lit("://"), lit(1)))
    val rest   = base.substr(length(scheme) + lit(4), length(base))
    val auth   = lower(split_part(rest, lit("/"), lit(1)))
    val path   = rest.substr(length(auth) + lit(1), length(rest))
    // userinfo dropped: `user:pw@host` never identifies the page, and
    // a credentialed crawl of the same URL must share its key (and
    // never leak the credential into it)
    val authNoUser = regexp_replace(auth, "^[^@]*@", "")
    val authNoPort = when(scheme === "http", regexp_replace(authNoUser, ":80$", ""))
      .when(scheme === "https", regexp_replace(authNoUser, ":443$", ""))
      .otherwise(authNoUser)
    val keptParams = filter(split(query, "&"), p =>
      p =!= lit("") && !p.rlike("^(utm_[^=&]*|gclid|fbclid)(=.*)?$"))
    val canonQuery = array_join(array_sort(keptParams), "&")
    val canon = concat(
      scheme, lit("://"), authNoPort,
      when(path === "", lit("/")).otherwise(path),
      when(canonQuery === "", lit("")).otherwise(concat(lit("?"), canonQuery)))
    when(url.rlike("^[A-Za-z][A-Za-z0-9+.-]*://[^/]"), canon).otherwise(lit(null))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis scalar functions for the training-data pipeline plane.
  *
  * All functions are pure Column expressions (whole-stage-codegen
  * friendly, no UDFs): at 100 TB these run embarrassingly parallel
  * inside the parquet scan projection with zero shuffle.
  *
  * Cross-engine determinism: everything bottoms out in md5/regexp/
  * length/IEEE-double ops that evaluate bit-identically in DuckDB, so
  * every function here is oracle-checkable.
  */
object TextFunctions {

  /** Let-binding for Column expressions: evaluates `value` ONCE per row
    * and binds it as the lambda variable of a single-element
    * `transform`, so `body` can reference it many times without
    * Catalyst's CollapseProject re-inlining (and re-executing) the
    * producing expression. Critical for MinHash: without it the
    * shingle array is recomputed once per signature row (16×). */
  def letBound(value: Column)(body: Column => Column): Column =
    element_at(transform(array(value), v => body(v)), 1)

  /** whitespace tokenization */
  def tokens(text: Column): Column = split(trim(text), "\\s+")

  /** HTML → text extraction for the crawl-ingestion bridge
    * ([[graft.sources.WarcSource.asDocuments]]): drop script/style/
    * comment subtrees wholesale, strip remaining tags, decode the
    * common entities, collapse whitespace. Pure regexp_replace chain —
    * codegen'd, scan-local, no parser state; intentionally NOT a DOM
    * parser (boilerplate-quality filtering is qt11/qt23's job — this
    * only makes tag soup tokenizable). Case-insensitive via (?is). */
  def htmlToText(html: Column): Column = {
    val noScript = regexp_replace(html,
      "(?is)<(script|style)\\b[^>]*>.*?</\\1\\s*>", " ")
    val noComment = regexp_replace(noScript, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val entities = Seq("&nbsp;" -> " ", "&amp;" -> "&", "&lt;" -> "<",
      "&gt;" -> ">", "&quot;" -> "\"", "&#39;" -> "'")
      .foldLeft(noTags) { case (c, (e, r)) => regexp_replace(c, e, r) }
    trim(regexp_replace(entities, "\\s+", " "))
  }

  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish sub-token segmentation: letter runs, digit runs, single
    * punctuation — the standard pre-tokenizer shape. */
  val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit(BpePattern), lit(0)))

  /** word n-gram shingles (empty array when the doc is shorter than n).
    * The token array is let-bound: higher-order functions evaluate
    * interpreted, so an unbound `w` would re-run the regex split for
    * every element_at — 3× per shingle (measured 100× slowdown). */
  def shingles(text: Column, n: Int): Column =
    letBound(tokens(text))(w => shinglesFromTokens(w, n))

  /** [[shingles]] over an already-computed token array — the shared-
    * tokenization hook: a caller that needs several gram families from
    * one document binds `tokens(text)` once and derives each family
    * from the same array (one regex split per row, not one per
    * family). */
  def shinglesFromTokens(w: Column, n: Int): Column =
    when(size(w) >= n,
      transform(sequence(lit(0), size(w) - n), i =>
        concat_ws(" ", (0 until n).map(k => element_at(w, i + k + 1)): _*)))
      .otherwise(array().cast("array<string>"))

  /** distinct md5 hashes of the doc's 3-gram shingles, first-occurrence
    * order. Delegates to the native
    * [[graft.functions.expressions.ShingleHashes]] (feeds the dedup
    * funnel, the jaccard index, and the fingerprint — the hottest
    * projection in the library); [[shingleHashesHof]] is the
    * built-ins-only formulation it must bit-match. */
  def shingleHashes(text: Column, n: Int = 3): Column =
    call_function("graft_shingle_hashes", tokens(text), lit(n))

  /** HOF reference implementation of [[shingleHashes]] (kept for the
    * bit-equality spec). */
  def shingleHashesHof(text: Column, n: Int = 3): Column =
    array_distinct(transform(shingles(text, n), md5(_)))

  /** MinHash signature: for seed s, sig(s) = min over shingles of
    * md5(s || ':' || shingle). String-min over uniform hex == numeric
    * min-hash; per-row computation, no shuffle (SURVEY §7 north-star
    * dedup). Delegates to the native
    * [[graft.functions.expressions.MinHashSignature]] expression
    * (registered by GraftExtensions); [[minhashSignatureHof]] is the
    * built-ins-only reference implementation it must bit-match. */
  def minhashSignature(text: Column, numHashes: Int, n: Int = 3): Column =
    call_function("graft_minhash_signature", shingles(text, n), lit(numHashes))

  /** HOF reference implementation of [[minhashSignature]] (kept for
    * the bit-equality spec). */
  def minhashSignatureHof(text: Column, numHashes: Int, n: Int = 3): Column =
    letBound(shingles(text, n)) { sh =>
      array((0 until numHashes).map { s =>
        array_min(transform(sh, x => md5(concat(lit(s.toString), lit(":"), x))))
      }: _*)
    }

  /** LSH band keys: band b = md5 of signature rows [b*rows, (b+1)*rows).
    * Docs sharing any band key are near-dup candidates. */
  def minhashBands(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      md5(concat_ws("|", (0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*))
    }: _*)

  /** 16-bit SimHash over distinct words: bit j set iff strictly more
    * word-hashes have hex digit j in [8..f] than in [0..7]. Returned as
    * a 16-char '0'/'1' string (hamming distance = char diff count).
    * Delegates to the native
    * [[graft.functions.expressions.SimHash16]]; [[simhash16Hof]] is the
    * built-ins-only formulation it must bit-match. */
  def simhash16(text: Column): Column =
    call_function("graft_simhash16", tokens(text))

  /** HOF reference implementation of [[simhash16]] (kept for the
    * bit-equality spec). */
  def simhash16Hof(text: Column): Column =
    letBound(array_distinct(transform(tokens(text), md5(_)))) { hashes =>
      array_join(
        transform(sequence(lit(0), lit(15)), j =>
          when(size(filter(hashes, h => h.substr(j + 1, lit(1)) >= "8")) * 2 > size(hashes), "1")
            .otherwise("0")), "")
    }

  /** SimHash over the doc's word 3-gram SHINGLES instead of single
    * words: far more discriminative on corpora with a shared
    * vocabulary (word-level simhash saturates — measured on the
    * testdata corpus: 8.7k of 125k pairs at hamming 0; shingle-level:
    * 8). Delegates to the fused native
    * [[graft.functions.expressions.ShingleSimHash16]] (shingle
    * construction + hashing + voting in one pass — the unfused
    * `graft_simhash16(shingles(...))` pays an interpreted HOF to
    * build every shingle string first); [[simhash16ShinglesUnfused]]
    * is that reference formulation, kept for the bit-equality spec. */
  def simhash16Shingles(text: Column, n: Int = 3): Column =
    call_function("graft_shingle_simhash16", tokens(text), lit(n))

  /** Unfused reference implementation of [[simhash16Shingles]] (kept
    * for the bit-equality spec). */
  def simhash16ShinglesUnfused(text: Column, n: Int = 3): Column =
    call_function("graft_simhash16", shingles(text, n))

  /** 64-bit shingle-SimHash (production fingerprint width; 16 bits is
    * the oracle-demo size). 64-char '0'/'1' string; delegates to the
    * fused native [[graft.functions.expressions.ShingleSimHash64]]. */
  def simhash64Shingles(text: Column, n: Int = 3): Column =
    call_function("graft_shingle_simhash64", tokens(text), lit(n))

  /** Winnowing-style document fingerprint: the 4 smallest shingle
    * hashes, joined. Robust to local edits; join-able for dedup. */
  def fingerprint(text: Column, n: Int = 3): Column =
    array_join(slice(array_sort(shingleHashes(text, n)), 1, 4), "|")

  // ---- language identification (stopword heuristic) ----

  val StopEn = Seq("the", "a", "of", "and", "to", "in", "is")
  val StopEs = Seq("el", "la", "de", "y", "que", "en", "los")
  val StopFr = Seq("le", "les", "des", "et", "une", "dans", "est")
  val StopDe = Seq("der", "die", "das", "und", "ist", "von", "nicht")

  private def stopCount(toks: Column, stops: Seq[String]): Column =
    size(filter(toks, t => t.isin(stops.map(lit): _*)))

  /** n-gram/stopword heuristic language ID with deterministic
    * tie-breaking (en > es > fr > de > und). */
  def langIdHeuristic(text: Column): Column = {
    val toks = tokens(lower(text))
    val en = stopCount(toks, StopEn); val es = stopCount(toks, StopEs)
    val fr = stopCount(toks, StopFr); val de = stopCount(toks, StopDe)
    when(en === 0 && es === 0 && fr === 0 && de === 0, "und")
      .when(en >= es && en >= fr && en >= de, "en")
      .when(es >= fr && es >= de, "es")
      .when(fr >= de, "fr")
      .otherwise("de")
  }

  /** Tie-free decimal quantization of a NON-NEGATIVE double: binary
    * half-up, floor(x·10^d + 0.5)/10^d — every step is one IEEE-754
    * operation on the true binary value, so any engine produces the
    * identical bit pattern for the same x. Plain `round(x, d)` does
    * NOT have that property across engines: Spark rounds the SHORTEST
    * DECIMAL RENDERING of the double (BigDecimal half-up on
    * Double.toString) while DuckDB rounds the true binary value, and
    * the two disagree exactly when the rendering is a tie — e.g. a
    * quality score whose shortest rendering is 0.5203125 rounds to
    * .520313 in Spark but .520312 in DuckDB (latent at sf0.01, found
    * by the round-11 sf0.1 gate sweep, documents row 3030). Oracle
    * mirror: `floor(x * 1e6 + 0.5) / 1e6`. */
  def quantize(c: Column, decimals: Int): Column = {
    val s = math.pow(10, decimals)
    floor(c * s + 0.5) / s
  }

  /** Composite quality score in [0,1]: length, lexical diversity,
    * stopword density, mean word length. Mirrors the oracle SQL
    * operation-for-operation so IEEE evaluation order matches; the
    * final 6-decimal step uses [[quantize]] (tie-free), not round(). */
  def qualityScore(text: Column): Column = {
    val toks = tokens(lower(text))
    val n = size(toks).cast("double")
    val d = size(array_distinct(toks)).cast("double")
    val sw = stopCount(toks, StopEn).cast("double")
    val chars = length(regexp_replace(text, "\\s", "")).cast("double")
    quantize(
      lit(0.25) * least(lit(1.0), n / 100.0) +
      lit(0.25) * (d / n) +
      lit(0.25) * least(lit(1.0), sw * 5.0 / n) +
      lit(0.25) * least(lit(1.0), chars / n / 8.0), 6)
  }

  /** Unicode normalization (native codegen'd
    * [[graft.functions.expressions.UnicodeNormalize]]): byte-identical
    * keys for render-identical text — run before ANY hash-keyed stage
    * on multilingual corpora (exact dedup, shingles, URL keys,
    * tokenizer censuses). `form`: NFC (web/oracle parity), NFKC
    * (tokenizer prep), NFD/NFKD (accent-strip feeds). */
  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    call_function("graft_unicode_normalize", text, lit(form))

  /** Accent stripping: NFKD + combining-mark removal — `résumé` and
    * `resume` share a key. A pure composition of the native normalize
    * and one codegen'd regexp (`\p{Mn}` = nonspacing marks); for
    * search-key folding, not display. */
  def stripAccents(text: Column): Column =
    regexp_replace(unicodeNormalize(text, "NFKD"), "\\p{Mn}", "")
}

package graft.operators

import graft.functions.TextFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Rule-based document quality filters from the published LLM-corpus
  * recipes: the Gopher quality rules (Rae et al. 2021, "Scaling
  * Language Models", App. A1.1) and the C4 line-level cleaning rules
  * (Raffel et al. 2020, "Exploring the Limits of Transfer Learning",
  * §2.2). These run BEFORE model-based filtering in every production
  * pipeline — they are cheap, transparent, and remove the bulk of
  * boilerplate/garbage.
  *
  * Scale design (100 TB): the rule census and line filter are pure
  * Column expressions over the tokenized text — whole-stage-codegen'd
  * scan projections, zero shuffle, embarrassingly parallel (safe to
  * drop into a streaming pre-gate). The line filter rebuilds the
  * document with `filter` + `array_join` instead of exploding to a
  * line table and re-aggregating (which would shuffle every line of
  * the corpus just to glue it back together). The ONE exception:
  * [[dupNgramCharFrac]] needs per-(doc, n-gram) counts, so it carries
  * a within-doc window shuffle + join — see its doc for the shape.
  *
  * Cross-engine determinism: counts are int, ratios are int/int double
  * divisions rounded to 6 — bit-stable vs the DuckDB oracle.
  */
object QualityRules {

  /** Gopher stopword probe set (the paper's "must contain 2 of":
    * the, be, to, of, and, that, have, with). */
  val GopherStops = Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** Per-doc Gopher rule census: raw metrics, one boolean per rule,
    * and the conjunctive `pass`. Bounds are parameters because the
    * paper's absolute values (50..100k words) are corpus-specific;
    * defaults are the paper's.
    *
    * Rules (paper numbering):
    *  1. word count within [minWords, maxWords]
    *  2. mean word length within [3, 10] characters
    *  3. fraction of words with at least one alphabetic char ≥ 0.8
    *  4. contains ≥ 2 of the stopword probe set
    *
    * `extraCols` carries input columns through unchanged (e.g. the
    * text itself, when the census is a streaming pre-gate feeding a
    * downstream consumer). Being a pure projection, this operator
    * composes directly into Structured Streaming plans. */
  def gopherFlags(docs: DataFrame, minWords: Long = 50L, maxWords: Long = 100000L,
                  idCol: String = "doc_id", textCol: String = "text",
                  extraCols: Seq[String] = Nil): DataFrame = {
    val out = letBound(tokens(lower(col(textCol)))) { toks =>
      val n = size(toks).cast("long")
      val meanLen = round(
        aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") / n, 6)
      val alphaFrac = round(
        size(filter(toks, w => w.rlike("[a-z]"))).cast("double") / n, 6)
      val stopHits = size(filter(toks, w => w.isin(GopherStops.map(lit): _*)))
        .cast("long")
      struct(
        n.as("n_words"), meanLen.as("mean_word_len"),
        alphaFrac.as("alpha_frac"), stopHits.as("n_stop_hits"),
        (n >= minWords && n <= maxWords).as("ok_words"),
        (meanLen >= 3.0 && meanLen <= 10.0).as("ok_word_len"),
        (alphaFrac >= 0.8).as("ok_alpha"),
        (stopHits >= 2L).as("ok_stops"))
    }
    docs.select(col(idCol) +: extraCols.map(col) :+ out.as("g"): _*)
      .select(col(idCol) +: extraCols.map(col) :+ col("g.*"): _*)
      .withColumn("pass",
        col("ok_words") && col("ok_word_len") && col("ok_alpha") && col("ok_stops"))
  }

  /** Duplicate-n-gram character fraction — the literal Gopher
    * repetition metric (Rae et al. 2021 App. A1.1: "fraction of
    * characters contained in duplicate n-grams"): per doc, the share
    * of token characters covered by n-gram windows that occur MORE
    * THAN ONCE within the document.
    *
    * Shape: positional windows explode, per-(doc, hash) counts via a
    * bounded window (partitions are within-doc), duplicate starts
    * collect into one per-doc array, and coverage is ONE sorted
    * interval-merge fold over the starts (O(starts · n), n = the
    * constant shingle width) — never a per-token × per-start scan,
    * which would be quadratic on exactly the highly repetitive
    * documents this metric exists to flag. */
  def dupNgramCharFrac(docs: DataFrame, n: Int = 3,
                       idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be positive, got $n")
    val win = docs
      .select(col(idCol), posexplode(shingles(col(textCol), n)).as(Seq("pos", "sh")))
      .select(col(idCol), col("pos"), md5(col("sh")).as("h"))
    val perHash = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol), col("h"))
    val dupStarts = win
      .withColumn("cnt", count(lit(1)).over(perHash))
      .filter(col("cnt") >= 2)
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
    val rebuilt = letBound(tokens(col(textCol))) { w =>
      letBound(coalesce(col("starts"), array().cast("array<int>"))) { st =>
        // sorted interval merge: fold (coveredUpTo, chars) over the
        // ascending starts; each window contributes only its not-yet-
        // covered token slice, so overlapping repeats never recount
        val dupChars = aggregate(st,
          struct(lit(-1).as("hi"), lit(0L).as("chars")),
          (acc, s) => {
            val from = greatest(s, acc.getField("hi") + 1)
            val hi = s + lit(n - 1)
            val len = greatest(hi - from + 1, lit(0))
            val add = aggregate(slice(w, from + 1, len), lit(0L),
              (a, x) => a + length(x))
            struct(greatest(hi, acc.getField("hi")).as("hi"),
                   (acc.getField("chars") + add).as("chars"))
          },
          acc => acc.getField("chars"))
        struct(
          aggregate(w, lit(0L), (a, x) => a + length(x)).as("total_chars"),
          dupChars.as("dup_chars"))
      }
    }
    docs.select(col(idCol), col(textCol))
      .join(dupStarts, Seq(idCol), "left")
      .select(col(idCol), rebuilt.as("r"))
      .select(col(idCol), col("r.*"))
      .withColumn("dup_char_frac", round(col("dup_chars") / col("total_chars"), 6))
  }

  /** C4 terminal-punctuation set: a line must end in one of these to
    * be kept ('.', '!', '?', closing quote). */
  private def endsTerminal(line: Column): Column =
    substring(line, -1, 1).isin(".", "!", "?", "\"")

  /** C4-style line-level cleaning over newline-delimited text:
    *  - keep only lines with ≥ `minWordsPerLine` words that end in
    *    terminal punctuation;
    *  - drop the whole document if it mentions "lorem ipsum" or
    *    contains a curly brace (code/boilerplate tell), or if fewer
    *    than `minLinesKept` lines survive.
    *
    * Output per doc: line census (`n_lines`, `n_kept`), the cleaned
    * text's md5 + word count, and `dropped` with its reason. The
    * cleaned text is rebuilt in place (`filter` + `array_join`) so the
    * whole operator stays a scan projection. */
  def c4LineFilter(docs: DataFrame, minWordsPerLine: Int = 5, minLinesKept: Int = 3,
                   idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val keepLine = (l: Column) =>
      size(tokens(l)) >= minWordsPerLine && endsTerminal(l)
    // the kept-line array is let-bound so the per-line tokenization in
    // keepLine runs ONCE per doc (an unbound second `filter` would
    // re-split every line — the letBound lesson)
    val out = letBound(split(col(textCol), "\n")) { lines =>
      letBound(filter(lines, keepLine)) { keptLines =>
        letBound(array_join(keptLines, "\n")) { cleaned =>
          val nKept = size(keptLines).cast("long")
          val badDoc = lower(col(textCol)).contains("lorem ipsum") ||
            col(textCol).contains("{") || col(textCol).contains("}")
          struct(
            size(lines).cast("long").as("n_lines"),
            nKept.as("n_kept"),
            when(badDoc, "boilerplate")
              .when(nKept < minLinesKept, "too_few_lines")
              .otherwise(lit(null).cast("string")).as("drop_reason"),
            md5(cleaned).as("clean_md5"),
            when(length(cleaned) === 0, lit(0L))
              .otherwise(size(tokens(cleaned)).cast("long")).as("clean_words"))
        }
      }
    }
    docs.select(col(idCol), out.as("c"))
      .select(col(idCol), col("c.*"))
      .withColumn("dropped", col("drop_reason").isNotNull)
  }

  /** Corpus-GLOBAL line-level boilerplate removal — C4's "discard any
    * line that repeats across the corpus" / FineWeb's boilerplate pass,
    * the step [[c4LineFilter]] (per-doc, rule-based) cannot do because
    * it never sees other documents. A "line" is a non-overlapping
    * `lineTokens`-token window ([[Chunking.chunkByTokens]] with zero
    * overlap); a line whose distinct-document frequency reaches
    * `maxDocFreq` is boilerplate and removed from EVERY document.
    *
    * Output per doc: `n_lines`, `n_kept`, and `clean_md5` — the
    * fingerprint of the surviving text in original line order.
    *
    * Scale shape (100 TB): one line-hash-keyed census (map-side
    * combined count-distinct — linear, the substring-dedup shape, no
    * pair join anywhere), one hash-keyed join back, one per-doc
    * re-aggregation. Joining on md5(line) keeps the shuffled key
    * narrow; the census table is corpus-sized but each partition only
    * meets its own hash range. */
  def globalLineDedup(docs: DataFrame, lineTokens: Int = 10, maxDocFreq: Int = 3,
                      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(lineTokens > 0, s"lineTokens must be positive, got $lineTokens")
    require(maxDocFreq >= 2, s"maxDocFreq must be >= 2, got $maxDocFreq")
    val lines = linesOf(docs, lineTokens, idCol, textCol)
    val census = lines.groupBy(col("lh"))
      .agg(countDistinct(col(idCol)).as("line_df"))
    val aggs = lineDedupAggs(maxDocFreq)
    lines.join(census, "lh")
      .groupBy(col(idCol))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** the line grid both the batch and incremental paths share:
    * (id, chunk_idx, chunk_text, lh = md5(line)) */
  private[operators] def linesOf(docs: DataFrame, lineTokens: Int,
                                 idCol: String, textCol: String): DataFrame =
    Chunking.chunkByTokens(docs, lineTokens, 0, idCol, textCol)
      .select(col(idCol), col("chunk_idx"), col("chunk_text"),
        md5(col("chunk_text")).as("lh"))

  /** per-doc reassembly aggregates over a lines frame carrying
    * `line_df`: count, kept count, and the kept text's md5 in original
    * line order */
  private[operators] def lineDedupAggs(maxDocFreq: Int): Seq[Column] = Seq(
    count(lit(1)).as("n_lines"),
    sum(when(col("line_df") < maxDocFreq, 1L).otherwise(0L)).as("n_kept"),
    md5(array_join(
      transform(
        array_sort(collect_list(when(col("line_df") < maxDocFreq,
          struct(col("chunk_idx"), col("chunk_text"))))),
        s => s.getField("chunk_text")),
      " ")).as("clean_md5"))
}

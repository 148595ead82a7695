package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing — laying a tokenized corpus into fixed-length
  * training sequences (the GPT-style concat-and-chunk layout: all docs
  * are concatenated in a deterministic order with a separator token
  * and the stream is cut every `seqLen` tokens; documents may straddle
  * a cut, the attention mask handles the boundary). The trainer-facing
  * questions this answers: how many sequences does the corpus fill,
  * which sequences does each doc land in, and how much of the batch
  * budget is boundary waste.
  *
  * Determinism: the pack order is the md5(id) shuffle order (the qp01
  * coordinate — reproducible on any engine/partitioning), so sequence
  * ids are a pure function of the corpus. All arithmetic is integer
  * (token counts, prefix sums, floor division): oracle-exact.
  *
  * Scale shape: ONE global prefix sum over (order, id) — a window over
  * the md5-ordered stream. At 100 TB the same layout is computed per
  * shard (shard by md5 prefix, pack within shard: identical math, no
  * global window) — [[Sampling.shuffleShards]] composes in front for
  * exactly that; the global variant here is the oracle-checkable
  * single-shard case.
  */
object Packing {

  /** Per-doc placement under concat-and-chunk packing: each doc
    * occupies tokens [start_off, start_off + n_tokens + sep) of the
    * concatenated stream (sep = 1 separator token appended per doc),
    * landing in sequences first_seq..last_seq of length `seqLen`.
    * Output: (id, n_tokens, start_off, first_seq, last_seq,
    * crosses_boundary). */
  def packPlacements(df: DataFrame, idCol: String, tokensCol: String,
                     seqLen: Int, sepTokens: Int = 1): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    require(sepTokens >= 0, s"sepTokens must be non-negative, got $sepTokens")
    val ord = md5(col(idCol).cast("string"))
    val w = Window.orderBy(ord.asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val costed = df.select(col(idCol), col(tokensCol).cast("long").as("n_tokens"))
      .withColumn("__end", sum(col("n_tokens") + lit(sepTokens.toLong)).over(w))
      .withColumn("start_off", col("__end") - col("n_tokens") - lit(sepTokens.toLong))
    costed.select(col(idCol), col("n_tokens"), col("start_off"),
        (col("start_off") / seqLen).cast("long").as("first_seq"),
        // last occupied token index: end-of-doc EXCLUDING the separator,
        // minus 1; empty docs (0 tokens) sit entirely at start_off
        (greatest(col("__end") - lit(sepTokens.toLong) - 1, col("start_off")) / seqLen)
          .cast("long").as("last_seq"))
      .withColumn("crosses_boundary", col("first_seq") =!= col("last_seq"))
  }

  /** The packing-efficiency report a batch-size decision needs:
    * sequence count, docs per sequence (mean), straddle fraction, and
    * tail padding waste. One row. */
  def packingReport(df: DataFrame, idCol: String, tokensCol: String,
                    seqLen: Int, sepTokens: Int = 1): DataFrame = {
    val placed = packPlacements(df, idCol, tokensCol, seqLen, sepTokens)
    placed.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("n_tokens"),
      (max(col("last_seq")) + 1).as("n_sequences"),
      sum(col("crosses_boundary").cast("long")).as("n_straddling"),
      round(avg(col("crosses_boundary").cast("double")), 6).as("straddle_frac"))
    .select(col("n_docs"), col("n_tokens"), col("n_sequences"),
      col("n_straddling"), col("straddle_frac"),
      // stream tokens incl. separators vs capacity of the sequences;
      // clamped at 0: the FINAL doc's separator can spill past the last
      // occupied token (n_sequences counts occupied tokens only), and a
      // spilled separator is dropped, not padding — without the clamp a
      // single seqLen-token doc reports pad_frac = -sep/seqLen
      round(greatest(col("n_sequences") * seqLen -
          (col("n_tokens") + col("n_docs") * sepTokens), lit(0L)).cast("double") /
        (col("n_sequences") * seqLen).cast("double"), 6).as("pad_frac"))
  }

  /** Whitespace token count for a text column — the packing cost
    * function when no learned tokenizer is in play (swap in the BPE
    * census join for subword-exact packing). */
  def wsTokens(text: Column): Column =
    size(filter(split(trim(text), "\\s+"), t => length(t) > 0))
}

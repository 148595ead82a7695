package graft.operators

import graft.functions.TextFunctions.letBound
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Content-defined chunking (CDC) — rolling-hash chunk boundaries, the
  * shift-robust complement to fixed-size chunk dedup (qd14): a chunk
  * boundary falls wherever the rolling hash of the trailing `w`-char
  * window hits a fixed residue, so inserting or deleting text moves
  * WHERE boundaries sit but not WHAT the surrounding chunks contain —
  * within one window of the edit, chunking re-synchronizes and every
  * later chunk hash matches again. Fixed-width chunking loses every
  * chunk after a one-character insertion; CDC loses one. This is the
  * storage-dedup trick (LBFS/rsync lineage) applied to corpus text.
  *
  * Everything is a pure per-row Column projection over integer
  * arithmetic (polynomial window hash mod M, all in BIGINT — exact in
  * any engine): zero shuffle for chunking itself, embarrassingly
  * parallel inside the scan, and oracle-checkable cell-for-cell. The
  * one scale caveat: the HOF evaluates ~w BIGINT ops per character
  * interpreted; the native-`Expression` port (the ShingleHashes
  * precedent) is the known optimization if chunking ever dominates a
  * profile. Boundaries use only the trailing window, so no min/max
  * chunk-size clamps — degenerate inputs (e.g. one repeated character)
  * chunk at the hash's natural period, documented rather than clamped,
  * keeping the boundary rule a pure function of the window.
  *
  * ASCII note: character codes come from `ascii`/`ord`, identical
  * across engines for single-byte code points (the testdata is pure
  * ASCII; a multibyte corpus would swap in a byte-level rolling hash).
  */
object ContentChunks {

  val Window = 8
  val Prime = 31L
  val Modulus = 1000003L
  /** boundary when H mod Divisor == Divisor-1 → expected chunk ≈ Divisor chars */
  val Divisor = 64L

  private val powers: Seq[Long] =
    Iterator.iterate(1L)(_ * Prime).take(Window).toSeq

  private def charCodes(text: Column): Column =
    transform(sequence(lit(1), length(text)), i => ascii(text.substr(i, lit(1))).cast("long"))

  /** 1-based positions i (w ≤ i ≤ n) where the hash of chars
    * [i-w+1 .. i] hits the boundary residue. */
  def cdcBoundaries(text: Column): Column =
    letBound(charCodes(text)) { cs =>
      when(length(text) >= Window,
        filter(sequence(lit(Window), length(text)), i =>
          powers.zipWithIndex.map { case (p, k) =>
            element_at(cs, i - lit(k)) * lit(p)
          }.reduce(_ + _) % Modulus % Divisor === lit(Divisor - 1)))
        .otherwise(array().cast("array<int>"))
    }

  /** The chunk list: substrings between consecutive boundaries,
    * concatenating back to the exact input. Delegates to the native
    * [[graft.functions.expressions.CdcChunks]] (one imperative pass
    * per row — the HOF formulation below interprets ~Window lambda
    * applications per character and measured 5.9 s at sf0.1, the
    * bench's slowest query; the native pass is the ShingleHashes
    * remedy). [[cdcChunksHof]] is the built-ins-only reference it
    * must bit-match (spec-pinned on ASCII, where `ascii`, `ord`, and
    * code points agree). */
  def cdcChunks(text: Column): Column =
    call_function("graft_cdc_chunks", text)

  /** HOF reference implementation of [[cdcChunks]]. */
  def cdcChunksHof(text: Column): Column =
    letBound(cdcBoundaries(text)) { bs =>
      letBound(concat(array(lit(1)), transform(bs, b => b + 1))) { ss =>
        letBound(concat(bs, array(length(text)))) { es =>
          filter(
            transform(sequence(lit(1), size(ss)), j =>
              text.substr(element_at(ss, j),
                element_at(es, j) - element_at(ss, j) + 1)),
            c => length(c) >= 1)
        }
      }
    }

  /** Per-doc chunking profile — chunk count, fattest chunk, total
    * chars (must reconcile with the input length: chunking is a
    * partition of the text), mean chunk length. */
  def chunkProfile(docs: DataFrame, idCol: String = "doc_id",
                   textCol: String = "text"): DataFrame =
    docs.select(col(idCol),
        cdcChunks(col(textCol)).as("chunks"))
      .select(col(idCol),
        size(col("chunks")).cast("long").as("n_chunks"),
        array_max(transform(col("chunks"), c => length(c))).cast("long").as("max_chunk_len"),
        aggregate(col("chunks"), lit(0L), (acc, c) => acc + length(c)).as("total_chars"))
      .withColumn("mean_chunk_len",
        round(col("total_chars").cast("double") / col("n_chunks").cast("double"), 6))

  /** Cross-document chunk census: md5 of every chunk, kept where the
    * chunk recurs in ≥ `minDocs` DISTINCT docs — shifted duplicate
    * content that fixed-grid chunk hashing misses. Linear shuffle on
    * the chunk hash (the substring-dedup shape), never a doc pair
    * join. */
  def chunkCensus(docs: DataFrame, minDocs: Int = 2, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame =
    docs.select(col(idCol), explode(cdcChunks(col(textCol))).as("chunk"))
      .select(col(idCol), md5(col("chunk")).as("chunk_hash"), length(col("chunk")).as("chunk_len"))
      .groupBy(col("chunk_hash"))
      .agg(countDistinct(col(idCol)).as("n_docs"),
           count(lit(1)).as("n_occurrences"),
           max(col("chunk_len")).cast("long").as("chunk_len"))
      .filter(col("n_docs") >= minDocs)
}

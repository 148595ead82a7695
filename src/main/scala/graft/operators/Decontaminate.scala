package graft.operators

import graft.functions.TextFunctions.shingleHashes
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Benchmark decontamination: flag corpus documents that share any
  * word n-gram with a benchmark/eval set — the standard guard against
  * test-set leakage into training data (exact n-gram collision, the
  * GPT-3/PaLM-style 13-gram rule; `n` is a parameter because the demo
  * corpus has ~54-word docs).
  *
  * Shape at 100 TB: the benchmark side is distinct n-gram HASHES of a
  * small eval suite — broadcast it; the corpus side is one
  * native-expression shingle projection + explode, so the whole check
  * is a map-side broadcast semi-join on the corpus scan followed by a
  * per-doc count. No shuffle of corpus text, no candidate explosion:
  * cost is one pass over the corpus.
  */
object Decontaminate {

  /** Per contaminated doc: how many DISTINCT n-gram hashes it shares
    * with the benchmark set (docs with zero hits are absent). */
  def contaminationHits(docs: DataFrame, bench: DataFrame, n: Int = 5,
                        idCol: String = "doc_id", textCol: String = "text",
                        broadcastBench: Boolean = true): DataFrame = {
    val benchGrams0 = bench
      .select(explode(shingleHashes(col(textCol), n)).as("g")).distinct()
    val benchGrams = if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    docs
      // shingleHashes is already distinct-per-doc: hits count distinct shared grams
      .select(col(idCol), explode(shingleHashes(col(textCol), n)).as("g"))
      .join(benchGrams, "g")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_hits"))
  }

  /** Full-corpus decontamination decisions: every doc with its shared
    * n-gram count and a contaminated flag. */
  def flag(docs: DataFrame, bench: DataFrame, n: Int = 5,
           idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val hits = contaminationHits(docs, bench, n, idCol, textCol)
    docs.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_hits").isNotNull.as("contaminated"))
  }
}

package graft.operators

import graft.functions.TextFunctions.tokens
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.DataFrame

/** Document segmentation and sequence packing — the two shape-changing
  * preparation steps between a curated corpus and a training/embedding
  * job: split long docs into fixed-token windows (RAG/embedding prep),
  * and pack short docs into contiguous fixed-budget bins (training
  * sequence packing).
  *
  * Both are deterministic and shuffle-minimal by construction:
  * chunking is a pure projection + explode (zero shuffle — each row
  * expands independently, so 100 TB chunks in one pass); packing is
  * one hash shuffle on the shard key + a running-sum window within
  * each shard.
  */
object Chunking {

  /** Fixed-size token windows with overlap: chunk starts every
    * `chunkSize - overlap` tokens; the final partial window is kept.
    * Output: (id, chunk_idx, chunk_tokens, chunk_text). */
  def chunkByTokens(docs: DataFrame, chunkSize: Int, overlap: Int,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize ($chunkSize) > overlap ($overlap) >= 0")
    val stride = chunkSize - overlap
    docs
      .select(col(idCol), tokens(col(textCol)).as("w"))
      .select(col(idCol),
        posexplode(sequence(lit(0), size(col("w")) - 1, lit(stride)))
          .as(Seq("chunk_idx", "start")),
        col("w"))
      .select(col(idCol), col("chunk_idx").cast("long").as("chunk_idx"),
        slice(col("w"), col("start") + 1, lit(chunkSize)).as("ck"))
      .select(col(idCol), col("chunk_idx"),
        size(col("ck")).cast("long").as("chunk_tokens"),
        concat_ws(" ", col("ck")).as("chunk_text"))
  }

  /** Contiguous fixed-budget sequence packing: within each shard
    * (deterministic hash of the id), docs are laid out in id order and
    * cut into bins wherever the running token count crosses a budget
    * multiple — bin = floor(tokens-before-this-doc / budget). Docs
    * longer than the budget get a bin of their own (the running sum
    * still advances). Output: per bin, its doc count and token total.
    *
    * One shuffle (shard key), one in-shard window — the layout every
    * packer on a cluster uses: global greedy packing is inherently
    * sequential, so the parallel contract is "greedy WITHIN shard". */
  def packSequences(docs: DataFrame, budget: Int, shards: Int = 8,
                    idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(budget > 0 && shards > 0)
    // shard key from md5 (not crc32/xxhash): engine-reproducible, so the
    // packing layout itself is cross-engine deterministic (Sampling.hashU
    // convention: first 16 bits of md5 as an exact integer)
    val h16 = conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10).cast("long")
    val toks = docs.select(col(idCol),
      (h16 % shards).cast("int").as("shard"),
      size(tokens(col(textCol))).cast("long").as("n_tokens"))
    val w = Window.partitionBy(col("shard")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("bin", floor((col("cum") - col("n_tokens")) / budget))
      .groupBy(col("shard"), col("bin"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tokens")).as("bin_tokens"))
  }
}

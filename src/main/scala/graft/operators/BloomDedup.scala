package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Bloom-filter prefilter for exact dedup against a massive corpus:
  * build a compact bloom filter over the corpus's content hashes ONCE
  * (one aggregate job; the filter is a few MB of binary, storable as
  * an artifact), then screen every incoming batch with a codegen'd
  * `might_contain` literal — rows the filter rejects are DEFINITELY
  * new (bloom filters have no false negatives) and skip the corpus
  * join entirely; only the (tiny) maybe-dup remainder pays the exact
  * semi-join.
  *
  * At 100 TB this turns "join every batch against 10^11 hashes" into
  * "scan the batch against an in-memory filter, then join ~fpp of it".
  * Built on Spark's OWN bloom machinery — the same
  * BloomFilterAggregate / BloomFilterMightContain expression pair the
  * engine uses for runtime join pruning (exposed as
  * `graft_bloom_agg` / `graft_might_contain` by GraftExtensions), so
  * the probe is a native codegen'd predicate, not a UDF.
  */
object BloomDedup {

  /** Build the filter over `md5(textCol)` content hashes: one
    * aggregate returning the serialized filter (single row to the
    * driver — the filter IS a driver-sized artifact, like any
    * broadcast). Size `expectedItems` at the corpus's distinct-hash
    * count; `numBits` defaults to ~8 bits/item (~2% fpp). */
  def buildFilter(corpus: DataFrame, textCol: String = "text",
                  expectedItems: Long = 1000000L,
                  numBits: Long = -1L): Array[Byte] = {
    val bits = if (numBits > 0) numBits else expectedItems * 8
    corpus
      .select(call_function("graft_bloom_agg",
        xxhash64(md5(col(textCol))), lit(expectedItems), lit(bits)).as("bf"))
      .head.getAs[Array[Byte]]("bf")
  }

  /** Codegen'd membership probe against a built filter (no false
    * negatives; false positives at the filter's fpp). */
  def mightContain(filter: Array[Byte], textCol: Column): Column =
    call_function("graft_might_contain", lit(filter), xxhash64(md5(textCol)))

  /** Split a batch into (definitely-new, maybe-dup) by the filter,
    * then resolve maybe-dups with the exact semi-join — returns the
    * batch with an `is_dup` column, equal to the plain anti-join
    * answer but with only filter-passing rows ever joining. */
  def exactDedupAgainst(batch: DataFrame, corpus: DataFrame,
                        filter: Array[Byte],
                        idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val candidates = batch.filter(mightContain(filter, col(textCol)))
      .select(col(idCol), md5(col(textCol)).as("__h"))
      .join(corpus.select(md5(col(textCol)).as("__h")).distinct(), Seq("__h"))
      .select(col(idCol).as("__dup_id")).distinct()
    batch.join(candidates, col(idCol) === col("__dup_id"), "left")
      .withColumn("is_dup", col("__dup_id").isNotNull)
      .drop("__dup_id")
  }
}

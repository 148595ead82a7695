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
    require(expectedItems >= 1,
      s"expectedItems must be >= 1, got $expectedItems — size the filter " +
        "at the corpus's distinct-hash count (an empty corpus still wants " +
        "a real capacity so the filter can absorb future appends)")
    val bits = if (numBits > 0) numBits else expectedItems * 8
    // BloomFilterAggregate silently CLAMPS oversized requests to these
    // session confs instead of erroring — a 10^11-item filter would
    // quietly degrade to the 64M-bit default and blow the fpp. Fail
    // loudly and tell the caller which conf to raise.
    val conf = corpus.sparkSession.conf
    val maxItems = conf.getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumItems")
      .map(_.toLong).getOrElse(4000000L)
    val maxBits = conf.getOption("spark.sql.optimizer.runtime.bloomFilter.maxNumBits")
      .map(_.toLong).getOrElse(67108864L)
    require(expectedItems <= maxItems,
      s"expectedItems ($expectedItems) exceeds spark.sql.optimizer.runtime." +
        s"bloomFilter.maxNumItems ($maxItems) — the aggregate would silently " +
        "clamp; raise the conf to size the filter honestly")
    require(bits <= maxBits,
      s"numBits ($bits) exceeds spark.sql.optimizer.runtime.bloomFilter." +
        s"maxNumBits ($maxBits) — the aggregate would silently clamp; raise the conf")
    val built = corpus
      .select(call_function("graft_bloom_agg",
        xxhash64(md5(col(textCol))), lit(expectedItems), lit(bits)).as("bf"))
      .head().getAs[Array[Byte]]("bf")
    if (built != null) built
    else {
      // empty corpus: the aggregate yields NULL, and a lit(null) probe
      // poisons every downstream predicate — publish a real (empty)
      // filter instead, from the same sketch implementation the
      // aggregate serializes, so might_contain stays well-typed and
      // answers false everywhere
      val empty = org.apache.spark.util.sketch.BloomFilter.create(expectedItems, bits)
      val bos = new java.io.ByteArrayOutputStream()
      empty.writeTo(bos)
      bos.toByteArray
    }
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

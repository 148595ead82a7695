package graft.operators

import graft.functions.TextFunctions.shingleHashes
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

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

  /** [[flag]] over a PRECOMPUTED per-doc distinct n-gram hash array —
    * the shared-tokenization hook (qc12): `grams` carries one row per
    * doc with the already-derived gram hashes; `isBench` selects the
    * benchmark rows within it. Expression-for-expression the same
    * broadcast semi-join + count as [[contaminationHits]]/[[flag]],
    * just reading the shared projection instead of re-tokenizing. */
  private[graft] def flagFromGrams(grams: DataFrame, isBench: Column,
                                   idCol: String = "doc_id",
                                   gramsCol: String = "g"): DataFrame = {
    val benchGrams = broadcast(grams.filter(isBench)
      .select(explode(col(gramsCol)).as("g")).distinct())
    val hits = grams
      .select(col(idCol), explode(col(gramsCol)).as("g"))
      .join(benchGrams, "g")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hits"))
    grams.select(col(idCol))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        col("n_hits").isNotNull.as("contaminated"))
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

  /** Cluster-aware decontamination (the qp12 composition argument
    * applied to leakage): a contaminated doc poisons its whole
    * near-dup cluster, because a paraphrased/typo'd copy of a leaked
    * eval item dodges the exact n-gram check while carrying the leak.
    * `pairs` is any near-dup pair table (the audited funnel's output);
    * decisions are per-CLUSTER: one bool aggregation over the CC
    * labels joined back. Output per doc: cluster id, its own hit, the
    * cluster verdict, and keep = clean cluster. */
  def clusterFlag(docs: DataFrame, bench: DataFrame, pairs: DataFrame,
                  n: Int = 5, idCol: String = "doc_id",
                  textCol: String = "text"): DataFrame = {
    val clusters = ConnectedComponents.dedupDecisions(docs, pairs, idCol)
      .select(col(idCol), col("cluster_id"))
    val hits = flag(docs, bench, n, idCol, textCol)
      .select(col(idCol), col("contaminated").as("self_hit"))
    val joined = clusters.join(hits, Seq(idCol)).localCheckpoint()
    val clusterHit = joined.groupBy(col("cluster_id"))
      .agg(max(col("self_hit")).as("cluster_hit"))
    joined.join(clusterHit, "cluster_id")
      .select(col(idCol), col("cluster_id"), col("self_hit"),
        col("cluster_hit"), (!col("cluster_hit")).as("keep"))
  }

  /** Fuzzy decontamination: flag corpus documents whose n-gram Jaccard
    * similarity with ANY benchmark document reaches `threshold` — the
    * near-duplicate leakage the exact n-gram rule misses (lightly
    * paraphrased or reformatted eval items; the Llama/GPT-4-report
    * style "contamination by high n-gram overlap").
    *
    * Same MinHash→LSH→verify funnel as [[Dedup.nearDupsMinhash]] but
    * ASYMMETRIC: band keys and shingle hashes of the (small) benchmark
    * side are broadcast, so the corpus is never self-joined — the scan
    * side streams once through a broadcast-hash join per stage, and
    * only corpus×bench band collisions are verified. Nothing shuffles
    * but the per-doc max aggregation.
    *
    * Output (one row per corpus doc): `max_jaccard` against the
    * benchmark (null when no candidate), the `bench_id` achieving it
    * (smallest id on ties — deterministic), and `contaminated`.
    *
    * Id-space contract: with `sharedIdSpace = true` (default — the
    * bench-is-a-corpus-subset shape) equal ids mean THE SAME document,
    * so a doc never matches itself but still flags at 1.0 against
    * other copies (the IncrementalDedup replay lesson). When the
    * benchmark carries its OWN ids, equal ids are a coincidence, not
    * identity — pass `sharedIdSpace = false` or a numeric collision
    * silently suppresses a genuine contamination hit. */
  def fuzzyFlag(docs: DataFrame, bench: DataFrame, threshold: Double,
                numHashes: Int = 16, bands: Int = 4,
                idCol: String = "doc_id", benchIdCol: String = "doc_id",
                textCol: String = "text",
                sharedIdSpace: Boolean = true,
                benchIsSubset: Boolean = false,
                storagePath: Option[String] = None,
                precomputedSigs: Option[DataFrame] = None): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0,
      s"threshold must be in (0,1], got $threshold")
    require(!benchIsSubset || sharedIdSpace,
      "benchIsSubset pulls signatures from the corpus row with the same id — " +
        "meaningless unless ids are a shared space (sharedIdSpace = true)")
    // precomputedSigs: an ALREADY-MATERIALIZED (idCol, hashes, bands)
    // frame from Dedup.signatureProjection with the same (numHashes,
    // bands) — the shared-scan hook for callers (qc11) that derive
    // several gram families from one pass over the text; the caller
    // owns the numHashes % bands divisibility guarantee.
    val corpusSigs = precomputedSigs.getOrElse(
      Dedup.signatureTable(docs, numHashes, bands, idCol, textCol, storagePath))
    // bench side is small by contract: the SAME projection the corpus
    // funnel uses (hash compatibility by construction), broadcast into
    // both join stages. With `benchIsSubset` (bench rows ARE corpus
    // rows, the eval-set-inside-the-corpus shape) the signatures come
    // from the already-materialized corpus table by id — skipping a
    // second signature pass over text; otherwise they are recomputed
    // lazily per reference (nothing persisted — no session cache to
    // leak). benchIsSubset implies a shared id space.
    val benchSigs =
      if (benchIsSubset) {
        val joined = corpusSigs.join(
            broadcast(bench.select(col(benchIdCol).as("__bench_id")).distinct()),
            col(idCol) === col("__bench_id"))
          .select(col("__bench_id").as(benchIdCol), col("hashes"), col("bands"))
        // a bench id absent from the corpus would silently drop that
        // eval item from the funnel — the exact under-flagging this
        // operator exists to prevent. One cheap count over the already-
        // materialized signature table buys the loud failure.
        val nBench = bench.select(col(benchIdCol)).distinct().count()
        val nFound = joined.count()
        require(nFound == nBench,
          s"benchIsSubset: ${nBench - nFound} of $nBench benchmark ids are " +
            "not in the corpus — pass benchIsSubset=false to compute their " +
            "signatures from the benchmark text")
        joined
      } else Dedup.signatureProjection(bench, numHashes, bands,
        benchIdCol, textCol)
    val corpusBanded = corpusSigs.select(col(idCol),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val benchBanded = benchSigs.select(col(benchIdCol).as("bench_id"),
      posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val collided = corpusBanded
      .join(broadcast(benchBanded), Seq("band_idx", "band_hash"))
    val cands = (if (sharedIdSpace) collided.filter(col(idCol) =!= col("bench_id"))
                 else collided)
      .select(col(idCol), col("bench_id"))
      .distinct()
    val common = size(array_intersect(col("hashes"), col("b_hashes"))).cast("double")
    val verified = cands
      .join(corpusSigs.select(col(idCol), col("hashes")), Seq(idCol))
      .join(broadcast(benchSigs.select(col(benchIdCol).as("bench_id"),
        col("hashes").as("b_hashes"))), Seq("bench_id"))
      .select(col(idCol), col("bench_id"),
        round(common / (size(col("hashes")) + size(col("b_hashes")) - common), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
    val best = verified
      .withColumn("__rk", row_number().over(
        Window.partitionBy(col(idCol))
          .orderBy(col("jaccard").desc, col("bench_id").asc)))
      .filter(col("__rk") === 1)
      .select(col(idCol), col("jaccard").as("max_jaccard"), col("bench_id"))
    docs.select(col(idCol))
      .join(best, Seq(idCol), "left")
      .select(col(idCol), col("max_jaccard"), col("bench_id"),
        col("max_jaccard").isNotNull.as("contaminated"))
  }

  /** SURGICAL decontamination: instead of flagging or dropping a
    * contaminated document, remove exactly the n-gram spans it shares
    * with the benchmark and keep the rest — the GPT-3-appendix "remove
    * the overlapping window" remedy, which preserves the bulk of a
    * long document that merely quotes one eval item.
    *
    * Mechanics: POSITIONAL n-grams this time (duplicates and order
    * kept — a doc repeating a benchmark phrase twice must lose both
    * sites), hash-joined against the broadcast benchmark gram set;
    * each doc's hit starts collect into one bounded array (≤ its own
    * token count), and the document is rebuilt in a single projection
    * that drops every token covered by any hit window. A benchmark doc
    * present in the corpus is scrubbed to nothing — by design: every
    * one of its grams IS benchmark content.
    *
    * Scale: one corpus pass + broadcast join + per-doc agg; the
    * rebuild join is id-keyed. Output per doc: `n_spans`,
    * `n_tokens_removed`, `clean_md5` (of the space-joined surviving
    * tokens), `contaminated`. */
  def scrubSpans(docs: DataFrame, bench: DataFrame, n: Int = 5,
                 idCol: String = "doc_id", textCol: String = "text",
                 broadcastBench: Boolean = true): DataFrame = {
    import graft.functions.TextFunctions._
    val benchGrams0 = bench
      .select(explode(shingleHashes(col(textCol), n)).as("h")).distinct()
    val benchGrams = if (broadcastBench) broadcast(benchGrams0) else benchGrams0
    val positioned = docs
      .select(col(idCol), posexplode(shingles(col(textCol), n)).as(Seq("pos", "sh")))
      .select(col(idCol), col("pos"), md5(col("sh")).as("h"))
    val starts = positioned.join(benchGrams, "h")
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
    val rebuilt = letBound(tokens(col(textCol))) { w =>
      letBound(coalesce(col("starts"), array().cast("array<int>"))) { st =>
        letBound(filter(w, (tok, i) =>
          !exists(st, s => i >= s && i <= s + lit(n - 1)))) { kept =>
          struct(
            size(st).cast("long").as("n_spans"),
            (size(w) - size(kept)).cast("long").as("n_tokens_removed"),
            md5(array_join(kept, " ")).as("clean_md5"),
            (size(st) > 0).as("contaminated"))
        }
      }
    }
    docs.select(col(idCol), col(textCol))
      .join(starts, Seq(idCol), "left")
      .select(col(idCol), rebuilt.as("r"))
      .select(col(idCol), col("r.*"))
  }
}

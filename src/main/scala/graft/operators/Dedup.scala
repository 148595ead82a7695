package graft.operators

import graft.functions.TextFunctions._
import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operator family for the training-data pipeline
  * (builder brief: exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup).
  *
  * Scale design (100 TB):
  *  - Signature/fingerprint computation is a pure projection — runs
  *    inside the scan stage, no shuffle, codegen'd.
  *  - Candidate generation shuffles on the *band key* (LSH) or a
  *    *blocking key*, never all-pairs: the only O(n²) work happens
  *    within a bucket, which LSH keeps small by construction.
  *  - Exact Jaccard verification runs only on candidate pairs (the
  *    classic MinHash → verify funnel).
  *  - Exact dedup is one hash-shuffle (`groupBy(content_hash)`); with
  *    AQE skew handling for pathological duplicate clusters.
  */
object Dedup {

  /** Exact dedup: canonical keeper (min id) per content hash.
    * Returns (id, content_hash, keeper, is_dup). */
  def exactCanonical(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    val hashed = docs.select(col(idCol), md5(col(textCol)).as("content_hash"))
    val w = Window.partitionBy(col("content_hash"))
    hashed
      .withColumn("keeper", min(col(idCol)).over(w))
      .withColumn("is_dup", col(idCol) =!= col("keeper"))
  }

  /** Exact dedup with a KEEPER POLICY: real pipelines don't keep the
    * minimum id — they keep the copy from the most trusted source, or
    * the longest/most complete one, and only then break ties by id.
    * `preference` is that ordering as VALUE expressions sorted
    * ascending (encode "prefer larger" by negation, e.g.
    * `-length(col("text"))`); id ascending is always appended as the
    * final deterministic tie-break.
    *
    * The preference expressions are materialized BEFORE the hash
    * shuffle and everything else is projected away, so only
    * (id, hash, preference values) move — the same slim shuffle
    * payload as [[exactCanonical]], even when a preference reads the
    * full text.
    *
    * Example: `Seq(col("source_rank"), -length(col("text")))` keeps
    * the highest-ranked source's longest copy. */
  def exactCanonicalBy(docs: DataFrame, preference: Seq[Column],
                       idCol: String = "doc_id",
                       textCol: String = "text"): DataFrame = {
    require(preference.nonEmpty,
      "empty preference — use exactCanonical for plain min-id dedup")
    val prefNames = preference.indices.map(i => s"__pref$i")
    val slim = docs.select(
      col(idCol) +: md5(col(textCol)).as("content_hash") +:
        preference.zip(prefNames).map { case (c, nm) => c.as(nm) }: _*)
    val w = Window.partitionBy(col("content_hash"))
      .orderBy(prefNames.map(col(_).asc) :+ col(idCol).asc: _*)
    slim
      .withColumn("keeper", first(col(idCol)).over(w))
      .withColumn("is_dup", col(idCol) =!= col("keeper"))
      .select(col(idCol), col("content_hash"), col("keeper"), col("is_dup"))
  }

  /** Per-doc MinHash signature column (array of hex-string minima). */
  def withMinhash(docs: DataFrame, numHashes: Int = 16,
                  textCol: String = "text"): DataFrame =
    docs.withColumn("minhash_sig", minhashSignature(col(textCol), numHashes))

  /** The one (id, shingle hashes, band keys) projection every MinHash
    * consumer must share — signatureTable persists it, fuzzy
    * decontamination broadcasts it unpersisted for the bench side. A
    * single definition keeps corpus and bench hashes join-compatible
    * by construction. */
  private[graft] def signatureProjection(docs: DataFrame, numHashes: Int,
                                         bands: Int, idCol: String,
                                         textCol: String): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands): " +
        "trailing signature rows would silently never enter any band")
    docs.select(col(idCol),
      shingleHashes(col(textCol)).as("hashes"),
      letBound(minhashSignature(col(textCol), numHashes)) { sig =>
        minhashBands(sig, bands, numHashes / bands)
      }.as("bands"))
  }

  /** Materialization contract shared by the funnels:
    *  - `storagePath = Some(dir)` — the 100 TB shape: the frame is
    *    written to storage as a first-class artifact (tiny next to the
    *    text) and every downstream reference scans the parquet, not
    *    the text. Survives executor loss; no cache memory.
    *  - `storagePath = None` (default, test/bench scale) — persisted to
    *    MEMORY_AND_DISK and eagerly materialized. The cache lives until
    *    the caller drops it (`spark.catalog.clearCache()`, as Verify
    *    and Bench do between queries) — the funnel's result is lazy, so
    *    this function cannot unpersist it itself. */
  private[graft] def materialized(frame: DataFrame,
                                  storagePath: Option[String]): DataFrame =
    storagePath match {
      case Some(path) =>
        frame.write.mode("overwrite").parquet(path)
        // read back with the writer's schema — the footer inference a
        // bare read pays (one driver job) tells us nothing new (§6)
        frame.sparkSession.read.schema(frame.schema).parquet(path)
      case None =>
        val cached = frame.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached.count() // materialize NOW: the downstream self-join would
                       // otherwise race both sides into the cold cache and
                       // compute every signature twice
        cached
    }

  /** Signature table: per doc, distinct shingle hashes + LSH band keys,
    * computed in ONE pass over the text and materialized (see
    * [[materialized]] for the storage-vs-cache contract). Everything
    * downstream (banding self-join, Jaccard verification) references
    * this table from both join sides — without materialization Spark
    * would re-run the signature scan once per side. */
  private[graft] def signatureTable(docs: DataFrame, numHashes: Int, bands: Int,
                                    idCol: String, textCol: String,
                                    storagePath: Option[String] = None): DataFrame =
    materialized(
      signatureProjection(docs, numHashes, bands, idCol, textCol), storagePath)

  /** LSH banding → distinct candidate pairs (a_id < b_id).
    * Shuffles on (band_idx, band_hash); only bucket-internal pairs are
    * materialized. */
  def minhashCandidatePairs(docs: DataFrame, numHashes: Int = 16,
                            bands: Int = 4, idCol: String = "doc_id",
                            textCol: String = "text",
                            storagePath: Option[String] = None): DataFrame =
    candidatesFrom(signatureTable(docs, numHashes, bands, idCol, textCol, storagePath), idCol)

  /** Band-bucket skew census — the histogram a funnel operator reads
    * BEFORE launching the bucket self-join: per band, LSH bucket sizes
    * log2-bucketed with the candidate-pair mass each size class implies
    * (`sum sz·(sz−1)/2`). The pair join's shuffle volume IS this
    * implied-pair count, so a fat tail here (one hot band_hash holding
    * thousands of docs) is the advance warning to widen bands, raise
    * the shingle width, or pre-split the hot bucket — before paying a
    * quadratic join, not after. Cost: the same one-pass signature
    * projection the funnel itself runs (Catalyst prunes the unused
    * shingle-hash column), one (band_idx, band_hash) aggregation, one
    * constant-size histogram — no pair materialization anywhere. */
  def bandCensus(docs: DataFrame, numHashes: Int = 16, bands: Int = 4,
                 idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val banded = signatureProjection(docs, numHashes, bands, idCol, textCol)
      .select(posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    banded.groupBy(col("band_idx"), col("band_hash"))
      .agg(count(lit(1)).as("sz"))
      .withColumn("pairs", expr("sz * (sz - 1) DIV 2"))
      .groupBy(col("band_idx"), floor(log2(col("sz"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_buckets"),
        sum(col("sz")).as("n_docs"),
        sum(col("pairs")).as("implied_pairs"),
        max(col("sz")).as("max_bucket"))
  }

  private def candidatesFrom(sigTable: DataFrame, idCol: String): DataFrame = {
    val banded = sigTable
      .select(col(idCol), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val a = banded.select(col(idCol).as("a_id"), col("band_idx"), col("band_hash"))
    val b = banded.select(col(idCol).as("b_id"), col("band_idx"), col("band_hash"))
    a.join(b, Seq("band_idx", "band_hash"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
  }

  /** Exact n-gram Jaccard via an inverted shingle index (set-similarity
    * join): candidate pairs are generated ONLY for docs sharing at
    * least one shingle hash within the block, and |A∩B| comes from a
    * count aggregation — no quadratic all-pairs scan, no per-pair array
    * intersection. Pairs with zero overlap have Jaccard 0 and are
    * correctly absent (callers filter on a positive threshold).
    *
    * Scale: shuffles on (block, shingle_hash); per-shingle fan-out is
    * bounded by document frequency, and AQE skew-join handles hot
    * shingles. This is the shape that survives 100 TB; the all-pairs
    * variant does not. */
  def jaccardPairsByBlock(docs: DataFrame, blockCol: String,
                          idCol: String = "doc_id", textCol: String = "text",
                          n: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol), col(blockCol).as("block"),
                         shingleHashes(col(textCol), n).as("hashes"))
    val inverted = sh.select(col("block"), col(idCol), explode(col("hashes")).as("h"))
    val a = inverted.select(col("block"), col(idCol).as("a_id"), col("h"))
    val b = inverted.select(col("block"), col(idCol).as("b_id"), col("h"))
    val common = a.join(b, Seq("block", "h"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("block"), col("a_id"), col("b_id"))
      .agg(count(lit(1)).cast("double").as("common"))
    val sizes = sh.select(col(idCol), size(col("hashes")).as("n_hashes"))
    common
      .join(sizes.select(col(idCol).as("a_id"), col("n_hashes").as("a_n")), "a_id")
      .join(sizes.select(col(idCol).as("b_id"), col("n_hashes").as("b_n")), "b_id")
      .select(col("block"), col("a_id"), col("b_id"),
        round(col("common") / (col("a_n") + col("b_n") - col("common")), 6).as("jaccard"))
  }

  /** Shingle CONTAINMENT within a block — the asymmetric cousin of
    * [[jaccardPairsByBlock]]: C(A,B) = |A∩B| / |A| detects A as a
    * near-SUBSET of B (excerpts, quotes, doc-in-doc inclusion) that
    * symmetric Jaccard structurally misses — a 150-token excerpt of a
    * 3000-token source has J ≈ 0.05 but C ≈ 1.0. Same inverted
    * shingle-index shape (candidates only for docs sharing a hash in
    * the block, |A∩B| from a count aggregation — no all-pairs scan, no
    * per-pair array intersection); the containment direction is the
    * smaller hash set (id tie-break), so each unordered pair emits one
    * (contained, container) row. */
  def containmentPairsByBlock(docs: DataFrame, blockCol: String, threshold: Double,
                              idCol: String = "doc_id", textCol: String = "text",
                              n: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0,1], got $threshold")
    val sh = docs.select(col(idCol), col(blockCol).as("block"),
                         shingleHashes(col(textCol), n).as("hashes"))
    val inverted = sh.select(col("block"), col(idCol), explode(col("hashes")).as("h"))
    val a = inverted.select(col("block"), col(idCol).as("a_id"), col("h"))
    val b = inverted.select(col("block"), col(idCol).as("b_id"), col("h"))
    val common = a.join(b, Seq("block", "h"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("block"), col("a_id"), col("b_id"))
      .agg(count(lit(1)).cast("double").as("common"))
    val sizes = sh.select(col(idCol), size(col("hashes")).as("n_hashes"))
    val aFirst = col("a_n") < col("b_n") ||
      (col("a_n") === col("b_n") && col("a_id") < col("b_id"))
    common
      .join(sizes.select(col(idCol).as("a_id"), col("n_hashes").as("a_n")), "a_id")
      .join(sizes.select(col(idCol).as("b_id"), col("n_hashes").as("b_n")), "b_id")
      .select(col("block"),
        when(aFirst, col("a_id")).otherwise(col("b_id")).as("contained_id"),
        when(aFirst, col("b_id")).otherwise(col("a_id")).as("container_id"),
        round(col("common") / least(col("a_n"), col("b_n")).cast("double"), 6)
          .as("containment"))
      .filter(col("containment") >= threshold)
  }

  /** Prefix-filtered set-similarity join (PPJoin-style): for a KNOWN
    * threshold t, a pair with Jaccard ≥ t must share a hash within each
    * doc's first |d| − ⌈t·|d|⌉ + 1 hashes under a global sort order —
    * so only those prefixes are indexed, candidates come from the
    * prefix join, and exact Jaccard is verified per candidate via
    * array intersection. Output is complete for jaccard ≥ t (pairs
    * below t are filtered — they carry no completeness guarantee).
    *
    * vs [[jaccardPairsByBlock]]: MEASURED at sf0.1 (ProfileJaccard,
    * NOTES_r2.md) the exact count-agg path wins at both t=0.05 (prefix
    * >10 min vs ~5 s) and t=0.3 (~6-10× slower): with few-hundred-
    * shingle docs the prefix is still ~70% of the doc at t=0.3, so the
    * candidate set barely shrinks while every candidate pays an
    * array_intersect the count aggregation never does. The prefix path
    * is the right shape only for high-threshold (t ≳ 0.7) dedup over
    * large documents, where the prefix (≤ 30% of hashes) collapses the
    * candidate set; qd02 therefore stays on the exact path. */
  def jaccardPairsByBlockPrefix(docs: DataFrame, blockCol: String, threshold: Double,
                                idCol: String = "doc_id", textCol: String = "text",
                                n: Int = 3): DataFrame = {
    require(threshold > 0.0 && threshold <= 1.0, s"threshold must be in (0,1], got $threshold")
    val sh = docs.select(col(idCol), col(blockCol).as("block"),
                         array_sort(shingleHashes(col(textCol), n)).as("hashes"))
    val pfxLen = (size(col("hashes")) - ceil(size(col("hashes")) * lit(threshold)) + lit(1))
      .cast("int")
    val pfx = sh.select(col("block"), col(idCol),
        explode(slice(col("hashes"), lit(1), pfxLen)).as("h"))
    val a = pfx.select(col("block"), col(idCol).as("a_id"), col("h"))
    val b = pfx.select(col("block"), col(idCol).as("b_id"), col("h"))
    val cands = a.join(b, Seq("block", "h"))
      .filter(col("a_id") < col("b_id"))
      .select(col("block"), col("a_id"), col("b_id"))
      .distinct()
    val full = sh.select(col(idCol), col("hashes"), size(col("hashes")).as("nh"))
    val common = size(array_intersect(col("a_hashes"), col("b_hashes"))).cast("double")
    cands
      .join(full.select(col(idCol).as("a_id"), col("hashes").as("a_hashes"), col("nh").as("a_n")), "a_id")
      .join(full.select(col(idCol).as("b_id"), col("hashes").as("b_hashes"), col("nh").as("b_n")), "b_id")
      .select(col("block"), col("a_id"), col("b_id"),
        round(common / (col("a_n") + col("b_n") - common), 6).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** MinHash candidates verified with exact Jaccard (the full funnel).
    * One signature pass feeds both candidate generation and
    * verification. */
  def nearDupsMinhash(docs: DataFrame, threshold: Double,
                      numHashes: Int = 16, bands: Int = 4,
                      idCol: String = "doc_id", textCol: String = "text",
                      storagePath: Option[String] = None): DataFrame =
    nearDupsMinhashFromSigs(
      signatureTable(docs, numHashes, bands, idCol, textCol, storagePath),
      threshold, idCol)

  /** [[nearDupsMinhash]] over an ALREADY-MATERIALIZED (idCol, hashes,
    * bands) signature frame — the shared-scan hook for callers (qc12)
    * that derive several gram families from one pass over the text;
    * the caller owns the numHashes % bands divisibility guarantee. */
  private[graft] def nearDupsMinhashFromSigs(sigs: DataFrame, threshold: Double,
                                             idCol: String = "doc_id"): DataFrame = {
    val cands = candidatesFrom(sigs, idCol)
    val sh = sigs.select(col(idCol), col("hashes"))
    val common = size(array_intersect(col("a_hashes"), col("b_hashes"))).cast("double")
    cands
      .join(sh.select(col(idCol).as("a_id"), col("hashes").as("a_hashes")), "a_id")
      .join(sh.select(col(idCol).as("b_id"), col("hashes").as("b_hashes")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(common / (size(col("a_hashes")) + size(col("b_hashes")) - common), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** [[nearDupsMinhash]] over a PRE-SHINGLED frame — the knob-sweep
    * shape: qd22 prices signature width at H ∈ {8,16,32}, and the
    * tokenize+shingle+hash scan is IDENTICAL across settings, so a
    * sweep should pay it once (`shingledTable`) and re-derive only the
    * per-H signature from the stored shingle arrays. `shingled` must
    * carry (idCol, shingles array<string>, hashes array<string>) —
    * exactly what [[shingledTable]] materializes. */
  def nearDupsMinhashFromShingles(shingled: DataFrame, threshold: Double,
                                  numHashes: Int, bands: Int,
                                  idCol: String = "doc_id"): DataFrame = {
    require(numHashes % bands == 0,
      s"numHashes ($numHashes) must be divisible by bands ($bands)")
    val sigs = materialized(
      shingled.select(col(idCol), col("hashes"),
        letBound(call_function("graft_minhash_signature",
            col("shingles"), lit(numHashes))) { sig =>
          minhashBands(sig, bands, numHashes / bands)
        }.as("bands")), None)
    val cands = candidatesFrom(sigs, idCol)
    val sh = sigs.select(col(idCol), col("hashes"))
    val common = size(array_intersect(col("a_hashes"), col("b_hashes"))).cast("double")
    cands
      .join(sh.select(col(idCol).as("a_id"), col("hashes").as("a_hashes")), "a_id")
      .join(sh.select(col(idCol).as("b_id"), col("hashes").as("b_hashes")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(common / (size(col("a_hashes")) + size(col("b_hashes")) - common), 6)
          .as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** The shared scan a signature sweep pays once: per doc, the raw
    * shingle array (minhash input) and its distinct-md5 hash set (the
    * Jaccard-verify input). */
  def shingledTable(docs: DataFrame, idCol: String = "doc_id",
                    textCol: String = "text", n: Int = 3): DataFrame =
    docs.select(col(idCol),
      shingles(col(textCol), n).as("shingles"),
      shingleHashes(col(textCol), n).as("hashes"))

  /** Banding-only legs of [[nearDupsMinhashFromShingles]] for a WHOLE
    * width sweep, NO verify. MinHash row s is seeded by s alone
    * (sig(s) = min md5(s":"x) — [[graft.functions.expressions.MinHashSignature]]),
    * so a narrower signature is a PREFIX of a wider one: the sweep
    * computes ONE maximal-width signature table and each width bands
    * its first `h` entries — bit-equal to computing that width
    * directly (spec-pinned), at 1x the minhash work instead of
    * sum-of-widths. Verification is factored out too
    * ([[verifyJaccardPairs]]): a pair's exact Jaccard is
    * width-independent, so the sweep verifies the candidate UNION
    * once. */
  def candidatePairsByWidth(shingled: DataFrame, widths: Seq[Int], bands: Int,
                            idCol: String = "doc_id"): Seq[(Int, DataFrame)] = {
    require(widths.nonEmpty && widths.forall(h => h >= 1 && h % bands == 0),
      s"every width must be a positive multiple of bands ($bands): $widths")
    val sigs = materialized(
      shingled.select(col(idCol),
        call_function("graft_minhash_signature",
          col("shingles"), lit(widths.max)).as("sig")), None)
    widths.map { h =>
      val banded = sigs.select(col(idCol),
        minhashBands(col("sig"), bands, h / bands).as("bands"))
      h -> candidatesFrom(banded, idCol)
    }
  }

  /** Exact distinct-shingle Jaccard for an explicit (a_id, b_id) pair
    * list, read from the shared [[shingledTable]] hash sets — the
    * verify stage factored out so sweeps can run it once over a
    * candidate union. */
  def verifyJaccardPairs(pairs: DataFrame, shingled: DataFrame,
                         idCol: String = "doc_id"): DataFrame = {
    val sh = shingled.select(col(idCol), col("hashes"))
    val common = size(array_intersect(col("a_hashes"), col("b_hashes"))).cast("double")
    pairs
      .join(sh.select(col(idCol).as("a_id"), col("hashes").as("a_hashes")), "a_id")
      .join(sh.select(col(idCol).as("b_id"), col("hashes").as("b_hashes")), "b_id")
      .select(col("a_id"), col("b_id"),
        round(common / (size(col("a_hashes")) + size(col("b_hashes")) - common), 6)
          .as("jaccard"))
  }

  /** Edit-distance near-duplicates: MinHash LSH candidates verified by
    * exact Levenshtein distance ≤ `maxDist` — the verify to reach for
    * when the dedup CONTRACT is character-level ("differs by at most k
    * edits": ids, titles, template instantiations), which set-based
    * Jaccard cannot express (one repeated token swap moves Jaccard a
    * lot or not at all depending on shingle width).
    *
    * Scale notes, honestly: (a) the verify joins candidate TEXT pairs
    * — unlike the Jaccard funnel, whose verify reads the materialized
    * hash sets — so candidate fan-out moves document text through a
    * shuffle; (b) Levenshtein is O(|a|·|b|) per pair. Both are fine
    * for short text fields and bounded candidate sets (what LSH
    * delivers); for long documents use the Jaccard/simhash funnels.
    * Recall is the banding's: a pair within maxDist edits that shares
    * no band never surfaces — candidates, not a guarantee (the
    * pigeonhole guarantee belongs to the simhash funnel). */
  def nearDupsEditDistance(docs: DataFrame, maxDist: Int,
                           numHashes: Int = 16, bands: Int = 4,
                           idCol: String = "doc_id", textCol: String = "text",
                           storagePath: Option[String] = None): DataFrame = {
    require(maxDist >= 0, s"maxDist must be non-negative, got $maxDist")
    // bands-only materialization: this funnel verifies on raw text, so
    // persisting the (largest) shingle-hash arrays the Jaccard verify
    // needs would be pure cache/storage waste here
    val sigs = materialized(
      signatureProjection(docs, numHashes, bands, idCol, textCol)
        .select(col(idCol), col("bands")), storagePath)
    val cands = candidatesFrom(sigs, idCol)
    val texts = docs.select(col(idCol), col(textCol))
    cands
      .join(texts.select(col(idCol).as("a_id"), col(textCol).as("a_text")), "a_id")
      .join(texts.select(col(idCol).as("b_id"), col(textCol).as("b_text")), "b_id")
      .select(col("a_id"), col("b_id"),
        levenshtein(col("a_text"), col("b_text")).cast("long").as("edit_dist"))
      .filter(col("edit_dist") <= maxDist)
  }

  /** Per-doc 16-bit SimHash fingerprint. */
  def withSimhash(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.withColumn("simhash", simhash16(col(textCol)))

  /** SimHash near-duplicates: band the 16-bit shingle-simhash into
    * `bands` equal slices, bucket-join on every (bands - maxHamming)-band
    * combination key, verify candidates by exact hamming ≤ `maxHamming`.
    *
    * Completeness: by pigeonhole, a pair within hamming h differs in at
    * most h bands, so with bands > h at least one (bands - h)-band
    * subset matches in full — the combination banding is EXACT (full
    * recall) for maxHamming < bands. The default (2 < 4) is therefore a
    * guarantee, not a heuristic; the qd05 oracle relies on it.
    *
    * Scale: same funnel shape as MinHash — signature is a native-
    * expression projection (fused ShingleSimHash16), candidates shuffle
    * on the combination key, exact verification only on candidates.
    * The combination key is what makes narrow fingerprints survive at
    * all: single 4-bit bands give 2^4 bucket values (hot buckets → n²
    * pairs; the measured funnel collapse at sf0.1), while 2-band 8-bit
    * keys give 2^8 per combo.
    *
    * The DEFAULT width (64, 16-bit bands → C(4,2) 32-bit combination
    * keys) is the production path — measured 3.6x faster than the
    * 16-bit funnel on the 50k scale stress because wide keys keep
    * buckets tiny. width=16 is the cross-engine-oracle demo size
    * (qd05); both satisfy the same pigeonhole recall guarantee. */
  def nearDupsSimhash(docs: DataFrame, maxHamming: Int = 2, bands: Int = 4,
                      idCol: String = "doc_id", textCol: String = "text",
                      width: Int = 64,
                      storagePath: Option[String] = None): DataFrame = {
    require(width == 16 || width == 64, s"width ($width) must be 16 or 64")
    require(width % bands == 0, s"bands ($bands) must divide $width")
    require(maxHamming < bands,
      s"recall guarantee needs maxHamming ($maxHamming) < bands ($bands)")
    val w = width / bands
    val sigExpr = if (width == 16) simhash16Shingles(col(textCol))
                  else simhash64Shingles(col(textCol))
    // same materialization contract as signatureTable: with storagePath
    // the signatures become a parquet artifact (nothing cached — the
    // long-lived-session shape); without it they persist in the session
    // cache and live until the caller clears it, since the lazy result
    // still references them
    val sigs = storagePath match {
      case Some(path) =>
        val proj = docs.select(col(idCol), sigExpr.as("sh"))
        proj.write.mode("overwrite").parquet(path)
        // writer's schema — skip the footer-inference driver job (§6)
        docs.sparkSession.read.schema(proj.schema).parquet(path)
      case None =>
        val cached = docs.select(col(idCol), sigExpr.as("sh"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        cached.count() // materialize: referenced by banding AND both verify sides
        cached
    }
    // Pigeonhole, pushed INTO the join key: hamming <= maxHamming flips
    // bits in at most maxHamming bands, so some (bands - maxHamming)-band
    // subset matches EXACTLY. Joining on every such subset (bands
    // concatenated) instead of single bands keeps recall exact while
    // widening the key from w to w*(bands - maxHamming) bits — the key
    // space grows 2^w-fold per extra band, shrinking each bucket (and
    // the n²-per-bucket candidate join, the funnel's hot-key hazard)
    // by the same factor. bands=4/maxHamming=2: C(4,2)=6 8-bit keys
    // instead of 4 4-bit keys → ~16x smaller buckets for 1.5x explode.
    val keep = bands - maxHamming
    val combos = (0 until bands).combinations(keep).toSeq
    val keyed = sigs.select(col(idCol),
      posexplode(array(combos.map(c =>
        concat(c.map(b => substring(col("sh"), b * w + 1, w)): _*)): _*))
        .as(Seq("combo_idx", "band")))
    val cands = keyed.select(col(idCol).as("a_id"), col("combo_idx"), col("band"))
      .join(keyed.select(col(idCol).as("b_id"), col("combo_idx"), col("band")),
            Seq("combo_idx", "band"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"))
      .distinct()
    // hamming as bit_count(xor) over integer fingerprints — same value
    // as the width-way substring comparison of the bit strings, but one
    // codegen'd xor+popcount per 32-bit half instead of `width`
    // interpreted substrings (measured 12x on the verify stage at 3M
    // pairs). 32-bit halves: a 64-bit binary string with a leading 1
    // would overflow the signed-long parse as one piece.
    val halves = (0 until width by 32).map { off =>
      val piece = conv(substring(col("sh"), off + 1, math.min(32, width)), 2, 10)
        .cast("long")
      (s"shi$off", piece)
    }
    val ints = sigs.select(col(idCol) +: halves.map { case (nm, e) => e.as(nm) }: _*)
    val hamming = halves.map { case (nm, _) =>
      bit_count(col(s"a_$nm").bitwiseXOR(col(s"b_$nm"))) }.reduce(_ + _)
    cands
      .join(ints.select(col(idCol).as("a_id") +:
        halves.map { case (nm, _) => col(nm).as(s"a_$nm") }: _*), "a_id")
      .join(ints.select(col(idCol).as("b_id") +:
        halves.map { case (nm, _) => col(nm).as(s"b_$nm") }: _*), "b_id")
      .select(col("a_id"), col("b_id"), hamming.cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact-substring duplication census (Lee et al. 2022,
    * "Deduplicating Training Data Makes Language Models Better"): a
    * span duplicated VERBATIM across documents is the strongest dedup
    * signal there is, and it is invisible to whole-document hashing
    * when the surrounding text differs. The paper builds a suffix
    * array; the shape that survives 100 TB on Spark is the hashed
    * fixed-width window equivalent: every k-token window, hashed,
    * grouped — a window shared by ≥2 docs is a duplicated span.
    *
    * Per doc this emits:
    *  - `n_windows`   — distinct k-token windows in the doc,
    *  - `n_shared`    — windows also present in ANY other doc,
    *  - `n_dup_before`— windows whose earliest owner (min doc id) is an
    *                    EARLIER doc — the "later copy" census that
    *                    makes keep-first dedup decisions,
    *  - `shared_frac` — n_shared / n_windows (round 6; null when the
    *                    doc is shorter than k tokens).
    *
    * Scale: one scan projection (native shingle hashing) + explode,
    * one hash shuffle on the window hash (count + min-owner per hash),
    * one join back, one per-doc aggregation. No pair materialization
    * at all — unlike the similarity funnels this is linear in corpus
    * size, which is why exact-substring dedup is routinely run on
    * full web-scale corpora. */
  def substringDupStats(docs: DataFrame, k: Int = 10,
                        idCol: String = "doc_id",
                        textCol: String = "text"): DataFrame = {
    val win = docs.select(col(idCol),
        explode(shingleHashes(col(textCol), k)).as("h"))
    // shingleHashes is distinct-per-doc, so count(*) per hash == the
    // number of distinct owning docs
    val owners = win.groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("first_owner"))
    val perDoc = win.join(owners, "h")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_windows"),
           sum(when(col("n_docs") >= 2, 1L).otherwise(0L)).as("n_shared"),
           sum(when(col("first_owner") < col(idCol), 1L).otherwise(0L))
             .as("n_dup_before"))
    docs.select(col(idCol))
      .join(perDoc, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_shared"), lit(0L)).as("n_shared"),
        coalesce(col("n_dup_before"), lit(0L)).as("n_dup_before"),
        round(col("n_shared") / col("n_windows"), 6).as("shared_frac"))
  }

  /** Exact-substring dedup REMOVAL — the scrub half of Lee et al. 2022
    * ([[substringDupStats]] is the census half): every k-token window
    * duplicated across ≥2 documents survives only in its first owner
    * (min doc id); every later doc has ALL occurrences of that window
    * cut, token-exact, and the document rebuilt from the surviving
    * tokens. Windows repeated only WITHIN one doc are untouched —
    * the contract is cross-document dedup, matching the census.
    *
    * Scale: the census's linear shape plus positions — one positional
    * shingle projection (no pair materialization), one window-hash
    * shuffle for the owner table (filtered to duplicated hashes BEFORE
    * the join back, so the hot side of the join carries only dup
    * windows), one per-doc position aggregation, and an id-keyed
    * rebuild join. Per-doc state is O(dup windows in the doc), never
    * O(corpus).
    *
    * Output per doc: `n_spans` (distinct removal start positions),
    * `n_tokens_removed`, `clean_md5` (md5 of the space-joined surviving
    * tokens), `scrubbed`. */
  def substringScrub(docs: DataFrame, k: Int = 10,
                     idCol: String = "doc_id",
                     textCol: String = "text"): DataFrame = {
    require(k >= 1, s"window width k must be >= 1, got $k")
    val positioned = docs
      .select(col(idCol), posexplode(shingles(col(textCol), k)).as(Seq("pos", "sh")))
      .select(col(idCol), col("pos"), md5(col("sh")).as("h"))
    // first owner per window hash, duplicated-across-docs hashes only
    val owners = positioned.select(col(idCol), col("h")).distinct()
      .groupBy(col("h"))
      .agg(count(lit(1)).as("n_docs"), min(col(idCol)).as("first_owner"))
      .filter(col("n_docs") >= 2)
      .select(col("h"), col("first_owner"))
    val starts = positioned.join(owners, "h")
      .filter(col(idCol) > col("first_owner"))
      .groupBy(col(idCol))
      .agg(sort_array(collect_set(col("pos"))).as("starts"))
    val rebuilt = letBound(tokens(col(textCol))) { w =>
      letBound(coalesce(col("starts"), array().cast("array<int>"))) { st =>
        letBound(filter(w, (tok, i) =>
          !exists(st, s => i >= s && i <= s + lit(k - 1)))) { kept =>
          struct(
            size(st).cast("long").as("n_spans"),
            (size(w) - size(kept)).cast("long").as("n_tokens_removed"),
            md5(array_join(kept, " ")).as("clean_md5"),
            (size(st) > 0).as("scrubbed"))
        }
      }
    }
    docs.select(col(idCol), col(textCol))
      .join(starts, Seq(idCol), "left")
      .select(col(idCol), rebuilt.as("r"))
      .select(col(idCol), col("r.*"))
  }

  /** SemDeDup (Abbas et al. 2023): semantic deduplication by
    * cluster-then-prune — assign every embedding to its nearest
    * coarse centroid ([[IvfIndex]]'s deterministic sampled-centroid
    * quantizer, so the whole funnel stays oracle-able), then inside
    * each cell mark every vector whose cosine to an EARLIER cell-mate
    * reaches `threshold` as a duplicate of its smallest-id match.
    * Semantic near-dups land in the same cell because they are near
    * the same centroid — the cells are exactly the blocking structure
    * [[embeddingNearDups]] takes as a given column, but learned from
    * the geometry instead of metadata.
    *
    * Scale: centroid table is `nCells` rows (broadcast); assignment is
    * one corpus pass + id-keyed argmin agg; pairing shuffles on the
    * cell key and is quadratic ONLY within a cell — cell size is
    * corpus/nCells in expectation, and a skewed cell is the same
    * hot-block problem [[embeddingNearDups]]'s sub-bucket guard
    * handles. Output per vector: cell, dup_of, cos_sim, is_dup. */
  def semanticDedup(emb: DataFrame, nCells: Int, threshold: Double,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import VectorFunctions._
    val cents = IvfIndex.centroids(emb, nCells, idCol, vecCol)
    val assigned = IvfIndex.assign(emb, cents, idCol, vecCol)
    val v = assigned.select(col("cell"), col(idCol), col(vecCol),
                            sqrt(norm2(col(vecCol))).as("nrm"))
    val a = v.select(col("cell"), col(idCol).as("a_id"),
                     col(vecCol).as("a_vec"), col("nrm").as("a_nrm"))
    val b = v.select(col("cell"), col(idCol).as("b_id"),
                     col(vecCol).as("b_vec"), col("nrm").as("b_nrm"))
    val pairs = a.join(b, Seq("cell"))
      .filter(col("a_id") < col("b_id"))
      .select(col("b_id"), col("a_id"),
        round(dot(col("a_vec"), col("b_vec")) / (col("a_nrm") * col("b_nrm")), 6)
          .as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
    val best = pairs.groupBy(col("b_id"))
      .agg(min(struct(col("a_id"), col("cos_sim"))).as("m"))
      .select(col("b_id").as(idCol), col("m.a_id").as("dup_of"),
              col("m.cos_sim").as("cos_sim"))
    assigned.select(col(idCol), col("cell"))
      .join(best, Seq(idCol), "left")
      .select(col(idCol), col("cell"), col("dup_of"), col("cos_sim"),
              col("dup_of").isNotNull.as("is_dup"))
  }

  /** Embedding-cosine near-duplicates within a blocking key. Norms are
    * precomputed per vector BEFORE the pair join (1 dot product per
    * pair instead of 3 — at n² pairs that factor matters).
    *
    * Hot-block guard: within-block work is O(n²), so one dominant
    * block (a single `lang` holding most of the corpus) degenerates.
    * Blocks larger than `maxBlockSize` are sub-bucketed by
    * `subPlanes` LSH sign bits before pairing — work per hot block
    * drops ~4^subPlanes-fold; near-identical vectors still collide
    * (their hyperplane signs agree), but borderline pairs straddling a
    * hyperplane can be missed — an explicit recall trade-off, applied
    * ONLY above the budget. The default budget (Int.MaxValue) keeps
    * every block exact, which is what the qd04 oracle checks;
    * DedupSpec pins the bounded-pair-count property on a pathological
    * block. */
  def embeddingNearDups(emb: DataFrame, threshold: Double,
                        blockCol: String = "label", idCol: String = "vec_id",
                        vecCol: String = "embedding",
                        maxBlockSize: Int = Int.MaxValue,
                        subPlanes: Int = 4, dim: Int = 64): DataFrame = {
    import VectorFunctions._
    val v = emb.select(col(blockCol).as("block"), col(idCol), col(vecCol),
                       sqrt(norm2(col(vecCol))).as("nrm"))
    val sizes = v.groupBy(col("block")).agg(count(lit(1)).as("__bn"))
    val keyed = v.join(sizes, Seq("block"))
      .withColumn("__sub",
        when(col("__bn") > maxBlockSize, lshBucket(col(vecCol), subPlanes, dim))
          .otherwise(lit("")))
    val a = keyed.select(col("block"), col("__sub"), col(idCol).as("a_id"),
                         col(vecCol).as("a_vec"), col("nrm").as("a_nrm"))
    val b = keyed.select(col("block"), col("__sub"), col(idCol).as("b_id"),
                         col(vecCol).as("b_vec"), col("nrm").as("b_nrm"))
    a.join(b, Seq("block", "__sub"))
      .filter(col("a_id") < col("b_id"))
      .select(col("block"), col("a_id"), col("b_id"),
        round(dot(col("a_vec"), col("b_vec")) / (col("a_nrm") * col("b_nrm")), 6).as("cos_sim"))
      .filter(col("cos_sim") >= threshold)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data curation:
  * stratified Bernoulli sampling, fixed-size per-stratum reservoirs,
  * and mixture rebalancing. The reference has no sampling surface at
  * all; these are north-star pipeline operators (builder brief), built
  * so the SAME sample comes out on every engine and every run:
  * randomness is `md5(id)` — a uniform hash any engine reproduces —
  * never `rand()`.
  *
  * Scale design (100 TB):
  *  - [[stratifiedSample]] is a pure filter inside the scan projection:
  *    zero shuffle, zero state — sampling 100 TB costs one pass, and
  *    Parquet column pruning means only the id + stratum columns are
  *    read if the caller projects afterwards.
  *  - [[reservoirPerKey]] is the two-phase salted top-k: a per-(key,
  *    salt) pre-prune bounds every window partition at `k` rows before
  *    the per-key window runs, so a 10-stratum 100 TB corpus never
  *    sorts a whole stratum on one task — the final window sees at most
  *    `salts × k` rows per key.
  *  - [[mixtureSample]] computes per-stratum acceptance rates from a
  *    tiny counts aggregate (broadcast back), then filters like
  *    [[stratifiedSample]]: one scan + one scalar-sized shuffle.
  */
object Sampling {

  /** Uniform-in-[0,1) hash coordinate for a row: the first 4 hex digits
    * of md5(id) as an integer, / 16^4. Cross-engine exact: the integer
    * is < 2^16 so the double is exact in any engine. */
  def hashU(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("double") / 65536.0

  /** Per-stratum Bernoulli sampling at deterministic per-stratum rates:
    * keep a row iff hashU(id) < rate(stratum). Rows in strata missing
    * from `rates` are dropped. */
  def stratifiedSample(df: DataFrame, stratumCol: String, idCol: String,
                       rates: Map[String, Double]): DataFrame = {
    // null fallback (NOT NaN: Spark orders NaN greatest, so `u < NaN`
    // would KEEP unknown strata; `u < null` is null → filtered out)
    val rate = rates.foldLeft(lit(null).cast("double")) { case (acc, (s, r)) =>
      when(col(stratumCol) === s, lit(r)).otherwise(acc)
    }
    df.filter(hashU(col(idCol)) < rate)
  }

  /** Deterministic fixed-size-`k` sample per key ("reservoir"): the k
    * rows ranking first by (md5(id), id) within each key. Two-phase so
    * no single task ever sorts a whole stratum: phase 1 takes the
    * per-(key, salt) top-k (bounded partitions, salt = spark hash of
    * the id — engine-internal is fine because the FINAL ranking is
    * salt-invariant), phase 2 re-ranks the ≤ salts×k survivors per key.
    * Emits (key, id, rk) with rk in [1, k]. */
  def reservoirPerKey(df: DataFrame, keyCol: String, idCol: String,
                      k: Int, salts: Int = 16): DataFrame = {
    val ord = md5(col(idCol).cast("string"))
    val salted = df.select(col(keyCol), col(idCol), ord.as("__ord"),
                           pmod(hash(col(idCol)), lit(salts)).as("__salt"))
    val w1 = Window.partitionBy(col(keyCol), col("__salt"))
      .orderBy(col("__ord").asc, col(idCol).asc)
    val pruned = salted.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col("__ord").asc, col(idCol).asc)
    pruned.withColumn("rk", row_number().over(w2).cast("long"))
      .filter(col("rk") <= k)
      .select(col(keyCol), col(idCol), col("rk"))
  }

  /** Weighted sampling WITHOUT replacement, fixed k per key — the
    * Efraimidis–Spirakis (2006) exponential-key reservoir:
    * each row draws key = −ln(u)/w (u the md5-derived uniform, shifted
    * into (0,1] so ln never sees 0), and the k SMALLEST keys per
    * stratum win — equivalent to sequential draws proportional to w
    * without replacement, as one scan + bounded windows. The member
    * [[weightedSample]] cannot express: ITS keep decisions are
    * independent Bernoulli (expected fraction), this one returns an
    * exact-size, weight-biased, collision-free sample.
    *
    * Determinism contract: the ES key is quantized to the 1e-6 grid
    * (floor(x·1e6 + 0.5) — the tie-free binary form) with the id as
    * final tie-break, so the kept set is a pure function of
    * (ids, weights) and replays cross-engine. The one transcendental
    * (ln) is evaluated on md5-derived uniforms whose images sit far
    * from grid boundaries at any realistic corpus size (the qt12 ln
    * discipline). Rows with w ≤ 0 or NULL have sampling weight zero
    * and are excluded by definition.
    *
    * Resolution bound (r13 ADVICE): u comes from the first 8 hex
    * digits of md5 — 2^32 distinct values, so same-weight strata tie
    * on the ES key only past ~2^16 rows per stratum (birthday), and
    * the quantized key floors to 0 only for weights above
    * ~4.4e7·max(−ln u) ≈ 4.4e7 — weights beyond that all rank as
    * "always take" (correct directionally, but ordered by id, not
    * weight). Callers with per-stratum weights spanning past ~1e7
    * should rescale weights into (0, 1e6] first (ES selection is
    * scale-invariant within a stratum).
    *
    * Scale shape: [[reservoirPerKey]]'s two-phase salted top-k — no
    * task ever sorts a whole stratum. Emits (key, id, es_key, rk). */
  def weightedReservoirPerKey(df: DataFrame, keyCol: String, idCol: String,
                              weightCol: String, k: Int,
                              salts: Int = 16): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(salts >= 1, s"salts must be >= 1, got $salts")
    // u in (0,1]: (first-8-hex-of-md5 + 1) / 2^32 — both the integer
    // and 2^32 are exact in a double, and DuckDB replays it verbatim
    val u = (conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10)
      .cast("double") + lit(1.0)) / 4294967296.0
    val esKey = floor(-log(u) / col(weightCol).cast("double") * 1e6 + 0.5)
      .cast("long")
    val salted = df.filter(col(weightCol).isNotNull && col(weightCol) > 0)
      .select(col(keyCol), col(idCol), esKey.as("es_key"),
        pmod(hash(col(idCol)), lit(salts)).as("__salt"))
    val w1 = Window.partitionBy(col(keyCol), col("__salt"))
      .orderBy(col("es_key").asc, col(idCol).asc)
    val pruned = salted.withColumn("__r1", row_number().over(w1))
      .filter(col("__r1") <= k)
    val w2 = Window.partitionBy(col(keyCol))
      .orderBy(col("es_key").asc, col(idCol).asc)
    pruned.withColumn("rk", row_number().over(w2).cast("long"))
      .filter(col("rk") <= k)
      .select(col(keyCol), col(idCol), col("es_key"), col("rk"))
  }

  /** Deterministic train/val/test assignment ("anti-leakage split"):
    * the split is a pure function of the row id, so re-running the
    * pipeline — or running it on another engine — can never move a
    * document across the boundary, and joining any derived table back
    * by id preserves the split. Adds a `split` column; zero shuffle. */
  def holdoutSplit(df: DataFrame, idCol: String,
                   trainFrac: Double = 0.8, valFrac: Double = 0.1): DataFrame = {
    require(trainFrac > 0 && valFrac >= 0 && trainFrac + valFrac < 1.0,
      s"fractions must leave room for test: train=$trainFrac val=$valFrac")
    val u = hashU(col(idCol))
    df.withColumn("split",
      when(u < trainFrac, "train")
        .when(u < trainFrac + valFrac, "val")
        .otherwise("test"))
  }

  /** Mixture rebalancing: equalize strata by downsampling every stratum
    * to the size of the smallest, deterministically. Acceptance rate
    * per stratum = min_count / count; membership = hashU(id) < rate.
    * Returns per-stratum (n_orig, rate, n_kept) — the audit frame a
    * curation run records; pair with [[stratifiedSample]]-style
    * filtering to materialize the rows themselves. */
  /** Deterministic global shuffle into `nShards` shards for training
    * export: shard and within-shard order both derive from
    * `md5(seed:id)` — a reproducible permutation that no engine,
    * partitioning, or re-run can perturb, with shards statistically
    * uniform in size and content (adjacent source docs scatter across
    * unrelated shards/positions — the anti-curriculum-bias property a
    * sequential trainer needs). Pure projection: zero shuffle HERE;
    * the writer path is `repartition(nShards, $"shard")` +
    * `sortWithinPartitions($"sort_key")` — one exchange, per-shard
    * local sorts, never a global sort. */
  def shuffleShards(df: DataFrame, idCol: String, nShards: Int,
                    seed: Long = 0L): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    // appended, not projected: the input's payload columns ride along,
    // so composing pipelines (e.g. the qc06 training mix) never need a
    // self-join back onto their own expensive subtree
    val h = md5(concat_ws(":", lit(seed.toString), col(idCol).cast("string")))
    df.withColumn("sort_key", h)
      .withColumn("shard",
        (conv(substring(col("sort_key"), 1, 4), 16, 10).cast("int") % nShards))
  }

  /** Deterministic token-budget selection per stratum — "take B tokens
    * from source s", the unit training mixes are specified in: rank
    * docs by the md5 coordinate (a reproducible uniform draw), keep
    * while the running token total stays ≤ `budget` (each kept doc's
    * own tokens included). One running-sum window per stratum —
    * streaming evaluation, no buffering; for strata vastly larger than
    * the budget, compose with [[reservoirPerKey]] to pre-prune before
    * the window (budget/min-doc-tokens bounds the rows that can ever
    * be kept). */
  def tokenBudgetPerKey(df: DataFrame, keyCol: String, idCol: String,
                        tokensCol: String, budget: Long): DataFrame = {
    val ord = md5(col(idCol).cast("string"))
    val w = Window.partitionBy(col(keyCol))
      .orderBy(ord.asc, col(idCol).asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(keyCol), col(idCol), col(tokensCol))
      .withColumn("running_tokens", sum(col(tokensCol)).over(w))
      .filter(col("running_tokens") <= budget)
  }

  /** Quality-WEIGHTED deterministic sampling — the DCLM/FineWeb-style
    * mix move: keep each doc with probability proportional to its
    * quality/importance weight, scaled so the expected kept fraction
    * is `targetFrac`. Keep iff hashU(id) < w · (targetFrac · n / Σw):
    * a pure per-row decision from one broadcast scalar (the weight
    * sum), zero data shuffle, engine-reproducible (the qp01 md5 draw).
    * Weights must be non-negative; docs with scaled probability ≥ 1
    * are always kept (the scale is an expectation, not a cap). */
  def weightedSample(df: DataFrame, idCol: String, weightCol: String,
                     targetFrac: Double): DataFrame = {
    require(targetFrac > 0.0 && targetFrac <= 1.0,
      s"targetFrac must be in (0,1], got $targetFrac")
    // DECIMAL sum: exact and partition-order-independent — a raw double
    // sum would differ in ulps across engines/partitionings and flip
    // keep decisions at the rounded boundary
    val tot = df.agg(
      sum(col(weightCol).cast("decimal(24,8)")).cast("double").as("__sumw"),
      count(lit(1)).cast("double").as("__n"))
    val scale = when(col("__sumw") <= 0.0,
        raise_error(lit("weightedSample: non-positive weight sum — " +
          "every doc would be silently dropped")).cast("double"))
      .otherwise(lit(targetFrac) * col("__n") / col("__sumw"))
    df.crossJoin(broadcast(tot))
      // tie-free binary quantization (TextFunctions.quantize): plain
      // round(_, 9) diverges from the oracle when the double's shortest
      // rendering is an exact tie (found by the round-11 sf0.1 sweep)
      .withColumn("keep_p", floor(col(weightCol) * scale * 1e9 + 0.5) / 1e9)
      .filter(hashU(col(idCol)) < col("keep_p"))
      .drop("__sumw", "__n")
  }

  /** Curriculum-ordered export: shard deterministically by md5(id)
    * (every shard sees the same difficulty distribution) but order
    * WITHIN each shard by the difficulty score — the curriculum-
    * learning layout, where a trainer reads each shard easy→hard.
    *
    * The explicit per-shard `position` comes from
    * [[Layout.ordinalPerKey]] (score-range buckets + offsets), NOT a
    * window partitioned by shard alone: shard counts are small by
    * construction, so the naive per-shard window would push a whole
    * shard — 1/nShards of the corpus — through one sort task. */
  def curriculumShards(df: DataFrame, idCol: String, scoreCol: String,
                       nShards: Int): DataFrame = {
    require(nShards >= 1, s"nShards must be >= 1, got $nShards")
    val sharded = df.withColumn("shard",
      (conv(substring(md5(col(idCol).cast("string")), 1, 4), 16, 10)
        .cast("int") % nShards))
    Layout.ordinalPerKey(sharded, "shard", scoreCol, idCol)
      .withColumnRenamed("ordinal", "position")
  }

  /** Temperature-based mixture sampling — the multilingual/multi-source
    * mix move (XLM / mT5: q_s ∝ p_s^α with α in (0,1] upsampling
    * low-resource sources relative to their raw share). Given a total
    * doc budget, each source's quota is budget·q_s and its keep rate
    * min(1, quota/n_s); the keep decision is the qp01 md5 draw, so the
    * kept set is a pure function of (corpus, α, budget) on any engine.
    *
    * Scale shape: the source census is a map-side-combined aggregate
    * (|sources| rows), rates are computed on that tiny frame and
    * broadcast back — the corpus is scanned once and never shuffled.
    * Rates are rounded to 1e-9 BEFORE the draw comparison (the
    * Unigram-logp lesson: pow() can differ in the last ulp across
    * engines, and the draw compares doubles exactly). Output: per-doc
    * (id, source, kept) — downstream writers filter kept. */
  def temperatureMix(df: DataFrame, stratumCol: String, idCol: String,
                     alpha: Double, budget: Long): DataFrame = {
    require(alpha > 0.0 && alpha <= 1.0, s"alpha must be in (0,1], got $alpha")
    require(budget > 0, s"budget must be positive, got $budget")
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_orig"))
    // q_s = n_s^α / Σ n^α: the p_s^α normalization's N^α cancels, so
    // work directly on counts (integers → pow of exact doubles)
    val powed = counts.select(col(stratumCol), col("n_orig"),
      pow(col("n_orig").cast("double"), lit(alpha)).as("__w"))
    val tot = powed.agg(sum(col("__w").cast("decimal(30,9)")).cast("double").as("__z"))
    val rated = powed.crossJoin(broadcast(tot))
      .select(col(stratumCol), col("n_orig"),
        round(col("__w") / col("__z"), 9).as("q_temp"),
        round(least(lit(1.0),
          lit(budget.toDouble) * (col("__w") / col("__z")) / col("n_orig").cast("double")),
          9).as("rate"))
    df.select(col(stratumCol), col(idCol))
      .join(broadcast(rated), stratumCol)
      .withColumn("kept", hashU(col(idCol)) < col("rate"))
  }

  def mixtureEqualize(df: DataFrame, stratumCol: String, idCol: String): DataFrame = {
    val counts = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("n_orig"))
    val minN = counts.agg(min(col("n_orig")).as("__min"))
    val rated = counts.crossJoin(broadcast(minN))
      .select(col(stratumCol), col("n_orig"),
              (col("__min").cast("double") / col("n_orig").cast("double")).as("rate"))
    df.select(col(stratumCol), col(idCol))
      .join(broadcast(rated), stratumCol)
      .filter(hashU(col(idCol)) < col("rate"))
      .groupBy(col(stratumCol))
      .agg(count(lit(1)).as("n_kept"), first(col("n_orig")).as("n_orig"),
           round(first(col("rate")), 6).as("rate"))
      .select(col(stratumCol), col("n_orig"), col("rate"), col("n_kept"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Approximate corpus statistics — the sketches a 100 TB pipeline
  * reaches for when the exact answer costs a full shuffle it cannot
  * afford, built on Spark's OWN sketch machinery (the same HLL++ and
  * CountMinSketch the engine uses internally), never reimplemented:
  *
  *  - [[approxDistinctPerKey]]: per-group cardinality via
  *    `approx_count_distinct` (HyperLogLog++) — one map-side-combining
  *    aggregate over a few-KB state per group, vs the exact
  *    distinct's full shuffle of every value. The rsd knob is the
  *    contract: error concentrates within ~±3·rsd.
  *  - [[countMinSketch]] / [[estimateCounts]]: item-frequency sketch —
  *    ONE pass builds a fixed-size (eps, confidence) summary that
  *    answers "how often does item x occur" for ANY x after the fact,
  *    without a per-item groupBy. CMS never undercounts (estimates are
  *    exact-or-over, biased by at most eps·N with prob ≥ confidence) —
  *    the right direction for over-represented-content guards, where a
  *    false "frequent" only costs a precise recount.
  *
  * Exactness is deliberately NOT oracle-checkable (two engines'
  * sketches disagree bit-wise), so like the bloom prefilter these are
  * spec-gated: the specs pin the error CONTRACTS (HLL within 3·rsd,
  * CMS never-under + eps·N over-bound) against exact twins.
  */
object Sketches {

  /** Per-key approximate distinct count of `valueCol` (HLL++),
    * alongside nothing else — compose into wider aggregates freely;
    * `rsd` = target relative standard deviation. */
  def approxDistinctPerKey(df: DataFrame, keyCol: String, valueCol: String,
                           rsd: Double = 0.05): DataFrame =
    df.groupBy(col(keyCol))
      .agg(approx_count_distinct(col(valueCol), rsd).as("approx_distinct"))

  /** Approximate trailing-window distinct via mergeable HLL sketches —
    * the 100 TB path for qe07's exact sliding distinct: each day's
    * sketch is built ONCE from that day's rows (one pass over raw
    * data), and every trailing window then merges `windowDays`
    * FIXED-SIZE sketches (≈ 2^lgConfigK bytes each) instead of
    * re-distincting its rows — the second shuffle moves day-count ×
    * sketch-size bytes, independent of data volume. Same bounded
    * explode discipline as the exact operator; observed-day filter
    * broadcast. Datasketches HLL (`hll_sketch_agg`/`hll_union_agg`)
    * rather than `approx_count_distinct` because union-mergeability IS
    * the operator; error ≈ 1.04/√2^lgConfigK relative (≈1.6% at the
    * default 12), pinned against the exact operator in SketchesSpec. */
  def slidingApproxDistinct(df: DataFrame, tsCol: String, valueCol: String,
                            windowDays: Int = 7, lgConfigK: Int = 12): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    // one raw-data pass: the per-day sketch table feeds both the day
    // domain and the window explode
    val daily = df.select(to_date(col(tsCol)).as("day"), col(valueCol).as("v"))
      .groupBy(col("day")).agg(hll_sketch_agg(col("v"), lgConfigK).as("sk"))
      .localCheckpoint()
    val days = daily.select(col("day").as("win_day"))
    daily
      .select(col("day"), col("sk"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"))
      .select(date_add(col("day"), col("off")).as("win_day"), col("sk"))
      .join(broadcast(days), "win_day")
      .groupBy(col("win_day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_distinct"))
      .withColumnRenamed("win_day", "day")
  }

  /** Per-key approximate quantiles via `percentile_approx`
    * (Greenwald-Khanna style): one map-side-combining aggregate with a
    * bounded-size summary per group, vs the exact ordered-set
    * aggregate's full sort of every group. The `accuracy` knob IS the
    * contract: each returned value's true rank is within
    * ±ceil(n / accuracy) of the requested p·n — pinned by
    * SketchesSpec against the exact quantiles. Use the exact
    * PERCENTILE_DISC (qt07) when bit-stable cross-engine values
    * matter; use this when the group is too large to sort. */
  def approxQuantilesPerKey(df: DataFrame, keyCol: String, valueCol: String,
                            probs: Seq[Double], accuracy: Int = 10000): DataFrame = {
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probs must be in [0,1], got $probs")
    require(accuracy > 0, s"accuracy must be positive, got $accuracy")
    df.groupBy(col(keyCol))
      .agg(percentile_approx(col(valueCol),
             array(probs.map(lit): _*), lit(accuracy)).as("quantiles"),
           count(lit(1)).as("n"))
  }

  /** Per-day KLL doubles sketches built partition-locally: ONE sketch
    * per (partition, day) updated in a tight loop — never a per-row
    * serialize/deserialize round-trip — then merged per day. The
    * shuffle carries days × partitions fixed-size summaries, not
    * values. */
  private def dailyKllSketches(df: DataFrame, tsCol: String, valueCol: String,
                               k: Int): DataFrame = {
    import org.apache.datasketches.kll.KllDoublesSketch
    val spark = df.sparkSession
    import spark.implicits._
    df.select(to_date(col(tsCol)).cast("string").as("day"),
              col(valueCol).cast("double").as("v"))
      .as[(String, Double)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, KllDoublesSketch]
        it.foreach { case (d, v) =>
          m.getOrElseUpdate(d, KllDoublesSketch.newHeapInstance(k)).update(v)
        }
        m.iterator.map { case (d, s) => (d, s.toByteArray) }
      }.toDF("day", "sk")
  }

  /** Trailing-window approximate quantiles — the quantile member of
    * the sliding-sketch family next to [[slidingApproxDistinct]]:
    * "p95 document length over the trailing 7 days" without ever
    * sorting a window's rows. One raw pass builds per-day KLL
    * summaries (mergeability is the point — GK/`percentile_approx`
    * summaries don't merge across pre-aggregated groups); each window
    * then merges `windowDays` fixed-size sketches. KLL's contract is
    * NORMALIZED RANK error (≈ 1.65% at k = 200, to 99% confidence) —
    * the returned value's true rank is within ±ε·n of p·n, which
    * SketchesSpec pins against exact per-window sorts. Output per
    * observed day: the trailing-window n and one column per requested
    * quantile. */
  def slidingSketchQuantiles(df: DataFrame, tsCol: String, valueCol: String,
                             windowDays: Int = 7, k: Int = 200,
                             probs: Seq[Double] = Seq(0.5, 0.95, 0.99)): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1, got $windowDays")
    require(probs.nonEmpty && probs.forall(p => p > 0.0 && p <= 1.0),
      s"probs must be in (0,1], got $probs")
    import org.apache.datasketches.kll.KllDoublesSketch
    import org.apache.datasketches.memory.Memory
    val mergeQuantiles = udf { (sks: Seq[Array[Byte]]) =>
      val s = KllDoublesSketch.newHeapInstance(k)
      sks.foreach(b => s.merge(KllDoublesSketch.heapify(Memory.wrap(b))))
      s.getN.toDouble +: probs.map(p => s.getQuantile(p,
        org.apache.datasketches.quantilescommon.QuantileSearchCriteria.INCLUSIVE))
    }
    val daily = dailyKllSketches(df, tsCol, valueCol, k)
      .withColumn("day", col("day").cast("date"))
      .localCheckpoint()
    val days = daily.select(col("day").as("win_day")).distinct()
    val merged = daily
      .select(col("day"), col("sk"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"))
      .select(date_add(col("day"), col("off")).as("win_day"), col("sk"))
      .join(broadcast(days), "win_day")
      .groupBy(col("win_day"))
      .agg(mergeQuantiles(collect_list(col("sk"))).as("q"))
    val qCols = probs.zipWithIndex.map { case (p, i) =>
      col("q").getItem(i + 1).as(s"p${(p * 100).round}")
    }
    merged.select(Seq(col("win_day").as("day"),
      col("q").getItem(0).cast("long").as("n")) ++ qCols: _*)
  }

  /** Week-over-week retained users via THETA sketches — the set
    * operation HLL cannot do: HLL unions but never intersects, theta
    * keeps the k smallest value hashes (a deterministic function of
    * the SET — partitioning- and order-invariant, spec-pinned) so
    * |A ∩ B| has a first-class estimator. Per-week sketches build
    * partition-locally and merge; consecutive weeks pair by a lag
    * over the tiny weeks frame (the single-partition window is
    * deliberate — the frame is |weeks| rows). Below k entries the
    * sketch is in exact mode, so small-cardinality estimates are
    * exact integers. */
  def weeklyRetention(df: DataFrame, tsCol: String, userCol: String,
                      lgK: Int = 12): DataFrame = {
    import org.apache.datasketches.memory.Memory
    import org.apache.datasketches.theta.{SetOperation, Sketches => TSketches, UpdateSketch}
    val spark = df.sparkSession
    import spark.implicits._
    val weeklyParts = df
      .select(date_trunc("week", col(tsCol)).cast("date").cast("string").as("week"),
              col(userCol).cast("string").as("u"))
      .as[(String, String)]
      .mapPartitions { it =>
        val m = scala.collection.mutable.HashMap.empty[String, UpdateSketch]
        it.foreach { case (w, u) =>
          m.getOrElseUpdate(w,
            UpdateSketch.builder().setLogNominalEntries(lgK).build()).update(u)
        }
        m.iterator.map { case (w, s) => (w, s.compact().toByteArray) }
      }.toDF("week", "sk")
    val mergeTheta = udf { (sks: Seq[Array[Byte]]) =>
      val u = SetOperation.builder().setLogNominalEntries(lgK).buildUnion()
      sks.foreach(b => u.union(TSketches.heapifyCompactSketch(Memory.wrap(b))))
      u.getResult().toByteArray
    }
    val retained = udf { (cur: Array[Byte], prev: Array[Byte]) =>
      val i = SetOperation.builder().setLogNominalEntries(lgK).buildIntersection()
      i.intersect(TSketches.heapifyCompactSketch(Memory.wrap(cur)))
      i.intersect(TSketches.heapifyCompactSketch(Memory.wrap(prev)))
      i.getResult().getEstimate
    }
    val estimate = udf { (b: Array[Byte]) =>
      TSketches.heapifyCompactSketch(Memory.wrap(b)).getEstimate
    }
    val weekly = weeklyParts.groupBy(col("week"))
      .agg(mergeTheta(collect_list(col("sk"))).as("sk"))
      .withColumn("week", col("week").cast("date"))
    // |weeks| rows: the unpartitioned lag is the deliberate tiny frame
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(datediff(col("week"), col("week"))).orderBy(col("week"))
    weekly
      .withColumn("prev_week", lag(col("week"), 1).over(w))
      .withColumn("prev_sk", lag(col("sk"), 1).over(w))
      .filter(col("prev_sk").isNotNull && datediff(col("week"), col("prev_week")) === 7)
      .select(col("week"), col("prev_week"),
        round(estimate(col("sk"))).cast("long").as("active_est"),
        round(estimate(col("prev_sk"))).cast("long").as("prev_active_est"),
        round(retained(col("sk"), col("prev_sk"))).cast("long").as("retained_est"))
  }

  /** Build a count-min sketch over `valueCol` in one aggregate pass.
    * The returned bytes are a storable artifact (like the bloom
    * filter): ship it anywhere and answer frequency queries without
    * touching the data again.
    *
    * The column is cast to STRING before sketching so the build side
    * and [[estimateCounts]]'s string probes hash identically — a
    * native-typed build (longs hash as longs) would make every string
    * probe silently read unrelated counters and return ~0 for a
    * genuinely heavy item. */
  def countMinSketch(df: DataFrame, valueCol: String,
                     eps: Double = 0.001, confidence: Double = 0.99,
                     seed: Int = 42): Array[Byte] =
    df.select(count_min_sketch(col(valueCol).cast("string"),
        lit(eps), lit(confidence), lit(seed)).as("cms"))
      .head().getAs[Array[Byte]]("cms")

  /** Estimate occurrence counts for `items` against a built sketch —
    * a driver-side probe of the artifact (the sketch IS driver-sized,
    * like a broadcast). */
  def estimateCounts(sketch: Array[Byte], items: Seq[String]): Map[String, Long] = {
    val cms = org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketch))
    items.map(i => i -> cms.estimateCount(i)).toMap
  }

  /** The composed over-representation guard: flag every item whose
    * CMS-estimated share of `total` exceeds `maxShare`. Never misses a
    * truly over-represented item (CMS never undercounts); flagged
    * items get their exact count from a candidates-only aggregate —
    * the same screen-then-verify funnel as the bloom dedup. */
  def overrepresented(df: DataFrame, valueCol: String, total: Long,
                      candidates: Seq[String], maxShare: Double,
                      eps: Double = 0.001): DataFrame = {
    val sketch = countMinSketch(df, valueCol, eps)
    val flagged = estimateCounts(sketch, candidates)
      .filter { case (_, est) => est.toDouble / total > maxShare }
    val spark = df.sparkSession
    import spark.implicits._
    val flaggedDf = flagged.toSeq.toDF(valueCol, "est_count")
    // string-cast the data side too: the sketch, the probes, and this
    // verify join all speak the same representation
    df.withColumn(valueCol, col(valueCol).cast("string"))
      .join(broadcast(flaggedDf), valueCol)
      .groupBy(col(valueCol))
      .agg(first(col("est_count")).as("est_count"),
           count(lit(1)).as("exact_count"))
  }

  // ---- sketch-valued materialized view (the MV plane's third member:
  // qi01 merges exact monoids, qi02 handles retractions, this one
  // maintains DISTINCT COUNTS — the aggregate with no exact monoid —
  // by storing the HLL sketch itself as the MV column) ----

  /** Per-key distinct-count MV: `(keys..., sk binary, n_rows)`. The
    * sketch IS the maintainable state: row counts add, registers max.
    * Distinct counts have no bounded exact merge state (qi01's +/min/
    * max monoids don't apply; exact re-distinct rescans history), so
    * the 100 TB MV stores the mergeable sketch and accepts the HLL
    * error contract — refreshes touch ONLY the delta. */
  def buildDistinctMv(rows: DataFrame, keyCols: Seq[String], valueCol: String,
                      lgK: Int = 12): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    rows.groupBy(keyCols.map(col): _*)
      .agg(expr(s"hll_sketch_agg($valueCol, $lgK)").as("sk"),
           count(lit(1)).as("n_rows"))
  }

  /** Fold a delta MV into the standing MV: union + one per-key
    * `hll_union_agg` / sum — new keys appear, existing keys' registers
    * merge. Append-only contract (sketches can't retract; a deletion
    * workload belongs to qi02's exact plane or a rebuild). */
  def mergeDistinctMv(standing: DataFrame, delta: DataFrame,
                      keyCols: Seq[String]): DataFrame =
    standing.unionByName(delta)
      .groupBy(keyCols.map(col): _*)
      .agg(expr("hll_union_agg(sk)").as("sk"),
           sum(col("n_rows")).as("n_rows"))

  /** Serve the MV: per-key estimated distinct count + exact row count. */
  def readDistinctMv(mv: DataFrame, keyCols: Seq[String]): DataFrame =
    mv.select(keyCols.map(col) :+
      round(expr("hll_sketch_estimate(sk)"), 4).as("est_distinct") :+
      col("n_rows"): _*)
}

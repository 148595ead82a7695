package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: each left (probe) row is paired with the most
  * recent right (reference) row whose timestamp is at-or-before the
  * probe's, per key — the temporal join every training-data pipeline
  * needs for "state as of event time" features (e.g. the last page
  * view before a purchase, the model-card revision in force at commit
  * time). The reference has no such operator (SURVEY.md §2.A notes no
  * as-of/interval joins anywhere); Spark has no built-in either, so
  * this is a composed-operator implementation per the custom-operator
  * preference order.
  *
  * Scale design (100 TB): the naive formulation is a range join
  * (`l.key = r.key AND r.ts <= l.ts` + argmax), which Spark plans as an
  * equi join whose output explodes to |matches-per-probe| before a
  * window prunes it — quadratic in dense keys. This implementation is
  * the canonical union-scan shape instead:
  *
  *  1. tag right rows marker=0 and left rows marker=1, union the two
  *     sides (right payload carried as one nullable struct),
  *  2. one window, partitioned by key, ordered by (ts, marker, seq):
  *     `last(right_payload, ignoreNulls)` over unbounded-preceding —
  *     a running "latest reference row seen so far",
  *  3. keep marker=1 rows: each probe holds exactly the latest
  *     at-or-before reference row (marker 0 < 1 makes equal-ts
  *     reference rows visible to same-ts probes).
  *
  * Cost: ONE shuffle of |left|+|right| rows on the key, a sort within
  * partitions, zero row amplification — the same price as a sort-merge
  * join. Per-key data never needs to fit in memory (the window frame is
  * running-last, which Spark evaluates streamingly within the sorted
  * partition). Skewed hot keys are the residual risk, same as any
  * keyed window; AQE does not split window partitions, so a pathological
  * key needs [[asOfBackwardSalted]], which splits each key's timeline
  * into quantile-bounded salt ranges and merges per-salt running-lasts
  * with a boundary carry-in.
  *
  * Internal columns are double-underscore-prefixed and the output
  * attaches `asof_<col>` names; both namespaces are asserted free on
  * the inputs rather than silently colliding.
  */
object AsOfJoin {

  /** names the construction claims for itself on the union frame */
  private val Reserved = Seq("__ts", "__tsd", "__m", "__m2", "__seq", "__ref",
                             "__match", "__salt", "__lastref", "__carry", "__best")

  private def checkNames(left: DataFrame, right: DataFrame, rightCols: Seq[String]): Unit = {
    val clash = (left.columns ++ right.columns).filter(Reserved.contains)
    require(clash.isEmpty,
      s"input columns collide with as-of internals: ${clash.mkString(", ")}")
    val outClash = rightCols.map("asof_" + _).filter(left.columns.contains)
    require(outClash.isEmpty,
      s"left columns collide with as-of output names: ${outClash.mkString(", ")}")
  }

  private def tagged(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String, rightSeq: String,
                     rightCols: Seq[String]): (DataFrame, Seq[String]) = {
    checkNames(left, right, rightCols)
    val leftFields = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)

    // the tie-break keeps rightSeq's NATIVE type (numeric seqs order
    // numerically, not "9" > "10"); probe rows carry a typed null —
    // ordering between probe and reference rows is decided by __m, so
    // the null's sort position is irrelevant
    val rCols: Seq[Column] =
      Seq(col(key), col(rightTs).as("__ts"), lit(0).as("__m"),
          col(rightSeq).as("__seq"), payload.as("__ref")) ++
        leftFields.filterNot(_ == key)
          .map(f => lit(null).cast(left.schema(f).dataType).as(f))
    val r = right.select(rCols: _*)

    val lCols: Seq[Column] =
      Seq(col(key), col(leftTs).as("__ts"), lit(1).as("__m"),
          lit(null).cast(right.schema(rightSeq).dataType).as("__seq"),
          lit(null).cast(r.schema("__ref").dataType).as("__ref")) ++
        leftFields.filterNot(_ == key).map(col)
    val l = left.select(lCols: _*)

    (r.unionByName(l), leftFields)
  }

  private def pickMatches(union: DataFrame, key: String, w: org.apache.spark.sql.expressions.WindowSpec,
                          leftFields: Seq[String], rightCols: Seq[String]): DataFrame =
    union
      .withColumn("__match", last(col("__ref"), ignoreNulls = true).over(w))
      .filter(col("__m") === 1)
      .select(leftFields.map(col) ++
        rightCols.map(c => col(s"__match.$c").as(s"asof_$c")): _*)

  /** @param left      probe side
    * @param right     reference side
    * @param key       equi-join column name (present on both sides)
    * @param leftTs    probe-time column on `left`
    * @param rightTs   reference-time column on `right`
    * @param rightSeq  total-order tie-break on the reference side: among
    *                  equal (key, ts) reference rows the one sorting
    *                  LAST by this column wins (deterministic argmax)
    * @param rightCols reference payload columns to attach to each probe
    *                  row (null when no reference row is at-or-before)
    * @return `left` columns + `rightCols` (each aliased `asof_<name>`)
    */
  def asOfBackward(left: DataFrame, right: DataFrame, key: String,
                   leftTs: String, rightTs: String, rightSeq: String,
                   rightCols: Seq[String]): DataFrame = {
    val (union, leftFields) = tagged(left, right, key, leftTs, rightTs, rightSeq, rightCols)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").asc, col("__m").asc, col("__seq").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pickMatches(union, key, w, leftFields, rightCols)
  }

  /** Forward as-of: earliest reference row at-or-after the probe — the
    * mirror image (time order reversed). At equal ts the reference is
    * still visible to the probe (marker asc); `__seq` DESC under the
    * descending time scan makes the smallest-seq reference the last one
    * seen, i.e. the winner — the deterministic "first by seq" argmin. */
  def asOfForward(left: DataFrame, right: DataFrame, key: String,
                  leftTs: String, rightTs: String, rightSeq: String,
                  rightCols: Seq[String]): DataFrame = {
    val (union, leftFields) = tagged(left, right, key, leftTs, rightTs, rightSeq, rightCols)
    val w = Window.partitionBy(col(key))
      .orderBy(col("__ts").desc, col("__m").asc, col("__seq").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    pickMatches(union, key, w, leftFields, rightCols)
  }

  /** Nearest as-of: the reference closest in time on EITHER side of
    * the probe — sensor alignment / attribution semantics where
    * "just after" beats "long before". Composed as the backward and
    * forward union-scans joined on the probe's unique id (two
    * one-exchange passes — still never a range join), with a
    * scan-local winner pick over each match's carried epoch-ms:
    * backward wins distance ties (the earlier reference — the
    * deterministic convention), and each side keeps its own
    * equal-ts tie rule (backward: max `rightSeq`; forward: min).
    * `probeId` must be unique per probe row — it is the join identity
    * between the two passes. */
  def asOfNearest(left: DataFrame, right: DataFrame, key: String, probeId: String,
                  leftTs: String, rightTs: String, rightSeq: String,
                  rightCols: Seq[String], rightMs: String,
                  leftMsCol: String): DataFrame = {
    require(rightCols.contains(rightMs),
      s"rightMs '$rightMs' must be one of rightCols so each match carries its timestamp")
    require(left.columns.contains(leftMsCol),
      s"left must carry its probe epoch-ms in '$leftMsCol'")
    val b = asOfBackward(left, right, key, leftTs, rightTs, rightSeq, rightCols)
    val fwdAll = asOfForward(left, right, key, leftTs, rightTs, rightSeq, rightCols)
    val f = rightCols.foldLeft(
        fwdAll.select((probeId +: rightCols.map("asof_" + _)).map(col): _*)) {
      (df, c) => df.withColumnRenamed(s"asof_$c", s"__fwd_$c")
    }
    val bMs = col(s"asof_$rightMs")
    val fMs = col(s"__fwd_$rightMs")
    val pMs = col(leftMsCol)
    val useB = fMs.isNull || (bMs.isNotNull && (pMs - bMs) <= (fMs - pMs))
    val outCols = b.columns.filterNot(_.startsWith("asof_")).toSeq.map(col) ++
      rightCols.map(c =>
        when(useB, col(s"asof_$c")).otherwise(col(s"__fwd_$c")).as(s"asof_$c"))
    b.join(f, Seq(probeId)).select(outCols: _*)
  }

  /** Tolerance-bounded backward as-of — the feature-store staleness
    * contract ("a feature older than X at serving time is as good as
    * missing"): [[asOfBackward]] whose attached columns all null out
    * when the matched reference is older than `toleranceMs` at probe
    * time. A pure post-projection: the match carries its own epoch-ms
    * via `rightMs` (one of `rightCols`, the caller's `unix_millis` of
    * the reference time — the qa01 convention), so the staleness test
    * is scan-local and adds zero shuffles to the one-exchange
    * union-scan shape. Probes with no match at all stay null (the
    * backward join's own semantics). */
  def asOfBackwardTolerant(left: DataFrame, right: DataFrame, key: String,
                           leftTs: String, rightTs: String, rightSeq: String,
                           rightCols: Seq[String], rightMs: String,
                           toleranceMs: Long): DataFrame = {
    require(rightCols.contains(rightMs),
      s"rightMs '$rightMs' must be one of rightCols so the match carries its timestamp")
    require(toleranceMs >= 0, s"toleranceMs must be >= 0, got $toleranceMs")
    val joined = asOfBackward(left, right, key, leftTs, rightTs, rightSeq, rightCols)
    // probe time in epoch-ms: converted when leftTs is a timestamp,
    // taken as already-ms when numeric (the fixture/long-ts shape)
    val probeMs =
      if (joined.schema(leftTs).dataType == org.apache.spark.sql.types.TimestampType)
        unix_millis(col(leftTs))
      else col(leftTs).cast("long")
    val fresh = col(s"asof_$rightMs").isNotNull &&
      probeMs - col(s"asof_$rightMs") <= toleranceMs
    rightCols.foldLeft(joined) { (df, c) =>
      df.withColumn(s"asof_$c", when(fresh, col(s"asof_$c"))) }
  }

  /** Skew-safe backward as-of: identical results to [[asOfBackward]],
    * but each key's timeline is split into `salts` quantile-bounded
    * time ranges so no single task ever sorts a whole hot key.
    *
    *  1. salt = time-range bucket of `__ts` (global approx quantiles —
    *     a stats-only driver fetch of `salts-1` doubles; bucket quality
    *     affects balance, never correctness),
    *  2. the running-last window runs per (key, salt) — hot keys now
    *     spread over `salts` tasks,
    *  3. a probe whose salt holds no at-or-before reference takes the
    *     boundary carry-in: the overall last reference among its key's
    *     STRICTLY earlier salts. Carry-ins come from the same
    *     union-scan trick one level up: per-(key, salt) top reference
    *     rows (`max_by` over (ts, seq)) unioned with the probe salt
    *     domain, probes ordered BEFORE same-salt tops, one running-last
    *     over salts — so the frame can never leak a same-salt
    *     reference that sits later than the probe's own timestamp.
    *
    * Equal timestamps always bucket identically (salting is a pure
    * function of ts), so the inclusive at-or-same-ts semantics and the
    * seq tie-break are preserved bit-for-bit. Null-ts probes bucket to
    * salt 0 where no carry-in exists — matching the unsalted
    * nulls-first scan, which sees no reference either.
    *
    * Cost vs unsalted: same one big shuffle (now on (key, salt)), plus
    * two small artifacts — the per-(key, salt) tops aggregate and a
    * (key, salt)-keyed join of carry-ins back onto probe rows (the big
    * side is already partitioned by (key, salt); the carry side has at
    * most |keys|×salts rows). */
  def asOfBackwardSalted(left: DataFrame, right: DataFrame, key: String,
                         leftTs: String, rightTs: String, rightSeq: String,
                         rightCols: Seq[String], salts: Int = 16,
                         quantileRelErr: Double = 0.01): DataFrame =
    salted(left, right, key, leftTs, rightTs, rightSeq, rightCols, salts,
      quantileRelErr, forward = false)

  /** [[asOfForward]]'s skew-safe twin: identical mechanics mirrored in
    * time — the per-salt scan runs ts-descending, the per-(key, salt)
    * top is the argmin over (ts, seq), and the boundary carry-in flows
    * from strictly LATER salts. */
  def asOfForwardSalted(left: DataFrame, right: DataFrame, key: String,
                        leftTs: String, rightTs: String, rightSeq: String,
                        rightCols: Seq[String], salts: Int = 16,
                        quantileRelErr: Double = 0.01): DataFrame =
    salted(left, right, key, leftTs, rightTs, rightSeq, rightCols, salts,
      quantileRelErr, forward = true)

  private def salted(left: DataFrame, right: DataFrame, key: String,
                     leftTs: String, rightTs: String, rightSeq: String,
                     rightCols: Seq[String], salts: Int,
                     quantileRelErr: Double, forward: Boolean): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val (union0, leftFields) = tagged(left, right, key, leftTs, rightTs, rightSeq, rightCols)
    // materialize the tagged union ONCE: the quantile action plus the
    // three downstream subtrees (per-salt window, tops aggregate,
    // probe-salt domain) would otherwise each re-run both inputs'
    // upstream scans — 4x the cost at exactly the scale this variant
    // exists for. localCheckpoint also truncates the lineage, same as
    // the iterative operators.
    val union = union0.withColumn("__tsd", col("__ts").cast("double"))
      .localCheckpoint(true)
    val bounds =
      if (salts == 1) Array.empty[Double]
      else union.filter(col("__tsd").isNotNull)
        .stat.approxQuantile("__tsd", (1 until salts).map(_.toDouble / salts).toArray,
          quantileRelErr)
    val saltExpr = bounds.zipWithIndex
      .foldLeft(when(col("__tsd").isNull, 0)) { case (acc, (b, i)) =>
        acc.when(col("__tsd") <= b, i)
      }
      .otherwise(salts - 1)
    val saltedU = union.withColumn("__salt", saltExpr).drop("__tsd")

    val w1 = Window.partitionBy(col(key), col("__salt"))
      .orderBy(
        (if (forward) col("__ts").desc else col("__ts").asc),
        col("__m").asc,
        (if (forward) col("__seq").desc else col("__seq").asc))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = saltedU.withColumn("__match", last(col("__ref"), ignoreNulls = true).over(w1))

    // per-(key, salt) overall top reference: argmax over (ts, seq) for
    // backward, argmin for forward
    val topAgg = if (forward) min_by(col("__ref"), struct(col("__ts"), col("__seq")))
                 else max_by(col("__ref"), struct(col("__ts"), col("__seq")))
    val tops = saltedU.filter(col("__m") === 0)
      .groupBy(col(key), col("__salt"))
      .agg(topAgg.as("__lastref"))
    val probeSalts = saltedU.filter(col("__m") === 1)
      .select(col(key), col("__salt")).distinct()
    val dom = tops
      .select(col(key), col("__salt"), lit(1).as("__m2"), col("__lastref"))
      .unionByName(probeSalts
        .select(col(key), col("__salt"), lit(0).as("__m2"),
          lit(null).cast(tops.schema("__lastref").dataType).as("__lastref")))
    // carry flows from strictly earlier salts (backward) or strictly
    // later ones (forward); probes order before same-salt tops either way
    val w2 = Window.partitionBy(col(key))
      .orderBy(
        (if (forward) col("__salt").desc else col("__salt").asc),
        col("__m2").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carry = dom
      .withColumn("__carry", last(col("__lastref"), ignoreNulls = true).over(w2))
      .filter(col("__m2") === 0)
      .select(col(key), col("__salt"), col("__carry"))

    local.filter(col("__m") === 1)
      .join(carry, Seq(key, "__salt"), "left")
      .withColumn("__best", coalesce(col("__match"), col("__carry")))
      .select(leftFields.map(col) ++
        rightCols.map(c => col(s"__best.$c").as(s"asof_$c")): _*)
  }
}

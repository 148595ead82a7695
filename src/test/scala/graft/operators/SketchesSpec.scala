package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

/** Pins the error CONTRACTS of the sketch family against exact twins
  * (bit-exact cross-engine oracles are impossible for sketches — the
  * contract IS the semantics). */
class SketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("HLL++ per-key cardinalities land within 3*rsd of exact") {
    val t = Tables(spark, sf0001)
    val exact = t.documents.groupBy($"lang")
      .agg(countDistinct($"doc_id").as("n")).as[(String, Long)].collect().toMap
    val approx = Sketches.approxDistinctPerKey(t.documents, "lang", "doc_id", rsd = 0.05)
      .as[(String, Long)].collect().toMap
    assert(approx.keySet == exact.keySet)
    approx.foreach { case (k, a) =>
      val e = exact(k)
      assert(math.abs(a - e).toDouble / e <= 0.15, s"$k: approx $a vs exact $e")
    }
  }


  test("sketch MV: incremental merge equals the full recompute (small-set exact regime)") {
    val day1 = (1 to 40).map(i => ("a", s"u$i")) ++ (1 to 10).map(i => ("b", s"v$i"))
    val day2 = (30 to 70).map(i => ("a", s"u$i")) ++ (1 to 5).map(i => ("c", s"w$i"))
    val d1 = day1.toDF("k", "u"); val d2 = day2.toDF("k", "u")
    val standing = Sketches.buildDistinctMv(d1, Seq("k"), "u")
    val merged = Sketches.mergeDistinctMv(standing, Sketches.buildDistinctMv(d2, Seq("k"), "u"), Seq("k"))
    val full = Sketches.buildDistinctMv(d1.union(d2), Seq("k"), "u")
    val got = Sketches.readDistinctMv(merged, Seq("k"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val want = Sketches.readDistinctMv(full, Seq("k"))
      .as[(String, Double, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === want, "incremental MV diverged from recompute")
    // small cardinalities sit in the sketch's exact regime
    assert(got("a") === ((70.0, 81L)))
    assert(got("b") === ((10.0, 10L)))
    assert(got("c") === ((5.0, 5L)))
  }

  test("sketch MV: ten sequential folds equal one build, estimates within 3*rsd at 20k") {
    val batches = (0 until 10).map(b => (0 until 2000).map(i => ("k", s"user${b * 1800 + i}")).toDF("k", "u"))
    val folded = batches.tail.foldLeft(Sketches.buildDistinctMv(batches.head, Seq("k"), "u")) {
      (mv, b) => Sketches.mergeDistinctMv(mv, Sketches.buildDistinctMv(b, Seq("k"), "u"), Seq("k"))
    }
    val one = Sketches.buildDistinctMv(batches.reduce(_ union _), Seq("k"), "u")
    val fEst = Sketches.readDistinctMv(folded, Seq("k")).as[(String, Double, Long)].head()
    val oEst = Sketches.readDistinctMv(one, Seq("k")).as[(String, Double, Long)].head()
    assert(fEst._3 === 20000L && oEst._3 === 20000L)
    val exact = batches.reduce(_ union _).select("u").distinct().count()
    // lgK=12 -> rsd ~ 1.04/sqrt(4096) ~ 1.6%
    for (est <- Seq(fEst._2, oEst._2))
      assert(math.abs(est - exact) / exact < 0.05, s"est $est vs exact $exact")
  }

  test("CMS never undercounts and overcounts by at most eps * N") {
    val n = 20000
    // zipf-ish: token i appears ~n/(i+1) times
    val rows = (0 until n).map(i => s"tok${i % 50 match {
      case m if m < 5 => m          // 5 heavy tokens
      case m => m
    }}")
    val df = rows.toDF("term")
    val truth = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sketch = Sketches.countMinSketch(df, "term", eps = 0.001, confidence = 0.99)
    val est = Sketches.estimateCounts(sketch, truth.keys.toSeq)
    truth.foreach { case (term, exact) =>
      assert(est(term) >= exact, s"$term undercounted: ${est(term)} < $exact")
      assert(est(term) <= exact + (0.001 * n).ceil.toLong + 1,
        s"$term overcounted beyond eps*N: ${est(term)} vs $exact")
    }
  }

  test("non-string columns sketch and probe consistently (heavy longs are found)") {
    val rows = (0 until 5000).map(_ => 42L) ++ (0L until 5000L)
    val df = rows.toDF("user_id")
    val sketch = Sketches.countMinSketch(df, "user_id")
    // the probe is the string rendering of the long — must hit the
    // same counters the build side incremented
    assert(Sketches.estimateCounts(sketch, Seq("42"))("42") >= 5000L)
    val out = Sketches.overrepresented(df, "user_id", total = rows.size,
        candidates = Seq("42", "17"), maxShare = 0.25)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out == Map("42" -> 5001L)) // 5000 heavy + one from the range
  }

  test("sketch bytes survive a storage round-trip") {
    val df = (0 until 1000).map(i => s"w${i % 10}").toDF("term")
    val sketch = Sketches.countMinSketch(df, "term")
    val p = java.nio.file.Files.createTempFile("graft-cms", ".bin")
    java.nio.file.Files.write(p, sketch)
    val back = java.nio.file.Files.readAllBytes(p)
    assert(Sketches.estimateCounts(back, Seq("w0"))("w0") >= 100L)
  }

  test("overrepresented: screen-then-verify finds every heavy item, exact counts attached") {
    // 10k filler + one term at 30% share
    val rows = (0 until 7000).map(i => s"rare$i") ++ (0 until 3000).map(_ => "heavy")
    val df = rows.toDF("term")
    val out = Sketches.overrepresented(df, "term", total = rows.size,
        candidates = Seq("heavy", "rare0", "absent"), maxShare = 0.1)
      .as[(String, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out.keySet == Set("heavy"))
    assert(out("heavy")._2 == 3000L)          // exact recount on the flagged item
    assert(out("heavy")._1 >= 3000L)          // estimate never under
  }

  test("approx quantiles: every returned value's rank is within n/accuracy of p*n") {
    // two skewed keys: a power-law-ish long tail and a uniform one
    val rows = (1 to 5000).map(i => ("pow", (i.toDouble / 5).toLong * i % 9973)) ++
               (1 to 3000).map(i => ("uni", i.toLong))
    val df = rows.toDF("k", "v")
    val probs = Seq(0.1, 0.5, 0.9, 0.99)
    val accuracy = 100
    val out = Sketches.approxQuantilesPerKey(df, "k", "v", probs, accuracy)
      .as[(String, Seq[Long], Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    val byKey = rows.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    out.foreach { case (k, (qs, n)) =>
      assert(n == byKey(k).size)
      val sortedVals = byKey(k)
      probs.zip(qs).foreach { case (p, q) =>
        // rank bracket of q among the exact sorted values
        val lo = sortedVals.count(_ < q)       // smallest possible rank
        val hi = sortedVals.count(_ <= q)      // largest possible rank
        val target = p * n
        val tol = math.ceil(n.toDouble / accuracy) + 1
        assert(target >= lo - tol && target <= hi + tol,
          s"key=$k p=$p q=$q rank-bracket=[$lo,$hi] target=$target tol=$tol")
      }
    }
  }

  test("approx quantiles: parameter contracts fail loudly") {
    val df = Seq(("a", 1L)).toDF("k", "v")
    intercept[IllegalArgumentException] {
      Sketches.approxQuantilesPerKey(df, "k", "v", Seq(1.5))
    }
    intercept[IllegalArgumentException] {
      Sketches.approxQuantilesPerKey(df, "k", "v", Seq(0.5), accuracy = 0)
    }
  }

  test("sliding KLL quantiles are exact below k and rank-bounded above") {
    import java.sql.Timestamp
    // 3 days x 60 values each: every trailing-3-day window holds < k=200
    // values, so the sketch is still in exact mode and the returned
    // quantile must BE the inclusive order statistic
    val rows = for (d <- 1 to 3; i <- 1 to 60)
      yield (Timestamp.valueOf(f"2024-03-0$d 10:00:00"), (d * 1000 + i).toDouble)
    val df = rows.toDF("ts", "v")
    val got = Sketches.slidingSketchQuantiles(df, "ts", "v", windowDays = 3,
        k = 200, probs = Seq(0.5, 0.95))
      .orderBy($"day").collect()
    assert(got.length == 3)
    def exactInclusive(vs: Seq[Double], p: Double): Double = {
      val s = vs.sorted
      s(math.ceil(p * s.size).toInt - 1)
    }
    // day 3's trailing window covers days 1..3 (exploded forward)
    val win3 = rows.map(_._2)
    val d3 = got.last
    assert(d3.getLong(1) == 180L)
    assert(d3.getDouble(2) == exactInclusive(win3, 0.5))
    assert(d3.getDouble(3) == exactInclusive(win3, 0.95))
    // day 1's window is just day 1
    val win1 = rows.filter(_._2 < 2000).map(_._2)
    assert(got.head.getLong(1) == 60L)
    assert(got.head.getDouble(2) == exactInclusive(win1, 0.5))
  }

  test("sliding KLL quantiles: rank error within 3*eps at corpus scale") {
    import java.sql.Timestamp
    val n = 5000
    val rows = (0 until n).map(i =>
      (Timestamp.valueOf("2024-03-01 10:00:00"), ((i * 2654435761L) % 100000).toDouble))
    val df = rows.toDF("ts", "v").repartition(8)
    val got = Sketches.slidingSketchQuantiles(df, "ts", "v", windowDays = 1,
        k = 200, probs = Seq(0.5, 0.95)).collect().head
    val sorted = rows.map(_._2).sorted
    def rankOf(v: Double): Double = sorted.count(_ <= v).toDouble / n
    // KLL k=200: normalized rank error ~1.65% at 99% confidence; 3x slack
    assert(math.abs(rankOf(got.getDouble(2)) - 0.5) <= 0.05, s"p50 rank ${rankOf(got.getDouble(2))}")
    assert(math.abs(rankOf(got.getDouble(3)) - 0.95) <= 0.05, s"p95 rank ${rankOf(got.getDouble(3))}")
    assert(got.getLong(1) == n.toLong)
  }

  test("theta weekly retention is exact below k and partitioning-invariant") {
    import java.sql.Timestamp
    // week of 2024-03-04 (Mon) and week of 2024-03-11: 40 users, 25 retained
    val w1 = (1 to 40).map(u => (Timestamp.valueOf("2024-03-05 09:00:00"), u.toLong))
    val w2 = (16 to 55).map(u => (Timestamp.valueOf("2024-03-12 09:00:00"), u.toLong))
    val df = (w1 ++ w2).toDF("ts", "user_id")
    val got = Sketches.weeklyRetention(df, "ts", "user_id")
      .select($"active_est", $"prev_active_est", $"retained_est")
      .as[(Long, Long, Long)].collect()
    assert(got.toSeq == Seq((40L, 40L, 25L)))
    val reparted = Sketches.weeklyRetention(df.repartition(7), "ts", "user_id")
      .select($"active_est", $"prev_active_est", $"retained_est")
      .as[(Long, Long, Long)].collect()
    assert(reparted.toSeq == got.toSeq, "theta must be a pure function of the set")
  }

  test("theta weekly retention skips non-consecutive week pairs") {
    import java.sql.Timestamp
    val w1 = (1 to 10).map(u => (Timestamp.valueOf("2024-03-05 09:00:00"), u.toLong))
    val w3 = (1 to 10).map(u => (Timestamp.valueOf("2024-03-19 09:00:00"), u.toLong))
    val got = Sketches.weeklyRetention((w1 ++ w3).toDF("ts", "user_id"),
      "ts", "user_id").collect()
    assert(got.isEmpty, "a 2-week gap is not week-over-week retention")
  }

  test("sliding HLL distinct tracks the exact 7-day distinct within sketch error") {
    val t = graft.Tables(spark, sf0001)
    val exact = graft.queries.PipelineQueries.slidingDistinct(t)
      .select($"day", $"u7").as[(java.sql.Date, Long)].collect()
      .map { case (d, u) => d.toLocalDate -> u }.toMap
    val approx = Sketches.slidingApproxDistinct(t.events, "ts", "user_id")
      .as[(java.sql.Date, Long)].collect()
      .map { case (d, u) => d.toLocalDate -> u }.toMap
    assert(approx.keySet == exact.keySet, "window-day domains must match")
    exact.foreach { case (d, u) =>
      val a = approx(d)
      // lgConfigK=12 → rsd ≈ 1.6%; allow 3σ
      assert(math.abs(a - u) <= math.max(3, (0.05 * u).toLong),
        s"$d: approx $a vs exact $u drifts past sketch error")
    }
  }
}

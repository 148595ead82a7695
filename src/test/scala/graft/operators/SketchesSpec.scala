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

package graft.queries

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.Row

/** Semantics of the monitoring/eval queries (qe07 sliding distinct,
  * qr02 drift report, qs11 retrieval metrics, qd15 intra-doc dedup).
  * The DuckDB oracle pins cell-exactness; these pin the mathematical
  * invariants a refactor must not lose.
  */
class MonitoringEvalSpec extends SparkTestBase {

  private lazy val t = Tables(spark, sf0001)

  test("qe07: u7 dominates u1, ties on the first day, and is subadditive") {
    val rows = PipelineQueries.slidingDistinct(t).collect()
    assert(rows.nonEmpty)
    val byDay = rows.map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
      .sortBy(_._1.toEpochDay)
    byDay.foreach { case (d, u1, u7) =>
      assert(u7 >= u1, s"$d: 7-day distinct $u7 < daily distinct $u1")
      // union bound: the window's distinct can't exceed the sum of the
      // trailing daily distincts
      val windowSum = byDay
        .filter { case (d2, _, _) =>
          !d2.isAfter(d) && !d2.isBefore(d.minusDays(6)) }
        .map(_._2).sum
      assert(u7 <= windowSum, s"$d: $u7 > union bound $windowSum")
    }
    val (d0, u1First, u7First) = byDay.head
    assert(u1First == u7First, s"first day $d0 has no history: $u7First != $u1First")
  }

  test("qd15: keep-first line dedup removes exactly the period-5 repeats") {
    val rows = PipelineQueries.intradocDedup(t).collect()
    assert(rows.length > 0)
    rows.foreach { case Row(id: Long, nLines: Long, nUniq: Long, nRem: Long, md5: String) =>
      assert(nRem == nLines - nUniq, s"doc $id: removed $nRem != $nLines - $nUniq")
      // planted lines cycle with period 5, so the distinct count is
      // exactly min(nLines, 5) (windows of word soup never collide)
      assert(nUniq == math.min(nLines, 5L), s"doc $id: $nUniq unique of $nLines lines")
      assert(md5.length == 32)
    }
    assert(rows.exists(_.getLong(3) > 0), "no doc had a repeated line removed")
  }

  test("qr02: KL total is nonnegative (Gibbs) and counts reconcile") {
    val rows = CurationQueries.driftReport(t).collect()
    val (total, perType) = rows.partition(_.getString(0) == "TOTAL")
    assert(total.length == 1 && perType.nonEmpty)
    val tRow = total.head
    assert(tRow.getDouble(5) >= 0.0, s"KL(first||second) negative: ${tRow.getDouble(5)}")
    assert(tRow.getDouble(6) >= 0.0)
    assert(perType.map(_.getLong(1)).sum == tRow.getLong(1))
    assert(perType.map(_.getLong(2)).sum == tRow.getLong(2))
    val nEvents = t.events.count()
    assert(tRow.getLong(1) + tRow.getLong(2) == nEvents,
      s"halves don't partition the events: ${tRow.getLong(1)} + ${tRow.getLong(2)} != $nEvents")
    perType.foreach { r =>
      assert(math.abs(r.getDouble(3) - r.getLong(1).toDouble / tRow.getLong(1)) < 1e-12)
    }
  }

  test("qp12: no near-dup cluster straddles the split boundary") {
    val rows = PipelineQueries.clusterHoldout(t).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val perCluster = rows.groupBy(_._2).view.mapValues(_.map(_._3).distinct)
    perCluster.foreach { case (c, splits) =>
      assert(splits.length == 1, s"cluster $c split across $splits")
    }
    assert(rows.map(_._3).distinct.sorted.sameElements(Array("test", "train", "val"))
           || rows.map(_._3).distinct.nonEmpty)
    // sanity: at least one multi-member cluster exists, so the property bites
    assert(perCluster.exists { case (c, _) => rows.count(_._2 == c) > 1 },
      "fixture produced no multi-doc cluster — the test is vacuous")
  }

  test("qr03: KS statistic is a valid CDF gap attained at the reported value") {
    val rows = CurationQueries.ksDrift(t).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val ks = r.getDouble(2)
      assert(ks >= 0.0 && ks <= 1.0, s"${r.getString(0)}: KS $ks out of [0,1]")
      assert(r.getLong(1) > 0)
    }
    // recompute one source's KS by brute force
    val docs = t.documents.select("source", "n_chars")
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val src = rows.head.getString(0)
    val mine = docs.filter(_._1 == src).map(_._2).sorted
    val rest = docs.filter(_._1 != src).map(_._2).sorted
    val domain = docs.map(_._2).distinct.sorted
    val brute = domain.map { v =>
      math.abs(mine.count(_ <= v).toDouble / mine.length -
               rest.count(_ <= v).toDouble / rest.length) }.max
    assert(math.abs(rows.head.getDouble(2) - brute) < 1e-12,
      s"$src: reported ${rows.head.getDouble(2)} vs brute $brute")
  }

  test("qp13: the mix is feasible, proportional, and binds on the scarcest source") {
    val rows = CurationQueries.targetMix(t).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
    assert(rows.nonEmpty)
    val shareSum = rows.map(_._3).sum
    assert(math.abs(shareSum - 1.0) < 1e-12, s"target shares sum to $shareSum")
    rows.foreach { case (s, avail, _, budget, rate) =>
      assert(rate <= 1.0 + 1e-12, s"$s upsamples: rate $rate")
      assert(budget <= avail * (1.0 + 1e-12), s"$s takes $budget of $avail")
    }
    // exactly the binding source(s) sit at rate ~1; at least one must
    assert(rows.exists(r => math.abs(r._5 - 1.0) < 1e-9), "no source binds the budget")
    // taken tokens are exactly proportional to the target shares
    val b = rows.map(r => r._4 / r._3).toSeq
    assert(b.max - b.min < 1e-6 * b.max, s"budget not proportional: $b")
  }

  test("qs11: metric ranges hold and the TOTAL row is the macro average") {
    val rows = RetrievalQueries.retrievalMetrics(t).collect()
    val (total, perQ) = rows.partition(_.getLong(0) == -1L)
    assert(total.length == 1 && perQ.length == 10)
    perQ.foreach { r =>
      val rr = r.getDouble(3); val p10 = r.getDouble(4); val nRel = r.getLong(5)
      assert(rr >= 0.0 && rr <= 1.0)
      assert(p10 >= 0.0 && p10 <= 1.0 && nRel >= 0 && nRel <= 10)
      if (nRel > 0) {
        val first = r.getLong(2)
        assert(first >= 1 && first <= 10, s"first_rel_rank $first out of top-10")
        assert(math.abs(rr - BigDecimal(1.0 / first)
          .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
      } else assert(r.isNullAt(2) && rr == 0.0)
    }
    val mrr = total.head.getDouble(3)
    assert(math.abs(mrr - perQ.map(_.getDouble(3)).sum / 10.0) < 1e-9,
      s"TOTAL MRR $mrr != macro average")
    assert(math.abs(total.head.getDouble(4) - perQ.map(_.getLong(5)).sum / 100.0) < 1e-12)
  }
}

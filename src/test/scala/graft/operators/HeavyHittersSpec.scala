package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HeavyHittersSpec extends SparkTestBase {
  import spark.implicits._

  // 3 heavy items + a long tail: heavy shares ~ 30/10/5%, tail of 2000
  // distinct singletons (vocab >> capacity, so Misra–Gries must evict)
  private def longTail(): Seq[String] = {
    val heavy = Seq.fill(300)("alpha") ++ Seq.fill(100)("beta") ++ Seq.fill(50)("gamma")
    val tail = (0 until 550).map(i => s"tail_$i")
    // deterministic interleave so heavy items are spread across the
    // stream (the adversarial order for counter-based summaries)
    val mixed = (heavy zip tail).flatMap { case (h, t0) => Seq(h, t0) } ++
      heavy.drop(550) ++ tail.drop(450)
    mixed
  }

  test("exactFrequent matches the brute-force census exactly") {
    val df = longTail().toDF("item")
    val got = HeavyHitters.exactFrequent(df, "item", denom = 20, capacity = 32)
      .orderBy($"cnt".desc, $"item").as[(String, Long, Double)].collect().toSeq
    val n = df.count()
    val want = df.groupBy($"item").agg(count(lit(1)).as("cnt"))
      .filter($"cnt" * 20 >= n)
      .select($"item", $"cnt",
        round($"cnt".cast("double") / lit(n.toDouble), 6).as("share"))
      .orderBy($"cnt".desc, $"item").as[(String, Long, Double)].collect().toSeq
    assert(got == want)
    assert(got.map(_._1) == Seq("alpha", "beta", "gamma"))
  }

  test("output is partitioning-invariant even though the MG summaries are not") {
    val df = longTail().toDF("item")
    val a = HeavyHitters.exactFrequent(df.repartition(1), "item", denom = 20, capacity = 32)
      .orderBy($"item").collect().toSeq
    val b = HeavyHitters.exactFrequent(df.repartition(17), "item", denom = 20, capacity = 32)
      .orderBy($"item").collect().toSeq
    assert(a == b)
  }

  test("misraGries per-partition pass: bounded counters, superset of local heavies") {
    val stream = longTail()
    val out = HeavyHitters.misraGries(stream.iterator, capacity = 32).toSeq
    val np = out.collect { case (None, Some(n)) => n }
    assert(np == Seq(stream.size.toLong))
    val cands = out.collect { case (Some(k), None) => k }.toSet
    assert(cands.size <= 32)
    // local survival bound: count > n/(capacity+1) must survive
    val bound = stream.size.toDouble / 33
    val localCounts = stream.groupBy(identity).view.mapValues(_.size)
    localCounts.filter(_._2 > bound).keys.foreach(k =>
      assert(cands.contains(k), s"heavy '$k' evicted"))
  }

  test("guardrails: denom >= 2 and the capacity/denom superset precondition") {
    val df = Seq("a").toDF("item")
    intercept[IllegalArgumentException](
      HeavyHitters.exactFrequent(df, "item", denom = 1, capacity = 256))
    intercept[IllegalArgumentException](
      HeavyHitters.exactFrequent(df, "item", denom = 200, capacity = 64))
    // boundary: capacity+1 == denom is NOT enough (pigeonhole must be
    // strict because MG's undercount bound and the final filter are
    // both inclusive) — the guard rejects it
    intercept[IllegalArgumentException](
      HeavyHitters.exactFrequent(df, "item", denom = 65, capacity = 64))
    // capacity == denom (capacity+1 > denom strictly) is accepted
    assert(HeavyHitters.exactFrequent(df, "item", denom = 64, capacity = 64)
      .count() >= 0L)
  }

  test("boundary heavy hitter with count exactly N/denom is found") {
    // 100 rows, denom=10 → threshold 10; 'hot' appears exactly 10 times
    val rows = Seq.fill(10)("hot") ++ (0 until 90).map(i => s"u$i")
    val df = rows.toDF("item").repartition(9)
    val got = HeavyHitters.exactFrequent(df, "item", denom = 10, capacity = 32)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == Map("hot" -> 10L), s"boundary hitter missed: $got")
  }

  test("uniform data below threshold returns the empty set, not an error") {
    val df = (0 until 500).map(i => s"u$i").toDF("item")
    assert(HeavyHitters.exactFrequent(df, "item", denom = 100, capacity = 128).count() == 0L)
  }
}

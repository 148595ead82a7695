package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite with SparkTestBase {

  import spark.implicits._

  // reference (right): (key, ts, payload id)
  private def refs = Seq(
    ("u1", 100L, 10L), ("u1", 200L, 11L), ("u1", 300L, 12L),
    ("u2", 150L, 20L)
  ).toDF("user_id", "r_ts", "ref_id")

  // probes (left): (key, ts, probe id)
  private def probes = Seq(
    ("u1", 50L, 1L),   // before any ref -> null
    ("u1", 200L, 2L),  // equal ts -> inclusive match 11
    ("u1", 250L, 3L),  // between 200 and 300 -> 11
    ("u1", 999L, 4L),  // after all -> 12
    ("u2", 149L, 5L),  // before u2's only ref -> null
    ("u3", 500L, 6L)   // key with no refs at all -> null
  ).toDF("user_id", "p_ts", "probe_id")

  private def runBackward: Map[Long, (Option[Any], Option[Any])] = AsOfJoin
    .asOfBackward(probes, refs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id", "r_ts"))
    .select($"probe_id", $"asof_ref_id", $"asof_r_ts")
    .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap

  test("backward as-of: latest at-or-before per key, null when none") {
    val m = runBackward
    assert(m(1L) === ((None, None)))
    assert(m(2L) === ((Some(11L), Some(200L))))
    assert(m(3L) === ((Some(11L), Some(200L))))
    assert(m(4L) === ((Some(12L), Some(300L))))
    assert(m(5L) === ((None, None)))
    assert(m(6L) === ((None, None)))
  }

  test("forward as-of: earliest at-or-after per key") {
    val m = AsOfJoin
      .asOfForward(probes, refs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"))
      .select($"probe_id", $"asof_ref_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(m(1L) === Some(10L)) // first ref after ts=50
    assert(m(2L) === Some(11L)) // equal ts inclusive
    assert(m(3L) === Some(12L))
    assert(m(4L) === None)      // nothing after ts=999
    assert(m(5L) === Some(20L))
    assert(m(6L) === None)
  }

  test("tolerant backward as-of nulls stale matches, keeps fresh ones, leaves misses null") {
    // refs carry their own ms (the r_ts fixture values ARE ms)
    val refsMs = refs.withColumn("ref_ms", $"r_ts")
    val m = AsOfJoin.asOfBackwardTolerant(probes, refsMs, "user_id",
        "p_ts", "r_ts", "ref_id", Seq("ref_id", "ref_ms"),
        rightMs = "ref_ms", toleranceMs = 60L)
      .select($"probe_id", $"asof_ref_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(m(1L) === None)           // no match at all
    assert(m(2L) === Some(11L))      // equal ts: age 0 <= 60
    assert(m(3L) === Some(11L))      // age 50 <= 60
    assert(m(4L) === None)           // age 699 > 60: match nulled
    assert(m(5L) === None && m(6L) === None)
    // zero tolerance keeps only exact-ts matches
    val z = AsOfJoin.asOfBackwardTolerant(probes, refsMs, "user_id",
        "p_ts", "r_ts", "ref_id", Seq("ref_id", "ref_ms"),
        rightMs = "ref_ms", toleranceMs = 0L)
      .select($"probe_id", $"asof_ref_id")
      .collect().map(r => (r.getLong(0), Option(r.get(1)))).toMap
    assert(z(2L) === Some(11L) && z(3L) === None && z(4L) === None)
    // contracts fail loudly
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackwardTolerant(probes, refsMs, "user_id", "p_ts", "r_ts",
        "ref_id", Seq("ref_id"), rightMs = "ref_ms", toleranceMs = 60L)
    }
  }

  test("nearest as-of: closest side wins, backward breaks exact ties, one-sided falls through") {
    // probes carry their own ms (the operator contract)
    val p = probes.withColumn("p_ms", $"p_ts")
    val r = refs.withColumn("r_ms", $"r_ts")
    val m = AsOfJoin.asOfNearest(p, r, key = "user_id", probeId = "probe_id",
        leftTs = "p_ts", rightTs = "r_ts", rightSeq = "ref_id",
        rightCols = Seq("ref_id", "r_ms"), rightMs = "r_ms", leftMsCol = "p_ms")
      .select($"probe_id", $"asof_ref_id")
      .collect().map(x => x.getLong(0) -> Option(x.get(1))).toMap
    assert(m(1L) === Some(10L)) // 50: nothing before, forward to 100
    assert(m(2L) === Some(11L)) // exact hit at 200
    assert(m(3L) === Some(11L)) // 250: |250-200| == |300-250| -> backward wins the tie
    assert(m(4L) === Some(12L)) // 999: after all, backward 300
    assert(m(5L) === Some(20L)) // 149: forward to 150 (backward empty)
    assert(m(6L) === None)      // no refs for the key at all
  }

  test("nearest as-of: strictly closer forward beats a much older backward") {
    val p = Seq(("u1", 290L, 1L)).toDF("user_id", "p_ts", "probe_id")
      .withColumn("p_ms", $"p_ts")
    val r = refs.withColumn("r_ms", $"r_ts")
    val got = AsOfJoin.asOfNearest(p, r, "user_id", "probe_id",
        "p_ts", "r_ts", "ref_id", Seq("ref_id", "r_ms"), "r_ms", "p_ms")
      .select($"asof_ref_id").as[Long].head()
    assert(got == 12L) // 300 is 10 away; 200 is 90 away
  }

  test("equal-ts reference ties resolve by seq in its NATIVE order (max for backward)") {
    // 9 vs 10: numeric order (10 wins backward) diverges from string
    // order ("9" > "10") — pins that the tie-break is typed
    val dupRefs = Seq(("u1", 100L, 7L), ("u1", 100L, 9L), ("u1", 100L, 10L))
      .toDF("user_id", "r_ts", "ref_id")
    val p = Seq(("u1", 100L, 1L)).toDF("user_id", "p_ts", "probe_id")
    val got = AsOfJoin
      .asOfBackward(p, dupRefs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"))
      .select($"asof_ref_id").collect().head.getLong(0)
    assert(got === 10L) // numeric max, not string-max "9"
    val fwd = AsOfJoin
      .asOfForward(p, dupRefs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"))
      .select($"asof_ref_id").collect().head.getLong(0)
    assert(fwd === 7L) // numeric min for forward
  }

  test("reserved internal and output names are rejected, not silently clobbered") {
    val badLeft = probes.withColumn("__ts", lit(1))
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackward(badLeft, refs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"))
    }
    val clashOut = probes.withColumn("asof_ref_id", lit(1))
    intercept[IllegalArgumentException] {
      AsOfJoin.asOfBackward(clashOut, refs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"))
    }
  }

  test("result is shuffle-invariant (repartitioned inputs, same rows)") {
    val shuffledL = probes.repartition(7, $"probe_id")
    val shuffledR = refs.repartition(5, $"ref_id")
    val again: Map[Long, (Option[Any], Option[Any])] = AsOfJoin
      .asOfBackward(shuffledL, shuffledR, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id", "r_ts"))
      .select($"probe_id", $"asof_ref_id", $"asof_r_ts")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(again === runBackward)
  }

  test("salted as-of matches unsalted exactly on the mixed fixture") {
    val unsalted = runBackward
    for (s <- Seq(1, 3, 8)) {
      val got: Map[Long, (Option[Any], Option[Any])] = AsOfJoin
        .asOfBackwardSalted(probes, refs, "user_id", "p_ts", "r_ts", "ref_id",
          Seq("ref_id", "r_ts"), salts = s)
        .select($"probe_id", $"asof_ref_id", $"asof_r_ts")
        .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
      assert(got === unsalted, s"salts=$s diverged")
    }
  }

  test("salted as-of on one pathological hot key matches unsalted exactly") {
    // one key owns every row: 4000 probes, 900 refs, colliding ts values
    // (so same-ts tie-breaks, cross-salt carry-ins, and empty-salt gaps
    // all occur), plus equal-ts probe/ref pairs for inclusivity
    val hotRefs = (0 until 900)
      .map(i => ("hot", (i * 7 % 1100).toLong, 100000L + i))
      .toDF("user_id", "r_ts", "ref_id")
    val hotProbes = (0 until 4000)
      .map(i => ("hot", (i % 1300).toLong, i.toLong))
      .toDF("user_id", "p_ts", "probe_id")
    def collect(df: org.apache.spark.sql.DataFrame) = df
      .select($"probe_id", $"asof_ref_id", $"asof_r_ts")
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    val unsalted = collect(AsOfJoin.asOfBackward(
      hotProbes, hotRefs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id", "r_ts")))
    val salted = collect(AsOfJoin.asOfBackwardSalted(
      hotProbes, hotRefs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id", "r_ts"),
      salts = 16))
    assert(salted.size === 4000)
    assert(salted === unsalted)
  }

  test("salted forward as-of matches unsalted forward everywhere") {
    // mixed fixture at several salt counts
    val unsaltedMixed = AsOfJoin
      .asOfForward(probes, refs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"))
      .select($"probe_id", $"asof_ref_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    for (s <- Seq(1, 3, 8)) {
      val got = AsOfJoin
        .asOfForwardSalted(probes, refs, "user_id", "p_ts", "r_ts", "ref_id",
          Seq("ref_id"), salts = s)
        .select($"probe_id", $"asof_ref_id")
        .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
      assert(got === unsaltedMixed, s"salts=$s diverged")
    }
    // pathological hot key
    val hotRefs = (0 until 900)
      .map(i => ("hot", (i * 7 % 1100).toLong, 100000L + i))
      .toDF("user_id", "r_ts", "ref_id")
    val hotProbes = (0 until 4000)
      .map(i => ("hot", (i % 1300).toLong, i.toLong))
      .toDF("user_id", "p_ts", "probe_id")
    def collect(df: org.apache.spark.sql.DataFrame) = df
      .select($"probe_id", $"asof_ref_id")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    val unsalted = collect(AsOfJoin.asOfForward(
      hotProbes, hotRefs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id")))
    val salted = collect(AsOfJoin.asOfForwardSalted(
      hotProbes, hotRefs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"), salts = 16))
    assert(salted === unsalted)
  }

  test("plan shape: one exchange on the key, no join node") {
    val plan = AsOfJoin
      .asOfBackward(probes, refs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of must not plan a join:\n$plan")
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges === 1, s"expected exactly one hash exchange, plan:\n$plan")
  }
}

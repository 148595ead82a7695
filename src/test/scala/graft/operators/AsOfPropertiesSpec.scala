package graft.operators

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based as-of semantics: on ScalaCheck-generated probe and
  * reference sets (few keys, colliding timestamps — maximal tie-break
  * and boundary pressure), the union-scan implementation must equal the
  * obvious per-probe brute-force argmax, and the salted variant must
  * equal the unsalted one for every salt count. Explicit seeds (the
  * scalatest-scalacheck bridge isn't in the offline cache) so failures
  * reproduce exactly. */
class AsOfPropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val probeGen = for {
    k <- Gen.choose(0, 3)
    ts <- Gen.choose(0L, 20L)
    id <- Gen.choose(0L, 1000000L)
  } yield (s"k$k", ts, id)

  private val refGen = for {
    k <- Gen.choose(0, 3)
    ts <- Gen.choose(0L, 20L)
    id <- Gen.choose(0L, 1000000L)
  } yield (s"k$k", ts, id)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def cases: Seq[(List[(String, Long, Long)], List[(String, Long, Long)])] =
    (1L to 8L).map { s =>
      (sample(Gen.listOfN(40, probeGen), s),
       sample(Gen.listOfN(25, refGen), s + 500))
    }

  /** brute force: per probe, max (ts, seq) among refs with ts <= probe ts */
  private def truth(probes: Seq[(String, Long, Long)],
                    refs: Seq[(String, Long, Long)]): Map[(String, Long, Long), Option[Long]] =
    probes.map { case (k, pts, pid) =>
      val eligible = refs.filter { case (rk, rts, _) => rk == k && rts <= pts }
      (k, pts, pid) -> (if (eligible.isEmpty) None
                        else Some(eligible.maxBy { case (_, rts, rid) => (rts, rid) }._3))
    }.toMap

  test("asOfBackward == per-probe brute-force argmax on random inputs") {
    cases.foreach { case (p0, r0) =>
      val probes = p0.toDF("user_id", "p_ts", "probe_id").dropDuplicates("user_id", "p_ts", "probe_id")
      val refs = r0.toDF("user_id", "r_ts", "ref_id").dropDuplicates("user_id", "r_ts", "ref_id")
      val got = AsOfJoin
        .asOfBackward(probes, refs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"))
        .select($"user_id", $"p_ts", $"probe_id", $"asof_ref_id")
        .as[(String, Long, Long, Option[Long])].collect()
        .map(r => (r._1, r._2, r._3) -> r._4).toMap
      val want = truth(
        probes.as[(String, Long, Long)].collect().toSeq,
        refs.as[(String, Long, Long)].collect().toSeq)
      assert(got == want, s"p=$p0 r=$r0")
    }
  }

  test("asOfForward == per-probe brute-force argmin on random inputs") {
    cases.foreach { case (p0, r0) =>
      val probes = p0.toDF("user_id", "p_ts", "probe_id").dropDuplicates("user_id", "p_ts", "probe_id")
      val refs = r0.toDF("user_id", "r_ts", "ref_id").dropDuplicates("user_id", "r_ts", "ref_id")
      val got = AsOfJoin
        .asOfForward(probes, refs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"))
        .select($"user_id", $"p_ts", $"probe_id", $"asof_ref_id")
        .as[(String, Long, Long, Option[Long])].collect()
        .map(r => (r._1, r._2, r._3) -> r._4).toMap
      val want = probes.as[(String, Long, Long)].collect().map { case (k, pts, pid) =>
        val eligible = refs.as[(String, Long, Long)].collect()
          .filter { case (rk, rts, _) => rk == k && rts >= pts }
        (k, pts, pid) -> (if (eligible.isEmpty) None
                          else Some(eligible.minBy { case (_, rts, rid) => (rts, rid) }._3))
      }.toMap
      assert(got == want, s"p=$p0 r=$r0")
    }
  }

  test("forward salted == forward unsalted for every salt count on random inputs") {
    cases.take(4).foreach { case (p0, r0) =>
      val probes = p0.toDF("user_id", "p_ts", "probe_id").dropDuplicates("user_id", "p_ts", "probe_id")
      val refs = r0.toDF("user_id", "r_ts", "ref_id").dropDuplicates("user_id", "r_ts", "ref_id")
      val unsalted = AsOfJoin
        .asOfForward(probes, refs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"))
        .select($"probe_id", $"asof_ref_id")
        .as[(Long, Option[Long])].collect().toSet
      for (s <- Seq(1, 2, 5)) {
        val salted = AsOfJoin
          .asOfForwardSalted(probes, refs, "user_id", "p_ts", "r_ts", "ref_id",
            Seq("ref_id"), salts = s)
          .select($"probe_id", $"asof_ref_id")
          .as[(Long, Option[Long])].collect().toSet
        assert(salted == unsalted, s"salts=$s p=$p0 r=$r0")
      }
    }
  }

  test("salted == unsalted for every salt count on random inputs") {
    cases.take(4).foreach { case (p0, r0) =>
      val probes = p0.toDF("user_id", "p_ts", "probe_id").dropDuplicates("user_id", "p_ts", "probe_id")
      val refs = r0.toDF("user_id", "r_ts", "ref_id").dropDuplicates("user_id", "r_ts", "ref_id")
      val unsalted = AsOfJoin
        .asOfBackward(probes, refs, "user_id", "p_ts", "r_ts", "ref_id", Seq("ref_id"))
        .select($"probe_id", $"asof_ref_id")
        .as[(Long, Option[Long])].collect().toSet
      for (s <- Seq(1, 2, 5)) {
        val salted = AsOfJoin
          .asOfBackwardSalted(probes, refs, "user_id", "p_ts", "r_ts", "ref_id",
            Seq("ref_id"), salts = s)
          .select($"probe_id", $"asof_ref_id")
          .as[(Long, Option[Long])].collect().toSet
        assert(salted == unsalted, s"salts=$s p=$p0 r=$r0")
      }
    }
  }
}

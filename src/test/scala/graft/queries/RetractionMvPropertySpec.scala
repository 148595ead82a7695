package graft.queries

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property: the qi02 incremental retraction merge equals a direct
  * aggregation over survivors for ARBITRARY event sets and delete
  * sets — and the `recomputed` flag fires exactly when a group's
  * min/max was retracted. Seeded generators (the scalatest-scalacheck
  * bridge isn't in the offline cache) so failures reproduce. */
class RetractionMvPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val eventsGen = for {
    n <- Gen.choose(8, 40)
    rows <- Gen.listOfN(n, for {
      u <- Gen.choose(1L, 5L)
      us <- Gen.choose(0L, 50L)
      v <- Gen.choose(-10000L, 10000L) // exact micro-cents
    } yield (u, us, v))
    delMask <- Gen.listOfN(n, Gen.oneOf(true, false, false))
  } yield rows.zipWithIndex.map { case ((u, us, v), i) =>
    (i.toLong, u, us, v, delMask(i))
  }

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  test("incremental == full recompute, flag == extremal retraction, for 25 random cases") {
    for (seed <- 1L to 25L) {
      val rows = sample(eventsGen, seed)
      val ev = rows.toDF("event_id", "user_id", "us", "raw_v", "del")
        .select($"user_id", $"event_id", $"us",
          ($"raw_v".cast("double") / 100.0).cast(DecimalType(18, 6)).as("v"), $"del")
      val got = ExtendedQueries.retractionMvFrom(
          ev.select($"user_id", $"event_id", $"us", $"v"),
          col("event_id").isin(rows.filter(_._5).map(_._1): _*))
        .collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2),
          r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap

      // host-side oracle
      val byUser = rows.groupBy(_._2)
      val want = byUser.flatMap { case (u, rs) =>
        val surv = rs.filterNot(_._5)
        if (surv.isEmpty) None
        else {
          val sumV = surv.map(r => BigDecimal(r._4) / 100).sum
          val allUs = rs.map(_._3)
          val delUs = rs.filter(_._5).map(_._3)
          val flag = delUs.nonEmpty &&
            (delUs.min == allUs.min || delUs.max == allUs.max)
          Some(u -> ((surv.size.toLong, sumV.toDouble,
            surv.map(_._3).min, surv.map(_._3).max, flag)))
        }
      }
      assert(got.keySet == want.keySet, s"seed=$seed users ${got.keySet} vs ${want.keySet}")
      want.foreach { case (u, w) =>
        assert(got(u) == w, s"seed=$seed user=$u got=${got(u)} want=$w")
      }
    }
  }
}

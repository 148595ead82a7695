package graft.hfc

import graft.SparkTestBase
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based MERGE semantics (SURVEY.md §5.3): idempotence and
  * last-writer-wins over ScalaCheck-generated key/value batches, and
  * histogram bucketing partitioning the domain. Generators are driven
  * with explicit seeds (the scalatest-scalacheck bridge isn't in the
  * offline cache) so failures reproduce exactly. */
class MergePropertiesSpec extends SparkTestBase {
  import spark.implicits._

  private val rowGen = for {
    k <- Gen.choose(0, 8)
    v <- Gen.choose(-100, 100)
  } yield (s"k$k", v)

  private val batchGen = Gen.listOfN(12, rowGen)

  private def sample[A](g: Gen[A], seed: Long): A =
    g.apply(Gen.Parameters.default, Seed(seed)).get

  private def cases: Seq[(List[(String, Int)], List[(String, Int)])] =
    (1L to 10L).map(s => (sample(batchGen, s), sample(batchGen, s + 1000)))

  test("upsert idempotence: merge(merge(e,b),b) == merge(e,b) for random batches") {
    cases.foreach { case (e0, b0) =>
      val existing = e0.toDF("id", "v").dropDuplicates("id")
      val batch = b0.toDF("id", "v")
      val once = MergeWriter.upsert(existing, batch, Seq("id"))
        .as[(String, Int)].collect().toSet
      val twice = MergeWriter.upsert(MergeWriter.upsert(existing, batch, Seq("id")), batch, Seq("id"))
        .as[(String, Int)].collect().toSet
      assert(once == twice, s"e=$e0 b=$b0")
    }
  }

  test("upsert result keys = existing ∪ batch keys; batch's LAST value wins on overlap") {
    cases.foreach { case (e0, b0) =>
      val existing = e0.toDF("id", "v").dropDuplicates("id")
      val batch = b0.toDF("id", "v")
      val out = MergeWriter.upsert(existing, batch, Seq("id"))
        .as[(String, Int)].collect().toMap
      val eKeys = existing.as[(String, Int)].collect().toMap
      val lastPerKey = b0.groupBy(_._1).view.mapValues(_.last._2).toMap
      assert(out.keySet == eKeys.keySet ++ lastPerKey.keySet)
      lastPerKey.foreach { case (k, v) => assert(out(k) == v, s"k=$k e=$e0 b=$b0") }
      (eKeys.keySet -- lastPerKey.keySet).foreach { k => assert(out(k) == eKeys(k)) }
    }
  }

  test("insertIfAbsent never changes existing values") {
    cases.foreach { case (e0, b0) =>
      val existing = e0.toDF("id", "v").dropDuplicates("id")
      val out = MergeWriter.insertIfAbsent(existing, b0.toDF("id", "v"), Seq("id"))
        .as[(String, Int)].collect().toMap
      existing.as[(String, Int)].collect().foreach { case (k, v) =>
        assert(out(k) == v)
      }
    }
  }

  test("explicit seqCol: last-wins is deterministic even after a shuffle") {
    cases.foreach { case (e0, b0) =>
      val existing = e0.toDF("id", "v").dropDuplicates("id")
      // stamp batch order explicitly, then destroy the physical order
      val batch = b0.zipWithIndex.map { case ((k, v), i) => (k, v, i.toLong) }
        .toDF("id", "v", "seq")
      val shuffled = batch.repartition(7, $"v").sortWithinPartitions($"v")
      val out = MergeWriter.upsert(existing.withColumn("seq", org.apache.spark.sql.functions.lit(-1L)),
          shuffled, Seq("id"), seqCol = Some("seq"))
        .drop("seq").as[(String, Int)].collect().toMap
      val lastPerKey = b0.groupBy(_._1).view.mapValues(_.last._2).toMap
      lastPerKey.foreach { case (k, v) => assert(out(k) == v, s"k=$k b=$b0") }
    }
  }

  test("bucketize is total and consistent with bounds for random doubles") {
    import org.apache.spark.sql.functions.col
    val vals = sample(Gen.listOfN(50, Gen.choose(-1000.0, 1000.0)), 7L)
    val bounds = Seq(-100.0, 0.0, 100.0)
    val out = vals.toDF("v")
      .select(col("v"), Transforms.bucketize(col("v"), bounds).as("b"))
      .as[(Double, String)].collect()
    out.foreach { case (v, b) =>
      val expected =
        if (v < -100) "<-100" else if (v < 0) "[-100,0)"
        else if (v < 100) "[0,100)" else ">=100"
      assert(b == expected, s"v=$v")
    }
  }
}

package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class BandCensusSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val docs = Tables(spark, sf0001).documents

  test("per-band doc mass is conserved and bucket sizes are consistent") {
    val census = Dedup.bandCensus(docs).collect()
    val nDocs = docs.count()
    val byBand = census.groupBy(_.getAs[Int]("band_idx"))
    assert(byBand.keySet === Set(0, 1, 2, 3))
    byBand.foreach { case (band, rows) =>
      // every doc lands in exactly one bucket per band
      assert(rows.map(_.getAs[Long]("n_docs")).sum === nDocs,
        s"band $band does not conserve doc mass")
      rows.foreach { r =>
        val bucket = r.getAs[Long]("bucket")
        val maxB = r.getAs[Long]("max_bucket")
        // max bucket size must live inside its log2 size class
        assert(maxB >= (1L << bucket) && maxB < (1L << (bucket + 1)))
      }
    }
  }

  test("implied pairs upper-bound the funnel's distinct candidate pairs") {
    val implied = Dedup.bandCensus(docs)
      .agg(sum($"implied_pairs")).head().getLong(0)
    val actual = Dedup.minhashCandidatePairs(docs).count()
    // candidates are DISTINCT across bands; the census counts per-band mass
    assert(actual <= implied,
      s"distinct candidates $actual exceed per-band implied pairs $implied")
    spark.catalog.clearCache() // drop the funnel's signature cache
  }

  test("a planted duplicate pair shows up as one size-2 bucket in every band") {
    val base = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"), // exact dup of 1
      (3L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
    val census = Dedup.bandCensus(base).collect()
    val sizeTwo = census.filter(r => r.getAs[Long]("bucket") === 1L)
    // in all 4 bands, the dup pair forms a bucket of exactly 2
    assert(sizeTwo.map(_.getAs[Int]("band_idx")).toSet === Set(0, 1, 2, 3))
    assert(sizeTwo.forall(_.getAs[Long]("implied_pairs") === 1L))
    assert(sizeTwo.forall(_.getAs[Long]("max_bucket") === 2L))
  }
}

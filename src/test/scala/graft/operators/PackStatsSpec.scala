package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class PackStatsSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val t = Tables(spark, sf0001)

  test("pack stats census is consistent with the packing layout it summarizes") {
    val budget = 256
    val bins = Chunking.packSequences(t.documents, budget = budget, shards = 8).collect()
    val stats = graft.queries.CurationQueries.packStats(t).collect()

    val byShard = bins.groupBy(_.getAs[Int]("shard"))
    assert(stats.length === byShard.size)
    stats.foreach { r =>
      val shard = r.getAs[Int]("shard")
      val shardBins = byShard(shard)
      assert(r.getAs[Long]("n_bins") === shardBins.length.toLong)
      assert(r.getAs[Long]("n_docs") === shardBins.map(_.getAs[Long]("n_docs")).sum)
      assert(r.getAs[Long]("tokens_total") === shardBins.map(_.getAs[Long]("bin_tokens")).sum)
      assert(r.getAs[Long]("overflow_bins") ===
        shardBins.count(_.getAs[Long]("bin_tokens") > budget).toLong)
      assert(r.getAs[Long]("max_bin_tokens") === shardBins.map(_.getAs[Long]("bin_tokens")).max)
      val fill = r.getAs[Double]("fill_pct")
      assert(fill > 0.0 && fill < 2.0, s"implausible fill $fill")
    }
  }

  test("total token mass equals the corpus token count (nothing dropped by packing)") {
    val statsTotal = graft.queries.CurationQueries.packStats(t)
      .agg(sum($"tokens_total")).head().getLong(0)
    val corpusTotal = t.documents
      .select(size(graft.functions.TextFunctions.tokens($"text")).cast("long").as("n"))
      .agg(sum($"n")).head().getLong(0)
    assert(statsTotal === corpusTotal)
  }
}

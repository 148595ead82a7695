package graft.tools

import graft.{GraftSession, Tables}
import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dedup-method evaluation harness (dev tool): plant one perturbed
  * near-duplicate per tenth document (every 10th token rewritten, so
  * planted pairs sit at high-but-not-1.0 similarity), then measure
  * each funnel's recall on the planted pairs and its precision over
  * the pairs it reports that involve a planted copy. Prints one table;
  * numbers land in NOTES_r{N}. `runMain graft.tools.DedupEval [sfDir]`. */
object DedupEval {
  private val Offset = 1000000L

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = GraftSession.local(appName = "dedup-eval")
    import spark.implicits._

    val docs = Tables(spark, dir).documents.select("doc_id", "text")

    // two planted-perturbation scenarios with opposite structure:
    //  scattered — every 10th token rewritten: similarity stays high
    //    but NO 10-token window survives verbatim (window-based
    //    methods must fail; set-based ones must not);
    //  block — one 5-token prefix rewritten, the rest verbatim:
    //    long intact spans (window/fingerprint methods must fire).
    def plant(mode: String) = docs.filter($"doc_id" % 10 === 0)
      .select(($"doc_id" + Offset).as("doc_id"),
        array_join(
          transform(split(trim($"text"), "\\s+"),
            (tok, i) =>
              when(if (mode == "scattered") i % 10 === 9 else i < 5,
                concat(lit("xqzv"), i)).otherwise(tok)),
          " ").as("text"))

    for (mode <- Seq("scattered", "block")) {
      val corpus = docs.unionByName(plant(mode)).localCheckpoint(true)
      val truth = docs.filter($"doc_id" % 10 === 0)
        .select($"doc_id".as("a"), ($"doc_id" + Offset).as("b"))
        .as[(Long, Long)].collect().toSet
      println(s"[eval] === $mode perturbation: ${corpus.count()} docs, ${truth.size} planted pairs")

      def score(name: String, pairs: DataFrame): Unit = {
        val got = pairs.select($"a_id", $"b_id").as[(Long, Long)].collect()
          .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
        val involved = got.filter { case (a, b) => a >= Offset || b >= Offset }
        val hit = truth.intersect(involved)
        val recall = hit.size.toDouble / truth.size
        val precision =
          if (involved.isEmpty) Double.NaN else hit.size.toDouble / involved.size
        println(f"[eval] $name%-22s recall ${recall}%6.3f  precision ${precision}%6.3f  " +
          f"pairs ${got.size}%6d (planted-involved ${involved.size}%5d)")
        spark.catalog.clearCache()
      }

      score("minhash tau=0.5", Dedup.nearDupsMinhash(corpus, threshold = 0.5))
      score("jaccard-exact tau=0.5",
        Dedup.jaccardPairsByBlock(corpus.withColumn("all", lit(1)), "all")
          .filter($"jaccard" >= 0.5).select($"a_id", $"b_id"))
      score("simhash64 h<=3", Dedup.nearDupsSimhash(corpus, width = 64))
      score("editdist d<=40", Dedup.nearDupsEditDistance(corpus, maxDist = 40))

      // substring census as a doc-level detector: how many planted
      // copies share >= half their 10-token windows with the original
      val frac = Dedup.substringDupStats(corpus, k = 10)
        .filter($"doc_id" >= Offset)
      val flagged = frac.filter($"shared_frac" >= 0.5).count()
      println(f"[eval] substring frac>=0.5    doc-recall ${flagged.toDouble / truth.size}%6.3f " +
        f"($flagged of ${truth.size} planted copies flagged)")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

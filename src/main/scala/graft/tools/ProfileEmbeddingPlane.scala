package graft.tools

import graft.{GraftSession, Tables}
import graft.queries.PipelineQueries
import org.apache.spark.sql.functions._

/** Scale profile of the round-8 embedding-plane operators — qs16 (PCA
  * power iteration), qs18 (JL recall curve), qs19 (residualized
  * top-k) — at 1x/4x/16x the sf0.1 embeddings (2k → 32k vectors),
  * with the [[ProfileScaleFamily.ShuffleMeter]] recording shuffle
  * read/write per query.
  *
  * What the numbers must show for the 100 TB verdict:
  *  - qs16: shuffle volume is CONSTANT in corpus size — each power
  *    round exchanges only the 64 per-dim decimal partial sums per
  *    partition, never vectors;
  *  - qs18/qs19: the projections are scan-local; the only exchange is
  *    the final per-query top-k aggregation (queries broadcast).
  * Replicas perturb every coordinate by a replica-specific epsilon so
  * scaled corpora are not degenerate duplicates.
  *
  * `runMain graft.tools.ProfileEmbeddingPlane [sfDir]` → markdown rows
  * for NOTES_r8.
  */
object ProfileEmbeddingPlane {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "profile-embedding-plane")
    import spark.implicits._
    val meter = new ProfileScaleFamily.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
    println("| reps | n_vecs | query | wall_s | shuf_rd_MB | shuf_wr_MB |")
    println("|---|---|---|---|---|---|")
    for (reps <- Seq(1, 4, 16)) {
      val dir = s"/tmp/emb_scale_$reps"
      if (!new java.io.File(s"$dir/embeddings.parquet").exists()) {
        (0 until reps).map { k =>
          if (k == 0) base
          else base.select(($"vec_id" + lit(k * 1000000L)).as("vec_id"),
            transform($"embedding", x => x + lit(k.toFloat * 1e-3f)).as("embedding"),
            $"label")
        }.reduce(_ unionByName _)
          .repartition(32)
          .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
      }
      val t = Tables(spark, dir)
      val n = t.embeddings.count()
      val queries = Seq(
        "qs16_pca_component" -> (() => PipelineQueries.pcaComponent(t)),
        "qs18_jl_recall"     -> (() => PipelineQueries.jlRecall(t)),
        "qs19_isotropic_topk" -> (() => PipelineQueries.isotropicTopK(t)))
      for ((name, q) <- queries) {
        spark.catalog.clearCache()
        meter.reset()
        val t0 = System.nanoTime()
        q().write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        println(f"| $reps | $n | $name | $wall%.2f | ${meter.read.get / 1e6}%.2f | ${meter.write.get / 1e6}%.2f |")
      }
    }
    spark.stop()
  }
}

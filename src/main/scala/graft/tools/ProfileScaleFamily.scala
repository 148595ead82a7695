package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import java.util.concurrent.atomic.AtomicLong

/** Scale evidence for the composition-heavy query family — the five
  * gate queries that stack funnel + connected-components + aggregation
  * (qc12 cluster decontamination, qd08 alternating-star CC, qd18
  * cluster census, qc11 three-layer contamination report, qp12
  * cluster-aware holdout). The 100 TB question is whether their wall
  * AND shuffle volume grow ~linearly in corpus size; this tool answers
  * it empirically at 1×/2×/5×/10× the sf0.1 corpus.
  *
  * Scaled corpora are derived (under /tmp, never touching the
  * read-only testdata): replica k of each document perturbs one word
  * (and one embedding coordinate) deterministically, so replicas are
  * NEAR-duplicates — cluster sizes grow with scale, which is the
  * adversarial direction for the CC stages (bigger clusters, more
  * funnel pairs), not a softball. Non-scaled tables are byte-copied.
  *
  * Shuffle volume comes from a stage-metrics listener (remote+local
  * shuffle read + shuffle write per completed stage, reset per query).
  * Numbers land in NOTES_r{N}.
  * `runMain graft.tools.ProfileScaleFamily [sfDir] [outBase]`. */
object ProfileScaleFamily {

  final class ShuffleMeter extends SparkListener {
    val read = new AtomicLong(0L)
    val write = new AtomicLong(0L)
    override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
        write.addAndGet(m.shuffleWriteMetrics.bytesWritten)
      }
    }
    def reset(): Unit = { read.set(0L); write.set(0L) }
  }

  private def buildScaled(spark: SparkSession, srcDir: String, outDir: String,
                          reps: Int, mode: String): Unit = {
    val fs = new java.io.File(outDir)
    if (fs.exists()) return // deterministic content — reuse
    fs.mkdirs()
    // byte-copy the non-scaled tables
    for (t <- Seq("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events")) {
      val src = new java.io.File(s"$srcDir/$t.parquet")
      val dst = new java.io.File(s"$outDir/$t.parquet")
      if (src.isDirectory) {
        dst.mkdirs()
        src.listFiles().foreach(f => java.nio.file.Files.copy(
          f.toPath, new java.io.File(dst, f.getName).toPath))
      } else java.nio.file.Files.copy(src.toPath, dst.toPath)
    }
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    (0 until reps).map { k =>
      if (k == 0) docs
      else {
        val words = split(col("text"), " ")
        val mutated =
          if (mode == "hashdup") {
            // EXACT text replicas (ids shifted): perceptual-hash
            // clusters grow linearly with scale — the adversarial
            // direction for the qm hamming funnel, whose per-cluster
            // verify stage is quadratic in cluster size (the priced
            // quadratic; occupancy census printed per scale). Any
            // text edit would scramble the strided stub hash (length
            // changes shift every sample position), so identity is
            // the only mutation that grows HASH clusters.
            words
          } else if (mode == "neardup") {
            // perturb ONE word: replicas are near-duplicates of each
            // other, so cluster sizes GROW with scale (adversarial for
            // the CC stages: candidate pairs ~ N x reps)
            val pos = pmod(col("doc_id") * 3 + lit(k), greatest(size(words), lit(1)))
            transform(words, (w, i) => when(i === pos, concat(lit("rw"), lit(k)))
              .otherwise(w))
          } else {
            // perturb every 3rd word with a replica-specific token:
            // ~33% divergence keeps replicas BELOW the near-dup
            // threshold, so the dup structure stays constant while N
            // grows — the pure-scale (production) shape
            transform(words, (w, i) =>
              when(i % 3 === k % 3, concat(lit("u"), lit(k), lit("_"), w)).otherwise(w))
          }
        docs.select(
          (col("doc_id") + lit(k * 10000000L)).as("doc_id"),
          concat_ws(" ", mutated).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = spark.read.parquet(s"$srcDir/embeddings.parquet")
    (0 until reps).map { k =>
      if (k == 0) emb
      else
        emb.select(
          (col("vec_id") + lit(k * 10000000L)).as("vec_id"),
          // neardup: 1e-3 nudge keeps cosine ~ 1 (semantic clusters
          // grow with scale); unique: +0.5*k on rotating coordinates
          // changes the direction outright (constant dup structure)
          transform(col("embedding"), (v, i) =>
            when(
              if (mode == "neardup")
                i === pmod(col("vec_id") + lit(k), size(col("embedding")))
              else i % 8 === k % 8,
              v + lit(if (mode == "neardup") k * 1e-3f else 0.5f * k)).otherwise(v))
            .as("embedding"),
          col("label"))
    }.reduce(_ unionByName _)
      .repartition(32).write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
  }

  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outBase0 = args.drop(1).headOption.getOrElse("/tmp/graft_scale")
    val mode = args.drop(2).headOption.getOrElse("neardup") // neardup | unique | hashdup
    val outBase = s"$outBase0-$mode"
    val spark = GraftSession.local(appName = "scale-family-profile")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    val family: Seq[(String, Tables => org.apache.spark.sql.DataFrame)] = Seq(
      "qd18_cluster_census" -> ((t: Tables) => graft.queries.PipelineQueries.clusterCensus(t)),
      "qd08_clusters_alternating" -> ((t: Tables) => graft.queries.PipelineQueries.dedupClustersAlternating(t)),
      "qc12_cluster_decontam" -> ((t: Tables) => graft.queries.CurationQueries.clusterDecontaminate(t)),
      "qc11_contamination_report" -> ((t: Tables) => graft.queries.QualityQueries.contaminationReport(t)),
      "qp12_cluster_holdout" -> ((t: Tables) => graft.queries.PipelineQueries.clusterHoldout(t)),
      // the composed multi-stage builds (r10): gate→dedup→mix and the
      // full release pipeline — scale evidence that COMPOSITION does
      // not add super-linear stages beyond its members'
      "qx01_corpus_build" -> ((t: Tables) => graft.queries.CurationQueries.corpusBuild(t)),
      "qc09_corpus_release" -> ((t: Tables) => graft.queries.QualityQueries.corpusRelease(t)),
      // the qm hamming funnels (r12): batch banded near-dup and the
      // incremental store path — run with mode=hashdup (growing hash
      // clusters, the adversarial direction) and mode=unique (control)
      "qm03_image_neardup" -> ((t: Tables) => graft.queries.PipelineQueries.imageNearDup(t)),
      "qm07_image_dedup_incr" -> ((t: Tables) => graft.queries.PipelineQueries.imageDedupIncremental(t)),
      "qm08_image_neardup_mih" -> ((t: Tables) => graft.queries.PipelineQueries.imageNearDupMih(t)),
      "qm09_image_dedup_incr_mih" -> ((t: Tables) => graft.queries.PipelineQueries.imageDedupIncrementalMih(t)))

    // optional 4th arg: comma-separated name-prefix filter (dev loops)
    val only = args.drop(3).headOption.map(_.split(",").toSeq)
    val selected = family.filter { case (n, _) => only.forall(_.exists(n.startsWith)) }

    println(f"[scale] ${"query"}%-26s ${"reps"}%4s ${"docs"}%7s ${"wall_s"}%8s ${"shuf_rd_mb"}%10s ${"shuf_wr_mb"}%10s")
    for (reps <- Seq(1, 2, 5, 10)) {
      val dir = s"$outBase/x$reps"
      buildScaled(spark, srcDir, dir, reps, mode)
      val t = Tables(spark, dir)
      val nDocs = t.documents.count()
      if (mode == "hashdup") {
        // band-bucket occupancy census of the qm03 funnel at this
        // scale: the shuffle-key distribution the hamming self-join
        // actually sees (4 x 14-bit bands over the 56-bit stub hash).
        // Bounded occupancy = bounded per-bucket pair fan-out.
        val occ = t.documents
          .select(graft.operators.Multimodal.textDhash56(col("text")).as("phash"))
          .select(col("phash"), posexplode(array((0 until 4).map(b =>
            shiftright(col("phash"), b * 14).bitwiseAND(lit((1L << 14) - 1))): _*))
            .as(Seq("band", "bkey")))
          .groupBy(col("band"), col("bkey")).count()
        val q = occ.stat.approxQuantile("count", Array(0.5, 0.99), 0.001)
        val mx = occ.agg(max(col("count"))).head().getLong(0)
        val nBuckets = occ.count()
        println(f"[scale] qm-band-occupancy reps=$reps%2d buckets=$nBuckets%7d " +
          f"p50=${q(0)}%6.1f p99=${q(1)}%8.1f max=$mx%8d")
      }
      selected.foreach { case (name, fn) =>
        // one warm pass (codegen/JIT), then the measured pass
        fn(t).write.format("noop").mode("overwrite").save()
        spark.catalog.clearCache()
        meter.reset()
        val t0 = System.nanoTime()
        fn(t).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        println(f"[scale] $name%-26s $reps%4d $nDocs%7d $wall%8.2f " +
          f"${meter.read.get / 1e6}%10.1f ${meter.write.get / 1e6}%10.1f")
      }
    }
    spark.stop()
  }
}

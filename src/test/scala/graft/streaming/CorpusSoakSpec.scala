package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.commons.io.FileUtils

import java.io.File
import java.nio.file.Files

/** Randomized fault-injection soak of the composed streaming corpus
  * pipeline (round-11 verdict #6): N=20 generated waves through
  * [[EventStreams.corpusPipelineStream]], with
  *  - a TORN STORE SWAP mid-commit (census store left in the
  *    crashed-between-rename-aside-and-publish state its AtomicSwap
  *    protocol can actually produce), and
  *  - a CHECKPOINT LOSS at a ScalaCheck-chosen batch boundary
  *    (restart from a fresh checkpoint re-delivering every wave from
  *    batch 0, the worst-case re-delivery window — MemoryStream ids
  *    re-align, matching the production contract that batch ids
  *    identify content),
  * asserting the final per-doc decisions and both stores are equal to
  * the fault-free run. The two-wave spec of round 10 found the
  * marker-loss bug; generalizing it found the third marker-class bug:
  * batchCounted consulted the marker WITHOUT recovering the swap
  * first, so a torn swap made a committed batch look un-counted and
  * the replay double-merged its counts (fixed in
  * IncrementalLineCensus.batchCounted; this spec pins it). */
class CorpusSoakSpec extends SparkTestBase {
  import spark.implicits._

  private val NWaves = 20
  private val Threshold = 0.9
  private val MinTokens = 5
  private val LineTokens = 2
  private val MaxDocFreq = 2

  /** Deterministic wave generator: each wave mixes a unique doc, an
    * exact dup of an earlier unique, a gate-fail, and (on some waves)
    * a doc carrying the shared hot line that crosses maxDocFreq. */
  private def mkWaves(seed: Long): IndexedSeq[Seq[(Long, String)]] = {
    val rnd = new scala.util.Random(seed)
    val uniques = scala.collection.mutable.ArrayBuffer[(Long, String)]()
    (0 until NWaves).map { w =>
      val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()
      val uid = 1000L + w
      val utext = (0 until 8).map(t => s"w${w}t${t}x${rnd.nextInt(1000)}").mkString(" ")
      uniques += ((uid, utext))
      docs += ((uid, utext))
      if (w > 0 && rnd.nextBoolean()) {
        val (src, stext) = uniques(rnd.nextInt(uniques.size - 1))
        docs += ((2000L + w, stext)) // exact dup of an earlier unique
        require(src >= 0)
      }
      if (rnd.nextInt(3) == 0) docs += ((3000L + w, "hi")) // gate-fail
      if (w % 4 == 2) // hot line shared across waves -> census scrub
        docs += ((4000L + w, s"hot line\nw${w} fresh tail content here extra"))
      docs.toSeq
    }
  }

  private final case class FinalState(decisions: Map[Long, (Boolean, Option[Long], Boolean)],
                                      dedupIds: Set[Long],
                                      census: Map[String, Long])

  /** Drive the waves through a (possibly faulted) run. Faults happen
    * at STOPPED boundaries — the only place a process crash manifests
    * to a restarted job. */
  private def runScenario(waves: IndexedSeq[Seq[(Long, String)]], base: String,
                          tornSwapAfter: Option[Int], lossAfter: Option[Int]): FinalState = {
    implicit val sqlCtx = spark.sqlContext
    val dedupStore = s"$base/dedup"; val censusStore = s"$base/census"
    val out = s"$base/decisions"
    graft.operators.IncrementalDedup.initStore(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), dedupStore)
    graft.operators.IncrementalLineCensus.initStore(
      Seq.empty[(Long, String)].toDF("doc_id", "text"), censusStore, LineTokens)

    var ckptGen = 0
    def startQuery(): (MemoryStream[(Long, String)],
                       org.apache.spark.sql.streaming.StreamingQuery) = {
      val mem = MemoryStream[(Long, String)]
      val q = EventStreams.corpusPipelineStream(
        mem.toDF.toDF("doc_id", "text"), dedupStore, censusStore, out,
        threshold = Threshold, minTokens = MinTokens,
        lineTokens = LineTokens, maxDocFreq = MaxDocFreq)
        .option("checkpointLocation", s"$base/ckpt$ckptGen")
        .start()
      ckptGen += 1
      (mem, q)
    }

    var (mem, q) = startQuery()
    var censusSnapshot: Option[String] = None
    try {
      for (w <- 0 until NWaves) {
        if (tornSwapAfter.contains(w)) {
          // snapshot the pre-wave store so the torn state is exactly
          // what a crash between commitDir's two renames leaves
          val snap = s"$base/census_snap"
          FileUtils.copyDirectory(new File(censusStore), new File(snap))
          censusSnapshot = Some(snap)
        }
        mem.addData(waves(w): _*)
        q.processAllAvailable()
        val fault = tornSwapAfter.contains(w) || lossAfter.contains(w)
        if (fault) {
          q.stop()
          if (tornSwapAfter.contains(w)) {
            // reconstruct the crashed-mid-commit state: staging = the
            // just-committed store (complete, _SUCCESS + markers), old
            // = the pre-wave store, target absent
            FileUtils.moveDirectory(new File(censusStore),
              new File(graft.hfc.AtomicSwap.stagingFor(censusStore)))
            FileUtils.moveDirectory(new File(censusSnapshot.get),
              new File(censusStore + ".old"))
            censusSnapshot = None
          }
          // checkpoint loss (or post-crash restart): fresh checkpoint,
          // worst-case re-delivery of every wave so far — batch ids
          // re-align with identical content
          val restarted = startQuery()
          mem = restarted._1; q = restarted._2
          for (r <- 0 to w) {
            mem.addData(waves(r): _*)
            q.processAllAvailable()
          }
        }
      }
    } finally if (q.isActive) q.stop()

    val dec = spark.read.parquet(out)
      .select($"doc_id", $"gate_passed", $"dup_of", $"kept")
      .collect()
      .map(r => (r.getLong(0),
        (r.getBoolean(1), Option(r.get(2)).map(_.asInstanceOf[Long]), r.getBoolean(3))))
    val byDoc = dec.groupBy(_._1).map { case (id, rows) =>
      val distinct = rows.map(_._2).distinct
      assert(distinct.size == 1,
        s"doc $id has ${distinct.size} distinct decision tuples across batches: $distinct")
      id -> distinct.head
    }
    FinalState(byDoc,
      spark.read.parquet(dedupStore).select("id").as[Long].collect().toSet,
      spark.read.parquet(censusStore).as[(String, Long)].collect().toMap)
  }

  test("20-wave soak: torn swap + checkpoint loss converge to the fault-free state") {
    // ScalaCheck-chosen fault boundaries, fixed seed for reproducibility
    val gen = org.scalacheck.Gen.choose(2, NWaves - 3)
    val seed = org.scalacheck.rng.Seed(42L)
    val crashAt = gen.apply(org.scalacheck.Gen.Parameters.default, seed).get
    val lossAt = gen.apply(org.scalacheck.Gen.Parameters.default, seed.next).get
      match { case l if l == crashAt => l + 1; case l => l }
    info(s"fault plan: torn swap after batch $crashAt, checkpoint loss after batch $lossAt")

    val waves = mkWaves(seed = 0xC0FFEE)
    val root = Files.createTempDirectory("graft-soak").toString
    val reference = runScenario(waves, s"$root/ref", None, None)
    val faulted = runScenario(waves, s"$root/fault",
      tornSwapAfter = Some(crashAt), lossAfter = Some(lossAt))

    assert(faulted.decisions == reference.decisions,
      "per-doc decisions must match the fault-free run")
    assert(faulted.dedupIds == reference.dedupIds,
      "dedup store must not gain or lose signatures under faults")
    assert(faulted.census == reference.census,
      "line census must not double-count under faults")
    // sanity: the scenario actually exercised the machinery
    assert(reference.decisions.exists(_._2._2.isDefined), "no dup decisions generated")
    assert(reference.decisions.exists(d => !d._2._1), "no gate-fails generated")
    assert(reference.census.values.exists(_ >= MaxDocFreq), "hot line never crossed the threshold")
    FileUtils.deleteDirectory(new File(root))
  }
}

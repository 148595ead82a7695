package graft.tools

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Round-14 optimization harness (guide §1: measure first).
  *
  * `runMain graft.tools.ProfileQuery <queryPrefix>[,<prefix>...] [passes] [planOut]`
  *
  * For each matching declared query: runs `passes` noop-sink passes
  * (guide §1.4), reports wall seconds per pass plus, per query, the
  * job / stage counts and total shuffle read/write bytes a run costs
  * (a cheap stand-in for the UI's stage table — stage count is the
  * sequential-barrier count that dominates toy-scale walls, shuffle
  * bytes the lever that dominates cluster-scale walls). With a
  * `planOut` directory it also writes `<name>.txt` with
  * `.explain("formatted")` for the before/after plan evidence the
  * round must commit (plans/r14/).
  */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ProfileQuery <queryPrefix>[,..] [passes] [planOutDir]")
    val prefixes = args(0).split(",").toSeq
    val passes = if (args.length > 1) args(1).toInt else 3
    val planOut = if (args.length > 2) Some(args(2)) else None
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "profile-query")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val shufRead = new AtomicLong(0L)
    val shufWrite = new AtomicLong(0L)
    // in-job time vs between-job gaps: gaps are driver-side planning /
    // AQE re-optimization; job time is scheduling + task run
    val inJob = new AtomicLong(0L)   // ns
    val lastEnd = new AtomicLong(0L) // ns timestamp of last job end
    val gap = new AtomicLong(0L)     // ns between jobs
    spark.sparkContext.addSparkListener(new SparkListener {
      private val starts = new java.util.concurrent.ConcurrentHashMap[Int, Long]()
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val now = System.nanoTime()
        jobs.incrementAndGet()
        starts.put(j.jobId, now)
        val le = lastEnd.get()
        if (le > 0L) gap.addAndGet(now - le)
      }
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit = {
        val now = System.nanoTime()
        val s = starts.remove(j.jobId)
        if (s != null) inJob.addAndGet(now - s.longValue())
        lastEnd.set(now)
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        shufRead.addAndGet(s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead)
        shufWrite.addAndGet(s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
      }
    })

    val named = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    require(named.nonEmpty, s"no query matches ${args(0)}")

    // warm codegen/classloading once so pass 1 measures the engine
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    named.foreach { case (name, fn) =>
      planOut.foreach { dir =>
        Files.createDirectories(Paths.get(dir))
        val txt = fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.write(Paths.get(dir, s"$name.txt"), txt.getBytes("UTF-8"))
      }
      val walls = (1 to passes).map { p =>
        spark.sparkContext.setJobDescription(s"$name pass $p")
        jobs.set(0); stages.set(0); tasks.set(0); shufRead.set(0L); shufWrite.set(0L)
        inJob.set(0L); gap.set(0L); lastEnd.set(0L)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val t = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // listener events are async; DRAIN the bus before reading the
        // counters (a fixed sleep raced late events from pass N into
        // pass N+1's numbers — r14 ADVICE). waitUntilEmpty is
        // private[spark], hence the reflective call; fall back to the
        // old sleep if the internals move.
        try {
          val bus = spark.sparkContext.getClass.getMethod("listenerBus")
            .invoke(spark.sparkContext)
          bus.getClass.getMethod("waitUntilEmpty").invoke(bus)
        } catch { case _: Throwable => Thread.sleep(300) }
        println(f"[profile] $name pass $p: $t%.3f s  jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} inJob=${inJob.get / 1e9}%.2f s gaps=${gap.get / 1e9}%.2f s shufRead=${shufRead.get / 1048576.0}%.1f MB shufWrite=${shufWrite.get / 1048576.0}%.1f MB")
        t
      }
      if (walls.nonEmpty)
        println(f"[profile] $name MIN ${walls.min}%.3f s over $passes passes")
    }
    spark.stop()
  }
}

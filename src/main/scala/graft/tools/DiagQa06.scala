package graft.tools

import graft.{GraftSession, Tables}

/** One-off diagnosis of qa06_asof_nearest's super-linear sf2→sf5 step
  * in the r14 relational rehearsal (6.8× wall for 2.5× data while the
  * family median sat at 2.0×): prints wall, shuffle, and the executed
  * plan's join/sort lines per scale so the regime flip (if any) is
  * visible. `runMain graft.tools.DiagQa06 [dirs]`. */
object DiagQa06 {
  def main(args: Array[String]): Unit = {
    val dirs = args.headOption.getOrElse("/tmp/sfgen/sf2,/tmp/sfgen/sf5").split(",")
    val spark = GraftSession.local(appName = "diag-qa06")
    val meter = new ProfileScaleFamily.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    dirs.foreach { dir =>
      val df = graft.queries.CurationQueries.asofNearestView(Tables(spark, dir))
      df.write.format("noop").mode("overwrite").save() // warm
      meter.reset()
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"[qa06] $dir wall=$wall%.2fs shufRd=${meter.read.get / 1e6}%.1fMB " +
        f"shufWr=${meter.write.get / 1e6}%.1fMB")
      df.queryExecution.executedPlan.execute().count()
      val plan = df.queryExecution.executedPlan.toString
      plan.linesIterator.filter(l => l.contains("Join") || l.contains("skew") ||
          l.contains("spill") || l.contains("Window")).take(12)
        .foreach(l => println("[qa06]   " + l.trim.take(150)))
    }
    spark.stop()
  }
}

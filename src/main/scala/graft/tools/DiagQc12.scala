package graft.tools

import graft.{GraftSession, Tables}
import org.apache.spark.sql.DataFrame

/** r15 diagnosis: qc12 old (per-layer text scans — funnel signatures,
  * guard corpus 5-grams, guard bench 5-grams) vs new (ONE shared
  * tokenize+hash projection feeding the funnel and both guard sides) —
  * interleaved in ONE session so host jitter cancels (the qt40 lesson:
  * measure the fusion, never assume). `runMain graft.tools.DiagQc12
  * [passes]` */
object DiagQc12 {
  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "diag-qc12")
    val t = Tables(spark, sfDir)

    def oldImpl(): DataFrame = graft.queries.CurationQueries.clusterDecontaminate(t)
    def newImpl(): DataFrame = graft.queries.CurationQueries.clusterDecontaminateShared(t)

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache() // the bench's per-query discipline
      dt
    }
    // warm both
    time(oldImpl); time(newImpl)
    val olds = collection.mutable.ArrayBuffer[Double]()
    val news = collection.mutable.ArrayBuffer[Double]()
    (1 to passes).foreach { p =>
      olds += time(oldImpl)
      news += time(newImpl)
      println(f"[diag] pass $p old=${olds.last}%.3f new=${news.last}%.3f")
    }
    println(f"[diag] MIN old=${olds.min}%.3f new=${news.min}%.3f")
    spark.stop()
  }
}

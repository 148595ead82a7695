package graft.tools

import graft.{GraftSession, Tables}
import graft.functions.TextFunctions.{letBound, shingles, tokens}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** r14 diagnosis: qt40 old (6 scans, one global agg per width) vs new
  * (1 scan, one (n)-grouped agg) — interleaved in ONE session so host
  * jitter cancels. `runMain graft.tools.DiagQt40 [passes]` */
object DiagQt40 {
  def main(args: Array[String]): Unit = {
    val passes = if (args.nonEmpty) args(0).toInt else 5
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(appName = "diag-qt40")
    val t = Tables(spark, sfDir)
    import spark.implicits._
    val widths = Seq(1, 2, 3, 4, 6, 8)

    def oldImpl(): DataFrame =
      widths.map { n =>
        t.documents.select(explode(shingles($"text", n)).as("g"))
          .select(md5($"g").as("h"))
          .agg(count(lit(1)).as("n_windows"), countDistinct($"h").as("n_distinct"))
          .select(lit(n).as("n"), $"n_windows", $"n_distinct",
            round(($"n_windows" - $"n_distinct").cast("double") /
              $"n_windows".cast("double"), 6).as("dup_frac"))
      }.reduce(_ unionByName _).orderBy($"n")

    def newImpl(): DataFrame = graft.queries.QualityQueries.noveltyCurve(t)

    def time(f: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      f().write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
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

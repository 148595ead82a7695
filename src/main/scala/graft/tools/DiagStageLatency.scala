package graft.tools

import graft.{GraftExtensions, SparkEntry}
import org.apache.spark.sql.SparkSession

/** Round-14 diagnosis: what composes the ~100-170 ms per materialized
  * stage that dominates iterative queries at toy scale? Runs a named
  * query under config variants (AQE off, codegen interpreted, more
  * shuffle partitions) to attribute the per-stage latency. Diagnosis
  * only — the bench session stays GraftSession.local.
  *
  * `runMain graft.tools.DiagStageLatency <query> <conf1=v1;conf2=v2> [passes]`
  */
object DiagStageLatency {
  def main(args: Array[String]): Unit = {
    val qname = args(0)
    val confs = if (args.length > 1 && args(1).nonEmpty)
      args(1).split(";").toSeq.map { kv => val Array(k, v) = kv.split("=", 2); (k, v) }
    else Seq.empty
    val passes = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    var b = SparkSession.builder().master(s"local[$cpus]").appName("diag-latency")
      .withExtensions(new GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.compression.codec", "zstd")
      .config("spark.ui.enabled", "false")
    confs.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    GraftExtensions.register(spark)
    spark.sparkContext.setLogLevel("ERROR")
    val fn = SparkEntry.queries(qname)
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }
    val walls = (1 to passes).map { p =>
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val t = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      println(f"[diag] $qname pass $p: $t%.3f s  (${confs.map(c => c._1 + "=" + c._2).mkString(";")})")
      t
    }
    println(f"[diag] $qname MIN ${walls.min}%.3f s")
    spark.stop()
  }
}

package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Evidence that AQE's runtime skew-join splitting actually engages on
  * a planted hot key, versus the manual salting advisory
  * ([[graft.operators.Skew.saltedJoin]], qj02's recommendation).
  *
  * Fact: 2M rows, 50% on ONE key (the mega-repo pathology); dim: 100k
  * keys. Broadcast is disabled so the join must sort-merge — the shape
  * AQE skew-splitting targets. The skew thresholds are lowered
  * PROPORTIONALLY to the local data size (the hot partition is ~30 MB
  * here, not the 256 MB default a production shuffle would show): the
  * trigger condition — hot partition > factor × median AND > absolute
  * threshold — is the same decision the defaults make at cluster
  * scale.
  *
  * Prints wall clocks for (AQE skew ON, AQE skew OFF, manual salt) and
  * the post-execution plan line proving `isSkewJoin=true`. Findings
  * land in PLANS.md. `runMain graft.tools.ProfileSkewJoin`. */
object ProfileSkewJoin {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(appName = "skew-join-profile")
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    val nFact = 2000000L
    val nDim = 100000L
    // 50% of fact rows on key 0, the rest uniform; md5 payload so the
    // skew decision sees real (incompressible) shuffle bytes
    val fact = spark.range(nFact).select(
      when(col("id") % 2 === 0, lit(0L)).otherwise(pmod(col("id"), lit(nDim))).as("k"),
      md5(col("id").cast("string")).as("v"))
      .localCheckpoint(true) // freeze input so each variant re-joins identical data
    val dim = spark.range(nDim).select(col("id").as("k"),
      concat(lit("dim-"), col("id")).as("d")).localCheckpoint(true)

    def run(label: String)(f: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val df = f
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[skew] $label%-18s wall=${(System.nanoTime() - t0) / 1e9}%6.2fs")
      df
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    val aqeOn = run("aqe-skew-on") { fact.join(dim, "k") }
    // execute THROUGH this DataFrame's own QueryExecution so the
    // AdaptiveSparkPlan finalizes and prints the runtime skew decision
    // (write()/foreach()/rdd each plan a FRESH QueryExecution — acting
    // through those leaves this one isFinalPlan=false)
    aqeOn.queryExecution.executedPlan.execute().count()
    val plan = aqeOn.queryExecution.executedPlan.toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get("/tmp/skewplan.txt"), plan)
    val skewLines = plan.linesIterator.filter(l =>
      l.toLowerCase.contains("skew")).toSeq
    println(s"[skew] skew-split engaged: ${skewLines.nonEmpty}")
    skewLines.take(3).foreach(l => println(s"[skew] plan: ${l.trim.take(200)}"))
    plan.linesIterator.filter(_.contains("SortMergeJoin")).take(2)
      .foreach(l => println(s"[skew] smj: ${l.trim.take(200)}"))
    plan.linesIterator.filter(_.contains("AQEShuffleRead")).take(2)
      .foreach(l => println(s"[skew] aqeread: ${l.trim.take(200)}"))

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run("aqe-skew-off") { fact.join(dim, "k") }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    run("manual-salt-16") {
      graft.operators.Skew.saltedJoin(fact, dim, "k", saltBuckets = 16)
    }
    spark.stop()
  }
}

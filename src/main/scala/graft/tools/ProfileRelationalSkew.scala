package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** The second half of the r13 verdict's scale-rehearsal ask: does
  * AQE's runtime skew-split fire on the REAL relational tables at
  * rehearsal scale, where [[ProfileSkewJoin]]'s synthetic 2M-row twin
  * says it should?
  *
  * Input: a GenRelational dir (default /tmp/sfgen/sf2 — 12M lineitem).
  * The generated keys are uniform (the driver's testdata has no
  * mega-key either), so the pathology is PLANTED the way qj02's
  * advisor prices it: 30% of lineitem rows re-keyed onto one hot
  * orderkey. Thresholds are scaled like ProfileSkewJoin's (the hot
  * partition here is tens of MB, not the 256 MB production default;
  * the trigger CONDITION — hot > factor × median AND > absolute — is
  * identical to what the defaults evaluate at cluster scale).
  *
  * Prints: advisor verdict (salt_hint must be true on the planted
  * input, false on the uniform one), walls for AQE-skew-on /
  * AQE-skew-off / manual salt, and the executed plan's skew marker
  * (`SortMergeJoin(skew=true)` / `AQEShuffleRead skewed` in Spark 4.1). `runMain graft.tools.ProfileRelationalSkew [sfDir] [hotFrac]`.
  */
object ProfileRelationalSkew {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/sfgen/sf2")
    val hotFrac = args.drop(1).headOption.map(_.toDouble).getOrElse(0.3)
    val spark = GraftSession.local(appName = "relational-skew-profile")
    import spark.implicits._
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")

    val orders = spark.read.parquet(s"$dir/orders.parquet")
      .select($"o_orderkey", $"o_orderpriority").localCheckpoint(true)
    val uniform = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey", $"l_extendedprice")
    val hot = uniform.select(
      when(pmod(xxhash64($"l_orderkey", $"l_extendedprice"), lit(1000))
        < (hotFrac * 1000).toInt, lit(0L))
        .otherwise($"l_orderkey").as("l_orderkey"),
      $"l_extendedprice").localCheckpoint(true)

    // the advisor must price the two shapes differently
    Seq(("uniform", uniform.localCheckpoint(true)), ("planted", hot)).foreach {
      case (label, fact) =>
        val advice = graft.operators.Skew.joinAdvice(
          fact, orders, "l_orderkey", "o_orderkey").collect().head
        println(s"[rskew] advisor $label: strategy=${advice.getAs[String]("strategy")} " +
          s"salt_hint=${advice.getAs[Boolean]("salt_hint")} " +
          s"max_key_mass=${advice.getAs[Long]("max_key_mass")}")
    }

    def run(label: String)(f: => org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
      val df = f
      df.write.format("noop").mode("overwrite").save() // warm
      val t0 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      println(f"[rskew] $label%-16s wall=${(System.nanoTime() - t0) / 1e9}%6.2fs")
      df
    }

    def skewLine(df: org.apache.spark.sql.DataFrame): Option[String] = {
      df.queryExecution.executedPlan.execute().count()
      df.queryExecution.executedPlan.toString.linesIterator
        .find(l => l.contains("skew=true") || l.contains("AQEShuffleRead skewed"))
    }

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    // Regime 1 — the ProfileSkewJoin shape: the join IS the stage tail.
    // AQE's OptimizeSkewedJoin applies freely here.
    val bare = run("bare-join") {
      hot.join(orders, $"l_orderkey" === $"o_orderkey")
    }
    val bareSkew = skewLine(bare)
    println(s"[rskew] bare-join skew marker: ${bareSkew.getOrElse("NOT FOUND")}")

    // Regime 2 — the realistic query shape (q04's): the join feeds a
    // re-aggregation exchange. MEASURED (Spark 4.1): the split fires
    // here TOO by default — the downstream groupBy keys on a different
    // column, so it re-shuffles regardless and splitting the join
    // costs no extra exchange. (forceOptimizeSkewedJoin only matters
    // when the join's output partitioning would be REUSED; kept as a
    // third leg so a Spark upgrade that changes the default shows up.)
    val agg = run("agg-default") {
      hot.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(sum($"l_extendedprice").as("rev"))
    }
    println(s"[rskew] agg-default skew marker: ${skewLine(agg).getOrElse("NOT FOUND")}")
    spark.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
    val forced = run("agg-forced") {
      hot.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(sum($"l_extendedprice").as("rev"))
    }
    val forcedSkew = skewLine(forced)
    println(s"[rskew] agg-forced skew marker: ${forcedSkew.getOrElse("NOT FOUND")}")
    spark.conf.unset("spark.sql.adaptive.forceOptimizeSkewedJoin")

    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "false")
    run("aqe-skew-off") {
      hot.join(orders, $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(sum($"l_extendedprice").as("rev"))
    }
    run("manual-salt") {
      graft.operators.Skew.saltedJoin(hot, orders.withColumnRenamed(
        "o_orderkey", "l_orderkey"), "l_orderkey", saltBuckets = 16)
        .groupBy($"o_orderpriority").agg(sum($"l_extendedprice").as("rev"))
    }
    require(bareSkew.isDefined,
      "AQE skew split did NOT fire on the planted hot key in the bare-join " +
        "regime — threshold regression vs ProfileSkewJoin")
    require(forcedSkew.isDefined,
      "forceOptimizeSkewedJoin did not engage the split under the downstream " +
        "aggregation — knob regression")
    spark.stop()
  }
}

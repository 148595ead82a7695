package graft.tools

import graft.GraftSession
import graft.operators.AsOfJoin
import org.apache.spark.sql.functions._

/** Measures the as-of join's hot-key behavior: one pathological key
  * owning millions of probe rows serializes the unsalted running-last
  * window onto a single task; the salted variant spreads it over
  * time-range salts. `runMain graft.tools.ProfileAsOf [nProbes] [nRefs]`
  * prints both timings plus a result checksum proving they agree.
  * Numbers quoted in NOTES_r4.md came from this tool.
  */
object ProfileAsOf {
  def main(args: Array[String]): Unit = {
    val nProbes = args.headOption.map(_.toInt).getOrElse(3000000)
    val nRefs = args.drop(1).headOption.map(_.toInt).getOrElse(300000)
    val spark = GraftSession.local(appName = "profile-asof")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[asof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // ONE key owns everything — the worst case for a keyed window.
    // Colliding ts values exercise tie-breaks and carry-ins.
    val probes = spark.range(nProbes.toLong)
      .select(lit("hot").as("user_id"), (col("id") * 13 % 10000000L).as("p_ts"),
              col("id").as("probe_id"))
      .localCheckpoint(true)
    val refs = spark.range(nRefs.toLong)
      .select(lit("hot").as("user_id"), (col("id") * 97 % 10000000L).as("r_ts"),
              (col("id") + 1000000000L).as("ref_id"))
      .localCheckpoint(true)
    println(s"[asof] $nProbes probes, $nRefs refs, 1 key")

    val unsalted = time("unsalted (1 task sorts all)") {
      val d = AsOfJoin.asOfBackward(probes, refs, "user_id", "p_ts", "r_ts",
        "ref_id", Seq("ref_id", "r_ts")).localCheckpoint(true)
      d
    }
    val salted = time("salted x32") {
      val d = AsOfJoin.asOfBackwardSalted(probes, refs, "user_id", "p_ts", "r_ts",
        "ref_id", Seq("ref_id", "r_ts"), salts = 32).localCheckpoint(true)
      d
    }
    // bit_xor: order-independent and overflow-free under ANSI mode
    val a = time("checksum unsalted")(
      unsalted.select(xxhash64(col("probe_id"), col("asof_ref_id"), col("asof_r_ts")).as("h"))
        .agg(expr("bit_xor(h)")).as[Long].head())
    val b = time("checksum salted")(
      salted.select(xxhash64(col("probe_id"), col("asof_ref_id"), col("asof_r_ts")).as("h"))
        .agg(expr("bit_xor(h)")).as[Long].head())
    println(s"[asof] checksums: unsalted=$a salted=$b equal=${a == b}")
    require(a == b, "salted result diverged from unsalted")

    // The noise-free scale metric: the largest window partition is the
    // one task no cluster size can shrink. Unsalted = the whole key;
    // salted = the biggest (key, time-range) slice.
    val union = probes.select(col("user_id"), col("p_ts").as("ts"))
      .unionByName(refs.select(col("user_id"), col("r_ts").as("ts")))
    val unsaltedMax = union.groupBy("user_id").count()
      .agg(max("count")).as[Long].head()
    val bounds = union.stat.approxQuantile("ts", (1 until 32).map(_ / 32.0).toArray, 0.01)
    val saltExpr = bounds.zipWithIndex
      .foldLeft(when(col("ts").isNull, 0)) { case (acc, (b, i)) => acc.when(col("ts") <= b, i) }
      .otherwise(31)
    val saltedMax = union.withColumn("salt", saltExpr)
      .groupBy("user_id", "salt").count()
      .agg(max("count")).as[Long].head()
    println(s"[asof] max window partition: unsalted=$unsaltedMax salted=$saltedMax " +
      f"(${unsaltedMax.toDouble / saltedMax}%.1fx smaller)")
    spark.stop()
  }
}

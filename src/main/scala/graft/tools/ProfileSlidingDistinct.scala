package graft.tools

import graft.GraftSession
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Measures exact vs merged-HLL sliding-window distinct at event
  * volumes where the difference is structural, not noise:
  * `runMain graft.tools.ProfileSlidingDistinct [nEvents] [nUsers] [nDays]`.
  *
  * The exact path's second distinct re-deduplicates every (window-day,
  * user) pair — its shuffle grows with daily-active volume × 7. The
  * sketch path's window shuffle moves nDays × 2^lgK bytes regardless
  * of volume: the structural claim quoted in NOTES_r4.md, measured
  * here together with the per-day max relative error actually
  * observed. */
object ProfileSlidingDistinct {
  def main(args: Array[String]): Unit = {
    val nEvents = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nUsers = args.drop(1).headOption.map(_.toLong).getOrElse(2000000L)
    val nDays = args.drop(2).headOption.map(_.toInt).getOrElse(30)
    val spark = GraftSession.local(appName = "profile-sliding")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[sliding] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // deterministic skewed activity: user u is active on day d iff
    // xxhash64(u, d) clears a per-user threshold — heavy users daily,
    // the tail sporadic (the realistic WAU shape)
    val events = spark.range(nEvents)
      .select(
        to_timestamp(lit("2024-01-01 00:00:00")).as("base"),
        (abs(xxhash64(col("id"))) % nUsers).as("user_id"),
        (abs(xxhash64(col("id"), lit(7))) % nDays).cast("int").as("d"))
      .select(col("user_id"),
        (unix_micros(col("base")) + col("d").cast("long") * 86400000000L).as("us"))
      .select(col("user_id"), expr("timestamp_micros(us)").as("ts"))
      .localCheckpoint(true)
    println(s"[sliding] $nEvents events, $nUsers users, $nDays days")

    // qe07's exact shape (PipelineQueries.slidingDistinct is bound to
    // the fixture tables; this is the same plan over the synthetic frame)
    val exact = time("exact (double distinct)") {
      val dayUser = events.select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      val days = dayUser.select(col("day").as("win_day")).distinct()
      val u7 = dayUser
        .select(col("day"), col("user_id"), explode(sequence(lit(0), lit(6))).as("off"))
        .select(date_add(col("day"), col("off")).as("win_day"), col("user_id"))
        .distinct()
        .join(broadcast(days), "win_day")
        .groupBy(col("win_day")).agg(count(lit(1)).as("u7"))
      u7.localCheckpoint(true)
    }
    val approx = time("merged HLL (lgK=12)") {
      Sketches.slidingApproxDistinct(events, "ts", "user_id").localCheckpoint(true)
    }
    val joined = exact.withColumnRenamed("win_day", "day")
      .join(approx.withColumnRenamed("approx_distinct", "a"), "day")
      .select(max(abs(col("a") - col("u7")).cast("double") / col("u7").cast("double")))
      .as[Double].head()
    println(f"[sliding] max relative error over $nDays days: $joined%.4f")
    require(joined < 0.05, s"sketch error $joined above the 3-sigma band")
    spark.stop()
  }
}

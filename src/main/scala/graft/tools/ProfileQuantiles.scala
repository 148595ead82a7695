package graft.tools

import graft.GraftSession
import graft.operators.Sketches
import org.apache.spark.sql.functions._

/** Measures exact vs merged-KLL trailing-window quantiles at volumes
  * where the difference is structural:
  * `runMain graft.tools.ProfileQuantiles [nRows] [nDays] [windowDays]`.
  *
  * The exact path sorts every window's rows (windowDays × volume rows
  * through percentile windows); the sketch path's window stage merges
  * nDays × partitions fixed ~few-KB summaries — volume-independent,
  * exactly the sliding-HLL argument applied to quantiles. Reports the
  * max observed |rank(est) − p| across all windows and probs against
  * KLL's ±1.65% (k=200, 99%) contract. */
object ProfileQuantiles {
  def main(args: Array[String]): Unit = {
    val nRows = args.headOption.map(_.toLong).getOrElse(20000000L)
    val nDays = args.drop(1).headOption.map(_.toInt).getOrElse(30)
    val windowDays = args.drop(2).headOption.map(_.toInt).getOrElse(7)
    val probs = Seq(0.5, 0.95, 0.99)
    val spark = GraftSession.local(appName = "profile-quantiles")
    import spark.implicits._

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[quantiles] $label%-26s ${(System.nanoTime() - t0) / 1e9}%8.2f s"); r
    }

    // log-normal-ish doc lengths drifting upward by day (so windows
    // genuinely differ and a stale estimate would show)
    val rows = spark.range(nRows)
      .select(
        (abs(xxhash64(col("id"), lit(3))) % nDays).cast("int").as("d"),
        (abs(xxhash64(col("id"))) % 100000).as("u"))
      .select(col("d"),
        (pow(col("u").cast("double") / 100000.0, 3.0) * 10000.0 +
          col("d").cast("double") * 50.0).as("v"))
      .select(
        expr("timestamp_micros(unix_micros(timestamp '2024-01-01 00:00:00') + " +
          "cast(d as long) * 86400000000)").as("ts"),
        col("v"))
      .localCheckpoint(true)
    println(s"[quantiles] $nRows rows, $nDays days, window $windowDays")

    val approx = time(s"merged KLL (k=200)") {
      Sketches.slidingSketchQuantiles(rows, "ts", "v", windowDays, k = 200, probs)
        .localCheckpoint(true)
    }
    // exact windows: explode each row into the trailing windows it
    // belongs to, one percentile sort per window — the cost being priced
    val exact = time("exact (window percentile)") {
      val days = rows.select(to_date(col("ts")).as("win_day")).distinct()
      rows.select(to_date(col("ts")).as("day"), col("v"),
          explode(sequence(lit(0), lit(windowDays - 1))).as("off"))
        .select(date_add(col("day"), col("off")).as("win_day"), col("v"))
        .join(broadcast(days), "win_day")
        .groupBy(col("win_day"))
        .agg(expr(s"percentile(v, array(${probs.mkString(",")}))").as("qs"),
             count(lit(1)).as("n"))
        .localCheckpoint(true)
    }
    // rank check: for each window and prob, the fraction of the window
    // at-or-below the KLL estimate must sit within the rank contract
    val est = approx.select(col("day").as("win_day") +:
      probs.zipWithIndex.map { case (p, i) =>
        col(s"p${(p * 100).round}").as(s"est_$i") }: _*)
    val ranks = rows.select(to_date(col("ts")).as("day"), col("v"),
        explode(sequence(lit(0), lit(windowDays - 1))).as("off"))
      .select(date_add(col("day"), col("off")).as("win_day"), col("v"))
      .join(broadcast(est), "win_day")
      .groupBy(col("win_day"))
      .agg(count(lit(1)).as("n"),
        probs.indices.map(i =>
          sum(when(col("v") <= col(s"est_$i"), 1L).otherwise(0L)).as(s"le_$i")): _*)
    val maxErr = ranks.select(greatest(probs.zipWithIndex.map { case (p, i) =>
        abs(col(s"le_$i").cast("double") / col("n").cast("double") - lit(p)) }: _*)
        .as("e"))
      .agg(max(col("e"))).as[Double].head()
    println(f"[quantiles] max |rank(est) - p| over windows×probs: $maxErr%.4f")
    require(maxErr < 0.0495, s"KLL rank error $maxErr above the 3x contract band")
    spark.stop()
  }
}

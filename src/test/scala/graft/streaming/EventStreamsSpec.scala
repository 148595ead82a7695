package graft.streaming

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:$sec%02d")

  test("windowedTypeCounts aggregates a real stream with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF.toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.windowedTypeCounts(df, windowDur = "10 minutes")
      .writeStream.format("memory").queryName("win_counts")
      .outputMode("complete").start()
    try {
      mem.addData(
        (1L, ts(1), "click", 1.0), (2L, ts(4), "click", 2.0),
        (3L, ts(7), "view", 5.0), (4L, ts(12), "click", 3.0))
      q.processAllAvailable()
      val out = spark.table("win_counts")
        .select($"window_start", $"event_type", $"n_events", $"total_value")
        .as[(Timestamp, String, Long, Double)].collect().toSet
      assert(out == Set(
        (ts(0), "click", 2L, 3.0),
        (ts(0), "view", 1L, 5.0),
        (ts(10), "click", 1L, 3.0)))
    } finally q.stop()
  }

  test("dedupedEvents drops in-watermark duplicate event_ids") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, String, Double)]
    val df = mem.toDF.toDF("event_id", "ts", "event_type", "value")
    val q = EventStreams.dedupedEvents(df)
      .writeStream.format("memory").queryName("dedup_events")
      .outputMode("append").start()
    try {
      mem.addData((1L, ts(1), "click", 1.0), (1L, ts(2), "click", 1.0), (2L, ts(3), "view", 2.0))
      q.processAllAvailable()
      mem.addData((1L, ts(4), "click", 1.0))   // duplicate in later batch
      q.processAllAvailable()
      val ids = spark.table("dedup_events").select("event_id").as[Long].collect().toSeq
      assert(ids.sorted == Seq(1L, 2L))
    } finally q.stop()
  }

  test("intervalJoin pairs events across two real streams within the delay bound") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, Timestamp, Long, String)]
    val rMem = MemoryStream[(Long, Timestamp, Long, String)]
    val cols = Seq("event_id", "ts", "user_id", "event_type")
    val q = EventStreams.intervalJoin(
        lMem.toDF.toDF(cols: _*), rMem.toDF.toDF(cols: _*), maxDelay = "10 minutes")
      .writeStream.format("memory").queryName("ij_out")
      .outputMode("append").start()
    try {
      lMem.addData((1L, ts(0), 7L, "view"), (2L, ts(0), 8L, "view"))
      rMem.addData(
        (10L, ts(5), 7L, "purchase"),    // within 10m, same user → pair
        (11L, ts(25), 7L, "purchase"),   // too late → no pair
        (12L, ts(5), 9L, "purchase"))    // other user → no pair
      q.processAllAvailable()
      val out = spark.table("ij_out").select("l_id", "r_id")
        .as[(Long, Long)].collect().toSet
      assert(out == Set((1L, 10L)))
    } finally q.stop()
  }

  test("intervalJoinLeftOuter emits the abandoned left once the watermark proves it") {
    implicit val sqlCtx = spark.sqlContext
    val lMem = MemoryStream[(Long, Timestamp, Long, String)]
    val rMem = MemoryStream[(Long, Timestamp, Long, String)]
    val cols = Seq("event_id", "ts", "user_id", "event_type")
    val q = EventStreams.intervalJoinLeftOuter(
        lMem.toDF.toDF(cols: _*), rMem.toDF.toDF(cols: _*),
        maxDelay = "10 minutes", watermark = "5 minutes")
      .writeStream.format("memory").queryName("ijo_out")
      .outputMode("append").start()
    try {
      lMem.addData((1L, ts(0), 7L, "view"),   // will match
                   (2L, ts(0), 8L, "view"))   // will never match
      rMem.addData((10L, ts(5), 7L, "purchase"))
      q.processAllAvailable()
      // matched pair emits promptly; the abandoned view cannot yet
      val sofar = spark.table("ijo_out").select("l_id", "r_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(sofar == Set((1L, Some(10L))))
      // advance BOTH watermarks far past l_ts + maxDelay + watermark
      lMem.addData((3L, ts(60), 9L, "view"))
      rMem.addData((11L, ts(60), 9L, "purchase"))
      q.processAllAvailable()
      lMem.addData((4L, ts(120), 9L, "view"))
      rMem.addData((12L, ts(120), 9L, "purchase"))
      q.processAllAvailable()
      val out = spark.table("ijo_out").select("l_id", "r_id")
        .as[(Long, Option[Long])].collect().toSet
      assert(out.contains((2L, None)), s"abandoned left must emit null-extended: $out")
      assert(out.contains((1L, Some(10L))))
    } finally q.stop()
  }

  test("viewToPurchase batch twin pairs views with in-window purchases only") {
    val events = Seq(
      (1L, ts(0), 7L, "view", 1.0),
      (2L, ts(10), 7L, "purchase", 9.0),   // within 30m of view 1
      (3L, ts(45), 7L, "purchase", 5.0),   // outside 30m
      (4L, ts(5), 8L, "purchase", 2.0),    // other user
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val out = EventStreams.viewToPurchase(events, maxDelayMs = 1800000L)
      .select("view_id", "purchase_id").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("anomalyStream matches anomalyBatch across micro-batch splits") {
    implicit val sqlCtx = spark.sqlContext
    def day(d: Int, n: Int): Seq[EventStreams.Event] =
      (1 to n).map(i => EventStreams.Event(d * 100L + i,
        Timestamp.valueOf(f"2024-01-$d%02d 10:00:${i % 60}%02d"), 7L, "click", 1.0))
    // user 7: daily counts 3, 5, 4, 20, 1 — day 4 is the anomaly
    val all = day(1, 3) ++ day(2, 5) ++ day(3, 4) ++ day(4, 20) ++ day(5, 1)
    val mem = MemoryStream[EventStreams.Event]
    val q = EventStreams.anomalyStream(mem.toDS())
      .writeStream.format("memory").queryName("anomalies").outputMode("append").start()
    try {
      // split mid-day-2 to prove state carries across micro-batches
      mem.addData(all.take(5): _*); q.processAllAvailable()
      mem.addData(all.drop(5): _*); q.processAllAvailable()
      val stream = spark.table("anomalies")
        .as[EventStreams.AnomalyOut].collect()
        .map(a => (a.user_id, a.day, a.n_events, a.z)).toSet
      val batch = EventStreams.anomalyBatch(all.toDF())
        .select($"user_id", $"day", $"n_events", $"z")
        .as[(Long, String, Long, Option[Double])].collect().toSet
      assert(stream == batch, s"stream $stream\nbatch $batch")
      // closed days 1..4 emitted (day 5 still open); day 4 flags hard
      assert(stream.map(_._2) ==
        Set("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04"))
      val day4 = stream.find(_._2 == "2024-01-04").get
      assert(day4._4.exists(_ > 2.0), s"day-4 z not anomalous: $day4")
      // first two days have no scoreable history
      assert(stream.filter(r => r._2 <= "2024-01-02").forall(_._4.isEmpty))
    } finally q.stop()
  }

  test("sessionize (flatMapGroupsWithState) matches sessionizeBatch on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[EventStreams.Event]
    val events = Seq(
      EventStreams.Event(1, ts(0), 7, "click", 1.0),
      EventStreams.Event(2, ts(5), 7, "view", 2.0),     // same session (gap 5m < 10m)
      EventStreams.Event(3, ts(40), 7, "click", 4.0),   // new session (gap 35m)
      EventStreams.Event(4, ts(2), 8, "view", 8.0))
    val q = EventStreams.sessionize(mem.toDS(), gapMs = 10 * 60 * 1000,
        timeout = org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout())
      .writeStream.format("memory").queryName("sessions").outputMode("append").start()
    try {
      mem.addData(events: _*)
      q.processAllAvailable()
      // user 7's first session closed by the in-batch gap
      val closed = spark.table("sessions")
        .as[EventStreams.SessionOut].collect()
      assert(closed.length == 1)
      assert(closed.head.user_id == 7 && closed.head.n_events == 2 && closed.head.total_value == 3.0)
      // batch twin agrees on the full set of sessions
      val batch = EventStreams.sessionizeBatch(
        events.toDF(), gapMs = 10 * 60 * 1000)
        .select($"user_id", $"n_events", $"total_value")
        .as[(Long, Long, Double)].collect().toSet
      assert(batch == Set((7L, 2L, 3.0), (7L, 1L, 4.0), (8L, 1L, 8.0)))
    } finally q.stop()
  }

  test("upsertStream merges each micro-batch into the parquet target") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString + "/target"
    val mem = MemoryStream[(Long, String, Int)]
    val df = mem.toDF.toDF("id", "name", "likes")
    val q = EventStreams.upsertStream(df, Seq("id"), dir).start()
    try {
      mem.addData((1L, "a", 1), (2L, "b", 2))
      q.processAllAvailable()
      mem.addData((2L, "b2", 20), (3L, "c", 3))   // update + insert
      q.processAllAvailable()
      val out = spark.read.parquet(dir)
        .select(col("id"), col("name"), col("likes"))
        .as[(Long, String, Int)].collect().toSet
      assert(out == Set((1L, "a", 1), (2L, "b2", 20), (3L, "c", 3)))
    } finally q.stop()
  }

  test("expectationsStream: per-batch contract reports, batch twin, replay overwrite") {
    import graft.operators.Expectations.{MinValue, RowCountBetween, Unique}
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("graft-sexp").toString
    val checks = Seq(Unique("id"), MinValue("amount", 0.0), RowCountBetween(1L, 10L))
    val mem = MemoryStream[(Long, Double)]
    val q = EventStreams.expectationsStream(
      mem.toDF.toDF("id", "amount"), checks, dir).start()
    try {
      mem.addData((1L, 5.0), (2L, 7.0))                 // clean batch
      q.processAllAvailable()
      mem.addData((3L, -4.0), (3L, 1.0))                // dup id + negative
      q.processAllAvailable()
      val rep = spark.read.parquet(dir)
        .select(col("batch_id"), col("expectation"), col("pass"))
        .as[(Long, String, Boolean)].collect().toSet
      assert(rep.filter(_._1 == 0L).forall(_._3), s"clean batch flagged: $rep")
      assert(rep.contains((1L, "unique", false)) && rep.contains((1L, "min_value", false)))
      assert(rep.contains((1L, "row_count", true)))
      // batch twin: the streaming report rows equal the batch suite on
      // the same content
      val twin = graft.operators.Expectations
        .suite(Seq((3L, -4.0), (3L, 1.0)).toDF("id", "amount"), checks)
        .select(col("expectation"), col("pass")).as[(String, Boolean)].collect().toSet
      assert(rep.filter(_._1 == 1L).map(r => (r._2, r._3)) == twin)
    } finally q.stop()

    // replay without the checkpoint: batch 0 re-delivers; the dynamic
    // partition overwrite keeps exactly one report per batch_id
    val before = spark.read.parquet(dir).count()
    val mem2 = MemoryStream[(Long, Double)]
    val q2 = EventStreams.expectationsStream(
      mem2.toDF.toDF("id", "amount"), checks, dir).start()
    try {
      mem2.addData((1L, 5.0), (2L, 7.0))
      q2.processAllAvailable()
      assert(spark.read.parquet(dir).count() == before, "replayed report duplicated rows")
    } finally q2.stop()
  }

  test("dedupStream dedups each micro-batch against the growing signature store") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-sdedup").toString
    val store = s"$base/store"; val decisions = s"$base/decisions"
    val text = "the quick brown fox jumps over the lazy dog today again"
    graft.operators.IncrementalDedup.initStore(
      Seq((0L, text)).toDF("doc_id", "text"), store)
    val mem = MemoryStream[(Long, String)]
    val q = EventStreams.dedupStream(
      mem.toDF.toDF("doc_id", "text"), store, decisions, threshold = 0.9).start()
    try {
      mem.addData((10L, text), (11L, "totally new words never stored before anywhere"))
      q.processAllAvailable()
      mem.addData((20L, "totally new words never stored before anywhere"))
      q.processAllAvailable()
      val out = spark.read.parquet(decisions)
        .select("doc_id", "dup_of").as[(Long, Option[Long])].collect().toMap
      assert(out(10L).contains(0L))   // dup of the seeded store doc
      assert(out(11L).isEmpty)        // unique -> appended to store
      assert(out(20L).contains(11L))  // matches the doc batch 1 appended
    } finally q.stop()

    // crash-replay: restart the stream WITHOUT its checkpoint so batch 0
    // re-delivers against a store that already holds its appends — the
    // applied-markers skip the second append and the batch_id partition
    // overwrite keeps decisions exactly-once
    val storeRows = spark.read.parquet(store).count()
    val before = spark.read.parquet(decisions)
      .select("doc_id", "dup_of").as[(Long, Option[Long])].collect().toMap
    val mem2 = MemoryStream[(Long, String)]
    val q2 = EventStreams.dedupStream(
      mem2.toDF.toDF("doc_id", "text"), store, decisions, threshold = 0.9).start()
    try {
      mem2.addData((10L, text), (11L, "totally new words never stored before anywhere"))
      q2.processAllAvailable()
      val after = spark.read.parquet(decisions)
        .select("doc_id", "dup_of").as[(Long, Option[Long])].collect().toMap
      assert(after == before)                              // no dup rows, no self-dups
      assert(spark.read.parquet(store).count() == storeRows) // store did not grow again
    } finally q2.stop()
  }

  test("quality-gated dedup stream: the rule census composes as a streaming pre-gate") {
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-qgate").toString
    val store = s"$base/store"; val decisions = s"$base/decisions"
    val good = "the quick brown fox jumps with the dog and the cat today"
    graft.operators.IncrementalDedup.initStore(
      Seq((0L, good)).toDF("doc_id", "text"), store)
    val mem = MemoryStream[(Long, String)]
    // gopherFlags is a pure projection, so it drops straight into the
    // streaming plan; only passing docs reach the dedup store
    val gated = graft.operators.QualityRules.gopherFlags(
        mem.toDF.toDF("doc_id", "text"),
        minWords = 5L, maxWords = 50L, extraCols = Seq("text"))
      .filter($"pass").select($"doc_id", $"text")
    val q = EventStreams.dedupStream(gated, store, decisions, threshold = 0.9).start()
    try {
      mem.addData(
        (10L, good),                                               // dup of the stored doc
        (11L, "aa bb !!"),                                         // fails every rule -> gated out
        (12L, "a fresh group of words with the dog and the cat here now")) // unique keeper
      q.processAllAvailable()
      // a batch the gate empties entirely must not break the stream
      mem.addData((13L, "zz !!"))
      q.processAllAvailable()
      val out = spark.read.parquet(decisions)
        .select("doc_id", "dup_of").as[(Long, Option[Long])].collect().toMap
      assert(out(10L).contains(0L))
      assert(out(12L).isEmpty)
      assert(!out.contains(11L) && !out.contains(13L)) // never reached the pipeline
      // the store grew only by the passing unique doc
      assert(spark.read.parquet(store).select("id")
        .as[Long].collect().toSet == Set(0L, 12L))
    } finally q.stop()
  }

  test("sessionizeBatch on the sf0.001 fixture: sessions partition events") {
    val t = Tables(spark, sf0001)
    val sessions = EventStreams.sessionizeBatch(t.events, gapMs = 1800000L)
    val nEvents = t.events.count()
    assert(sessions.agg(sum($"n_events")).as[Long].head() == nEvents)
    // session bounds are ordered and non-overlapping per user
    val bad = sessions.as[(Long, Long, Timestamp, Timestamp, Long, Double)]
      .collect().groupBy(_._1).values.flatMap { ss =>
        val sorted = ss.sortBy(_._2)
        sorted.zip(sorted.tail).filter { case (a, b) => !a._4.before(b._3) }
      }
    assert(bad.isEmpty)
  }

  test("slidingDistinctStream agrees with the batch sketch on every observed day") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp, Long)]
    val df = mem.toDF.toDF("event_id", "ts", "user_id")
    val q = EventStreams.slidingDistinctStream(df, windowDays = 7)
      .writeStream.format("memory").queryName("sliding_hll")
      .outputMode("complete").start()
    def day(d: Int, h: Int = 10): Timestamp =
      Timestamp.valueOf(f"2024-01-$d%02d $h%02d:00:00")
    // three days of activity with overlapping users, split mid-stream
    val b1 = Seq((1L, day(1), 100L), (2L, day(1), 101L), (3L, day(2), 100L))
    val b2 = Seq((4L, day(2), 102L), (5L, day(3), 103L), (6L, day(3), 100L))
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val streamed = spark.table("sliding_hll")
        .as[(java.sql.Date, Long)].collect().toMap
      val batch = graft.operators.Sketches.slidingApproxDistinct(
          (b1 ++ b2).toDF("event_id", "ts", "user_id"), "ts", "user_id")
        .as[(java.sql.Date, Long)].collect().toMap
      // batch restricts to observed days; the stream also carries the
      // trailing days past the last event — agree on the batch domain
      assert(batch.keySet.subsetOf(streamed.keySet))
      batch.foreach { case (d, n) =>
        assert(streamed(d) == n, s"$d: stream ${streamed(d)} != batch $n") }
      // small exact cardinalities: HLL is exact in sparse mode
      assert(batch(java.sql.Date.valueOf("2024-01-01")) == 2L)
      assert(batch(java.sql.Date.valueOf("2024-01-03")) == 4L)
    } finally q.stop()
  }

  test("driftStream matches driftBatch across a micro-batch split and scores drift") {
    implicit val sqlCtx = spark.sqlContext
    val ref = Seq("click" -> 0.5, "view" -> 0.5)
    val mem = MemoryStream[(Long, Timestamp, String)]
    val df = mem.toDF.toDF("event_id", "ts", "event_type")
    val q = EventStreams.driftStream(df, ref, windowDur = "10 minutes")
      .writeStream.format("memory").queryName("drift")
      .outputMode("complete").start()
    // window 1: balanced (zero drift); window 2: all clicks + one
    // unmonitored type (excluded from the domain total)
    val w1 = Seq((1L, ts(1), "click"), (2L, ts(3), "view"),
                 (3L, ts(5), "click"), (4L, ts(7), "view"))
    val w2 = Seq((5L, ts(11), "click"), (6L, ts(13), "click"),
                 (7L, ts(15), "error"), (8L, ts(17), "click"))
    try {
      mem.addData(w1: _*); q.processAllAvailable()   // split mid-stream:
      mem.addData(w2: _*); q.processAllAvailable()   // w2 is a later batch
      val streamed = spark.table("drift").as[
        (Timestamp, Timestamp, Long, String, Long, Double, Double, Double)]
        .collect().toSet
      val batch = EventStreams.driftBatch(
          (w1 ++ w2).toDF("event_id", "ts", "event_type"), ref, windowDur = "10 minutes")
        .as[(Timestamp, Timestamp, Long, String, Long, Double, Double, Double)]
        .collect().toSet
      assert(streamed == batch, s"stream $streamed != batch $batch")
      val byKey = streamed.map(r => (r._1, r._4) -> r).toMap
      // balanced window: share == ref → KL terms exactly 0
      assert(byKey(ts(0) -> "click")._8 == 0.0 && byKey(ts(0) -> "view")._8 == 0.0)
      // drifted window: all mass on click → its KL term is ln(2) rounded
      val drifted = byKey(ts(10) -> "click")
      assert(drifted._5 == 3L && drifted._6 == 1.0)
      assert(math.abs(drifted._8 - 0.693147) < 1e-12)
      assert(byKey(ts(10) -> "view")._8 == 0.0)  // zero-count type: 0, not NaN
      // the unmonitored 'error' event is outside the domain total
      assert(drifted._3 == 3L)
    } finally q.stop()
  }
}

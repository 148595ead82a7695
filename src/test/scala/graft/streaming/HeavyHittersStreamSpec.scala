package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import EventStreams.{MgState, mgBucket, mgFold}

/** Streaming Misra-Gries heavy hitters: fixed nBuckets·k state, the
  * deterministic inclusion guarantee, and stream == batch-twin fold
  * across micro-batch boundaries (the qe replay-determinism
  * discipline: per-batch sorted processing makes state a pure function
  * of batch contents). */
class HeavyHittersStreamSpec extends SparkTestBase {
  import spark.implicits._

  private def foldAll(batches: Seq[Seq[String]], k: Int, nBuckets: Int): Map[(Int, String), Long] = {
    var states = Map.empty[Int, MgState].withDefaultValue(MgState(Map.empty, 0L))
    batches.foreach { b =>
      b.groupBy(mgBucket(_, nBuckets)).foreach { case (bkt, items) =>
        states += bkt -> mgFold(states(bkt), items, k)
      }
    }
    for ((bkt, s) <- states; (i, v) <- s.counters) yield (bkt, i) -> v
  }

  test("mgFold: the inclusion guarantee — any item above n/(k+1) survives, counts undercount bounded") {
    // 60 'hot', 15 each of 8 'cold-*' → n = 180, k = 4: hot (60 > 36) must survive
    val items = Seq.fill(60)("hot") ++ (0 until 8).flatMap(i => Seq.fill(15)(s"cold$i"))
    val s = mgFold(MgState(Map.empty, 0L), items, k = 4)
    assert(s.processed == 180)
    assert(s.counters.contains("hot"), s"hot item evicted: ${s.counters}")
    val slack = (s.processed - s.counters.values.sum) / 5.0
    assert(s.counters("hot") >= 60 - slack && s.counters("hot") <= 60,
      s"count ${s.counters("hot")} outside MG bound [${60 - slack}, 60]")
  }

  test("mgFold: exact when distinct items fit the counter budget") {
    val items = Seq.fill(7)("a") ++ Seq.fill(3)("b") ++ Seq.fill(5)("c")
    val s = mgFold(MgState(Map.empty, 0L), items, k = 8)
    assert(s.counters == Map("a" -> 7L, "b" -> 3L, "c" -> 5L))
  }

  test("stream across micro-batches == the batch-twin fold, latest row per (bucket, item)") {
    implicit val sqlCtx = spark.sqlContext
    val b1 = Seq.fill(10)("x") ++ Seq.fill(4)("y") ++ Seq("z1", "z2", "z3")
    val b2 = Seq.fill(6)("x") ++ Seq.fill(9)("w") ++ Seq("z4", "z5")
    val mem = MemoryStream[String]
    val out = EventStreams.heavyHittersStream(mem.toDS(), k = 3, nBuckets = 2)
    val q = out.writeStream.format("memory").queryName("mg_out")
      .outputMode("update").start()
    try {
      mem.addData(b1: _*); q.processAllAvailable()
      mem.addData(b2: _*); q.processAllAvailable()
      val served = spark.sql("SELECT * FROM mg_out").collect()
        .map(r => (r.getInt(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3))))
        .groupBy(_._1)
        // Update mode appends refreshed summaries; serve the latest
        // emission per key (max bucket_processed)
        .map { case (key, rows) => key -> rows.map(_._2).maxBy(_._2)._1 }
      val twin = foldAll(Seq(b1, b2), k = 3, nBuckets = 2)
      // every surviving twin counter must be served with the same count
      twin.foreach { case (key, v) =>
        assert(served.get(key).contains(v),
          s"$key: stream served ${served.get(key)}, twin says $v\nserved=$served\ntwin=$twin")
      }
    } finally q.stop()
  }

  test("state is bounded: at most k counters per bucket regardless of cardinality") {
    val items = (0 until 500).map(i => s"item$i")
    val s = mgFold(MgState(Map.empty, 0L), items, k = 6)
    assert(s.counters.size <= 6 && s.processed == 500)
  }
}

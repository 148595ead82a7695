package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
    .digest(s.getBytes).map("%02x".format(_)).mkString

  test("wsTokens counts whitespace tokens, collapsing runs and edges") {
    val got = Seq("a  b c", "  x ", "", "one").toDF("t")
      .select(Packing.wsTokens($"t")).as[Int].collect().toSeq
    assert(got == Seq(3, 1, 0, 1))
  }

  test("packPlacements: contiguous md5-ordered stream, floor-div placement, straddle flag") {
    val docs = Seq((1L, 7L), (2L, 3L), (3L, 12L), (4L, 0L), (5L, 5L))
      .toDF("id", "n")
    val got = Packing.packPlacements(docs, "id", "n", seqLen = 10)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap

    // replay the exact layout host-side in md5 order
    val order = Seq(1L, 2L, 3L, 4L, 5L).sortBy(i => (md5hex(i.toString), i))
    val toks = Map(1L -> 7L, 2L -> 3L, 3L -> 12L, 4L -> 0L, 5L -> 5L)
    var off = 0L
    order.foreach { id =>
      val n = toks(id)
      val start = off
      val lastTok = math.max(start + n - 1, start)
      val want = (n, start, start / 10, lastTok / 10, start / 10 != lastTok / 10)
      assert(got(id) == want, s"doc $id: got ${got(id)}, want $want")
      off += n + 1 // separator
    }
  }

  test("packingReport reconciles with the placements") {
    val docs = (1L to 100L).map(i => (i, (i % 13) + 1)).toDF("id", "n")
    val placed = Packing.packPlacements(docs, "id", "n", seqLen = 32).collect()
    val rep = Packing.packingReport(docs, "id", "n", seqLen = 32).head()
    assert(rep.getLong(0) == 100L)
    assert(rep.getLong(1) == (1L to 100L).map(i => (i % 13) + 1).sum)
    assert(rep.getLong(2) == placed.map(_.getLong(4)).max + 1)
    assert(rep.getLong(3) == placed.count(_.getBoolean(5)).toLong)
    // pad fraction: capacity minus stream over capacity, in [0, 1)
    val cap = rep.getLong(2) * 32
    val stream = rep.getLong(1) + 100L
    assert(math.abs(rep.getDouble(5) - math.rint((cap - stream).toDouble / cap * 1e6) / 1e6) < 1e-9)
  }

  test("placements are partitioning-invariant (md5 order is global, not physical)") {
    val docs = (1L to 60L).map(i => (i, i % 7)).toDF("id", "n")
    val a = Packing.packPlacements(docs.repartition(1), "id", "n", seqLen = 16)
      .orderBy($"id").collect().toSeq
    val b = Packing.packPlacements(docs.repartition(13), "id", "n", seqLen = 16)
      .orderBy($"id").collect().toSeq
    assert(a == b)
  }

  test("pad_frac clamps at 0 when the final doc's separator spills past the last sequence") {
    // one 10-token doc at seqLen=10: the stream is 11 tokens (doc+sep)
    // but the single sequence is fully occupied — pad is 0, not -1/10
    val rep = Packing.packingReport(Seq((1L, 10L)).toDF("id", "n"), "id", "n", seqLen = 10).head()
    assert(rep.getLong(2) == 1L, "one fully-occupied sequence")
    assert(rep.getDouble(5) == 0.0, s"pad_frac must clamp to 0, got ${rep.getDouble(5)}")
  }

  test("guardrails: positive seqLen, non-negative separator") {
    val docs = Seq((1L, 2L)).toDF("id", "n")
    intercept[IllegalArgumentException](Packing.packPlacements(docs, "id", "n", seqLen = 0))
    intercept[IllegalArgumentException](
      Packing.packPlacements(docs, "id", "n", seqLen = 8, sepTokens = -1))
  }
}

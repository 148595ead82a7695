package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** [[GraphMetrics.hits]] — Kleinberg hubs/authorities with the
  * quantized-normalization determinism contract (the qg03 discipline
  * applied to two coupled score vectors). The hand trajectory below is
  * computed on paper for the 3-node chain-with-fanin fixture:
  *
  *   1 → 3, 2 → 3, 3 → 4
  *
  * Round 1: a ∝ in-weighted h0=1: a(3)=2/3, a(4)=1/3 (1e-9 grid:
  * 0.666666667 / 0.333333333); h from those: h(1)=h(2)=
  * 666666667/1666666667 → 0.4, h(3)=0.2, h(4)=0.
  * Round 2: a(3)=0.8, a(4)=0.2; h(1)=h(2)=8e8/1.8e9 → 0.444444444,
  * h(3)=0.111111111 (floor(... + 0.5) grid), h(4)=0.
  */
class HitsSpec extends SparkTestBase {
  import spark.implicits._

  private def chain = Seq((1L, 3L), (2L, 3L), (3L, 4L)).toDF("src", "dst")

  private def scores(iters: Int): Map[Long, (Double, Double)] =
    GraphMetrics.hits(chain, iters).collect()
      .map { case Row(n: Long, h: Double, a: Double) => n -> (h, a) }.toMap

  test("hand-computed round-1 trajectory") {
    val s = scores(1)
    assert(s(3L) === (0.2, 0.666666667))
    assert(s(4L) === (0.0, 0.333333333))
    assert(s(1L) === (0.4, 0.0))
    assert(s(2L) === (0.4, 0.0))
  }

  test("hand-computed round-2 trajectory") {
    val s = scores(2)
    assert(s(1L) === (0.444444444, 0.0))
    assert(s(2L) === (0.444444444, 0.0))
    assert(s(3L) === (0.111111111, 0.8))
    assert(s(4L) === (0.0, 0.2))
  }

  test("a sink is a pure authority (hub exactly 0.0), a source a pure hub") {
    val s = scores(3)
    assert(s(4L)._1 === 0.0)     // no out-edges: hub 0, not a missing row
    assert(s(1L)._2 === 0.0)     // no in-edges: authority 0
    assert(s.size === 4)         // every node reported
  }

  test("edge direction decides the role: reversal flips pure hubs to pure authorities") {
    // NOT an exact score swap: the standard authority-first update
    // order means forward h1 uses a1 while reversed a1 uses h0 — the
    // coupled iterations are offset by half a step. The ROLE structure
    // (who has exactly-zero hub / authority mass) is what direction
    // determines outright.
    val rev = chain.select($"dst".as("src"), $"src".as("dst"))
    val bwd = GraphMetrics.hits(rev, 3).collect()
      .map { case Row(n: Long, h: Double, a: Double) => n -> (h, a) }.toMap
    assert(bwd(4L)._2 === 0.0 && bwd(4L)._1 > 0.0)  // was pure authority, now pure hub
    assert(bwd(1L)._1 === 0.0 && bwd(1L)._2 > 0.0)  // was pure hub, now pure authority
    assert(bwd(2L)._1 === 0.0 && bwd(2L)._2 > 0.0)
  }

  test("self-loops and duplicate edges are ignored") {
    val noisy = chain
      .unionByName(Seq((1L, 3L), (5L, 5L)).toDF("src", "dst"))
    val s = GraphMetrics.hits(noisy, 2).collect()
      .map { case Row(n: Long, h: Double, a: Double) => n -> (h, a) }.toMap
    // node 5 only had a self-loop: it contributes no edge, so it never
    // appears as a node either
    assert(!s.contains(5L))
    assert(s === scores(2))
  }

  test("partitioning invariance") {
    val wide = GraphMetrics.hits(chain.repartition(13), 3).collect()
      .map { case Row(n: Long, h: Double, a: Double) => n -> (h, a) }.toMap
    assert(wide === scores(3))
  }

  test("iters guard") {
    intercept[IllegalArgumentException] { GraphMetrics.hits(chain, 0) }
  }
}

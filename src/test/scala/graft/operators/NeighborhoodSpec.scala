package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

class NeighborhoodSpec extends SparkTestBase {

  import spark.implicits._

  private def edges(rows: (Long, Long)*): DataFrame = rows.toDF("a", "b")

  private def exact(e: DataFrame, maxR: Int): Map[Int, (Long, Double)] =
    GraphMetrics.neighborhoodFunction(e, maxR).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap

  test("path graph: hand-computed ball growth to the diameter, then saturation") {
    // 1-2-3-4-5: N(0)=5, N(1)=5+2·4=13, N(2)=19, N(3)=23, N(4)=25=|V|²
    val got = exact(edges((1, 2), (2, 3), (3, 4), (4, 5)), maxR = 5)
    assert(got.view.mapValues(_._1).toMap === Map(0 -> 5L, 1 -> 13L, 2 -> 19L, 3 -> 23L, 4 -> 25L, 5 -> 25L))
    assert(got(0)._2 === 1.0)
    assert(got(4)._2 === 5.0)
  }

  test("star graph: everything within two hops of everything") {
    val got = exact(edges((0, 1), (0, 2), (0, 3), (0, 4)), maxR = 2)
    assert(got(1)._1 === 13L) // 5 self + 2·4 center-leaf pairs
    assert(got(2)._1 === 25L)
  }

  test("components never leak: two triangles saturate at 2 x 9 pairs") {
    val got = exact(edges((1, 2), (2, 3), (1, 3), (10, 11), (11, 12), (10, 12)), maxR = 3)
    assert(got(1)._1 === 18L)
    assert(got(3)._1 === 18L)
  }

  test("edge canonicalization: duplicates, reversed pairs and self-loops don't change N(r)") {
    val messy = edges((1, 2), (2, 1), (1, 2), (1, 1), (2, 3))
    val clean = edges((1, 2), (2, 3))
    assert(exact(messy, 2) === exact(clean, 2))
  }

  test("HyperBall tracks the exact neighborhood function within sketch error") {
    // deterministic ~60-node graph: ring + chords
    val ring = (0L until 60L).map(i => (i, (i + 1) % 60))
    val chords = (0L until 60L by 5).map(i => (i, (i + 17) % 60))
    val e = (ring ++ chords).toDF("a", "b")
    val ex = exact(e, 4)
    val ap = GraphMetrics.neighborhoodFunctionApprox(e, maxR = 4, lgK = 14).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (r <- 0 to 4) {
      val rel = math.abs(ap(r) - ex(r)._1.toDouble) / ex(r)._1.toDouble
      assert(rel < 0.05, s"radius $r: est ${ap(r)} vs exact ${ex(r)._1} (rel $rel)")
    }
    // ball membership only grows → register maxes only grow → monotone
    assert((0 to 3).forall(r => ap(r) <= ap(r + 1)), s"estimates not monotone: $ap")
  }

  test("HyperBall estimates are invariant to the input partitioning (register merge is a max)") {
    val e = (0L until 40L).map(i => (i, (i + 1) % 40)).toDF("a", "b")
    val a = GraphMetrics.neighborhoodFunctionApprox(e, maxR = 3).collect().map(_.getDouble(1)).toSeq
    val b = GraphMetrics.neighborhoodFunctionApprox(e.repartition(13), maxR = 3)
      .collect().map(_.getDouble(1)).toSeq
    assert(a === b)
  }

  test("regime boundary |V|=512: HyperBall agrees with the exact leg within sketch error") {
    // qg10/qg11 hand off exact → HyperBall at ExactNeighborhoodMaxV=512
    // vertices (ExtendedQueries). This pins the handoff WHERE BOTH LEGS
    // ARE COMPUTABLE — the largest graph the priced switch would still
    // serve exactly — so the sf0.1 regime-skip rests on a verified
    // switch, not a trusted one. Production parameters: maxR=6, default
    // lgK=12 (2^12 registers → ~1.6% rsd per ball; 5% aggregate bound
    // is conservative).
    val ring = (0L until 512L).map(i => (i, (i + 1) % 512))
    val chords = (0L until 512L by 7).map(i => (i, (i * 31 + 64) % 512))
      .filter { case (a, b) => a != b }
    val e = (ring ++ chords).toDF("a", "b")
    val ex = exact(e, 6)
    val ap = GraphMetrics.neighborhoodFunctionApprox(e, maxR = 6).collect()
      .map(r => r.getInt(0) -> r.getDouble(1)).toMap
    for (r <- 0 to 6) {
      val rel = math.abs(ap(r) - ex(r)._1.toDouble) / ex(r)._1.toDouble
      assert(rel < 0.05, s"radius $r: est ${ap(r)} vs exact ${ex(r)._1} (rel $rel)")
    }
    // the scalar the function exists to serve: effective diameter read
    // from either leg lands within one radius
    def effDiam(nf: Map[Int, Double]): Int = {
      val mx = nf.values.max
      (0 to 6).find(r => nf(r) >= 0.9 * mx).get
    }
    val dEx = effDiam(ex.view.mapValues(_._1.toDouble).toMap)
    val dAp = effDiam(ap)
    assert(math.abs(dEx - dAp) <= 1, s"eff diameter: exact $dEx vs approx $dAp")
  }

  test("guards reject non-positive radius and out-of-range lgK loudly") {
    val e = edges((1, 2))
    intercept[IllegalArgumentException](GraphMetrics.neighborhoodFunction(e, 0))
    intercept[IllegalArgumentException](GraphMetrics.neighborhoodFunctionApprox(e, 2, lgK = 2))
  }
}

package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class GraphMetricsSpec extends SparkTestBase {
  import spark.implicits._

  private def count3(edges: Seq[(Long, Long)]): (Long, Long, Long) =
    GraphMetrics.triangleCount(edges.toDF("a", "b"))
      .as[(Long, Long, Long)].collect().head

  test("triangleCount: K4 has 4 triangles; dangling path adds none") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    assert(count3(k4) == ((4L, 6L, 4L)))
    assert(count3(k4 ++ Seq((4L, 5L), (5L, 6L))) == ((6L, 8L, 4L)))
  }

  test("triangleCount: canonicalization — direction, duplicates, self-loops ignored") {
    val messy = Seq((2L, 1L), (1L, 2L), (3L, 1L), (2L, 3L), (3L, 3L))
    assert(count3(messy) == ((3L, 3L, 1L)))
  }

  test("triangleCount: star graph — hub apexes no wedges, zero triangles") {
    val star = (1L to 50L).map(l => (0L, l))
    assert(count3(star) == ((51L, 50L, 0L)))
  }

  test("pageRank: symmetric ring stays uniform; star concentrates rank at the hub") {
    val ring = (0L until 10L).map(i => (i, (i + 1) % 10)).toDF("a", "b")
    val rr = GraphMetrics.pageRank(ring, iters = 5)
      .select("pagerank").as[Double].collect()
    assert(rr.length == 10)
    // uniform start on a vertex-transitive graph is the fixed point
    assert(rr.forall(r => math.abs(r - 0.1) < 1e-6), rr.toSeq.toString)
    val star = (1L to 20L).map(l => (0L, l)).toDF("a", "b")
    val sr = GraphMetrics.pageRank(star, iters = 5)
      .orderBy($"node").select("node", "pagerank").as[(Long, Double)].collect()
    val hub = sr.head._2; val leaves = sr.tail.map(_._2)
    assert(leaves.forall(hub > _), s"hub $hub not above leaves ${leaves.max}")
    assert(leaves.toSet.size == 1, "leaves are symmetric — equal ranks")
    // total rank is conserved (no dangling mass in a symmetric graph)
    assert(math.abs(sr.map(_._2).sum - 1.0) < 1e-5)
  }

  test("pageRank is partition-invariant (decimal-exact contribution sums)") {
    val edges = (0L until 30L).flatMap(i => Seq((i, (i + 1) % 30), (i, (i + 7) % 30)))
      .toDF("a", "b")
    val a = GraphMetrics.pageRank(edges, iters = 4)
      .orderBy($"node").collect().toSeq
    val b = GraphMetrics.pageRank(edges.repartition(13), iters = 4)
      .orderBy($"node").collect().toSeq
    assert(a == b)
  }

  test("degree-oriented count equals naive ordered count on the co-activity graph") {
    val t = Tables(spark, sf0001)
    val b = t.events.select($"user_id".as("u"), $"event_type".as("et"),
                            date_trunc("minute", $"ts").as("m")).distinct()
    val edges = b.select($"u".as("a"), $"et", $"m")
      .join(b.select($"u".as("b"), $"et", $"m"), Seq("et", "m"))
      .filter($"a" < $"b").select($"a", $"b")
    val oriented = GraphMetrics.triangleCount(edges)
      .select("n_triangles").as[Long].collect().head
    val e = GraphMetrics.canonicalEdges(edges)
    val naive = e.select($"a", $"b")
      .join(e.select($"a".as("b"), $"b".as("c")), "b")
      .join(e.select($"a", $"b".as("c")), Seq("a", "c"), "left_semi")
      .count()
    assert(oriented == naive, s"degree-oriented $oriented != naive $naive")
  }
}

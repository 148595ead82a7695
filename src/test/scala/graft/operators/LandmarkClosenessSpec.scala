package graft.operators

import graft.SparkTestBase

class LandmarkClosenessSpec extends SparkTestBase {
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString

  /** reference: multi-source BFS capped at maxDepth */
  private def refCloseness(edges: Seq[(Long, Long)], k: Int, maxDepth: Int)
      : Map[Long, (Long, Long, Double)] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (n, es) => n -> es.map(_._2).toSet }
    val nodes = adj.keySet
    val lms = nodes.toSeq.sortBy(n => (md5hex(n.toString), n)).take(k)
    val dists = lms.map { lm =>
      var frontier = Set(lm); var seen = Map(lm -> 0L); var d = 0L
      while (frontier.nonEmpty && d < maxDepth) {
        d += 1
        frontier = frontier.flatMap(adj.getOrElse(_, Set.empty)) -- seen.keySet
        seen = seen ++ frontier.map(_ -> d)
      }
      seen
    }
    nodes.map { n =>
      val ds = dists.flatMap(_.get(n))
      // decimal-exact micro-unit sum, matching the operator's
      // round-6 → DECIMAL(18,6) → double pipeline
      val harmMicros = ds.filter(_ > 0)
        .map(d => math.rint(1.0 / d * 1e6).toLong).sum
      n -> (ds.size.toLong, ds.sum, harmMicros / 1e6)
    }.toMap
  }

  private val pathAndPair =
    Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))

  test("matches the reference multi-source BFS on a path plus a detached pair") {
    val got = GraphMetrics.landmarkCloseness(
        pathAndPair.toDF("a", "b"), nLandmarks = 2, maxDepth = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == refCloseness(pathAndPair, 2, 8))
    assert(got.keySet == Set(0L, 1L, 2L, 3L, 4L, 10L, 11L))
  }

  test("a component no landmark lands in reports zero coverage") {
    // k=1: the single landmark sits in one component; the other is dark
    val got = GraphMetrics.landmarkCloseness(
        pathAndPair.toDF("a", "b"), nLandmarks = 1, maxDepth = 8)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    val dark = got.filter(_._2 == (0L, 0L, 0.0)).keySet
    assert(dark == Set(0L, 1L, 2L, 3L, 4L) || dark == Set(10L, 11L))
    assert(got == refCloseness(pathAndPair, 1, 8))
  }

  test("the horizon cap truncates distances, exactly as documented") {
    val line = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val got = GraphMetrics.landmarkCloseness(line.toDF("a", "b"),
        nLandmarks = 1, maxDepth = 2)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got == refCloseness(line, 1, 2))
    assert(got.values.exists(_._1 == 0L), "something beyond the horizon")
  }

  test("guardrails") {
    intercept[IllegalArgumentException](
      GraphMetrics.landmarkCloseness(pathAndPair.toDF("a", "b"), nLandmarks = 0))
    intercept[IllegalArgumentException](
      GraphMetrics.landmarkCloseness(pathAndPair.toDF("a", "b"), maxDepth = 0))
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

/** [[Scc.strongComponents]] vs a host-side brute-force transitive
  * closure on adversarial fixtures: cycles, chains, rho shapes,
  * self-loops, nested condensations, and the counterexample that kills
  * the (min-ancestor, min-descendant) pair heuristic. */
class SccSpec extends SparkTestBase {
  import spark.implicits._

  /** Brute force: scc_id(v) = min over {v} ∪ {u : v→*u ∧ u→*v}. */
  private def truth(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val reach = collection.mutable.Set[(Long, Long)](edges: _*)
    var grew = true
    while (grew) {
      grew = false
      for ((a, b) <- reach.toSeq; (c, d) <- reach.toSeq if b == c && !reach((a, d))) {
        reach += ((a, d)); grew = true
      }
    }
    nodes.map { v =>
      val mutual = nodes.filter(u => reach((v, u)) && reach((u, v)))
      v -> (v +: mutual).min
    }.toMap
  }

  private def run(edges: Seq[(Long, Long)]): Map[Long, Long] =
    Scc.strongComponents(edges.toDF("src", "dst")).collect()
      .map { case Row(n: Long, s: Long) => n -> s }.toMap

  private def check(edges: Seq[(Long, Long)]): Unit =
    assert(run(edges) === truth(edges))

  test("cycle, chain, rho, self-loop, mutual pair — matches brute force") {
    // 3-cycle {1,2,3}; chain 10->11->12; rho tail 20 -> the cycle;
    // self-loop 30; mutual pair {40,41}
    check(Seq((1L, 2L), (2L, 3L), (3L, 1L), (10L, 11L), (11L, 12L),
      (20L, 1L), (30L, 30L), (40L, 41L), (41L, 40L)))
  }

  test("the (min-ancestor, min-descendant) heuristic counterexample stays split") {
    // 2 and 3 share min ancestor 1 AND min descendant 0 but are NOT
    // mutually reachable — a pair-heuristic SCC would merge them
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 0L), (3L, 0L))
    val got = run(edges)
    assert(got(2L) === 2L && got(3L) === 3L)
    assert(got === truth(edges))
  }

  test("nested condensation: cycle feeding a cycle peels in phases") {
    // {1,2} -> {3,4}: first phase confirms {1,2} (root 1 colors all),
    // second phase must still find {3,4}
    val edges = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 4L), (4L, 3L))
    val got = run(edges)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L))
  }

  test("long chain is trimmed, not phase-peeled") {
    // without TRIM a 12-chain needs 12 peel phases; maxPhases=3 proves
    // trim handles it
    val chain = (0L until 12L).map(i => (i, i + 1))
    val got = Scc.strongComponents(chain.toDF("src", "dst"), maxPhases = 3)
      .collect().map { case Row(n: Long, s: Long) => n -> s }.toMap
    assert(got === (0L to 12L).map(i => i -> i).toMap)
  }

  test("string node type (host graphs)") {
    val got = Scc.strongComponents(
        Seq(("a.com", "b.com"), ("b.com", "a.com"), ("b.com", "c.com"))
          .toDF("src", "dst"))
      .collect().map { case Row(n: String, s: String) => n -> s }.toMap
    assert(got === Map("a.com" -> "a.com", "b.com" -> "a.com", "c.com" -> "c.com"))
  }

  test("partitioning invariance and duplicate edges") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L), (1L, 2L), (5L, 6L))
    val wide = Scc.strongComponents(edges.toDF("src", "dst").repartition(17))
      .collect().map { case Row(n: Long, s: Long) => n -> s }.toMap
    assert(wide === truth(edges))
  }

  test("random graphs match brute force (seeded)") {
    val rnd = new scala.util.Random(7)
    for (_ <- 1 to 5) {
      val n = 12
      val edges = Seq.fill(20)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter { case (a, b) => a != b || rnd.nextBoolean() }
      check(edges)
    }
  }

  test("an under-budget round cap fails LOUDLY, never silently mis-assigns") {
    // a 40-cycle needs ~40 propagation rounds; with maxRounds=8 the
    // run must abort (wrong components are the one unacceptable
    // outcome — a partial peel would shatter the cycle into fake
    // singletons on the next phase)
    val cycle = (0L until 40L).map(i => (i, (i + 1) % 40))
    intercept[IllegalArgumentException] {
      Scc.strongComponents(cycle.toDF("src", "dst"), maxRounds = 8)
    }
    // and with an adequate budget the same graph resolves exactly
    val got = Scc.strongComponents(cycle.toDF("src", "dst"), maxRounds = 64)
      .collect().map { case Row(n: Long, s: Long) => n -> s }.toMap
    assert(got === (0L until 40L).map(i => i -> 0L).toMap)
  }

  test("guards and empty input") {
    intercept[IllegalArgumentException] {
      Scc.strongComponents(Seq((1L, 2L)).toDF("src", "dst"), maxRounds = 0)
    }
    assert(Scc.strongComponents(
      Seq.empty[(Long, Long)].toDF("src", "dst")).count() === 0)
  }
}

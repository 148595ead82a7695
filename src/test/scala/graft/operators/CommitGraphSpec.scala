package graft.operators

import graft.SparkTestBase

/** Commit-DAG semantics on a hand-drawn graph:
  *
  *   m ← b1 ← b2        (feature branch)
  *   m ← c1 ← c2 ← c3   (main line)     merge has parents (c3, b2)
  */
class CommitGraphSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val walk = Seq(
    ("m",     Seq.empty[String]),
    ("b1",    Seq("m")),
    ("b2",    Seq("b1")),
    ("c1",    Seq("m")),
    ("c2",    Seq("c1")),
    ("c3",    Seq("c2")),
    ("merge", Seq("c3", "b2")),
  ).toDF("sha", "parents")

  private lazy val edges = CommitGraph.edgesFromParents(walk)

  test("edgesFromParents explodes parent lists, merge commits get two edges") {
    val e = edges.as[(String, String)].collect().toSet
    assert(e == Set(("b1", "m"), ("b2", "b1"), ("c1", "m"), ("c2", "c1"),
                    ("c3", "c2"), ("merge", "c3"), ("merge", "b2")))
  }

  test("kHopAncestors reports minimum depth across branches") {
    val anc = CommitGraph.kHopAncestors(edges, 4)
      .as[(String, String, Long)].collect()
      .map { case (c, a, d) => (c, a) -> d }.toMap
    assert(anc(("merge", "c3")) == 1)
    assert(anc(("merge", "b2")) == 1)
    assert(anc(("merge", "c2")) == 2)
    assert(anc(("merge", "b1")) == 2)
    // m is reachable via c path (depth 4) AND b path (depth 3) → min 3
    assert(anc(("merge", "m")) == 3)
    assert(anc(("c3", "m")) == 3)
    // depth bound respected
    val anc2 = CommitGraph.kHopAncestors(edges, 2)
      .as[(String, String, Long)].collect().map { case (c, a, d) => (c, a) -> d }.toMap
    assert(!anc2.contains(("merge", "m")))
    assert(anc2(("c2", "m")) == 2)
  }

  test("linearEdges chains commits per repo in the given order") {
    val commits = Seq(
      (10L, "r1", 1), (11L, "r1", 2), (12L, "r1", 3),
      (20L, "r2", 1), (21L, "r2", 2),
    ).toDF("sha", "repo", "seq")
    val e = CommitGraph.linearEdges(commits, "sha", "repo", Seq($"seq".asc, $"sha".asc))
      .as[(Long, Long)].collect().toSet
    assert(e == Set((11L, 10L), (12L, 11L), (21L, 20L)))
  }
}

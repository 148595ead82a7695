package graft.operators

import graft.SparkTestBase

/** Pointer-doubling redirect resolution: exact hop counts on chains,
  * loop/overflow sentinels, the maxHops boundary (a chain at distance
  * exactly maxHops resolves, one hop further does not), functional
  * normalization of conflicting observations, and the power-of-two
  * guard. */
class RedirectsSpec extends SparkTestBase {
  import spark.implicits._

  private def resolveMap(edges: Seq[(String, String)], maxHops: Int = 16) =
    Redirects.resolve(edges.toDF("src", "dst"), maxHops = maxHops)
      .collect().map(r => r.getString(0) ->
        (Option(r.getString(1)), r.getLong(2), r.getBoolean(3))).toMap

  test("chains resolve to their terminal with exact hop counts") {
    val edges = Seq("a" -> "b", "b" -> "c", "c" -> "d", "x" -> "d")
    val m = resolveMap(edges)
    assert(m("a") == ((Some("d"), 3L, true)))
    assert(m("b") == ((Some("d"), 2L, true)))
    assert(m("c") == ((Some("d"), 1L, true)))
    assert(m("x") == ((Some("d"), 1L, true)))
    assert(m.size == 4, "one row per distinct source; terminals get no row")
  }

  test("loops and over-long chains sentinel to NULL/false at hops=maxHops") {
    // 3-cycle, self-loop, and a tail INTO the cycle (classic rho shape)
    val edges = Seq("p" -> "q", "q" -> "r", "r" -> "p", "s" -> "s", "t" -> "p")
    val m = resolveMap(edges, maxHops = 8)
    for (n <- Seq("p", "q", "r", "s", "t"))
      assert(m(n) == ((None, 8L, false)), s"$n: ${m(n)}")
  }

  test("the maxHops boundary is exact: distance maxHops resolves, +1 does not") {
    // chain n0 -> n1 -> ... -> n17 (17 edges): n1 is 16 hops from the
    // terminal n17, n0 is 17
    val edges = (0 until 17).map(i => s"n${"%02d".format(i)}" -> s"n${"%02d".format(i + 1)}")
    val m = resolveMap(edges, maxHops = 16)
    assert(m("n01") == ((Some("n17"), 16L, true)), s"n01: ${m("n01")}")
    assert(m("n00") == ((None, 16L, false)), s"n00: ${m("n00")}")
  }

  test("conflicting observations normalize functionally: smallest target wins") {
    val edges = Seq("a" -> "z2", "a" -> "z1", "z1" -> "end")
    val m = resolveMap(edges)
    assert(m("a") == ((Some("end"), 2L, true)), s"a: ${m("a")}")
  }

  test("null endpoints are not observations") {
    val m = resolveMap(Seq("a" -> "b", "c" -> null, null.asInstanceOf[String] -> "d"))
    assert(m == Map("a" -> ((Some("b"), 1L, true))), s"$m")
  }

  test("maxHops must be a power of two") {
    intercept[IllegalArgumentException] {
      Redirects.resolve(Seq("a" -> "b").toDF("src", "dst"), maxHops = 12)
    }
  }
}

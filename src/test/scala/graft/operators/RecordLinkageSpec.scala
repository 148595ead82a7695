package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RecordLinkageSpec extends SparkTestBase {
  import spark.implicits._
  import RecordLinkage._

  private val rules = Seq(
    FieldRule("l_name", "r_name", 0.9, 0.01),
    FieldRule("l_city", "r_city", 0.8, 0.2))
  private val wNameA = math.log(0.9 / 0.01) / math.log(2.0)
  private val wNameD = math.log(0.1 / 0.99) / math.log(2.0)
  private val wCityA = math.log(0.8 / 0.2) / math.log(2.0)
  private val wCityD = math.log(0.2 / 0.8) / math.log(2.0)

  private def score(l: (Long, Int, String, String), r: (Long, Int, String, String)) =
    linkScores(
      Seq(l).toDF("l_id", "l_blk", "l_name", "l_city"),
      Seq(r).toDF("r_id", "r_blk", "r_name", "r_city"),
      "l_blk", "r_blk", "l_id", "r_id", rules)
      .as[(Long, Long, Double)].collect().toSeq

  test("weights are the hand-computed Fellegi-Sunter log-odds sums") {
    val both = score((1L, 5, "ann", "rome"), (9L, 5, "ann", "rome"))
    assert(both == Seq((1L, 9L, math.rint((wNameA + wCityA) * 1e6) / 1e6)))
    val nameOnly = score((1L, 5, "ann", "rome"), (9L, 5, "ann", "oslo"))
    assert(nameOnly == Seq((1L, 9L, math.rint((wNameA + wCityD) * 1e6) / 1e6)))
    val neither = score((1L, 5, "ann", "rome"), (9L, 5, "bob", "oslo"))
    assert(neither == Seq((1L, 9L, math.rint((wNameD + wCityD) * 1e6) / 1e6)))
  }

  test("blocking is absolute: cross-block pairs are never scored") {
    assert(score((1L, 5, "ann", "rome"), (9L, 6, "ann", "rome")).isEmpty)
  }

  test("NULL fields count as disagreement") {
    val l = Seq((1L, 5, Some("ann"), Some("rome"))).toDF("l_id", "l_blk", "l_name", "l_city")
    val r = Seq((9L, 5, Option.empty[String], Some("rome"))).toDF("r_id", "r_blk", "r_name", "r_city")
    val got = linkScores(l, r, "l_blk", "r_blk", "l_id", "r_id", rules)
      .as[(Long, Long, Double)].collect().head
    assert(got._3 == math.rint((wNameD + wCityA) * 1e6) / 1e6)
  }

  test("classify applies the two-threshold decision rule; guardrails hold") {
    val scores = Seq((1L, 9L, 12.0), (2L, 9L, 3.0), (3L, 9L, -5.0))
      .toDF("l_id", "r_id", "weight")
    val v = classify(scores, upper = 10.0, lower = 0.0)
      .select($"l_id", $"verdict").as[(Long, String)].collect().toMap
    assert(v == Map(1L -> "match", 2L -> "possible", 3L -> "non_match"))
    intercept[IllegalArgumentException](classify(scores, upper = 0.0, lower = 0.0))
    intercept[IllegalArgumentException](FieldRule("a", "b", m = 0.2, u = 0.5))
    intercept[IllegalArgumentException](
      linkScores(scores, scores, "weight", "weight", "l_id", "r_id", Seq.empty))
  }

  test("planted registry: exact copies land in the match band, dirty copies in review") {
    val people = Seq((1L, 7, "ann", "rome"), (2L, 7, "bob", "rome"), (3L, 7, "cho", "oslo"))
    val copies = Seq((11L, 7, "ann", "rome"),   // exact dup of 1
                     (12L, 7, "bobx", "rome"),  // typo'd dup of 2
                     (13L, 7, "zed", "rome"))   // unrelated
    // weaker name model (m=0.8, u=0.01) + stronger city (m=0.9, u=0.1):
    // wNameD = log2(.2/.99) ≈ −2.31 < wCityA = log2(9) ≈ 3.17, so
    // city-only evidence lands in the review band instead of rejection
    val rules2 = Seq(FieldRule("l_name", "r_name", 0.8, 0.01),
                     FieldRule("l_city", "r_city", 0.9, 0.1))
    val v = classify(linkScores(
        people.toDF("l_id", "l_blk", "l_name", "l_city"),
        copies.toDF("r_id", "r_blk", "r_name", "r_city"),
        "l_blk", "r_blk", "l_id", "r_id", rules2), upper = 6.0, lower = 0.0)
      .as[(Long, Long, Double, String)].collect()
      .map(r => (r._1, r._2) -> r._4).toMap
    assert(v((1L, 11L)) == "match")
    assert(v((2L, 12L)) == "possible")   // name typo: city evidence only
    assert(v((2L, 13L)) == "possible")   // same-city stranger: the FS ambiguity band
    assert(v((1L, 12L)) == "possible")   // ann vs bobx, same city — review band too
    assert(v((3L, 13L)) == "non_match")  // different city, different name
  }
}

package graft.hfc

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkTestBase {
  import spark.implicits._

  private val historySchema = Seq.empty[(Long, String, Long, Option[Long])]
    .toDF("k", "attr", "valid_from", "valid_to")

  private def apply0(history: org.apache.spark.sql.DataFrame,
                     updates: Seq[(Long, String, Long, Long)]) =
    Scd2.applyChanges(history,
        updates.toDF("k", "attr", "ts", "tie"), "k", "attr", "ts", "tie")
      .orderBy($"k", $"valid_from", $"attr")
      .as[(Long, String, Long, Option[Long])].collect().toSeq

  test("build from scratch: consecutive repeats collapse, versions chain") {
    val got = apply0(historySchema, Seq(
      (1L, "A", 10L, 1L), (1L, "A", 20L, 2L), (1L, "B", 30L, 3L), (1L, "A", 40L, 4L)))
    assert(got == Seq(
      (1L, "A", 10L, Some(30L)), (1L, "B", 30L, Some(40L)), (1L, "A", 40L, None)))
  }

  test("merge against standing history: no-change collapses, change closes the current row") {
    val history = Seq(
      (1L, "Z", 1L, Some(5L)),      // closed version — must survive untouched
      (1L, "A", 5L, Option.empty[Long]),
      (2L, "X", 3L, Option.empty[Long])  // untouched key
    ).toDF("k", "attr", "valid_from", "valid_to")
    val got = apply0(history, Seq(
      (1L, "A", 10L, 1L),   // equals the standing attr → collapses
      (1L, "B", 20L, 2L),   // real change → closes A at 20
      (3L, "N", 7L, 3L)))   // brand-new key
    assert(got == Seq(
      (1L, "Z", 1L, Some(5L)),
      (1L, "A", 5L, Some(20L)),
      (1L, "B", 20L, None),
      (2L, "X", 3L, None),
      (3L, "N", 7L, None)))
  }

  test("NULL attribute values: transitions to/from NULL are real changes, " +
       "runs of NULL collapse, and the prior version is closed") {
    val nullableUpdates = Seq(
      (1L, Some("A"), 10L, 1L),
      (1L, Option.empty[String], 20L, 2L),  // A → NULL: a real change
      (1L, Option.empty[String], 30L, 3L),  // NULL → NULL: collapses
      (1L, Some("B"), 40L, 4L))             // NULL → B: a real change
      .toDF("k", "attr", "ts", "tie")
    val emptyHist = Seq.empty[(Long, Option[String], Long, Option[Long])]
      .toDF("k", "attr", "valid_from", "valid_to")
    val got = Scd2.applyChanges(emptyHist, nullableUpdates, "k", "attr", "ts", "tie")
      .orderBy($"k", $"valid_from")
      .as[(Long, Option[String], Long, Option[Long])].collect().toSeq
    assert(got == Seq(
      (1L, Some("A"), 10L, Some(20L)),   // closed BY the NULL version
      (1L, None, 20L, Some(40L)),        // one NULL version, run collapsed
      (1L, Some("B"), 40L, None)))
  }

  test("NULL update against a standing non-null current row closes it") {
    val history = Seq((1L, Some("A"), 5L, Option.empty[Long]))
      .toDF("k", "attr", "valid_from", "valid_to")
    val got = Scd2.applyChanges(history,
        Seq((1L, Option.empty[String], 10L, 1L)).toDF("k", "attr", "ts", "tie"),
        "k", "attr", "ts", "tie")
      .orderBy($"k", $"valid_from")
      .as[(Long, Option[String], Long, Option[Long])].collect().toSeq
    assert(got == Seq((1L, Some("A"), 5L, Some(10L)), (1L, None, 10L, None)))
  }

  test("same-timestamp updates order by the tie-break column") {
    val got = apply0(historySchema, Seq((1L, "B", 10L, 2L), (1L, "A", 10L, 1L)))
    assert(got == Seq((1L, "A", 10L, Some(10L)), (1L, "B", 10L, None)))
  }

  test("version chains are contiguous and non-overlapping (as-of joinable)") {
    val updates = (0 until 50).map(i =>
      (i.toLong % 5, s"v${i % 3}", (i / 5).toLong * 10, i.toLong))
    val chains = apply0(historySchema, updates).groupBy(_._1)
    chains.values.foreach { vs =>
      // exactly one current version per key
      assert(vs.count(_._4.isEmpty) == 1)
      // each version's valid_to equals the next version's valid_from
      vs.sliding(2).foreach {
        case Seq(a, b) => assert(a._4.contains(b._3), s"gap in chain: $a -> $b")
        case _ => ()
      }
    }
  }

  test("applying updates is partitioning-invariant") {
    val ups = (0 until 60).map(i => (i.toLong % 7, s"a${i % 4}", i.toLong * 3, i.toLong))
    val a = Scd2.applyChanges(historySchema, ups.toDF("k", "attr", "ts", "tie")
        .repartition(1), "k", "attr", "ts", "tie")
      .orderBy($"k", $"valid_from").collect().toSeq
    val b = Scd2.applyChanges(historySchema, ups.toDF("k", "attr", "ts", "tie")
        .repartition(13), "k", "attr", "ts", "tie")
      .orderBy($"k", $"valid_from").collect().toSeq
    assert(a == b)
  }
}

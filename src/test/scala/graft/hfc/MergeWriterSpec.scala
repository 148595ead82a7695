package graft.hfc

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame

/** K2/K3/K4 upsert semantics (SURVEY.md §5.2-5.3: idempotence,
  * first-writer-wins, column-targeted update). */
class MergeWriterSpec extends SparkTestBase {
  import spark.implicits._

  private def tbl(rows: (String, Int, String)*): DataFrame =
    rows.toDF("id", "likes", "name")

  private def sortedRows(df: DataFrame): Seq[(String, Int, String)] =
    df.as[(String, Int, String)].collect().toSeq.sortBy(_._1)

  test("upsert inserts new keys and overwrites existing") {
    val existing = tbl(("a", 1, "x"), ("b", 2, "y"))
    val updates  = tbl(("b", 20, "y2"), ("c", 3, "z"))
    val out = MergeWriter.upsert(existing, updates, Seq("id"))
    assert(sortedRows(out) == Seq(("a", 1, "x"), ("b", 20, "y2"), ("c", 3, "z")))
  }

  test("upsert is idempotent: applying the same batch twice == once") {
    val existing = tbl(("a", 1, "x"))
    val batch    = tbl(("a", 5, "x5"), ("d", 4, "w"))
    val once  = MergeWriter.upsert(existing, batch, Seq("id"))
    val twice = MergeWriter.upsert(once, batch, Seq("id"))
    assert(sortedRows(once) == sortedRows(twice))
  }

  test("upsert resolves batch-internal dups keeping the last row") {
    val existing = tbl(("a", 1, "x"))
    val batch    = tbl(("b", 1, "first"), ("b", 2, "last"))
    val out = MergeWriter.upsert(existing, batch, Seq("id"))
    assert(sortedRows(out).find(_._1 == "b").get == ("b", 2, "last"))
  }

  test("insertIfAbsent keeps existing rows (first-writer-wins)") {
    val existing = tbl(("a", 1, "orig"))
    val updates  = tbl(("a", 99, "clobber"), ("b", 2, "new"))
    val out = MergeWriter.insertIfAbsent(existing, updates, Seq("id"))
    assert(sortedRows(out) == Seq(("a", 1, "orig"), ("b", 2, "new")))
  }

  test("updateColumns touches only the listed columns, ignores unmatched keys") {
    val existing = tbl(("a", 1, "x"), ("b", 2, "y"))
    val updates  = tbl(("a", 100, "IGNORED"), ("zz", 7, "nope"))
    val out = MergeWriter.updateColumns(existing, updates, Seq("id"), Seq("likes"))
    assert(sortedRows(out) == Seq(("a", 100, "x"), ("b", 2, "y")))
  }

  test("stalenessSplit partitions exactly on the watermark") {
    import org.apache.spark.sql.functions._
    val df = Seq(("a", "2024-01-15"), ("b", "2024-03-02"))
      .toDF("id", "d").withColumn("d", col("d").cast("timestamp"))
    val (stale, fresh) = MergeWriter.stalenessSplit(df, "d", lit("2024-02-01").cast("timestamp"))
    assert(stale.select("id").as[String].collect().toSeq == Seq("a"))
    assert(fresh.select("id").as[String].collect().toSeq == Seq("b"))
  }
}

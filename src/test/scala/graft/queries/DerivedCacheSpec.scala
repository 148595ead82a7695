package graft.queries

import graft.{SparkTestBase, Tables}

/** The qg-family derived-frame memo (co-activity edges, neighborhood
  * table) is keyed on DATA IDENTITY, not just (session, dir): if the
  * backing events.parquet is regenerated inside the same JVM session,
  * the memo must rebuild from the new files and unpersist the stale
  * checkpoint instead of silently serving old edges (ADVICE r9). */
class DerivedCacheSpec extends SparkTestBase {
  import spark.implicits._

  private def writeEvents(dir: String, users: Seq[Long]): Unit =
    users.map(u => (u, "click", java.sql.Timestamp.valueOf("2024-03-01 12:00:30")))
      .toDF("user_id", "event_type", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")

  test("regenerating events.parquet invalidates the co-activity memo and unpersists the stale checkpoint") {
    val dir = java.nio.file.Files.createTempDirectory("tables").toString
    // 3 users in one (type, minute) bucket: K3 -> exactly one triangle
    writeEvents(dir, Seq(1L, 2L, 3L))
    val first = ExtendedQueries.triangleCensus(Tables(spark, dir)).collect().head
    assert(first.getAs[Long]("n_triangles") == 1L, first.toString)
    val persistedBefore = spark.sparkContext.getPersistentRDDs.size

    // regenerate: only 2 users -> a single edge, zero triangles
    writeEvents(dir, Seq(1L, 2L))
    val second = ExtendedQueries.triangleCensus(Tables(spark, dir)).collect().head
    assert(second.getAs[Long]("n_triangles") == 0L,
      s"stale memo served the pre-regeneration edge frame: $second")
    assert(second.getAs[Long]("n_edges") == 1L)

    // the replaced checkpoint was unpersisted: the rebuild swaps the
    // persisted RDD rather than accumulating one per regeneration
    assert(spark.sparkContext.getPersistentRDDs.size <= persistedBefore,
      "stale checkpoint RDD leaked after invalidation")
  }

  test("same data, same memo: repeated reads hit the cached frame (no rebuild)") {
    val dir = java.nio.file.Files.createTempDirectory("tables").toString
    writeEvents(dir, Seq(1L, 2L, 3L))
    ExtendedQueries.triangleCensus(Tables(spark, dir)).collect()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    ExtendedQueries.triangleCensus(Tables(spark, dir)).collect()
    // subset, not size equality: ContextCleaner may collect DEAD
    // localCheckpoint blocks from earlier suites between the two reads
    // (a shrink is fine); the memo contract only forbids NEW persists
    val after = spark.sparkContext.getPersistentRDDs.keySet
    assert(after.subsetOf(before),
      s"unchanged input must not trigger a rebuild / new checkpoint: " +
        s"new persistent RDDs ${after -- before}")
  }

  test("invalidateDerivedCaches drops and unpersists every memoized frame") {
    val dir = java.nio.file.Files.createTempDirectory("tables").toString
    writeEvents(dir, Seq(1L, 2L, 3L))
    ExtendedQueries.triangleCensus(Tables(spark, dir)).collect()
    ExtendedQueries.invalidateDerivedCaches()
    // after the explicit hook the next read rebuilds and still answers
    val again = ExtendedQueries.triangleCensus(Tables(spark, dir)).collect().head
    assert(again.getAs[Long]("n_triangles") == 1L)
  }
}

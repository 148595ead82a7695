package graft.operators

import graft.{SparkTestBase, Tables}

/** Pins the IVF fit/apply split: the stored index's probe path must
  * (a) return exactly what the in-memory chain returns and (b) carry
  * the probed cells as PARTITION filters on the corpus scan — the
  * property that makes a query touch nProbe/nCells of 100 TB. */
class IvfIndexSpec extends SparkTestBase {
  import spark.implicits._

  private val qs = (0L until 10L).toSeq

  test("storage-backed probe matches the in-memory build+probe chain") {
    val t = Tables(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    try {
      IvfIndex.build(t.embeddings, dir, nCells = 8)
      val stored = IvfIndex.topKFromStorage(spark, dir, qs, k = 5, nProbe = 2)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
        .as[(Long, Long, Double, Long)].collect().toSet
      val inMem = Similarity.ivfTopK(t.embeddings, qs, k = 5, nCells = 8, nProbe = 2)
        .select("query_id", "neighbor_id", "cos_sim", "rk")
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(stored == inMem)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }

  test("probe scan prunes to the probed cell partitions (PartitionFilters)") {
    val t = Tables(spark, sf0001)
    val dir = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    try {
      IvfIndex.build(t.embeddings, dir, nCells = 8)
      val plan = IvfIndex.topKFromStorage(spark, dir, Seq(0L), k = 5, nProbe = 2)
        .queryExecution.executedPlan.toString
      assert(plan.contains("PartitionFilters: [cell"),
        s"expected a cell partition filter on the corpus scan:\n$plan")
      // and the filter is selective: 2 probed cells, not IN(all 8)
      val filterLine = plan.linesIterator.find(_.contains("PartitionFilters: [cell")).get
      val inList = "IN \\(([0-9,]+)\\)".r.findFirstMatchIn(filterLine).map(_.group(1))
      assert(inList.exists(_.split(",").length <= 2),
        s"probe should touch nProbe=2 cells: $filterLine")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}

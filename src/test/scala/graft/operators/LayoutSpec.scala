package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class LayoutSpec extends SparkTestBase {
  import spark.implicits._

  test("zValue2: hand-computed Morton codes") {
    val df = Seq((1L, 0L), (0L, 1L), (3L, 5L), (4095L, 4095L))
      .toDF("x", "y")
      .select(Layout.zValue2(col("x"), col("y"), bits = 12).as("z"))
    // z(3,5): x bits 011 at even positions -> 1+4, y bits 101 at odd -> 2+32
    assert(df.as[Long].collect().toSeq == Seq(1L, 2L, 39L, (1L << 24) - 1))
  }

  test("zorderAudit: z-prefix buckets are tight rectangles on BOTH dimensions") {
    // the full 64x64 grid at bits=6, bucketBits=4 -> 16 quadrants of 16x16
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val out = Layout.zorderAudit(grid, col("x"), col("y"), bits = 6, bucketBits = 4)
      .collect()
    assert(out.length == 16)
    assert(out.forall(_.getAs[Long]("n_rows") == 256L))
    assert(out.forall { r =>
      r.getAs[Long]("x_max") - r.getAs[Long]("x_min") == 15L &&
      r.getAs[Long]("y_max") - r.getAs[Long]("y_min") == 15L })
  }

  test("zorderAudit: parameter contracts fail loudly") {
    val df = Seq((1L, 1L)).toDF("x", "y")
    intercept[IllegalArgumentException] { Layout.zValue2(col("x"), col("y"), bits = 0) }
    intercept[IllegalArgumentException] {
      Layout.zorderAudit(df, col("x"), col("y"), bits = 4, bucketBits = 9)
    }
  }

  test("globalOrdinal: matches ROW_NUMBER over the global order, shuffled input") {
    val ids = scala.util.Random.shuffle((1 to 1000).map(_ * 7L - 3500L)).toSeq
    val df = ids.toDF("id").repartition(13)
    val out = Layout.globalOrdinal(df, "id", numBuckets = 8)
      .select($"id", $"ordinal").as[(Long, Long)].collect().sortBy(_._2)
    assert(out.map(_._2).toSeq == (1L to 1000L))       // contiguous 1-based ranks
    assert(out.map(_._1).toSeq == ids.sorted)          // rank order == value order
  }

  test("globalOrdinal: no data-scale window — every window is bucket-partitioned") {
    val df = (1 to 100).map(_.toLong).toDF("id")
    val plan = Layout.globalOrdinal(df, "id", numBuckets = 4)
      .queryExecution.optimizedPlan.toString
    // the only unpartitioned-looking window runs over the numBuckets-row
    // offsets frame (constant lit partition); the data window partitions
    // by the bucket id
    assert(plan.contains("windowspecdefinition(__pid"))
  }

  test("globalOrdinal: single bucket degenerates gracefully") {
    val df = Seq(5L, 1L, 3L).toDF("id")
    val out = Layout.globalOrdinal(df, "id", numBuckets = 1)
      .select($"id", $"ordinal").as[(Long, Long)].collect().sortBy(_._2)
    assert(out.toSeq == Seq((1L, 1L), (3L, 2L), (5L, 3L)))
  }

  test("globalOrdinal: sub-1.0 value ranges bucket correctly (scores, ratios)") {
    // values in [0, 0.01): the old integer-spacing formula collapsed
    // these into one bucket (a data-scale window); ranks must hold AND
    // spread across buckets
    val vals = scala.util.Random.shuffle((1 to 500).map(_ * 0.00002)).toSeq
    val out = Layout.globalOrdinal(vals.toDF("score"), "score", numBuckets = 8)
      .select($"score", $"ordinal").as[(Double, Long)].collect().sortBy(_._2)
    assert(out.map(_._1).toSeq == vals.sorted)
    // pin the spread via the bucket formula on the known min/max
    val (mn, mx) = (vals.min, vals.max)
    val pids = vals.map(v => math.min(math.floor((v - mn) / (mx - mn) * 8).toLong, 7L))
    assert(pids.distinct.size == 8, s"expected 8 buckets, got ${pids.distinct.size}")
  }

  test("globalOrdinal: identical values everywhere degenerate to one bucket, not NaN") {
    val out = Layout.globalOrdinal(Seq(2L, 2L).toDF("id").withColumn("id", $"id" * 0 + 7),
        "id", numBuckets = 4)
      .select($"ordinal").as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 2L)) // ties broken arbitrarily but ranks contiguous
  }

  test("ordinalPerKey: matches the per-key window reference, with ties and skew") {
    // skewed keys (one key holds 80%), tied scores — ranks must equal
    // ROW_NUMBER() OVER (PARTITION BY k ORDER BY score, id)
    val rows = (1 to 800).map(i => ("big", i.toLong, (i % 7).toLong)) ++
               (1 to 200).map(i => ("small", 1000L + i, (i % 3).toLong))
    val df = scala.util.Random.shuffle(rows).toDF("k", "id", "score").repartition(9)
    val out = Layout.ordinalPerKey(df, "k", "score", "id", numBuckets = 8)
      .select($"k", $"id", $"ordinal").as[(String, Long, Long)].collect()
    val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
      rs.sortBy(r => (r._3, r._2)).zipWithIndex.map { case (r, i) => (k, r._2, i + 1L) }
    }.toSet
    assert(out.toSet == expected)
    // every ranking window is (key, bucket)-partitioned — no whole-key sort
    val windows = Layout.ordinalPerKey(df, "k", "score", "id")
      .queryExecution.optimizedPlan.toString.linesIterator
      .filter(_.contains("windowspecdefinition")).mkString("\n")
    assert(windows.contains("__pid"), windows)
  }

  test("globalOrdinal: NULL order values fail loudly, never mis-rank") {
    val df = Seq(Some(1L), None, Some(3L)).toDF("id")
    val e = intercept[Exception] {
      Layout.globalOrdinal(df, "id", numBuckets = 4).collect()
    }
    assert(e.getMessage.contains("NULL in order column") ||
      Option(e.getCause).exists(_.getMessage.contains("NULL in order column")))
  }

  test("compact: many small files collapse to the plan's target, data byte-identical") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact").toString + "/t"
    try {
      // 64 micro-files (the streaming-sink pathology)
      (1 to 6400).map(i => (i.toLong, s"row$i")).toDF("id", "v")
        .repartition(64).write.mode("overwrite").parquet(dir)
      val before = Layout.compactionPlan(spark, dir, targetFileBytes = 1L << 20)
      assert(before.nFiles == 64 && before.needed)
      val after = Layout.compact(spark, dir, targetFileBytes = 1L << 20)
      assert(after.nFiles == after.targetFiles && !after.needed)
      val data = spark.read.parquet(dir).as[(Long, String)].collect().sorted
      assert(data.length == 6400 && data.head == ((1L, "row1")))
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("compactionPlan rolls a torn swap forward before reading (crash inside commitDir)") {
    val base = java.nio.file.Files.createTempDirectory("graft-compact3").toString
    val dir = s"$base/t"
    try {
      (1 to 100).map(i => (i.toLong, s"r$i")).toDF("id", "v")
        .coalesce(1).write.mode("overwrite").parquet(dir)
      // simulate the crash window: target renamed away, staging complete
      val fs = org.apache.hadoop.fs.FileSystem.get(
        spark.sparkContext.hadoopConfiguration)
      spark.read.parquet(dir).repartition(2)
        .write.mode("overwrite").parquet(s"$dir.staging")
      assert(fs.rename(new org.apache.hadoop.fs.Path(dir),
                       new org.apache.hadoop.fs.Path(s"$dir.old")))
      // the table dir no longer exists — a guard-less read would throw
      val plan = Layout.compactionPlan(spark, dir, targetFileBytes = 1L << 20)
      assert(plan.nFiles == 2) // the staged (new) layout won the roll-forward
      assert(spark.read.parquet(dir).count() == 100L)
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    }
  }

  test("compact with sortCols re-clusters during the rewrite") {
    val dir = java.nio.file.Files.createTempDirectory("graft-compact2").toString + "/t"
    try {
      (1 to 1000).map(i => ((i * 37) % 1000L, i.toLong)).toDF("k", "v")
        .repartition(16).write.mode("overwrite").parquet(dir)
      Layout.compact(spark, dir, targetFileBytes = 16L << 10, sortCols = Seq("k"))
      // post-compaction files hold disjoint k ranges (range-clustered)
      val ranges = spark.read.parquet(dir)
        .groupBy(input_file_name().as("f"))
        .agg(min($"k").as("lo"), max($"k").as("hi"))
        .select($"lo", $"hi").as[(Long, Long)].collect().sortBy(_._1)
      ranges.zip(ranges.tail).foreach { case ((_, hi), (lo2, _)) =>
        assert(hi <= lo2, s"overlapping file ranges: $hi > $lo2") }
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(
        new java.io.File(dir).getParentFile)
    }
  }

  test("zorderAudit: out-of-domain values fail loudly instead of aliasing") {
    val df = Seq((5000L, 1L)).toDF("x", "y") // 5000 >= 2^12
    val e = intercept[Exception] {
      Layout.zorderAudit(df, col("x"), col("y"), bits = 12).collect()
    }
    assert(e.getMessage.contains("outside [0,") ||
      Option(e.getCause).exists(_.getMessage.contains("outside [0,")))
  }

  test("z-ordered WRITE produces files tight on BOTH dims (the file-skipping evidence)") {
    // 64x64 grid -> 16 range partitions by z vs 16 by a linear (x, y) sort.
    // Z-order: every file's x-span AND y-span stay <= half the domain
    // (a contiguous Morton range is a compact rectangle-ish region).
    // Linear: files are x-slices that span the ENTIRE y domain, so a
    // y-predicate can never skip a file.
    val grid = (0 until 64).flatMap(x => (0 until 64).map(y => (x.toLong, y.toLong)))
      .toDF("x", "y")
    val dir = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    try {
      val z = grid.withColumn("z", Layout.zValue2(col("x"), col("y"), bits = 6))
      z.repartitionByRange(16, col("z")).sortWithinPartitions(col("z"))
        .write.mode("overwrite").parquet(s"$dir/zorder")
      grid.repartitionByRange(16, col("x"), col("y"))
        .write.mode("overwrite").parquet(s"$dir/linear")
      def spans(path: String) = spark.read.parquet(path)
        .groupBy(input_file_name())
        .agg((max($"x") - min($"x")).as("xs"), (max($"y") - min($"y")).as("ys"))
        .select($"xs", $"ys").as[(Long, Long)].collect()
      val zSpans = spans(s"$dir/zorder")
      val linSpans = spans(s"$dir/linear")
      assert(zSpans.forall { case (xs, ys) => xs <= 32 && ys <= 32 },
        s"z-order files must be tight on both dims: ${zSpans.mkString(",")}")
      // the linear layout's files each cover (almost) the whole y domain
      assert(linSpans.count { case (_, ys) => ys >= 60 } >= linSpans.length / 2,
        s"linear layout should be y-wide: ${linSpans.mkString(",")}")
    } finally {
      org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(dir))
    }
  }
}

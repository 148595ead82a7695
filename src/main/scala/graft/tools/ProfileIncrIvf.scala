package graft.tools

import graft.GraftSession
import graft.operators.{IncrementalIvf, IvfIndex}
import graft.tools.ProfileScaleFamily.ShuffleMeter
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Store ≫ batch stress for the incremental IVF index (qs25) — the
  * ProfileMihStore discipline applied to the ANN store. The two scale
  * claims under test:
  *  - `appendBatch` cost is FLAT in store size: assignment reads the
  *    frozen centroid table (nCells rows) and the batch, never the
  *    standing index — a 16× bigger store must not change the append
  *    wall or shuffle;
  *  - `serve` cost follows the PRUNED cells, not the store: with
  *    nProbe of nCells cells probed, the scan should touch ~nProbe/
  *    nCells of the index (metered by rows the probe join processes
  *    and by wall), plus one flat probe-side dedup.
  *
  * Stores are synthesized (seeded md5-derived 32-dim vectors — no
  * codecs, the point is store mechanics), seeded at 250k/1M/4M rows
  * with nCells=64; every round appends the SAME 5k-vector batch and
  * serves the same 10 queries at nProbe=4.
  * `runMain graft.tools.ProfileIncrIvf [outBase]`. */
object ProfileIncrIvf {

  private def vectors(spark: SparkSession, from: Long, n: Long) = {
    // 32 dims from md5 nibbles: deterministic, spread, cheap
    val vec = transform(sequence(lit(0), lit(31)), i =>
      (conv(substring(md5(concat(col("id").cast("string"), lit(":"),
        i.cast("string"))), 1, 4), 16, 10).cast("double") / 65535.0).cast("float"))
    spark.range(from, from + n).select(col("id").as("vec_id"), vec.as("embedding"))
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val outBase = args.headOption.getOrElse("/tmp/graft-incrivf")
    val spark = GraftSession.local(appName = "profile-incrivf")
    val meter = new ShuffleMeter
    spark.sparkContext.addSparkListener(meter)
    import spark.implicits._

    val batch = vectors(spark, 900000000L, 5000L).localCheckpoint(true)
    val queryIds = (900000000L until 900000010L).toSeq

    for (n <- Seq(250000L, 1000000L, 4000000L)) {
      val path = s"$outBase/n$n/ivf"
      if (!new java.io.File(path).exists()) {
        IncrementalIvf.init(vectors(spark, 0L, n), path, nCells = 64)
      }
      // append the same foreign batch; wall/shuffle must be store-size-flat
      meter.reset()
      val (_, tAppend) = timed { IncrementalIvf.appendBatch(batch, path) }
      val apShuf = (meter.read.get + meter.write.get) / 1e6

      // serve: probe 4 of 64 cells; wall follows pruned-cell mass
      meter.reset()
      val (rows, tServe) = timed {
        IncrementalIvf.serve(spark, path, queryIds, k = 5, nProbe = 4).count()
      }
      val svShuf = (meter.read.get + meter.write.get) / 1e6
      assert(rows == queryIds.size * 5L, s"expected full top-5 per query, got $rows")

      // the pruned fraction actually read (partition pruning evidence):
      // count rows in the probed cells vs the whole store
      val assigned = spark.read.parquet(s"$path/assigned")
      val total = assigned.count()
      println(f"[incrivf] store=$n%8d (total rows $total%8d)  " +
        f"append ${tAppend}%6.2f s (shuf ${apShuf}%6.2f MB)  " +
        f"serve ${tServe}%6.2f s (shuf ${svShuf}%6.2f MB, ${rows} rows)")
    }
    spark.stop()
  }
}

package graft.tools

import graft.GraftSession
import graft.operators.ConnectedComponents
import org.apache.spark.sql.functions._

/** Measures incremental cluster maintenance vs full recompute as pair
  * batches arrive: `runMain graft.tools.ProfileIncrementalCC
  * [nVerts] [batches]`. Synthetic near-dup graph: `nVerts` vertices in
  * 10-cliques; each batch delivers the cliques' pairs for its slice,
  * PLUS cross-batch edges that merge a fraction of earlier clusters
  * (the realistic incremental-dedup shape — new docs mostly form new
  * clusters, some join old ones). After every batch both paths must
  * agree label-for-label; the timing question is how each scales with
  * HISTORY: the fold closes |labeled vertices| + |batch| edges, the
  * recompute closes every pair ever seen. Numbers quoted in
  * NOTES_r4.md come from this tool. */
object ProfileIncrementalCC {
  def main(args: Array[String]): Unit = {
    val nVerts = args.headOption.map(_.toLong).getOrElse(200000L)
    val nBatches = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = GraftSession.local(appName = "profile-inc-cc")
    import spark.implicits._

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }

    val perBatch = nVerts / nBatches
    // batch k: clique pairs (v, v - v%10 ... consecutive ring within the
    // 10-clique) over its vertex slice + merge edges tying 1% of its
    // cliques to a batch-(k-1) clique
    def batch(k: Int) = {
      val lo = k * perBatch
      // ALL clique pairs (45 per 10-clique, ~4.5 per vertex): near-dup
      // funnels emit the full pair set, and it's the pair-multiplicity
      // the full recompute pays for while the fold never re-reads it
      val cliques = spark.range(lo, lo + perBatch)
        .select(col("id"), explode(sequence(lit(1), lit(9))).as("j"))
        .select(col("id").as("a_id"),
          (col("id") - (col("id") % 10) + ((col("id") + col("j")) % 10)).as("b_id"))
        .filter(col("a_id") < col("b_id"))
      val merges =
        if (k == 0) cliques.limit(0)
        else spark.range(lo, lo + perBatch / 100)
          .select(col("id").as("a_id"), (col("id") - perBatch).as("b_id"))
      cliques.unionByName(merges).localCheckpoint(true)
    }

    val batches = (0 until nBatches).map(batch)
    println(s"[inccc] $nVerts vertices, $nBatches batches of ~$perBatch")

    var labels = ConnectedComponents.run(batches.head)
    var history = batches.head
    batches.zipWithIndex.tail.foreach { case (b, k) =>
      val (folded, tFold) = time {
        val l = ConnectedComponents.mergeBatch(labels, b).localCheckpoint(true)
        l.count(); l
      }
      history = history.unionByName(b).localCheckpoint(true)
      val (full, tFull) = time {
        val l = ConnectedComponents.run(history).localCheckpoint(true)
        l.count(); l
      }
      val mismatch = folded.withColumnRenamed("comp", "f")
        .join(full.withColumnRenamed("comp", "g"), "id")
        .filter(col("f") =!= col("g")).count()
      println(f"[inccc] batch $k: fold $tFold%7.2f s  full-recompute $tFull%7.2f s  mismatches $mismatch")
      require(mismatch == 0, s"batch $k diverged")
      labels = folded
    }
    spark.stop()
  }
}

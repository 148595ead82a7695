package graft.tools

import graft.GraftSession
import graft.functions.VectorFunctions
import org.apache.spark.sql.functions._

/** Dumps (vec_id, lsh_bucket) as CSV for the cross-engine parity
  * prototype (`tools/dump_lsh_buckets.py`): proves DuckDB reproduces
  * [[VectorFunctions.lshBucket]] bit-for-bit before the qs02 oracle is
  * wired into the driver contract. */
object DumpLshBuckets {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "/tmp/lsh_buckets_spark"
    val spark = GraftSession.local(appName = "graft-dump-lsh")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    emb.select(col("vec_id"), VectorFunctions.lshBucket(col("embedding"), 8, 64).as("bucket"))
      .orderBy(col("vec_id"))
      .coalesce(1)
      .write.mode("overwrite").option("header", "true").csv(out)
    spark.stop()
  }
}

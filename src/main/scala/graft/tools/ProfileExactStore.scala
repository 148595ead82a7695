package graft.tools

import graft.GraftSession
import graft.operators.IncrementalHashDedup
import org.apache.spark.sql.functions._

/** Cost of the birthday-bound escape hatch (r13 verdict #5): the
  * exact-key store in its two key widths —
  *
  *   - `long`: [[IncrementalHashDedup.dedupBatch]] exact regime
  *     (bands = 1, bandBits = 32, maxHamming = 0) over 8-byte keys —
  *     the key60 production path, now capped at `maxExactStoreRows`,
  *   - `string`: [[IncrementalHashDedup.exactDedupBatchString]] over
  *     full-digest 32-char md5 keys — collision-free at any scale,
  *     4× the key bytes.
  *
  * Same planted workload as ProfileMihStore (half the batch duplicates
  * a store row, half fresh; recall must be 1.0 in both modes), store
  * swept 1M → 16M at a fixed 5k batch. The number this buys: the
  * per-batch wall + shuffle DELTA a billion-key deployment pays for
  * switching to the safe key — quoted in NOTES_r14 so the key60 cap's
  * error message sends users to a priced alternative, not an unknown.
  *
  * `runMain graft.tools.ProfileExactStore [storeSizes] [batchSize] [workDir]`
  * defaults `1000000,4000000,16000000` / `5000`.
  */
object ProfileExactStore {

  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.getOrElse("1000000,4000000,16000000")
      .split(",").map(_.trim.toLong).toSeq
    val batchN = args.drop(1).headOption.map(_.toLong).getOrElse(5000L)
    val work = args.drop(2).headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("profile-exactstore").toString)
    val spark = GraftSession.local(appName = "profile-exactstore")
    import spark.implicits._
    val meter = new ProfileScaleFamily.ShuffleMeter
    spark.sparkContext.addSparkListener(meter)

    println(f"[exact] ${"store_rows"}%12s ${"mode"}%8s ${"wall_s"}%8s " +
      f"${"shuf_rd_mb"}%10s ${"shuf_wr_mb"}%10s ${"store_mb"}%9s " +
      f"${"planted"}%8s ${"found"}%8s")

    def dirMb(p: String): Double = {
      def walk(f: java.io.File): Long =
        if (f.isDirectory) f.listFiles().map(walk).sum else f.length()
      walk(new java.io.File(p)) / 1e6
    }

    sizes.foreach { storeN =>
      val longStore = s"$work/long_$storeN"
      val strStore = s"$work/str_$storeN"
      if (!new java.io.File(longStore).exists())
        IncrementalHashDedup.initStore(
          spark.range(storeN).select($"id", xxhash64($"id").as("hash")),
          longStore, idCol = "id", hashCol = "hash")
      if (!new java.io.File(strStore).exists())
        IncrementalHashDedup.initStringStore(
          spark.range(storeN).select($"id", md5($"id".cast("string")).as("key")),
          strStore, idCol = "id", keyCol = "key")

      // half planted exact dups (key of id % storeN — MUST match the
      // store's key derivation exactly, xxhash64 over the LONG /
      // md5 over its string), half fresh draws from a disjoint stream
      val base = $"id" % storeN
      val fresh = concat($"id".cast("string"), lit("-fresh"))
      def batch(longKeys: Boolean) =
        spark.range(storeN, storeN + batchN).select($"id",
          (if (longKeys)
             when($"id" % 2 === 0, xxhash64(base)).otherwise(xxhash64(fresh))
           else
             when($"id" % 2 === 0, md5(base.cast("string"))).otherwise(md5(fresh))
          ).as("k"),
          when($"id" % 2 === 0, base).as("planted_base"))
          .localCheckpoint(true)

      def report(mode: String, store: String, wall: Double,
                 decisions: org.apache.spark.sql.DataFrame,
                 planted: org.apache.spark.sql.DataFrame): Unit = {
        val (rd, wr) = (meter.read.get / 1e6, meter.write.get / 1e6)
        val found = decisions.join(planted, Seq("id"))
          .filter($"dup_of".isNotNull).count()
        val nPlanted = planted.count()
        println(f"[exact] $storeN%12d $mode%8s $wall%8.2f $rd%10.1f $wr%10.1f " +
          f"${dirMb(store)}%9.1f $nPlanted%8d $found%8d")
        require(found == nPlanted,
          s"$mode recall hole: $found of $nPlanted planted dups found")
      }

      // run each mode twice: first warms the page cache, second is the
      // quotable number (the ProfileMihStore fairness discipline)
      Seq("long", "long2").foreach { mode =>
        val b = batch(longKeys = true)
        val planted = b.filter($"planted_base".isNotNull).select($"id")
          .localCheckpoint(true)
        meter.reset()
        val t0 = System.nanoTime()
        val d = IncrementalHashDedup.dedupBatch(
          b.select($"id", $"k"), longStore,
          bands = 1, bandBits = 32, maxHamming = 0,
          idCol = "id", hashCol = "k", appendUnique = false)
        report(mode, longStore, (System.nanoTime() - t0) / 1e9, d, planted)
      }
      Seq("string", "string2").foreach { mode =>
        val b = batch(longKeys = false)
        val planted = b.filter($"planted_base".isNotNull).select($"id")
          .localCheckpoint(true)
        meter.reset()
        val t0 = System.nanoTime()
        val d = IncrementalHashDedup.exactDedupBatchString(
          b.select($"id", $"k"), strStore,
          idCol = "id", keyCol = "k", appendUnique = false)
        report(mode, strStore, (System.nanoTime() - t0) / 1e9, d, planted)
      }
    }
    spark.stop()
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._

/** Exact frequent-item detection via the screen-then-verify funnel:
  * per-partition Misra–Gries summaries discover a provable SUPERSET of
  * every item with global share ≥ 1/denom, and a candidates-only exact
  * count pass then keeps precisely the true heavy hitters.
  *
  * Why not just `groupBy(item).count()`? At 100 TB the vocabulary is
  * the problem: a full frequency census shuffles one row per DISTINCT
  * item (billions for web-scale token/URL/host columns) to answer a
  * question whose output is a handful of rows. Here the shuffle is
  * bounded by `capacity × partitions` candidate rows (a few MB at any
  * scale) plus the exact-verify aggregate, whose map-side combine
  * emits at most `capacity × partitions` rows too — the full-vocab
  * shuffle never happens. The sketch plane's CMS guard
  * ([[Sketches.overrepresented]]) answers frequency for KNOWN probe
  * items; this operator DISCOVERS the frequent items with no prior
  * candidate list, and unlike the sketches its output is exact, so it
  * is oracle-checkable.
  *
  * The superset guarantee (why the final output is exact and
  * partitioning-invariant): Misra–Gries with `capacity` counters
  * undercounts any item by at most n_p/(capacity+1) within a partition
  * of n_p items, so an item with local count > n_p/(capacity+1)
  * necessarily retains a positive counter and is emitted. An item with
  * GLOBAL count ≥ N/denom must, by pigeonhole, have local count
  * ≥ n_p/denom in at least one partition; with capacity+1 ≥ denom
  * (enforced) that exceeds the local survival bound there, so every
  * true heavy hitter is a candidate somewhere. False candidates cost
  * only verify work, never wrong output.
  */
object HeavyHitters {

  /** One partition's Misra–Gries pass: emits (candidate, null) rows
    * plus a single (null, n_p) partition-total row. Bounded memory:
    * `capacity` counters regardless of partition size. */
  private[operators] def misraGries(
      it: Iterator[String], capacity: Int): Iterator[(Option[String], Option[Long])] = {
    val counters = new java.util.HashMap[String, Long](capacity * 2)
    var np = 0L
    while (it.hasNext) {
      val x = it.next()
      np += 1
      val c = counters.get(x) // 0L when absent
      if (c > 0L) counters.put(x, c + 1L)
      else if (counters.size < capacity) counters.put(x, 1L)
      else {
        val e = counters.entrySet().iterator()
        while (e.hasNext) {
          val en = e.next()
          if (en.getValue == 1L) e.remove() else en.setValue(en.getValue - 1L)
        }
      }
    }
    val out = Iterator.single((None: Option[String], Some(np): Option[Long]))
    val keys = new scala.collection.mutable.ArrayBuffer[String](counters.size)
    counters.keySet().forEach(k => { keys += k; () })
    keys.iterator.map(k => (Some(k), None: Option[Long])) ++ out
  }

  /** Exact items with global count ≥ N/denom over `df(itemCol)`.
    * Output: (item, cnt, share) — exact integers plus one rounded IEEE
    * division, identical on any partitioning (the MG summaries vary
    * with the split; the verified output cannot, because candidates
    * are a superset everywhere and verification is exact).
    *
    * Two corpus passes: the candidate scan (materialized — the summary
    * is capacity×partitions rows, so `localCheckpoint` is metadata-
    * cheap and stops the total/candidate branches re-scanning) and the
    * candidates-only verify aggregate. */
  def exactFrequent(df: DataFrame, itemCol: String,
                    denom: Int = 200, capacity: Int = 256): DataFrame = {
    require(denom >= 2, s"denom must be >= 2, got $denom")
    // Strict pigeonhole: MG's undercount bound is <= n_p/(capacity+1)
    // and NOT strict, while the final filter is inclusive (cnt*denom >=
    // n_total) — so a boundary item with count exactly N/denom needs
    // capacity+1 > denom STRICTLY to be guaranteed a surviving counter
    // in some partition. capacity+1 == denom can miss it.
    require(capacity >= denom,
      s"capacity ($capacity) must be >= denom ($denom): the superset " +
        "guarantee needs capacity+1 > denom strictly")
    val spark = df.sparkSession
    val items = df.select(col(itemCol).cast("string").as("item"))
    val summary = items
      .select(col("item"))
      .mapPartitions(rows => misraGries(rows.map(_.getString(0)), capacity))(
        Encoders.product[(Option[String], Option[Long])])
      .toDF("cand", "np")
      .localCheckpoint()
    val total = summary.agg(sum(col("np")).as("n_total"))
    val cands = summary.filter(col("cand").isNotNull).select(col("cand")).distinct()
    items
      .join(broadcast(cands), items("item") === cands("cand"), "left_semi")
      .groupBy(col("item"))
      .agg(count(lit(1)).as("cnt"))
      .crossJoin(broadcast(total))
      .filter(col("cnt") * lit(denom.toLong) >= col("n_total"))
      .select(col("item"), col("cnt"),
        round(col("cnt").cast("double") / col("n_total").cast("double"), 6).as("share"))
  }
}

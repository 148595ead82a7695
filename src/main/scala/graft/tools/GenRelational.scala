package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, SparkSession}

/** Deterministic generator for the relational-plane rehearsal
  * (r13 verdict #7): the driver's testdata tops out at sf0.1 (600k
  * lineitem), which gates CORRECTNESS but says nothing about how the
  * q/qa/qj plans scale. This emits the same eight-table star schema
  * (identical column names/types, similar value ranges and key
  * distributions) at arbitrary SF so the bench can be swept 0.1 → 5
  * with one generator and the wall-vs-sf exponent fitted per query.
  * The driver's own testdata stays read-only and authoritative — this
  * never writes outside the caller's outDir, and its sf0.1 is
  * regenerated locally so the sweep compares like to like.
  *
  * Row counts mirror the driver's ratios (TPC-H-ish): lineitem 6M·sf,
  * orders 1.5M·sf, customer 150k·sf, part 200k·sf, supplier 10k·sf,
  * events 1M·sf, nation 25, region 5.
  *
  * All values derive from xxhash64(id, salt) — fully distributed
  * generation (spark.range → projections, zero shuffle) and identical
  * bytes on every run.
  *
  * `runMain graft.tools.GenRelational <sf> <outDir>`
  */
object GenRelational {

  private def u(salt: String): Column = // uniform in [0,1) from the id
    (pmod(xxhash64(col("id"), lit(salt)), lit(1000000007L)).cast("double")
      / 1000000007.0)

  private def pick(salt: String, vals: Seq[String]): Column =
    element_at(array(vals.map(lit): _*),
      (pmod(xxhash64(col("id"), lit(salt)), lit(vals.size)) + 1).cast("int"))

  private def money(salt: String, lo: Double, hi: Double): Column =
    round(lit(lo) + u(salt) * (hi - lo), 2)

  private def tsBetween(salt: String, startIso: String, days: Int): Column =
    timestamp_seconds(unix_timestamp(lit(startIso).cast("timestamp")) +
      (u(salt) * days.toDouble * 86400.0).cast("long"))

  def generate(spark: SparkSession, sf: Double, outDir: String): Unit = {
    import spark.implicits._
    val nCust = math.max(1L, (150000 * sf).toLong)
    val nOrd = math.max(1L, (1500000 * sf).toLong)
    val nLine = math.max(1L, (6000000 * sf).toLong)
    val nPart = math.max(1L, (200000 * sf).toLong)
    val nSupp = math.max(1L, (10000 * sf).toLong)
    val nEvents = math.max(1L, (1000000 * sf).toLong)

    def write(name: String)(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")

    write("region")(Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"),
      (3, "EUROPE"), (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"))
    write("nation")((0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey"))

    write("customer")(spark.range(nCust).select(
      $"id".as("c_custkey"),
      format_string("Customer#%09d", $"id").as("c_name"),
      pmod(xxhash64($"id", lit("cn")), lit(25)).cast("int").as("c_nationkey"),
      money("cb", -999.99, 9999.99).as("c_acctbal"),
      pick("cs", Seq("AUTOMOBILE", "BUILDING", "FURNITURE", "HOUSEHOLD",
        "MACHINERY")).as("c_mktsegment")))

    write("supplier")(spark.range(nSupp).select(
      $"id".as("s_suppkey"),
      format_string("Supplier#%09d", $"id").as("s_name"),
      pmod(xxhash64($"id", lit("sn")), lit(25)).cast("int").as("s_nationkey"),
      money("sb", -999.99, 9999.99).as("s_acctbal")))

    write("part")(spark.range(nPart).select(
      $"id".as("p_partkey"),
      concat(pick("pa", Seq("large", "hot", "small", "dim", "cold", "shiny")),
        lit(" "),
        pick("pb", Seq("ring", "bolt", "washer", "panel", "gear", "valve")))
        .as("p_name"),
      concat(lit("Brand#"),
        pmod(xxhash64($"id", lit("pc")), lit(50)).cast("string")).as("p_brand"),
      pick("pd", Seq("LARGE", "ECONOMY", "STANDARD", "SMALL", "MEDIUM",
        "PROMO")).as("p_type"),
      (pmod(xxhash64($"id", lit("pe")), lit(50)) + 1).cast("int").as("p_size"),
      round(lit(900.0) + $"id" % 1000 / 10.0, 2).as("p_retailprice")))

    write("orders")(spark.range(nOrd).select(
      $"id".as("o_orderkey"),
      pmod(xxhash64($"id", lit("oc")), lit(nCust)).as("o_custkey"),
      pick("os", Seq("O", "F", "P")).as("o_orderstatus"),
      money("op", 1000.0, 500000.0).as("o_totalprice"),
      date_trunc("day", tsBetween("od", "1995-01-01", 3285)).as("o_orderdate"),
      pick("opr", Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
        "5-LOW")).as("o_orderpriority")))

    write("lineitem")(spark.range(nLine).select(
      pmod(xxhash64($"id", lit("lo")), lit(nOrd)).as("l_orderkey"),
      pmod(xxhash64($"id", lit("lp")), lit(nPart)).as("l_partkey"),
      pmod(xxhash64($"id", lit("ls")), lit(nSupp)).as("l_suppkey"),
      (pmod(xxhash64($"id", lit("ln")), lit(7)) + 1).cast("int").as("l_linenumber"),
      (pmod(xxhash64($"id", lit("lq")), lit(50)) + 1).cast("double").as("l_quantity"),
      money("le", 1000.0, 100000.0).as("l_extendedprice"),
      (pmod(xxhash64($"id", lit("ld")), lit(11)).cast("double") / 100.0).as("l_discount"),
      (pmod(xxhash64($"id", lit("lt")), lit(9)).cast("double") / 100.0).as("l_tax"),
      pick("lr", Seq("A", "N", "R")).as("l_returnflag"),
      pick("ll", Seq("O", "F")).as("l_linestatus"),
      date_trunc("day", tsBetween("lsd", "1995-01-01", 3285)).as("l_shipdate")))

    write("events")(spark.range(nEvents).select(
      $"id".as("event_id"),
      timestamp_micros(
        lit(1704067200000000L) + // 2024-01-01T00:00:00Z
          ($"id" * lit(40000000L)) + // ~40 s mean spacing
          pmod(xxhash64($"id", lit("ej")), lit(39000000L))).as("ts"),
      pmod(xxhash64($"id", lit("eu")), lit(math.max(2L, nEvents / 50))).as("user_id"),
      pick("et", Seq("view", "cart", "purchase", "error", "click")).as("event_type"),
      money("ev", 0.0, 200.0).as("value"),
      format_string("{\"k\": %d}",
        pmod(xxhash64($"id", lit("ek")), lit(100))).as("props")))
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenRelational <sf> <outDir>")
    val spark = GraftSession.local(appName = "gen-relational")
    generate(spark, args(0).toDouble, args(1))
    spark.stop()
  }
}

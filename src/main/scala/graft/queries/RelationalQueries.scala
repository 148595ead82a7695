package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational analytics plane.
  *
  * Re-expresses the reference's SQL workload (HFCommunity
  * `docs/metrics.html:242-392` metrics M1-M8 and the extractor's
  * relational operators, SURVEY.md §2) over the driver's TPC-H-ish
  * tables. Every query has a DuckDB oracle (SparkEntry.oracleSql).
  *
  * Numeric-determinism contract (cross-engine hash parity): any SUM over
  * a double column casts each element to DECIMAL first (exact, order-
  * independent addition), then casts the exact sum back to DOUBLE.
  * Ratios divide exact values in double precision. Every query ends with
  * a total ORDER BY over a unique key set so row order is deterministic.
  *
  * Scale notes (100 TB design): dimension joins (`nation`, `region`,
  * `supplier`) are explicitly `broadcast()`; fact-fact joins shuffle on
  * their equi-keys and rely on AQE for skew; all aggregations are
  * partial+final hash aggregates (map-side combine) by construction;
  * top-k is `orderBy.limit` → `TakeOrderedAndProject` (no global sort).
  */
object RelationalQueries {

  /** decimal-exact sum of a double column, returned as double */
  private def dsum(c: Column, p: Int = 18, s: Int = 4): Column =
    sum(c.cast(DecimalType(p, s))).cast("double")

  /** TPC-H Q1 shape: multi-aggregate scan with filter pushdown.
    * Covers SURVEY §2.A A1-style hash aggregation + P8-style projection. */
  def pricingSummary(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .filter($"l_shipdate" <= lit("1998-09-02").cast("timestamp"))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        dsum($"l_quantity", 12, 2).as("sum_qty"),
        dsum($"l_extendedprice").as("sum_base_price"),
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("sum_disc_price"),
        (dsum($"l_quantity", 12, 2) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** M1 analogue (top org by #models → top customers by #orders):
    * group-count + deterministic top-k (TakeOrderedAndProject). */
  def topCustomers(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.orders
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("order_cnt"),
           dsum($"o_totalprice", 18, 2).as("total_spend"))
      .orderBy($"order_cnt".desc, $"total_spend".desc, $"o_custkey".asc)
      .limit(10)
  }

  val topCustomersSql: String =
    """SELECT o_custkey, COUNT(*) AS order_cnt,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total_spend
      |FROM orders GROUP BY o_custkey
      |ORDER BY order_cnt DESC, total_spend DESC, o_custkey ASC LIMIT 10""".stripMargin

  /** M2 analogue (files-per-repo histogram): two-level aggregation +
    * range bucketing (reference: metrics.html:268-288). */
  def orderSizeHistogram(t: Tables): DataFrame = {
    import t.spark.implicits._
    val perOrder = t.lineitem.groupBy($"l_orderkey").agg(count(lit(1)).as("n_items"))
    val bucket = when($"n_items" === 1, "1")
      .when($"n_items" <= 3, "2-3")
      .when($"n_items" <= 5, "4-5")
      .when($"n_items" <= 7, "6-7")
      .otherwise(">7")
    perOrder.select(bucket.as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n_orders"))
      .orderBy($"bucket")
  }

  val orderSizeHistogramSql: String =
    """SELECT bucket, COUNT(*) AS n_orders FROM (
      |  SELECT CASE WHEN n_items = 1 THEN '1'
      |              WHEN n_items <= 3 THEN '2-3'
      |              WHEN n_items <= 5 THEN '4-5'
      |              WHEN n_items <= 7 THEN '6-7'
      |              ELSE '>7' END AS bucket
      |  FROM (SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey)
      |) GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Star join: fact ⋈ fact shuffle join + broadcast dimension chain.
    * Covers SURVEY §2.A J1/J3 equi-joins; dims broadcast explicitly. */
  def regionRevenue(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .join(t.orders, $"l_orderkey" === $"o_orderkey")
      .join(t.customer, $"o_custkey" === $"c_custkey")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(t.region), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name")
      .agg(
        dsum($"l_extendedprice" * (lit(1.0) - $"l_discount")).as("revenue"),
        countDistinct($"c_custkey").as("n_customers"),
        count(lit(1)).as("n_lineitems"))
      .orderBy($"r_name")
  }

  val regionRevenueSql: String =
    """SELECT r_name,
      |  CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(DISTINCT c_custkey) AS n_customers,
      |  COUNT(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders   ON l_orderkey  = o_orderkey
      |JOIN customer ON o_custkey   = c_custkey
      |JOIN nation   ON c_nationkey = n_nationkey
      |JOIN region   ON n_regionkey = r_regionkey
      |GROUP BY r_name ORDER BY r_name""".stripMargin

  /** M5 analogue (share of repos with discussions): distinct-count
    * left join + ratio per group. */
  def segmentEngagement(t: Tables): DataFrame = {
    import t.spark.implicits._
    val active = t.orders.select($"o_custkey").distinct()
    t.customer
      .join(active, $"c_custkey" === $"o_custkey", "left_outer")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_customers"),
           count($"o_custkey").as("n_active"),
           (count($"o_custkey").cast("double") / count(lit(1))).as("active_ratio"))
      .orderBy($"c_mktsegment")
  }

  val segmentEngagementSql: String =
    """SELECT c_mktsegment, COUNT(*) AS n_customers,
      |  COUNT(o_custkey) AS n_active,
      |  CAST(COUNT(o_custkey) AS DOUBLE) / COUNT(*) AS active_ratio
      |FROM customer
      |LEFT JOIN (SELECT DISTINCT o_custkey FROM orders) a ON c_custkey = o_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  /** TPC-H Q6 shape: highly selective scan — predicate pushdown +
    * column pruning all the way into the parquet reader. */
  def revenueFilter(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.lineitem
      .filter($"l_shipdate" >= lit("1996-01-01").cast("timestamp") &&
              $"l_shipdate" <  lit("1997-01-01").cast("timestamp") &&
              $"l_discount".between(0.05, 0.07) &&
              $"l_quantity" < 24)
      .agg(dsum($"l_extendedprice" * $"l_discount").as("revenue"),
           count(lit(1)).as("n_rows"))
  }

  val revenueFilterSql: String =
    """SELECT
      |  CAST(SUM(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_rows
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin

  /** Anti-join (SURVEY §2.A K3/U3 insert-if-absent key-difference shape):
    * customers with no orders, counted per nation. */
  def inactiveCustomers(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.customer
      .join(t.orders, t.customer("c_custkey") === t.orders("o_custkey"), "left_anti")
      .join(broadcast(t.nation), $"c_nationkey" === $"n_nationkey")
      .groupBy($"n_name")
      .agg(count(lit(1)).as("n_inactive"))
      .orderBy($"n_name")
  }

  val inactiveCustomersSql: String =
    """SELECT n_name, COUNT(*) AS n_inactive
      |FROM customer JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY n_name ORDER BY n_name""".stripMargin

  /** Set operations (SURVEY §2.A U1-U3): INTERSECT / EXCEPT / UNION ALL
    * over the nation key-sets of customers vs suppliers. */
  def nationCoverage(t: Tables): DataFrame = {
    import t.spark.implicits._
    val cn = t.customer.select($"c_nationkey".as("nationkey")).distinct()
    val sn = t.supplier.select($"s_nationkey".as("nationkey")).distinct()
    val both     = cn.intersect(sn).withColumn("side", lit("both"))
    val custOnly = cn.except(sn).withColumn("side", lit("customer_only"))
    both.unionByName(custOnly).select($"side", $"nationkey").orderBy($"side", $"nationkey")
  }

  val nationCoverageSql: String =
    """SELECT 'both' AS side, nationkey FROM
      |  (SELECT c_nationkey AS nationkey FROM customer INTERSECT SELECT s_nationkey FROM supplier)
      |UNION ALL
      |SELECT 'customer_only' AS side, nationkey FROM
      |  (SELECT c_nationkey AS nationkey FROM customer EXCEPT SELECT s_nationkey FROM supplier)
      |ORDER BY side, nationkey""".stripMargin

  /** Window top-k per group (rank within partition, deterministic ties). */
  def topOrdersPerSegment(t: Tables): DataFrame = {
    import t.spark.implicits._
    val j = t.orders.join(t.customer, $"o_custkey" === $"c_custkey")
    val w = Window.partitionBy($"c_mktsegment").orderBy($"o_totalprice".desc, $"o_orderkey".asc)
    j.withColumn("rk", row_number().over(w).cast("long"))
      .filter($"rk" <= 5)
      .select($"c_mktsegment", $"rk", $"o_orderkey", $"o_totalprice")
      .orderBy($"c_mktsegment", $"rk")
  }

  val topOrdersPerSegmentSql: String =
    """SELECT c_mktsegment, rk, o_orderkey, o_totalprice FROM (
      |  SELECT c_mktsegment, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |) WHERE rk <= 5 ORDER BY c_mktsegment, rk""".stripMargin

  /** Running aggregate window over the event stream (decimal-exact
    * running sum so the incremental accumulation is order-independent
    * across engines). */
  def runningUserValue(t: Tables): DataFrame = {
    import t.spark.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".asc, $"event_id".asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t.events
      .withColumn("running_value", sum($"value".cast(DecimalType(12, 2))).over(w).cast("double"))
      .select($"user_id", $"event_id", $"running_value")
      .orderBy($"user_id", $"event_id")
  }

  val runningUserValueSql: String =
    """SELECT user_id, event_id,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (
      |    PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
      |FROM events ORDER BY user_id, event_id""".stripMargin

  /** CASE-WHEN bucketing + multi-key group (SURVEY §2.A P8-P11 shapes). */
  def priceTiers(t: Tables): DataFrame = {
    import t.spark.implicits._
    val tier = when($"o_totalprice" < 50000, "small")
      .when($"o_totalprice" < 150000, "medium")
      .when($"o_totalprice" < 300000, "large")
      .otherwise("jumbo")
    t.orders.select(tier.as("tier"), $"o_orderpriority")
      .groupBy($"tier", $"o_orderpriority")
      .agg(count(lit(1)).as("n_orders"))
      .orderBy($"tier", $"o_orderpriority")
  }

  val priceTiersSql: String =
    """SELECT CASE WHEN o_totalprice < 50000 THEN 'small'
      |            WHEN o_totalprice < 150000 THEN 'medium'
      |            WHEN o_totalprice < 300000 THEN 'large'
      |            ELSE 'jumbo' END AS tier,
      |       o_orderpriority, COUNT(*) AS n_orders
      |FROM orders GROUP BY 1, 2 ORDER BY tier, o_orderpriority""".stripMargin

  /** M7 analogue (avg comments per discussion, bucketed): agg → agg →
    * bucket three-level shape. */
  def avgItemsBucket(t: Tables): DataFrame = {
    import t.spark.implicits._
    val perOrder = t.lineitem.groupBy($"l_orderkey").agg(count(lit(1)).as("n_items"))
    val perCust = t.orders
      .join(perOrder, $"o_orderkey" === $"l_orderkey")
      .groupBy($"o_custkey")
      .agg((sum($"n_items").cast("double") / count(lit(1))).as("avg_items"))
    val bucket = when($"avg_items" <= 2.0, "<=2")
      .when($"avg_items" <= 3.0, "(2,3]")
      .when($"avg_items" <= 4.0, "(3,4]")
      .when($"avg_items" <= 5.0, "(4,5]")
      .otherwise(">5")
    perCust.select(bucket.as("bucket"))
      .groupBy($"bucket").agg(count(lit(1)).as("n_customers"))
      .orderBy($"bucket")
  }

  val avgItemsBucketSql: String =
    """SELECT bucket, COUNT(*) AS n_customers FROM (
      |  SELECT CASE WHEN avg_items <= 2.0 THEN '<=2'
      |              WHEN avg_items <= 3.0 THEN '(2,3]'
      |              WHEN avg_items <= 4.0 THEN '(3,4]'
      |              WHEN avg_items <= 5.0 THEN '(4,5]'
      |              ELSE '>5' END AS bucket
      |  FROM (
      |    SELECT o_custkey, CAST(SUM(n_items) AS DOUBLE) / COUNT(*) AS avg_items
      |    FROM orders JOIN (SELECT l_orderkey, COUNT(*) AS n_items FROM lineitem GROUP BY l_orderkey) li
      |      ON o_orderkey = l_orderkey
      |    GROUP BY o_custkey
      |  )
      |) GROUP BY bucket ORDER BY bucket""".stripMargin

  /** Semi-structured JSON extraction (SURVEY §1.1 `full_data`/`config`
    * blobs → `get_json_object` typed view). */
  def jsonEventProps(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.events
      .select($"event_type", get_json_object($"props", "$.k").cast("int").as("k"))
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"),
           sum($"k").as("sum_k"),
           (sum($"k").cast("double") / count($"k")).as("avg_k"))
      .orderBy($"event_type")
  }

  val jsonEventPropsSql: String =
    """SELECT event_type, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS sum_k,
      |  CAST(SUM(k) AS DOUBLE) / COUNT(k) AS avg_k
      |FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k FROM events)
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  /** Time-series rollup (M3 heatmap analogue): date_trunc + two-key agg. */
  def dailyActivity(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.events
      .select(date_trunc("day", $"ts").cast("date").as("day"), $"event_type", $"value")
      .groupBy($"day", $"event_type")
      .agg(count(lit(1)).as("n_events"), dsum($"value", 12, 2).as("total_value"))
      .orderBy($"day", $"event_type")
  }

  val dailyActivitySql: String =
    """SELECT CAST(date_trunc('day', ts) AS DATE) AS day, event_type,
      |  COUNT(*) AS n_events,
      |  CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
      |FROM events GROUP BY 1, 2 ORDER BY day, event_type""".stripMargin

  /** Deterministic surrogate keys (SURVEY §2.A P1-P3: sha256 of
    * concatenated natural keys — joins without lookups). */
  def surrogateKeys(t: Tables): DataFrame = {
    import t.spark.implicits._
    t.documents
      .select($"doc_id",
              sha2(concat_ws("_", $"source", $"doc_id".cast("string")), 256).as("doc_key"),
              md5($"text").as("content_key"))
      .orderBy($"doc_id")
  }

  val surrogateKeysSql: String =
    """SELECT doc_id,
      |  sha256(source || '_' || CAST(doc_id AS VARCHAR)) AS doc_key,
      |  md5(text) AS content_key
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Conditional pivot (wide conditional aggregation — the union-typed
    * `discussion_event` P11 dispatch shape). */
  def eventTypePivot(t: Tables): DataFrame = {
    import t.spark.implicits._
    def cnt(tp: String) = sum(when($"event_type" === tp, 1).otherwise(0)).as(s"n_$tp")
    t.events.groupBy($"user_id")
      .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"))
      .orderBy($"user_id")
  }

  val eventTypePivotSql: String =
    """SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
      |  CAST(SUM(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
      |  CAST(SUM(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
      |  CAST(SUM(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error
      |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin

  /** All queries in this module, name → builder. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary"   -> ((s: SparkSession, d: String) => pricingSummary(Tables(s, d))),
    "q02_top_customers"     -> ((s: SparkSession, d: String) => topCustomers(Tables(s, d))),
    "q03_order_size_hist"   -> ((s: SparkSession, d: String) => orderSizeHistogram(Tables(s, d))),
    "q04_region_revenue"    -> ((s: SparkSession, d: String) => regionRevenue(Tables(s, d))),
    "q05_segment_engage"    -> ((s: SparkSession, d: String) => segmentEngagement(Tables(s, d))),
    "q06_revenue_filter"    -> ((s: SparkSession, d: String) => revenueFilter(Tables(s, d))),
    "q07_inactive_cust"     -> ((s: SparkSession, d: String) => inactiveCustomers(Tables(s, d))),
    "q08_nation_coverage"   -> ((s: SparkSession, d: String) => nationCoverage(Tables(s, d))),
    "q09_top_orders_seg"    -> ((s: SparkSession, d: String) => topOrdersPerSegment(Tables(s, d))),
    "q10_running_value"     -> ((s: SparkSession, d: String) => runningUserValue(Tables(s, d))),
    "q11_price_tiers"       -> ((s: SparkSession, d: String) => priceTiers(Tables(s, d))),
    "q12_avg_items_bucket"  -> ((s: SparkSession, d: String) => avgItemsBucket(Tables(s, d))),
    "q13_json_props"        -> ((s: SparkSession, d: String) => jsonEventProps(Tables(s, d))),
    "q14_daily_activity"    -> ((s: SparkSession, d: String) => dailyActivity(Tables(s, d))),
    "q15_surrogate_keys"    -> ((s: SparkSession, d: String) => surrogateKeys(Tables(s, d))),
    "q16_event_pivot"       -> ((s: SparkSession, d: String) => eventTypePivot(Tables(s, d))),
  )

  def oracles: Map[String, String] = Map(
    "q01_pricing_summary"  -> pricingSummarySql,
    "q02_top_customers"    -> topCustomersSql,
    "q03_order_size_hist"  -> orderSizeHistogramSql,
    "q04_region_revenue"   -> regionRevenueSql,
    "q05_segment_engage"   -> segmentEngagementSql,
    "q06_revenue_filter"   -> revenueFilterSql,
    "q07_inactive_cust"    -> inactiveCustomersSql,
    "q08_nation_coverage"  -> nationCoverageSql,
    "q09_top_orders_seg"   -> topOrdersPerSegmentSql,
    "q10_running_value"    -> runningUserValueSql,
    "q11_price_tiers"      -> priceTiersSql,
    "q12_avg_items_bucket" -> avgItemsBucketSql,
    "q13_json_props"       -> jsonEventPropsSql,
    "q14_daily_activity"   -> dailyActivitySql,
    "q15_surrogate_keys"   -> surrogateKeysSql,
    "q16_event_pivot"      -> eventTypePivotSql,
  )
}

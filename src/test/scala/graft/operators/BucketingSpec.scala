package graft.operators

import graft.{SparkTestBase, Tables}

class BucketingSpec extends SparkTestBase {

  test("same-bucket-count tables join without any Exchange (co-located)") {
    val t = Tables(spark, sf0001)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // forbid broadcast so the no-shuffle property is from bucketing alone
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(t.lineitem, "b_lineitem", "l_orderkey", 8)
      Bucketing.writeBucketed(t.orders, "b_orders", "o_orderkey", 8)
      val joined = Bucketing.colocatedJoin(spark, "b_lineitem", "b_orders",
        "l_orderkey", "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(plan.contains("SortMergeJoin"), plan)
      // bucketed scan reports the bucket layout
      assert(plan.contains("Bucketed: true"), plan)
      // and of course it's still correct
      assert(joined.count() == t.lineitem.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("mismatched bucket counts fall back to a shuffle (layout contract)") {
    val t = Tables(spark, sf0001)
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Bucketing.writeBucketed(t.lineitem, "b_li8", "l_orderkey", 8)
      Bucketing.writeBucketed(t.orders, "b_ord4", "o_orderkey", 4)
      val plan = Bucketing.colocatedJoin(spark, "b_li8", "b_ord4",
        "l_orderkey", "o_orderkey").queryExecution.executedPlan.toString
      assert(plan.contains("Exchange"), s"expected shuffle on mismatch:\n$plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS b_li8")
      spark.sql("DROP TABLE IF EXISTS b_ord4")
    }
  }
}

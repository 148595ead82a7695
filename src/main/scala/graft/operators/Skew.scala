package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Manual skew mitigation for the cases AQE can't fix alone
  * (SURVEY.md §7.4.2 — mega-repos dominate `repo_file`/`modified_file`;
  * the reference simply blocklists them, databaseImport.py:712).
  *
  * AQE's skew-join splitting handles sort-merge joins at runtime; these
  * helpers cover the two remaining shapes:
  *  - [[saltedAggregate]]: a single hot group overwhelming one reducer
  *    → two-stage aggregation through a salted intermediate key.
  *  - [[saltedJoin]]: a skewed fact joined to a dimension too large to
  *    broadcast → salt the fact side, replicate the dimension side N×.
  */
object Skew {

  /** Two-stage salted aggregation: stage 1 aggregates on
    * (key, salt ∈ [0,n)), stage 2 combines the partials per key.
    * `partial` must be an algebraic aggregate (sum/count/min/max — the
    * same map-side-combine algebra Spark uses internally); `combine`
    * re-aggregates the partial column. */
  def saltedAggregate(df: DataFrame, keyCols: Seq[String], saltBuckets: Int,
                      partial: Column, combine: Column => Column,
                      outCol: String): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)))
    val stage1 = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(partial.as("__partial"))
    stage1
      .groupBy(keyCols.map(col): _*)
      .agg(combine(col("__partial")).as(outCol))
  }

  /** Pre-join mass census — qd19's funnel pricing generalized to ANY
    * equi join: per-key row counts on each side, joined on the KEY
    * COUNT tables (|distinct keys| rows, never the data), with
    * per-key output mass = cl × cr — exactly the rows the real join
    * would produce for that key. Log2-bucketed histogram + the fattest
    * key per bucket: the census a 100 TB pipeline reads BEFORE running
    * a join, because one hot key (mass ≫ rest) is the signal to salt
    * ([[saltedJoin]]), broadcast, or blocklist — after the join it's a
    * straggler task you discover at hour three.
    *
    * Cost: one map-side-combined count per side + one join of the
    * count tables. Output is constant-size (≤ 64 buckets). Exact
    * integers throughout → oracle-checkable. */
  def joinMass(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String): DataFrame = {
    val cl = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cl"))
    val cr = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cr"))
    cl.join(cr, "k")
      .select(col("k"), (col("cl") * col("cr")).as("mass"))
      .groupBy(floor(log2(col("mass"))).cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_keys"),
        sum(col("mass")).cast("long").as("implied_rows"),
        max(col("mass")).cast("long").as("max_key_mass"))
  }

  /** The broadcast/shuffle/salt decision row for one candidate equi
    * join — [[joinMass]] priced into a verdict (the qz04/qe11
    * audit-to-decision move applied to join planning): side row
    * counts, distinct-key counts, the exact implied output (Σ cl·cr),
    * the fattest key's mass, the strategy under a STATED row
    * threshold (broadcast the smaller side when it fits, else
    * shuffle), and a salt hint when one key carries ≥ 10% of the
    * output. All from the two count tables — the data never moves. */
  def joinAdvice(left: DataFrame, right: DataFrame,
                 leftKey: String, rightKey: String,
                 broadcastMaxRows: Long = 10000L): DataFrame = {
    require(broadcastMaxRows > 0, s"broadcastMaxRows must be positive")
    val cl = left.groupBy(col(leftKey).as("k")).agg(count(lit(1)).as("cl"))
    val cr = right.groupBy(col(rightKey).as("k")).agg(count(lit(1)).as("cr"))
    val mass = cl.join(cr, "k")
      .select((col("cl") * col("cr")).as("m"))
      .agg(coalesce(sum(col("m")), lit(0L)).cast("long").as("implied_rows"),
        coalesce(max(col("m")), lit(0L)).cast("long").as("max_key_mass"))
    val lrows = left.agg(count(lit(1)).as("left_rows"))
    val rrows = right.agg(count(lit(1)).as("right_rows"))
    val lkeys = cl.agg(count(lit(1)).as("left_keys"))
    val rkeys = cr.agg(count(lit(1)).as("right_keys"))
    lrows.crossJoin(broadcast(rrows)).crossJoin(broadcast(lkeys))
      .crossJoin(broadcast(rkeys)).crossJoin(broadcast(mass))
      .select(col("left_rows"), col("right_rows"),
        col("left_keys"), col("right_keys"),
        col("implied_rows"), col("max_key_mass"),
        when(col("right_rows") <= broadcastMaxRows, lit("broadcast_right"))
          .when(col("left_rows") <= broadcastMaxRows, lit("broadcast_left"))
          .otherwise(lit("shuffle")).as("strategy"),
        (col("max_key_mass") * 10 > col("implied_rows")).as("salt_hint"))
  }

  /** Salted equi-join: the (skewed) left side gets a random salt in
    * [0,n); the right side is exploded n× so every salted key finds its
    * match. Preserves inner-join semantics exactly; costs n× the right
    * side, which must therefore be the small one. */
  def saltedJoin(skewed: DataFrame, other: DataFrame, key: String,
                 saltBuckets: Int): DataFrame = {
    val saltedLeft = skewed.withColumn("__salt",
      pmod(spark_partition_id() + monotonically_increasing_id(), lit(saltBuckets)).cast("int"))
    val replicatedRight = other.withColumn("__salt",
      explode(sequence(lit(0), lit(saltBuckets - 1))))
    saltedLeft.join(replicatedRight, Seq(key, "__salt")).drop("__salt")
  }
}

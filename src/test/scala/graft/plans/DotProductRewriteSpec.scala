package graft.plans

import graft.SparkTestBase
import graft.functions.VectorFunctions
import graft.functions.expressions.DotProduct
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class DotProductRewriteSpec extends SparkTestBase {
  import spark.implicits._

  /** range-backed (NOT a local Seq) so ConvertToLocalRelation can't
    * eagerly evaluate the projection away before we inspect the plan */
  private def vecs: DataFrame = spark.range(1, 4).toDF("id")
    .withColumn("a",
      when($"id" === 1, typedLit(Seq(1.0, 2.0, 3.0)))
        .when($"id" === 2, typedLit(Seq(0.5, -1.5)))
        .otherwise(typedLit(Seq(-0.0, 2.0))))
    .withColumn("b",
      when($"id" === 1, typedLit(Seq(4.0, 5.0, 6.0)))
        .when($"id" === 2, typedLit(Seq(2.0, 2.0)))
        .otherwise(typedLit(Seq(1.0, 1.0))))

  private def hasNative(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten
      .exists(_.exists(_.isInstanceOf[DotProduct]))

  test("the HOF fold rewrites to the native expression") {
    val df = vecs.select($"id", VectorFunctions.dotHof($"a", $"b").as("d"))
    assert(hasNative(df), df.queryExecution.optimizedPlan.toString)
    assert(!df.queryExecution.optimizedPlan.toString.contains("aggregate(zip_with"),
      df.queryExecution.optimizedPlan.toString)
  }

  test("rewritten results equal the direct native call bit-for-bit") {
    val viaHof = vecs.select($"id", VectorFunctions.dotHof($"a", $"b").as("d"))
      .orderBy($"id").as[(Long, Double)].collect().toSeq
    val viaNative = vecs.select($"id", VectorFunctions.dot($"a", $"b").as("d"))
      .orderBy($"id").as[(Long, Double)].collect().toSeq
    assert(viaHof == viaNative)
    assert(viaHof.map(_._2) == Seq(32.0, -2.0, 2.0))
  }

  test("null and length-mismatch semantics survive the rewrite") {
    val df = spark.range(1, 4).toDF("id")
      .withColumn("a", // id=2 stays NULL
        when($"id" === 1, typedLit(Seq(1.0, 2.0)))
          .when($"id" === 3, typedLit(Seq(1.0, 2.0))))
      .withColumn("b", // id=1 gets a length mismatch
        when($"id" === 1, typedLit(Seq(1.0))).otherwise(typedLit(Seq(3.0, 4.0))))
      .select($"id", VectorFunctions.dotHof($"a", $"b").as("d"))
    assert(hasNative(df))
    val rows = df.orderBy($"id").collect()
    assert(rows(0).isNullAt(1) && rows(1).isNullAt(1) && rows(2).getDouble(1) == 11.0)
  }

  test("a fold that is NOT a dot product is left alone") {
    // zero = 1.0: not the dot-product seed
    val seeded = vecs.select(aggregate(
      zip_with($"a", $"b", (x, y) => x * y), lit(1.0), (s, v) => s + v).as("d"))
    assert(!hasNative(seeded))
    // merge = s - v: not a sum
    val sub = vecs.select(aggregate(
      zip_with($"a", $"b", (x, y) => x * y), lit(0.0), (s, v) => s - v).as("d"))
    assert(!hasNative(sub))
    // zip lambda x + y: not a product
    val plus = vecs.select(aggregate(
      zip_with($"a", $"b", (x, y) => x + y), lit(0.0), (s, v) => s + v).as("d"))
    assert(!hasNative(plus))
    // int arrays: wrong element type
    val ints = spark.range(1, 3).toDF("id")
      .withColumn("a", typedLit(Seq(1, 2))).withColumn("b", typedLit(Seq(3, 4)))
      .select(aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0), (s, v) => s + v).as("d"))
    assert(!hasNative(ints))
  }

  test("cosine built from the HOF form rides the rewrite end-to-end") {
    val hofCos = vecs.select($"id",
      round(VectorFunctions.dotHof($"a", $"b") /
        sqrt(VectorFunctions.dotHof($"a", $"a") * VectorFunctions.dotHof($"b", $"b")), 6).as("c"))
    assert(hasNative(hofCos))
    val nativeCos = vecs.select($"id", VectorFunctions.cosineRounded($"a", $"b").as("c"))
    assert(hofCos.orderBy($"id").collect().toSeq ==
      nativeCos.orderBy($"id").collect().toSeq)
  }

  test("the rewrite reaches the real embeddings scan") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val q = emb.as("x").join(emb.as("y"), $"x.vec_id" < $"y.vec_id")
      .select($"x.vec_id", $"y.vec_id",
        VectorFunctions.dotHof($"x.embedding", $"y.embedding").as("d"))
      .limit(5)
    assert(hasNative(q))
  }

  private def hasCentered(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan
      .collect { case p => p.expressions }.flatten
      .exists(_.exists(_.isInstanceOf[graft.functions.expressions.CenteredDot]))

  test("dot(zip_with(x, mu, _-_), v) fuses to the native centered dot, either operand order") {
    val mu = typedLit(Seq(0.5, 0.5, 0.5))
    val lft = vecs.filter($"id" === 1).select(
      VectorFunctions.dot(zip_with($"a", mu, (p, q) => p - q), $"b").as("c"))
    assert(hasCentered(lft), lft.queryExecution.optimizedPlan.toString)
    val rgt = vecs.filter($"id" === 1).select(
      VectorFunctions.dot($"b", zip_with($"a", mu, (p, q) => p - q)).as("c"))
    assert(hasCentered(rgt), rgt.queryExecution.optimizedPlan.toString)
    // value equals the direct native call
    val direct = vecs.filter($"id" === 1).select(
      VectorFunctions.centeredDot($"a", mu, $"b").as("c")).as[Double].head()
    assert(lft.as[Double].head() == direct && rgt.as[Double].head() == direct)
    assert(direct == 0.5 * 4.0 + 1.5 * 5.0 + 2.5 * 6.0)
  }

  test("the fully-composed HOF centered dot fuses within the fixpoint batch") {
    // aggregate(zip_with(zip_with(x,mu,_-_), v, _*_), 0, _+_): one
    // fixpoint iteration rewrites the fold to DotProduct, the next
    // fuses the centered zip into CenteredDot
    val mu = typedLit(Seq(0.5, 0.5, 0.5))
    val df = vecs.filter($"id" === 1).select(
      VectorFunctions.dotHof(zip_with($"a", mu, (p, q) => p - q), $"b").as("c"))
    assert(hasCentered(df), df.queryExecution.optimizedPlan.toString)
    assert(df.as[Double].head() == 0.5 * 4.0 + 1.5 * 5.0 + 2.5 * 6.0)
  }

  test("subtraction order is strict: (p,q) => q - p is NOT fused") {
    val mu = typedLit(Seq(0.5, 0.5, 0.5))
    val df = vecs.filter($"id" === 1).select(
      VectorFunctions.dot(zip_with($"a", mu, (p, q) => q - p), $"b").as("c"))
    assert(!hasCentered(df), df.queryExecution.optimizedPlan.toString)
    // still correct through the unfused path
    assert(df.as[Double].head() == (-0.5 * 4.0) + (-1.5 * 5.0) + (-2.5 * 6.0))
  }
}

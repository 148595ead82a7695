package graft.functions

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class DotProductSpec extends SparkTestBase {
  import spark.implicits._

  test("native DotProduct is bit-identical to the HOF formulation") {
    val t = Tables(spark, sf0001)
    val mismatches = t.embeddings
      .select(VectorFunctions.dot($"embedding", $"embedding").as("native"),
              VectorFunctions.dotHof($"embedding", $"embedding").as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(mismatches == 0)
  }

  test("known values and null propagation") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0)))).toDF("a", "b")
    val out = df.select(VectorFunctions.dot($"a", $"b")).as[Option[Double]].collect()
    assert(out(0).contains(32.0))
    assert(out(1).isEmpty)
  }

  test("null elements and unequal lengths return NULL, matching the HOF") {
    val df = Seq(
      (Seq(Some(1.0), None, Some(3.0)), Seq(Some(4.0), Some(5.0), Some(6.0))),
      (Seq(Some(1.0), Some(2.0)), Seq(Some(4.0), Some(5.0), Some(6.0))),
      (Seq(Some(1.0), Some(2.0)), Seq(Some(4.0), Some(5.0)))).toDF("a", "b")
    val out = df.select(VectorFunctions.dot($"a", $"b").as("native"),
                        VectorFunctions.dotHof($"a", $"b").as("hof"))
      .as[(Option[Double], Option[Double])].collect()
    assert(out(0) == ((None, None)))          // null element poisons the fold
    assert(out(1) == ((None, None)))          // unequal lengths: zip_with pads with null
    assert(out(2) == ((Some(14.0), Some(14.0))))
  }

  test("registered as SQL function via extensions") {
    val v = spark.sql("SELECT graft_dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(v == 11.0)
  }

  test("native lshBucket bit-matches the HOF reference on the fixture") {
    val t = Tables(spark, sf0001)
    val mismatches = t.embeddings
      .select(VectorFunctions.lshBucket($"embedding", 8, 64).as("native"),
              VectorFunctions.lshBucketHof($"embedding", 8, 64).as("hof"))
      .filter($"native" =!= $"hof")
      .count()
    assert(mismatches == 0)
    // and with a plane count that exercises non-default weights
    val m4 = t.embeddings
      .select(VectorFunctions.lshBucket($"embedding", 4, 64).as("native"),
              VectorFunctions.lshBucketHof($"embedding", 4, 64).as("hof"))
      .filter($"native" =!= $"hof").count()
    assert(m4 == 0)
  }

  test("participates in whole-stage codegen (no fallback marker)") {
    val t = Tables(spark, sf0001)
    val plan = t.embeddings
      .select(VectorFunctions.dot($"embedding", $"embedding").as("d"))
      .queryExecution.executedPlan.toString
    // '*(n)' prefix marks operators inside a WholeStageCodegen stage
    assert(plan.contains("*(1) Project"), s"expected codegen'd project:\n$plan")
  }
}

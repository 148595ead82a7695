package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** The fused native centered dot must be BIT-equal to the composed
  * `dot(zip_with(x, mu, _-_), v)` form it replaces — the qs16-qs21
  * oracles assume the two are interchangeable. */
class CenteredDotSpec extends SparkTestBase {
  import spark.implicits._

  test("bit-equality with the HOF form on real embeddings") {
    val df = spark.read.parquet(s"$sf0001/embeddings.parquet")
    val mu = lit((0 until 64).map(j => math.sin(j.toDouble) * 0.1).toArray)
    val v = lit((0 until 64).map(j => math.cos(j * 0.7) * 0.3).toArray)
    val got = df.select(
        VectorFunctions.centeredDot($"embedding", mu, v).as("a"),
        VectorFunctions.centeredDotHof($"embedding", mu, v).as("b"))
      .as[(Double, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (a, b) =>
      assert(java.lang.Double.doubleToRawLongBits(a) ==
        java.lang.Double.doubleToRawLongBits(b), s"$a != $b")
    }
  }

  test("hand-computed value, and the interpreted path agrees with codegen") {
    val row = Seq((Array(1.0, 2.0, 3.0), Array(0.5, 0.5, 0.5), Array(2.0, -1.0, 4.0)))
      .toDF("x", "m", "v")
    val want = (1.0 - 0.5) * 2.0 + (2.0 - 0.5) * -1.0 + (3.0 - 0.5) * 4.0
    val a = row.select(VectorFunctions.centeredDot($"x", $"m", $"v")).as[Double].head()
    assert(a == want)
    // interpreted eval (no codegen) — the Expression's nullSafeEval path
    val e = graft.functions.expressions.CenteredDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(1.0, 2.0, 3.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(0.5, 0.5, 0.5),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Seq(2.0, -1.0, 4.0),
        org.apache.spark.sql.types.ArrayType(org.apache.spark.sql.types.DoubleType)))
    assert(e.eval(null) == want)
  }

  test("null semantics mirror the zip_with fold: length mismatch and null elements poison") {
    val df = Seq(
      (Array(1.0, 2.0), Array(0.0, 0.0, 0.0), Array(1.0, 1.0)),       // len mismatch
      (Array(1.0, 2.0), Array(0.0, 0.0), Array(1.0, 1.0))             // clean
    ).toDF("x", "m", "v")
    val got = df.select(VectorFunctions.centeredDot($"x", $"m", $"v").as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got(0).isEmpty, "length mismatch must be NULL")
    assert(got(1).contains(3.0))
    val hof = df.select(VectorFunctions.centeredDotHof($"x", $"m", $"v").as("c"))
      .collect().map(r => if (r.isNullAt(0)) None else Some(r.getDouble(0)))
    assert(got.toSeq == hof.toSeq, "native and HOF null semantics must agree")
  }
}

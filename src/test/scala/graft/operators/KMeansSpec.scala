package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkTestBase {

  import spark.implicits._

  private lazy val emb = Tables(spark, sf0001).embeddings

  test("update: exact element-wise member means, dead cells dropped") {
    val assigned = Seq(
      (1L, Seq(1.0f, 3.0f), 0),
      (2L, Seq(3.0f, 5.0f), 0),
      (3L, Seq(10.0f, 0.0f), 2)
    ).toDF("vec_id", "embedding", "cell")
    val got = KMeans.update(assigned).collect()
      .map(r => r.getAs[Int]("cell") ->
        (r.getAs[Seq[Double]]("c_vec"), r.getAs[Long]("n_members"), r.getAs[Double]("c_nrm2")))
      .toMap
    assert(got.keySet === Set(0, 2)) // cell 1 never existed; no empty rows invented
    assert(got(0) === ((Seq(2.0, 4.0), 2L, 20.0)))
    assert(got(2) === ((Seq(10.0, 0.0), 1L, 100.0)))
  }

  test("census conserves corpus mass and Lloyd's objective never increases") {
    val n = emb.count()
    val i1 = KMeans.census(emb, k = 8, iters = 1).collect()
    val i2 = KMeans.census(emb, k = 8, iters = 2).collect()
    assert(i1.map(_.getAs[Long]("n_members")).sum === n)
    assert(i2.map(_.getAs[Long]("n_members")).sum === n)
    val obj1 = i1.map(_.getAs[Double]("inertia")).sum
    val obj2 = i2.map(_.getAs[Double]("inertia")).sum
    // post-update inertia after round 2 cannot exceed round 1's
    // (assign can only improve scores; update is the cell-wise argmin)
    assert(obj2 <= obj1 + 1e-6, s"objective rose: $obj1 -> $obj2")
  }

  test("clustering is invariant to the input partitioning (exact-decimal means)") {
    val a = KMeans.census(emb, k = 8, iters = 2).collect().map(_.toSeq).toSeq
    val b = KMeans.census(emb.repartition(13), k = 8, iters = 2).collect().map(_.toSeq).toSeq
    assert(a === b)
  }

  test("refined centroids beat the sampled seeds on inertia (why Lloyd exists)") {
    // inertia of the SEEDS measured on their own assignment
    val seeds = IvfIndex.centroids(emb, 8)
    val assigned = IvfIndex.assign(emb, seeds)
    val seedInertia = assigned.join(broadcast(seeds), "cell")
      .select((graft.functions.VectorFunctions.norm2($"embedding")
        - lit(2.0) * graft.functions.VectorFunctions.dot($"embedding", $"c_vec")
        + $"c_nrm2").as("d"))
      .agg(sum($"d")).head().getDouble(0)
    val refined = KMeans.census(emb, k = 8, iters = 2).collect()
      .map(_.getAs[Double]("inertia")).sum
    assert(refined < seedInertia, s"refinement did not help: $seedInertia -> $refined")
  }
}

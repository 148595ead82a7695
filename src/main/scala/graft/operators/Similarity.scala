package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths per the builder brief:
  *  - [[bruteForceTopK]] — exact cosine top-k. The query set is
  *    broadcast (it is small by definition); the corpus streams through
  *    a single projection+window stage. Correctness baseline.
  *  - [[lshTopK]] — random-hyperplane LSH bucketing: corpus and queries
  *    are hashed to sign-bit buckets, candidates come only from the
  *    query's bucket. This is the 100 TB path: the corpus-side bucket
  *    assignment is a pure projection, the join shuffles on the (small)
  *    bucket key, and per-bucket work is bucket-local. Recall is tested
  *    against the brute-force baseline in SimilaritySpec.
  */
object Similarity {

  /** Exact top-k neighbors by cosine for each query vector. Norms are
    * precomputed on each side before the join (1 dot per pair, not 3). */
  def bruteForceTopK(corpus: DataFrame, queryIds: Seq[Long], k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
              sqrt(norm2(col(vecCol))).as("q_nrm"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
                          sqrt(norm2(col(vecCol))).as("c_nrm"))
    val sims = c.join(broadcast(q), col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    sims.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** LSH-bucketed approximate top-k: only candidates in the query's
    * hyperplane-sign bucket are scored.
    *
    * `tables` > 1 gives the standard multi-table recall boost: table t
    * hashes with its own `planes` hyperplanes (indices t·planes …
    * (t+1)·planes − 1, so every table's weights stay deterministic and
    * oracle-able), a pair is a candidate if it collides in ANY table,
    * and candidates are deduped before scoring. Recall grows roughly
    * with 1 − (1 − p^planes)^tables at the cost of `tables`× bucket
    * joins — still never all-pairs. */
  def lshTopK(corpus: DataFrame, queryIds: Seq[Long], k: Int,
              planes: Int = 8, dim: Int = 64, tables: Int = 1,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(tables >= 1, s"tables must be >= 1, got $tables")
    if (tables == 1) {
      // single-table fast path: score inline on the bucket join (the
      // plan PlanAuditSpec audits — one broadcast equi join, no dedup)
      val bucketed = corpus.select(col(idCol), col(vecCol),
        lshBucket(col(vecCol), planes, dim).as("bucket"),
        sqrt(norm2(col(vecCol))).as("nrm"))
      val q = bucketed.filter(col(idCol).isin(queryIds: _*))
        .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), col("bucket"), col("nrm").as("q_nrm"))
      val c = bucketed.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"), col("bucket"), col("nrm").as("c_nrm"))
      val sims = c.join(broadcast(q), Seq("bucket"))
        .filter(col("neighbor_id") =!= col("query_id"))
        .select(col("query_id"), col("neighbor_id"),
          round(dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
      return sims.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
    }
    // multi-table path: one pass computes every table's bucket — table
    // t is bit-slice [t*planes, (t+1)*planes) of one long bit code
    val allBits = lshBucket(col(vecCol), tables * planes, dim)
    val bucketCols = (0 until tables).map(t =>
      substring(allBits, t * planes + 1, planes).as(s"bucket_$t"))
    val bucketed = corpus.select(
      Seq(col(idCol), col(vecCol), sqrt(norm2(col(vecCol))).as("nrm")) ++ bucketCols: _*)
    val q = bucketed.filter(col(idCol).isin(queryIds: _*))
    val cands = (0 until tables).map { t =>
      bucketed.select(col(idCol).as("neighbor_id"), col(s"bucket_$t").as("bucket"))
        .join(broadcast(q.select(col(idCol).as("query_id"), col(s"bucket_$t").as("bucket"))),
              Seq("bucket"))
        .select(col("query_id"), col("neighbor_id"))
    }.reduce(_ unionByName _).distinct()
      .filter(col("neighbor_id") =!= col("query_id"))
    val sims = cands
      .join(broadcast(q.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
                               col("nrm").as("q_nrm"))), "query_id")
      .join(bucketed.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
                            col("nrm").as("c_nrm")), "neighbor_id")
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    sims.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** Filtered exact top-k — vector search under a metadata predicate
    * (here: same label as the query), the "search within my
    * collection" shape every production vector store needs. The
    * filter is applied PRE-scoring by riding the broadcast-join
    * condition — the label equality IS a join key, so only eligible
    * pairs are ever scored and the result is the exact top-k among
    * eligible vectors. The alternative (search-then-filter) scores
    * everything and then drops rows, returning FEWER than k whenever
    * the filter bites inside the unfiltered top-k — SimilaritySpec
    * pins that counterexample. At scale the predicate composes with
    * partition pruning (a label-partitioned corpus reads only its
    * cell, the IvfIndex storage argument applied to metadata). */
  def filteredTopK(corpus: DataFrame, queryIds: Seq[Long], k: Int,
                   idCol: String = "vec_id", vecCol: String = "embedding",
                   labelCol: String = "label"): DataFrame = {
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        sqrt(norm2(col(vecCol))).as("q_nrm"), col(labelCol).as("q_label"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      sqrt(norm2(col(vecCol))).as("c_nrm"), col(labelCol).as("c_label"))
    val sims = c.join(broadcast(q),
        col("c_label") === col("q_label") && col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    sims.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** Reciprocal (mutual) k-NN graph — the edge set SemDeDup-style
    * clustering and UMAP-ish manifold steps start from: (a, b) is an
    * edge iff b is in a's top-k AND a is in b's top-k. One-directional
    * nearest neighbors are dominated by hubs (a few central vectors
    * appear in everyone's top-k); mutuality is the standard hub
    * filter. Neighborhoods are scored WITHIN an IVF cell
    * ([[IvfIndex]]'s deterministic quantizer — the same blocking that
    * keeps [[graft.operators.Dedup.semanticDedup]] off the corpus²
    * cliff), so the pair join shuffles on the cell key and the per-id
    * top-k window is cell-bounded. Mutuality is a self-join of the
    * ranked lists on the reversed pair — candidate-sized, not
    * corpus-sized. Output: canonical a<b edges with the cosine and
    * both ranks. */
  def mutualKnn(corpus: DataFrame, nCells: Int, k: Int,
                idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    require(nCells >= 1 && k >= 1, s"need nCells >= 1 and k >= 1, got $nCells, $k")
    val cents = IvfIndex.centroids(corpus, nCells, idCol, vecCol)
    val assigned = IvfIndex.assign(corpus, cents, idCol, vecCol)
    val v = assigned.select(col("cell"), col(idCol),
      col(vecCol), sqrt(norm2(col(vecCol))).as("nrm"))
    val a = v.select(col("cell"), col(idCol).as("a_id"),
      col(vecCol).as("a_vec"), col("nrm").as("a_nrm"))
    val b = v.select(col("cell"), col(idCol).as("b_id"),
      col(vecCol).as("b_vec"), col("nrm").as("b_nrm"))
    val sims = a.join(b, Seq("cell"))
      .filter(col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(dot(col("a_vec"), col("b_vec")) / (col("a_nrm") * col("b_nrm")), 6)
          .as("cos_sim"))
    val w = Window.partitionBy(col("a_id"))
      .orderBy(col("cos_sim").desc, col("b_id").asc)
    val ranked = sims.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
    ranked.filter(col("a_id") < col("b_id"))
      .join(ranked.select(col("a_id").as("b_id"), col("b_id").as("a_id"),
          col("rk").as("rk_ba")),
        Seq("a_id", "b_id"))
      .select(col("a_id"), col("b_id"), col("cos_sim"),
        col("rk").as("rk_ab"), col("rk_ba"))
  }

  /** Hard-negative mining for contrastive/embedding training: for each
    * query vector, the top-k most-similar corpus vectors whose label
    * DIFFERS from the query's — the near-misses a trainer wants as
    * negatives (random negatives are too easy; same-label neighbors are
    * positives, not negatives). The label inequality also excludes the
    * query row itself.
    *
    * Same plan shape as [[bruteForceTopK]]: the query set (with its
    * labels) is broadcast, the corpus streams through one projection +
    * per-query window — the label filter rides the broadcast join
    * condition, so mismatched pairs are dropped before any dot product
    * is computed. At 100 TB the exact corpus pass swaps for [[lshTopK]]
    * or [[IvfIndex]] candidates with the identical label filter. */
  def hardNegatives(corpus: DataFrame, queryIds: Seq[Long], k: Int,
                    idCol: String = "vec_id", vecCol: String = "embedding",
                    labelCol: String = "label"): DataFrame = {
    val q = corpus.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
              col(labelCol).as("q_label"), sqrt(norm2(col(vecCol))).as("q_nrm"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
                          col(labelCol).as("c_label"), sqrt(norm2(col(vecCol))).as("c_nrm"))
    val sims = c.join(broadcast(q), col("c_label") =!= col("q_label"))
      .select(col("query_id"), col("neighbor_id"), col("c_label").as("neighbor_label"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    sims.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }

  /** IVF (inverted-file) approximate top-k over the deterministic
    * sampled-centroid quantizer — see [[IvfIndex]]. Fit and apply are
    * split: [[IvfIndex.centroids]]/[[IvfIndex.assign]] are the build
    * stage (run once, persisted via [[IvfIndex.build]] at scale) and
    * [[IvfIndex.topK]] is the probe; this convenience wrapper chains
    * them for the oracle-checked query path. No ML fit runs here. */
  def ivfTopK(corpus: DataFrame, queryIds: Seq[Long], k: Int,
              nCells: Int = 8, nProbe: Int = 2,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val cents = IvfIndex.centroids(corpus, nCells, idCol, vecCol)
    val assigned = IvfIndex.assign(corpus, cents, idCol, vecCol)
    IvfIndex.topK(assigned, cents, queryIds, k, nProbe, idCol, vecCol)
  }

  /** Offline data-adaptive IVF quantizer: KMeans centroids (fixed
    * seed). This is a BUILD-stage tool — `.fit` must never run inside a
    * query path (persist the assignment via [[IvfIndex.build]]-style
    * layout instead); the probe shape is identical to [[ivfTopK]]. */
  def ivfTopKKMeans(corpus: DataFrame, queryIds: Seq[Long], k: Int,
                    nCells: Int = 8, nProbe: Int = 2, seed: Long = 42L,
                    idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import org.apache.spark.ml.linalg.Vector

    val featurized = corpus.select(col(idCol), col(vecCol),
      array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    val model = new KMeans().setK(nCells).setSeed(seed).setFeaturesCol("features")
      .fit(featurized)
    val assigned = model.transform(featurized)
      .select(col(idCol), col(vecCol), col("prediction").as("cell"),
              sqrt(norm2(col(vecCol))).as("nrm"))

    // each query probes its nProbe nearest centroids
    val centroids = model.clusterCenters.zipWithIndex
    val queries = assigned.filter(col(idCol).isin(queryIds: _*))
      .select(col(idCol).as("query_id"), col(vecCol).as("q_vec"), col("nrm").as("q_nrm"))
    val probeCells = udf { (v: Seq[Float]) =>
      val vd = v.map(_.toDouble).toArray
      centroids.map { case (c: Vector, i: Int) =>
        var d = 0.0
        var j = 0
        while (j < vd.length) { val t = vd(j) - c(j); d += t * t; j += 1 }
        (i, d)
      }.sortBy(_._2).take(nProbe).map(_._1)
    }
    val q = queries.withColumn("cell", explode(probeCells(col("q_vec"))))
    val c = assigned.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
                            col("cell"), col("nrm").as("c_nrm"))
    val sims = c.join(broadcast(q), Seq("cell"))
      .filter(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        round(dot(col("q_vec"), col("c_vec")) / (col("q_nrm") * col("c_nrm")), 6).as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id").asc)
    sims.withColumn("rk", row_number().over(w).cast("long")).filter(col("rk") <= k)
  }
}

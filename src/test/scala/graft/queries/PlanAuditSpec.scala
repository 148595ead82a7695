package graft.queries

import graft.{SparkTestBase, Tables}

/** Physical-plan audits (builder brief: "iterate until it's the plan
  * you'd want"). These pin the scale-critical plan properties so a
  * refactor that silently loses pushdown/broadcast/top-k fails CI.
  */
class PlanAuditSpec extends SparkTestBase {

  private lazy val t = Tables(spark, sf0001)

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("q06: filters are pushed into the parquet scan") {
    val p = plan(RelationalQueries.revenueFilter(t))
    assert(p.contains("PushedFilters: ["), p)
    // the selective predicates reach the reader, not a post-scan Filter only
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("IsNotNull(l_shipdate"), p)
  }

  test("q06: scan reads only the referenced columns (pruning)") {
    val p = plan(RelationalQueries.revenueFilter(t))
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("l_extendedprice") && readSchema.contains("l_discount"))
    assert(!readSchema.contains("l_orderkey") && !readSchema.contains("l_returnflag"),
      s"scan reads unneeded columns: $readSchema")
  }

  test("q04: dimension joins broadcast, no shuffle on the small side") {
    val p = plan(RelationalQueries.regionRevenue(t))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("q02: top-k plans as TakeOrderedAndProject (no global sort)") {
    val p = plan(RelationalQueries.topCustomers(t))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q01: aggregation is partial+final (map-side combine)") {
    val p = plan(RelationalQueries.pricingSummary(t))
    assert(p.contains("HashAggregate"), p)
    assert(p.contains("partial_"), s"no partial aggregation:\n$p")
  }

  test("q07: anti join planned as a hash anti join, not nested loop") {
    val p = plan(RelationalQueries.inactiveCustomers(t))
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("qd02: inverted-index jaccard shuffles on shingle hash, not all-pairs") {
    val p = plan(graft.operators.Dedup.jaccardPairsByBlock(t.documents, "lang"))
    // equi-join on (block, h): a hash-partitioned or broadcast equi join
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("qs01: query side is broadcast so the corpus never shuffles") {
    val p = plan(graft.operators.Similarity.bruteForceTopK(t.embeddings, Seq(0L, 1L), 3))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
  }

  test("qs02: bucket join is an equi join on the bucket key, queries broadcast") {
    val p = plan(graft.operators.Similarity.lshTopK(t.embeddings, Seq(0L, 1L), 3))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the bucket assignment is the native expression, not an interpreted HOF
    assert(p.contains("graft_lsh_bucket"), s"expected native lsh bucket in plan:\n$p")
  }

  test("qs03: probe joins on the cell key with broadcast probes, centroids broadcast") {
    val p = plan(graft.operators.Similarity.ivfTopK(t.embeddings, Seq(0L, 1L), 3))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qg01: bounded DAG recursion is k equi joins, never a nested loop") {
    val p = plan(ExtendedQueries.commitAncestors(t))
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("qr01: rollup is ONE scan + Expand + partial/final agg, not unioned groupBys") {
    val p = plan(CurationQueries.dataCard(t))
    assert(p.contains("Expand"), s"rollup should plan an Expand:\n$p")
    assert(p.contains("partial_"), s"no map-side partial aggregation:\n$p")
    assert(!p.contains("Union"), s"rollup must not union separate aggregations:\n$p")
    // exactly one documents scan feeds all grouping levels
    assert("parquet".r.findAllIn(p.toLowerCase).length >= 1 &&
      p.linesIterator.count(_.contains("FileScan")) == 1, s"expected a single scan:\n$p")
  }

  test("qa02: salted as-of keeps equi joins only — no cartesian, no nested loop") {
    val p = plan(CurationQueries.asofViewBeforePurchaseSalted(t))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // both window levels present: per-(key, salt) running-last + the
    // per-key carry-in scan; the carry attach broadcasts (tiny side)
    assert("Window \\[".r.findAllIn(p).length >= 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("qt10/qt13: rule census and classifier scoring are join-free scan shapes") {
    val pRules = plan(QualityQueries.gopherRules(t))
    assert(!pRules.contains("Join"), s"gopher rules should be a pure projection:\n$pRules")
    val pCls = plan(QualityQueries.classifierScore(t))
    // classifier: explode + per-doc agg + the keep-empty-docs left join
    // back onto ids — but never a shuffle of the weight "model"
    assert(!pCls.contains("CartesianProduct") &&
           !pCls.contains("BroadcastNestedLoopJoin"), pCls)
  }

  test("qc07: fuzzy decontamination broadcasts the bench side in BOTH stages") {
    val p = plan(QualityQueries.fuzzyDecontaminate(t))
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"bench band + bench hash joins must both broadcast:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("qd09: substring census is linear — no candidate-pair self-join columns") {
    val p = plan(QualityQueries.substringDedup(t))
    assert(!p.contains("a_id") && !p.contains("b_id"),
      s"substring dedup must never materialize pairs:\n$p")
    assert(p.contains("partial_"), s"owner census should combine map-side:\n$p")
  }

  test("qt12: LM scoring joins are equi joins on the n-gram key") {
    val p = plan(QualityQueries.lmScore(t))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("qd10: edit-distance funnel joins are equi joins, never a nested loop") {
    val p = plan(PipelineQueries.editDistanceNearDups(t))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("levenshtein"), s"expected codegen'd levenshtein verify:\n$p")
  }

  test("qs06: BM25 scoring is a broadcast join on the postings scan — corpus never query-shuffled") {
    val p = plan(RetrievalQueries.bm25TopK(t))
    assert(p.contains("BroadcastHashJoin"), p)
    // no unbounded pair joins; the only nested-loop is the 1-row stats
    // broadcast (crossJoin of two scalar aggregates)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qt16: PMI top-k plans as TakeOrderedAndProject with the support filter before the joins") {
    val df = PipelineQueries.pmiBigrams(t)
    val p = plan(df)
    assert(p.contains("TakeOrderedAndProject"), p)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains(">= 5"), s"support filter missing from optimized plan:\n$opt")
  }

  test("qg02: triangle census is equi joins only — no nested loop, no cartesian pair join") {
    val p = plan(ExtendedQueries.triangleCensus(t))
    assert(!p.contains("CartesianProduct"), p)
    // the edge/wedge/closing joins are hash equi joins; nested-loop
    // appears only in the 1-row scalar combines at the very top
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
           p.contains("ShuffledHashJoin"), p)
    val bnlj = p.linesIterator.count(_.contains("BroadcastNestedLoopJoin"))
    assert(bnlj <= 2, s"expected only the two scalar combines as nested-loop, got $bnlj:\n$p")
  }

  test("qd12: substring scrub stays linear — no candidate-pair self-join columns") {
    val p = QualityQueries.substringScrub(t).queryExecution.optimizedPlan.toString
    assert(!p.contains("a_id") && !p.contains("b_id"), p)
  }

  test("qp09: DSIR model table is broadcast; corpus never model-shuffled") {
    val p = plan(QualityQueries.dsirWeights(t))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qd13: SemDeDup centroids broadcast; pairing is an equi join on the cell key") {
    val p = plan(PipelineQueries.semanticDedup(t))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the pair join keys on the learned cell
    assert(p.contains("cell"), p)
  }

  test("qc10: benchmark embeddings broadcast — corpus streams once, no self-shuffle") {
    val p = plan(QualityQueries.semanticDecontaminate(t))
    // bench side is a broadcast (nested-loop on the tiny side is the
    // expected shape for an unconditioned scoring join)
    assert(p.contains("Broadcast"), p)
    assert(!p.contains("SortMergeJoin") ||
           p.linesIterator.count(_.contains("SortMergeJoin")) <= 1, p)
  }

  test("qt20: vocab coverage never plans a vocabulary-scale unpartitioned window") {
    val df = PipelineQueries.vocabCoverage(t)
    val windows = df.queryExecution.optimizedPlan.toString.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    // the term-scale windows partition by the log2-frequency bucket;
    // the only constant-partition window is the ~64-row bucket-offset
    // frame (partitionBy(lit(0)) → a literal, not a column reference)
    assert(windows.exists(_.contains("windowspecdefinition(bkt")),
      s"expected bkt-partitioned running sum:\n${windows.mkString("\n")}")
  }

  test("qz02: global ordinal never plans a data-scale unpartitioned window") {
    val df = LayoutQueries.globalOrdinal(t)
    val windows = df.queryExecution.optimizedPlan.toString.linesIterator
      .filter(_.contains("windowspecdefinition")).toSeq
    // the data window partitions by the bucket id; the only constant-
    // partition window is the numBuckets-row offsets frame
    assert(windows.exists(_.contains("windowspecdefinition(__pid")),
      s"expected bucket-partitioned data window:\n${windows.mkString("\n")}")
  }

  test("qe07: sliding distinct has no events range self-join and no window distinct") {
    val p = plan(PipelineQueries.slidingDistinct(t))
    // exact sliding-window distinct must come from the bounded explode
    // of the collapsed (day,user) frame — never a range self-join of
    // raw events (a non-equi join would plan nested-loop/cartesian)
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin"), s"day-dimension filter should broadcast:\n$p")
    assert(!p.contains("Window"), s"no window-function distinct:\n$p")
  }

  test("qd15: intra-doc line dedup is a pure scan projection (zero Exchange)") {
    val p = plan(PipelineQueries.intradocDedup(t))
    val exchanges = p.linesIterator.count(_.trim.startsWith("Exchange"))
    // the single Exchange is the final orderBy's range partitioning for
    // presentation; the dedup itself must not shuffle
    assert(exchanges <= 1, s"expected at most the presentation sort exchange:\n$p")
    assert(!p.contains("Join"), s"no joins in a per-doc projection:\n$p")
  }

  test("qr02: drift report unions the materialized terms frame, no data-scale join") {
    val p = plan(CurationQueries.driftReport(t))
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
    // the |types|-row terms frame is checkpointed once (corpus scanned
    // exactly twice, upstream); both union branches read the
    // materialized RDD instead of re-scanning events per branch
    assert(p.contains("Scan ExistingRDD"), s"expected the checkpointed terms frame:\n$p")
    assert(!p.contains("FileScan"), s"no events re-scan in the union:\n$p")
  }

  test("qs11: metrics attach labels on the top-k frame via equi joins only") {
    val p = plan(RetrievalQueries.retrievalMetrics(t))
    // one nested-loop is inherent to the unconditioned query×corpus
    // scoring join (qs01's shape); label attachment must stay equi
    assert(p.linesIterator.count(_.contains("BroadcastNestedLoopJoin")) <= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qp14: domain cap is one window over the planted projection — no join, no cartesian") {
    val p = plan(CurationQueries.domainCap(t))
    assert(!p.contains("Join"), s"domain cap must be join-free:\n$p")
    assert(p.contains("Window"), p)
    // exactly one data shuffle: the domain hash partition for the window
    // (plus the presentation sort's range exchange)
    assert(p.linesIterator.count(_.contains("Exchange hashpartitioning")) == 1, p)
  }

  test("qr04: gate ablation unpivot reads the 1-row checkpoint, never rescans the corpus") {
    val p = plan(QualityQueries.gateAblation(t))
    // four union branches over the materialized aggregate row
    assert(p.contains("Scan ExistingRDD"), s"expected the checkpointed agg row:\n$p")
    assert(!p.contains("FileScan"), s"corpus must not be rescanned per gate row:\n$p")
  }

  test("qt23: global line dedup is census + equi join-back — no pair join, map-side combine") {
    val p = plan(QualityQueries.lineBoilerplate(t))
    assert(!p.contains("CartesianProduct") && !p.contains("NestedLoop"), p)
    // the doc-frequency census partial-aggregates before its shuffle
    assert(p.contains("partial_"), s"line census should combine map-side:\n$p")
    // join back rides the md5 line-hash key (lh), an equi join
    assert(p.contains("lh"), s"join-back must key on the line hash:\n$p")
  }

  test("qd19: band census is join-free with map-side partial aggregation") {
    val p = plan(graft.operators.Dedup.bandCensus(t.documents))
    assert(!p.contains("Join"), s"census must price the join, not run it:\n$p")
    assert(p.contains("partial_"), s"bucket counts should combine map-side:\n$p")
  }

  test("qs12: kmeans touches the corpus only through broadcast joins") {
    val p = plan(graft.operators.KMeans.census(t.embeddings, k = 4, iters = 1))
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"),
      s"corpus must never shuffle-join the centroid side:\n$p")
    assert(p.contains("Broadcast"), p)
  }

  test("qg06: label propagation aggregates with map-side combine, no window sort") {
    val p = plan(ExtendedQueries.labelPropagation(t))
    // the per-node argmax is min(struct(-c, label)) — a hash aggregate
    // with partial combine, never a Window over node partitions
    assert(!p.contains("Window"), s"argmax must not plan as a window:\n$p")
    assert(p.contains("partial_min"), s"argmax should combine map-side:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("qr05: expectation suite — branches read the 1-row checkpoint; FK is a broadcast anti join") {
    val p = plan(QualityQueries.expectations(t))
    assert(p.contains("LeftAnti") && p.contains("BroadcastHashJoin"),
      s"FK orphan check must be a broadcast anti join:\n$p")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"), p)
  }

  test("qe08: the data-scale disorder window is bucket-partitioned; bucket frame broadcast") {
    val p = plan(PipelineQueries.disorderCensus(t))
    // the per-event window must carry the bkt partition spec — an
    // unpartitioned ORDER BY arr window over the events would serialize
    // the whole table through one task
    assert(p.contains("windowspecdefinition(bkt"), s"events window lost its partition:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"bucket frame should broadcast:\n$p")
  }

  test("ql01: linkage pairs are the block equi join only; weights are scan-local") {
    val p = plan(QualityQueries.recordLinkage(t))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"linkage must never go all-pairs:\n$p")
    assert(p.contains("Join"), p)
  }

  test("qk03: the point-in-time join is the as-of union scan, never a per-fact range join") {
    val p = plan(ExtendedQueries.pitJoin(t))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"PIT join must not fall back to a range/nested-loop join:\n$p")
    // the fact→orders custkey attach stays an equi hash join
    assert(p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("qs13: mutual kNN pairs only within cells; centroids broadcast") {
    val p = plan(RetrievalQueries.mutualKnnGraph(t))
    assert(!p.contains("CartesianProduct"),
      s"pairing must be cell-keyed, never all-pairs:\n$p")
    // the 8-row centroid frame broadcasts (hash or nested-loop — both
    // are the broadcast shape for a constant-size side)
    assert(p.contains("Broadcast"), s"centroid frame should broadcast:\n$p")
  }

  test("qr06: PSI is aggregates of the materialized counts, scalars broadcast") {
    val p = plan(CurationQueries.psiDrift(t))
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"),
      s"the 1-row totals must broadcast:\n$p")
    assert(p.contains("partial_"), s"the counts aggregation should combine map-side:\n$p")
  }

  test("qz03: the hilbert walk is pure projection — no exchange before the final agg") {
    val p = plan(LayoutQueries.hilbertLayout(t))
    // exactly the aggregation exchange (+AQE reuse markers), no join, no window
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(p.contains("partial_count"), s"bucket census should combine map-side:\n$p")
  }

  test("qa06: nearest as-of is two union scans, never a range join") {
    val p = plan(CurationQueries.asofNearestView(t))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"nearest as-of must not explode into a range join:\n$p")
  }

  test("qd21: containment candidates come from the inverted index, never all-pairs") {
    val p = plan(PipelineQueries.containmentDedup(t))
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_count"), s"intersection counts should combine map-side:\n$p")
  }

  test("qe09: abandonment is a hash LEFT ANTI with the interval as residual, not a nested loop") {
    val p = plan(PipelineQueries.abandonedViews(t))
    assert(p.contains("LeftAnti"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("qs14: the filter predicate is a broadcast-join key — eligible pairs only are scored") {
    val p = plan(PipelineQueries.filteredAnn(t))
    assert(p.contains("BroadcastHashJoin"), s"label+query side must broadcast-hash join:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qf02: the TTL sweep is one scan into a map-side-combined day aggregation") {
    val p = plan(ExtendedQueries.ttlExpiry(t))
    assert(p.contains("partial_"), s"day counts should combine map-side:\n$p")
    assert(!p.contains("SortMergeJoin"), s"the scalar range frame must broadcast:\n$p")
  }

  test("qi01: only the delta aggregation scans data; the standing MV is a materialized frame") {
    val p = plan(ExtendedQueries.incrementalAgg(t))
    // the checkpointed standing aggregate surfaces as a scan of an
    // existing RDD, not a second pass over the events relation
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      s"standing side must be materialized:\n$p")
    assert(p.contains("partial_"), s"delta aggregation should combine map-side:\n$p")
  }

  test("qs17/qs19: PCA projection and residual are scan-local — zero Exchange before the top-k") {
    val c = graft.operators.Pca.topComponent(t.embeddings, "embedding", iters = 1)
    val proj = plan(graft.operators.Pca.projected(t.embeddings, "embedding", "vec_id", c))
    assert(!proj.contains("Exchange"), s"PC1 projection must not shuffle:\n$proj")
    val res = plan(graft.operators.Pca.residualized(t.embeddings, "embedding", "vec_id", c))
    assert(!res.contains("Exchange"), s"residual must not shuffle:\n$res")
  }

  test("qs18: JL projection is a scan-local integer fold — zero Exchange, no UDF") {
    val p = plan(graft.operators.RandomProjection
      .projected(t.embeddings, "vec_id", "embedding", m = 8, d = 64))
    assert(!p.contains("Exchange"), s"projection must not shuffle:\n$p")
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }

  test("qi02: the retraction rescan re-reads ONLY affected keys via a broadcast join") {
    val p = plan(ExtendedQueries.retractionMv(t))
    assert(p.contains("BroadcastHashJoin"), s"affected-key set must broadcast:\n$p")
    // the standing MV and merge decision are materialized frames, so
    // the full history is not re-aggregated on the output path
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      s"merge decision must be materialized:\n$p")
  }

  test("qt37: readability is a join-free scan with map-side-combined per-source sums") {
    val p = plan(QualityQueries.readability(t))
    assert(!p.contains("Join"), s"readability must not join:\n$p")
    assert(p.contains("partial_"), s"per-source sums should combine map-side:\n$p")
  }

  test("qt28: heavy-hitter verify joins the broadcast candidate set; counts combine map-side") {
    val p = plan(QualityQueries.heavyHitters(t))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftSemi"),
      s"verify pass must semi-join the broadcast candidates:\n$p")
    assert(p.contains("partial_count"), s"verify counts should combine map-side:\n$p")
    assert(!p.contains("SortMergeJoin"), s"corpus must never shuffle for the candidates:\n$p")
  }

  test("qi03: the served MV merges partial sketch aggregates; the standing half is materialized") {
    val p = plan(ExtendedQueries.sketchDistinctMv(t))
    // hll_union_agg must run partial+final (mergeable-state discipline)
    assert(p.contains("partial_"), s"sketch agg should combine map-side:\n$p")
    // the standing MV is a localCheckpoint'd frame, not a re-aggregation
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      s"standing MV must be materialized:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("qg11: the quantile read attaches the scalar max by broadcast, never reshuffling N(r)") {
    val p = plan(ExtendedQueries.effectiveDiameter(t))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      s"the 7-row frame x 1-row max must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin"), s"no shuffle join on a 7-row frame:\n$p")
  }

  test("qs24: candidates come from probed cells (hash join); queries broadcast into ADC scoring") {
    val p = plan(PipelineQueries.ivfPqServe(t))
    assert(p.contains("BroadcastHashJoin"), s"query side must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"),
      s"candidate generation must never be all-pairs:\n$p")
  }

  test("qx01: the composed pipeline adds no shuffle beyond its stages (rates broadcast, dedup one window)") {
    val p = plan(CurationQueries.corpusBuild(t))
    assert(p.contains("BroadcastHashJoin"), s"mix rates must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
    // the only nested-loop join allowed is temperatureMix's documented
    // broadcast 1-row scalar attach (Cross, BuildRight)
    val bnlj = p.linesIterator.filter(_.contains("BroadcastNestedLoopJoin")).toSeq
    assert(bnlj.forall(l => l.contains("BuildRight") && l.contains("Cross")),
      s"unexpected nested-loop join shape:\n${bnlj.mkString("\n")}")
    // the dedup stage is materialized once, not re-derived per count
    assert(p.contains("Scan ExistingRDD") || p.contains("LocalTableScan"),
      s"unique survivors must be a materialized frame:\n$p")
  }

  test("qm11: the frame-vote funnel shuffles on (band, bkey) only; frame payloads never exchange") {
    val p = plan(PipelineQueries.videoNearDupVote(t))
    // frames hash scan-locally and checkpoint as (id, frame_idx, fhash)
    // before the funnel — the pair join starts from a materialized frame
    assert(p.contains("Scan ExistingRDD"),
      s"frame hashes must be a materialized narrow frame:\n$p")
    val parts = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    // the candidate join keys on (band, bkey): at tiny SF one side
    // broadcasts (no exchange at all — better); at scale it shuffles
    // on exactly that key, never anything carrying payload
    assert(parts.exists(k => k.contains("band") && k.contains("bkey")) ||
      p.contains("BroadcastHashJoin"),
      s"the candidate join must key on the band bucket (broadcast or shuffle), got: $parts\n$p")
    // payload columns are `text#N` / `frame#N`; the frame INDEX
    // (probe_frame#N, frame_idx#N) is an 8-byte long and is fine
    assert(parts.forall(_.split(",\\s*").forall(c =>
      !c.startsWith("text#") && !c.startsWith("frame#"))),
      s"frame payloads/text must never shuffle: $parts")
    assert(!p.contains("CartesianProduct"), s"never all-pairs:\n$p")
  }

  test("qx02: one metadata scan feeds both dedup legs; corpus bytes never shuffle") {
    val p = plan(PipelineQueries.multimodalCorpusBuild(t))
    assert(p.contains("Scan ExistingRDD"),
      s"the wc/tl/md5/phash projection must be a materialized ~120 B/doc frame:\n$p")
    val parts = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(parts.forall(k => !k.contains("text")),
      s"corpus bytes must never enter an exchange: $parts")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qx03: one extraction scan checkpoints ~100 B/doc metadata; HTML and text never shuffle") {
    val p = plan(QualityQueries.webCorpusBuild(t))
    // extraction (htmlToText/anchorCount/urlCanonicalize) runs once and
    // lands in a materialized metadata frame — the funnel never
    // re-derives the markup
    assert(p.contains("Scan ExistingRDD"),
      s"extraction metadata must be a materialized frame:\n$p")
    val parts = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(parts.forall(k => !k.contains("text") && !k.contains("html") &&
      !k.contains("clean_")),
      s"page bytes must never enter an exchange: $parts")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qx03: funnel invariants — every stage fires and kept reconciles exactly") {
    val rows = QualityQueries.webCorpusBuild(Tables(spark, "/root/testdata/sf0.01")).collect()
    val n = rows.length
    val gated = rows.count(_.getBoolean(1))
    val urlDups = rows.count(!_.isNullAt(4))
    val contentDups = rows.count(!_.isNullAt(5))
    val kept = rows.count(_.getBoolean(6))
    assert(n > gated, "the non-URL quarantine must gate some docs")
    assert(urlDups > 0, "the planted URL variants must collapse")
    assert(contentDups > 0, "natural body-prefix dups must fire the content stage")
    assert(kept === gated - urlDups - contentDups,
      s"kept must reconcile: $gated - $urlDups - $contentDups != $kept")
    rows.foreach { r =>
      if (!r.isNullAt(4)) assert(r.getLong(4) < r.getLong(0), "keeper is the smaller id")
      if (!r.isNullAt(5)) assert(r.getLong(5) < r.getLong(0), "keeper is the smaller id")
      assert(r.getBoolean(6) === (r.getBoolean(1) && r.isNullAt(4) && r.isNullAt(5)),
        s"kept must equal gated AND unique in both stages: $r")
      if (!r.getBoolean(1)) assert(r.isNullAt(4) && r.isNullAt(5),
        s"gate-failed docs are never dup-judged: $r")
    }
  }

  test("qx05: verdict joins only on metadata keys; no cartesian; decisions checkpointed") {
    // NOTE: the resolution-map and rules joins are wrapped in
    // broadcast() upstream of the decision localCheckpoint, so they
    // are not visible in the final executed plan — what IS visible
    // (and scale-critical) is that the verdict stage reads a
    // materialized decision frame and every exchange keys on doc_id
    // or the canonical key, never a raw url/path string payload
    val p = plan(QualityQueries.crawlFrontierBuild(t))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("Scan ExistingRDD"),
      s"the verdict must come from a materialized decision frame:\n$p")
    val parts = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(p)
      .map(_.group(1)).toSeq
    assert(parts.forall(k => k.contains("doc_id") || k.contains("canon_url")),
      s"verdict exchanges must key on metadata only: $parts")
  }

  test("qx05: frontier invariants — identities collapse, sentinels compose, kept reconciles") {
    val rows = QualityQueries.crawlFrontierBuild(Tables(spark, "/root/testdata/sf0.01"))
      .collect()
    val byId = rows.map(r => r.getLong(0) -> r).toMap
    rows.foreach { r =>
      val (m, quarantined, allowed, kept) =
        (r.getLong(0) % 12, r.getBoolean(2), r.getBoolean(3), r.getBoolean(5))
      // loop and non-URL sentinels quarantine; quarantined is never allowed
      if (m == 3 || m == 4) assert(quarantined && !allowed && !kept, s"$r")
      else assert(!quarantined, s"$r")
      // robots: /private blocked, /private/ok allow-overridden
      if (m == 5) assert(!allowed && !kept, s"$r")
      if (m == 6) assert(allowed && kept, s"$r")
      // the redirect chain and the messy direct fetch share one identity:
      // the chain HEAD keeps, mid and direct attribute to it
      if (m == 1 || m == 2) {
        assert(!r.isNullAt(4) && r.getLong(4) == r.getLong(0) - m, s"$r")
        assert(r.getString(1) == byId(r.getLong(0) - m).getString(1),
          s"canonical identity must match the keeper's: $r")
      }
      if (m == 0) assert(kept && r.isNullAt(4), s"chain head keeps: $r")
      assert(kept == (allowed && r.isNullAt(4)), s"kept must reconcile: $r")
    }
  }

  test("J1: delta-to-repo_file join shuffles on the COMPOSITE (repo_id, filename) key") {
    // the skew-tolerance property (round-11 verdict #5): a mega repo's
    // rows diffuse across partitions because the shuffle key is
    // (repo_id, filename), not repo_id alone — losing the composite
    // key in a refactor would concentrate every mega repo on one task
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val deltas = Seq(("r1", "r1", "s1", "MODIFY", null: String, "a.txt",
          "d", 1L, 0L, 5L))
        .toDF("repo_id", "repo_name", "sha", "change_type", "old_path",
          "new_path", "diff", "added_lines", "deleted_lines", "nloc")
      val repoFile = Seq(("r1", "a.txt", "id1")).toDF("repo_id", "rfilename", "id")
      val p = plan(graft.hfc.Normalize.modifiedFiles(deltas, repoFile))
      val parts = "hashpartitioning\\(([^)]*)\\)".r.findAllMatchIn(p)
        .map(_.group(1)).toSeq
      assert(parts.nonEmpty, s"expected a shuffle join with broadcast disabled:\n$p")
      assert(parts.forall(k => k.contains("repo_id") && k.contains("filename")),
        s"J1 must shuffle on the composite key, got: $parts")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("qs26: phrase search plans TakeOrderedAndProject over term-pruned postings") {
    val p = plan(RetrievalQueries.phraseSearch(t))
    assert(p.contains("TakeOrderedAndProject"),
      s"top-k must never be a global sort:\n$p")
  }

  test("qg14: HITS normalizers attach by broadcast; no cartesian on data") {
    val p = plan(QualityQueries.domainHits(t))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"the scalar L1 totals must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"no unbroadcast cartesian:\n$p")
  }

  test("qx06: schedule exchanges key on doc_id/hid metadata only; no cartesian") {
    // the rules/delays broadcasts live UPSTREAM of the verdict's
    // localCheckpoint (the qx05 audit lesson) — the final plan exposes
    // only the schedule: pin that every exchange keys on tiny metadata
    // columns and nothing cartesians
    val p = plan(QualityQueries.crawlSchedule(t))
    assert(!p.contains("CartesianProduct"), s"no unbroadcast cartesian:\n$p")
    val keys = "hashpartitioning\\(([a-z_]+)".r.findAllMatchIn(p)
      .map(_.group(1)).toSet
    assert(keys.subsetOf(Set("doc_id", "hid")),
      s"schedule must shuffle on doc_id/hid metadata only, got $keys:\n$p")
  }

  test("qr08: the host verdict joins back by broadcast — the corpus shuffles once") {
    val p = plan(QualityQueries.hostReputation(t))
    assert(p.contains("BroadcastHashJoin"),
      s"the host-cardinality verdict must broadcast onto the doc scan:\n$p")
  }

  test("qi04: every join-MV leg pre-aggregates (partial_count) before the monoid merge") {
    val p = plan(ExtendedQueries.incrementalJoinMv(t))
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"legs must map-side combine before the merge:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("qe13: the moving-average window runs on the aggregated day table, not raw events") {
    val df = PipelineQueries.gapfillMa(t)
    val p = plan(df)
    // the window's input is the gap-filled day dim joined to day counts:
    // day-cardinality rows. Pin that the raw event columns never reach
    // the Window operator's child.
    val winIdx = p.indexOf("Window")
    assert(winIdx >= 0, p)
    assert(!p.substring(winIdx).contains("event_id"),
      s"the window must consume aggregated days only:\n$p")
  }

  test("qx01: funnel counts are monotone per source (raw >= quality >= unique >= sampled)") {
    val rows = CurationQueries.corpusBuild(Tables(spark, "/root/testdata/sf0.01")).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, q, u, s) = (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(raw >= q && q >= u && u >= s,
        s"funnel must narrow monotonically for ${r.getString(0)}: $raw/$q/$u/$s")
    }
    // the temperature budget binds: total sampled docs sit at/under ~budget
    val tot = rows.map(_.getLong(4)).sum
    assert(tot <= 1200, s"budget=1000 should bound the sample, got $tot")
  }
  test("qf03: the dump parse is a zero-shuffle scan -> project -> explode") {
    val dir = java.nio.file.Files.createTempDirectory("graft-planaudit-dump")
    java.nio.file.Files.write(dir.resolve("d.sql"),
      "INSERT INTO `t` VALUES (1,'a'),(2,'b');\n".getBytes("UTF-8"))
    val parsed = graft.hfc.SqlDump.statements(spark, dir.resolve("d.sql").toString)
    val p = plan(parsed)
    assert(!p.contains("Exchange"), s"dump parse shuffles:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("qf04: pyrepr compat is projection-only — exactly one exchange, the sort's") {
    val df = InteropQueries.pyreprCompat(t)
    // the presentation orderBy owns the plan's ONLY exchange (a range
    // partition); any second exchange means the parse/extraction
    // stopped being a scan-local projection. (The first cut of this
    // test split the plan text at "Sort " and checked the text ABOVE
    // it — which is just the plan header, so it could never fail.)
    val p = plan(df)
    val exchanges = p.linesIterator.filter(_.contains("Exchange")).toSeq
    assert(exchanges.size == 1, s"expected only the sort's exchange:\n$p")
    assert(exchanges.head.contains("rangepartitioning"), exchanges.head)
  }

}

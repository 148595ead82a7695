package graft

import graft.functions.expressions.DotProduct
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}

/** Session extensions registering graft's native Catalyst functions
  * (SURVEY.md §7.3 "custom Catalyst" surface).
  *
  * Two registration paths:
  *  - `.withExtensions(new GraftExtensions)` at session build time
  *    (spark.sql.extensions-compatible), and
  *  - [[GraftExtensions.register]] for an already-built session (used
  *    by GraftSession.local so getOrCreate-reused sessions get the
  *    functions too).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.descriptors.foreach(ext.injectFunction)
    ext.injectOptimizerRule(_ => graft.plans.DotProductRewrite)
  }
}

object GraftExtensions {
  import graft.functions.expressions.{LshBucket, MinHashSignature, ShingleHashes, ShingleSimHash16, ShingleSimHash64, SimHash16}

  private val descriptors
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("graft_dot_product"),
     new ExpressionInfo(classOf[DotProduct].getName, "graft_dot_product"),
     (children: Seq[Expression]) => DotProduct(children(0), children(1))),
    (FunctionIdentifier("graft_centered_dot"),
     new ExpressionInfo(classOf[graft.functions.expressions.CenteredDot].getName,
       "graft_centered_dot"),
     (children: Seq[Expression]) =>
       graft.functions.expressions.CenteredDot(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_minhash_signature"),
     new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash_signature"),
     (children: Seq[Expression]) => MinHashSignature(children(0), children(1))),
    (FunctionIdentifier("graft_shingle_hashes"),
     new ExpressionInfo(classOf[ShingleHashes].getName, "graft_shingle_hashes"),
     (children: Seq[Expression]) => ShingleHashes(children(0), children(1))),
    (FunctionIdentifier("graft_simhash16"),
     new ExpressionInfo(classOf[SimHash16].getName, "graft_simhash16"),
     (children: Seq[Expression]) => SimHash16(children(0))),
    (FunctionIdentifier("graft_shingle_simhash16"),
     new ExpressionInfo(classOf[ShingleSimHash16].getName, "graft_shingle_simhash16"),
     (children: Seq[Expression]) => ShingleSimHash16(children(0), children(1))),
    (FunctionIdentifier("graft_shingle_simhash64"),
     new ExpressionInfo(classOf[ShingleSimHash64].getName, "graft_shingle_simhash64"),
     (children: Seq[Expression]) => ShingleSimHash64(children(0), children(1))),
    (FunctionIdentifier("graft_cdc_chunks"),
     new ExpressionInfo(classOf[graft.functions.expressions.CdcChunks].getName,
       "graft_cdc_chunks"),
     (children: Seq[Expression]) =>
       graft.functions.expressions.CdcChunks(children(0))),
    (FunctionIdentifier("graft_lsh_bucket"),
     new ExpressionInfo(classOf[LshBucket].getName, "graft_lsh_bucket"),
     (children: Seq[Expression]) => LshBucket(children(0), children(1), children(2))),
    (FunctionIdentifier("graft_text_dhash56"),
     new ExpressionInfo(classOf[graft.functions.expressions.TextDhash56Expr].getName,
       "graft_text_dhash56"),
     (children: Seq[Expression]) =>
       graft.functions.expressions.TextDhash56Expr(children(0))),
    (FunctionIdentifier("graft_text_audio_fp32"),
     new ExpressionInfo(classOf[graft.functions.expressions.TextAudioFp32Expr].getName,
       "graft_text_audio_fp32"),
     (children: Seq[Expression]) =>
       graft.functions.expressions.TextAudioFp32Expr(children(0))),
    (FunctionIdentifier("graft_text_audio_fp63"),
     new ExpressionInfo(classOf[graft.functions.expressions.TextAudioFp63Expr].getName,
       "graft_text_audio_fp63"),
     (children: Seq[Expression]) =>
       graft.functions.expressions.TextAudioFp63Expr(children(0))),
    (FunctionIdentifier("graft_text_audio_energy"),
     new ExpressionInfo(classOf[graft.functions.expressions.TextAudioEnergyExpr].getName,
       "graft_text_audio_energy"),
     (children: Seq[Expression]) =>
       graft.functions.expressions.TextAudioEnergyExpr(children(0))),
    (FunctionIdentifier("graft_unicode_normalize"),
     new ExpressionInfo(classOf[graft.functions.expressions.UnicodeNormalize].getName,
       "graft_unicode_normalize"),
     (children: Seq[Expression]) =>
       graft.functions.expressions.UnicodeNormalize(children(0), children(1))),
    (FunctionIdentifier("graft_sql_insert_parse"),
     new ExpressionInfo(classOf[graft.functions.expressions.SqlInsertParse].getName,
       "graft_sql_insert_parse"),
     (children: Seq[Expression]) =>
       graft.functions.expressions.SqlInsertParse(children(0))),
    (FunctionIdentifier("graft_sql_quote"),
     new ExpressionInfo(classOf[graft.functions.expressions.SqlQuote].getName,
       "graft_sql_quote"),
     (children: Seq[Expression]) =>
       graft.functions.expressions.SqlQuote(children(0))),
    (FunctionIdentifier("graft_pyrepr_json"),
     new ExpressionInfo(classOf[graft.functions.expressions.PyReprJson].getName,
       "graft_pyrepr_json"),
     (children: Seq[Expression]) =>
       graft.functions.expressions.PyReprJson(children(0))),
    // Spark's OWN runtime-join-pruning bloom machinery, exposed as SQL
    // functions (upstream keeps them internal-only): the agg builds the
    // serialized filter, the predicate probes it codegen'd. Used by
    // operators.BloomDedup for exact-dup prescreening.
    (FunctionIdentifier("graft_bloom_agg"),
     new ExpressionInfo(
       classOf[org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate].getName,
       "graft_bloom_agg"),
     (children: Seq[Expression]) =>
       new org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate(
         children(0), children(1), children(2)).toAggregateExpression()),
    (FunctionIdentifier("graft_might_contain"),
     new ExpressionInfo(
       classOf[org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain].getName,
       "graft_might_contain"),
     (children: Seq[Expression]) =>
       org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain(
         children(0), children(1))))

  /** idempotent post-hoc registration on a live session */
  def register(spark: SparkSession): Unit = {
    descriptors.foreach { case (id, _, builder) =>
      spark.sessionState.functionRegistry.createOrReplaceTempFunction(
        id.funcName, builder, "built-in")
    }
    // getOrCreate-reused sessions miss injectOptimizerRule; the
    // experimental seam accepts rules on a live session
    if (!spark.experimental.extraOptimizations.contains(graft.plans.DotProductRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ graft.plans.DotProductRewrite
  }
}

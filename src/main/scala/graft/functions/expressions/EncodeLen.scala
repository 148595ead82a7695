package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** word → encoded-subword COUNT under a learned tokenizer vocabulary,
  * as a native expression — the retirement of the repo's last three
  * interpreted Scala-UDF sites (r13 verdict #6).
  *
  * The vocabulary (BPE merge list / WordPiece merge list / Unigram
  * log-prob table) is a plan-time constant held as an expression
  * field: it rides the broadcast task binary exactly once per executor
  * (the same distribution the old `sparkContext.broadcast` bought),
  * and eval is one direct call on the UTF8String — no ScalaUDF
  * null-wrapper/type-converter lane. Evaluated only over the
  * DISTINCT-WORD census (vocabulary-sized, never the corpus — the
  * encodedTokenCounts discipline), so CodegenFallback is the CdcChunks
  * class: per-row call overhead is amortized by the per-word dynamic
  * programming inside.
  *
  * Registration: the vocab is structured plan-time data, not a literal
  * child, so the static GraftExtensions path cannot carry it. The
  * [[EncodeLen.bpe]]/[[EncodeLen.wordPiece]]/[[EncodeLen.unigram]]
  * Column builders register a CONTENT-ADDRESSED temp function
  * (`graft_encode_len_<md5-of-vocab>`) through the same
  * functionRegistry seam GraftExtensions.register uses — the name is a
  * pure function of the vocabulary, so re-registration is idempotent
  * and two different vocabs can never resolve to each other's encoder
  * at analysis time.
  */
case class EncodeLen(child: Expression, encoder: EncodeLen.Encoder)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case org.apache.spark.sql.types.StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_encode_len requires a string word, got ${t.simpleString}")
  }

  override def dataType: DataType = IntegerType

  override def nullSafeEval(input: Any): Any =
    encoder.len(input.asInstanceOf[UTF8String].toString)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "graft_encode_len"
}

object EncodeLen {
  /** a serializable word→subword-count kernel; implementations are
    * case classes so plan canonicalization/equality stay structural */
  sealed trait Encoder extends Serializable {
    def len(word: String): Int
    /** canonical text of the vocabulary — the content address (maps
      * are sorted so equal content always names the same function) */
    def canonical: String
  }

  final case class BpeEncoder(pairs: Seq[(String, String)]) extends Encoder {
    def len(word: String): Int = graft.operators.Bpe.encodeWord(word, pairs).size
    def canonical: String =
      pairs.map { case (a, b) => s"$a\u0001$b" }.mkString("bpe:", "\u0002", "")
  }
  final case class WordPieceEncoder(merges: Seq[graft.operators.WordPiece.Merge])
      extends Encoder {
    def len(word: String): Int = graft.operators.WordPiece.encodeWord(word, merges).size
    def canonical: String =
      merges.map(m => s"${m.rank}\u0001${m.left}\u0001${m.right}")
        .mkString("wp:", "\u0002", "")
  }
  final case class UnigramEncoder(logp: Map[String, Double], maxPieceLen: Int)
      extends Encoder {
    def len(word: String): Int =
      graft.operators.Unigram.segmentWord(word, logp, maxPieceLen).size
    def canonical: String =
      logp.toSeq.sorted.map { case (p, l) => s"$p\u0001$l" }
        .mkString(s"ug:$maxPieceLen:", "\u0002", "")
  }

  private def column(spark: SparkSession, c: Column, e: Encoder): Column = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(e.canonical.getBytes("UTF-8"))
      .take(8).map(b => f"$b%02x").mkString
    val name = s"graft_encode_len_$digest"
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      name, children => EncodeLen(children.head, e), "built-in")
    call_function(name, c)
  }

  /** BPE merge-replay length ([[graft.operators.Bpe.encodeWord]]) */
  def bpe(spark: SparkSession, word: Column, pairs: Seq[(String, String)]): Column =
    column(spark, word, BpeEncoder(pairs))

  /** WordPiece merge-replay length ([[graft.operators.WordPiece.encodeWord]]) */
  def wordPiece(spark: SparkSession, word: Column,
                merges: Seq[graft.operators.WordPiece.Merge]): Column =
    column(spark, word, WordPieceEncoder(merges))

  /** Unigram Viterbi segmentation length ([[graft.operators.Unigram.segmentWord]]) */
  def unigram(spark: SparkSession, word: Column, logp: Map[String, Double],
              maxPieceLen: Int): Column =
    column(spark, word, UnigramEncoder(logp, maxPieceLen))
}

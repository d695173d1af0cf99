package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Linear-model score of a text's hashed bag-of-words — the inference
  * kernel of [[graft.ext.Classifier]] (a fastText/CCNet-style quality or
  * domain filter scored in-pipeline). One pass over the text: lowercase +
  * whitespace-tokenize + XXH64 each token (EXACTLY
  * [[WordShingleHashes.tokenHashes]] — the trainer featurizes through the
  * same function, so train and serve cannot disagree on tokenization or
  * hashing), bucket each hash into `weights.length` dimensions by
  * floorMod, and emit `sigmoid(bias + Σ w[bucket] / nTok)` — the
  * L1-normalized term-frequency dot product. Empty text scores
  * `sigmoid(bias)`.
  *
  * The model rides the expression as data (driver-fit, bounded-sample —
  * the [[NearestCellIds]] model-parameter contract) and the whole pass
  * participates in whole-stage codegen: scoring 100 TB of documents is
  * one scan at tokenizer speed, no shuffle, no joins.
  */
case class HashedBowScore(child: Expression, weights: Seq[Double], bias: Double)
    extends UnaryExpression with ExpectsInputTypes {

  require(weights.nonEmpty, "weights must be non-empty")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = DoubleType
  override def prettyName: String = "hashed_bow_score"

  @transient private lazy val w: Array[Double] = weights.toArray

  def compute(input: UTF8String): Double = {
    val (hashes, nTok) = WordShingleHashes.tokenHashes(input)
    val dim = w.length
    var acc = 0.0
    var i = 0
    while (i < nTok) {
      acc += w(java.lang.Math.floorMod(hashes(i), dim.toLong).toInt)
      i += 1
    }
    val margin = bias + (if (nTok > 0) acc / nTok else 0.0)
    1.0 / (1.0 + math.exp(-margin))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("hashedBowScore", this, classOf[HashedBowScore].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

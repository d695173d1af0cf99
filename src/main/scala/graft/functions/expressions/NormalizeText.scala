package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization of a string column — the first step of every
  * LLM-corpus cleaning chain (é as one codepoint vs e+combining-acute are
  * different byte strings to exact dedup, MinHash, and tokenizers alike;
  * NFKC additionally folds compatibility forms like the ﬁ ligature and
  * full-width digits). Spark has no built-in for this; the expression
  * wraps `java.text.Normalizer` (ICU-equivalent for the normalization
  * forms) behind the engine's usual codegen'd-static-helper shape, so it
  * runs per row inside whole-stage codegen with no UDF boundary.
  *
  * `form` is a plan-time constant: NFC | NFD | NFKC | NFKD.
  */
case class NormalizeText(child: Expression, form: String)
    extends UnaryExpression with ExpectsInputTypes {

  require(NormalizeText.Forms.contains(form),
    s"normalize form must be one of ${NormalizeText.Forms.mkString("/")}, got $form")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_normalize_text"

  // form is a plan-time constant — resolve the enum ONCE here, not per row
  // (valueOf inside compute would add a string→enum lookup to every row of
  // a function framed as scan-speed)
  @transient private lazy val resolvedForm: java.text.Normalizer.Form =
    java.text.Normalizer.Form.valueOf(form)

  override def nullSafeEval(input: Any): Any =
    NormalizeText.compute(input.asInstanceOf[UTF8String], resolvedForm)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val formRef = ctx.addReferenceObj("form", resolvedForm, "java.text.Normalizer.Form")
    val util = NormalizeText.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $util.compute($s, $formRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeText {
  val Forms: Set[String] = Set("NFC", "NFD", "NFKC", "NFKD")

  def compute(s: UTF8String, form: java.text.Normalizer.Form): UTF8String = {
    val str = s.toString
    // normalized-check first: for already-normalized text (the common case
    // on clean corpora) this is a single scan with no allocation
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}

package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Filter an array<string> by HASH-SET exclusion — the rewrite kernel of
  * [[graft.ext.TextAnalysis]] `pruneHotTokens`. The exclusion set is a
  * model parameter (the corpus Zipf head, driver-collected under a guard
  * the same way IVF centroids are) and can legitimately reach 10⁴-10⁵
  * entries; the builtin formulation `filter(ts, t → !array_contains(hot,
  * t))` is a per-token LINEAR scan of that literal — O(tokens · |hot|)
  * over the corpus, which at the guard ceiling turns a scan-bound rewrite
  * into the job. Here the set is hashed once per executor
  * (UTF8String.hashCode is cached in the object) and each token costs one
  * O(1) probe, order preserved, with the same output: tokens not in the
  * set, in input order.
  *
  * The reference has no analog (engine-side extension surface); the
  * expression rides whole-stage codegen via a reference object, the
  * [[NearestCellIds]] idiom.
  */
case class StringArrayExcludeSet(child: Expression, exclude: Seq[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "string_array_exclude_set"

  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](math.max(4, exclude.size * 2))
    exclude.foreach(e => s.add(UTF8String.fromString(e)))
    s
  }

  def compute(input: ArrayData): GenericArrayData = {
    val n = input.numElements()
    val out = new Array[AnyRef](n)
    var k = 0
    var i = 0
    while (i < n) {
      // contract: token arrays contain no nulls (split never yields null);
      // a null element would have been dropped by the probe either way
      if (!input.isNullAt(i)) {
        val v = input.getUTF8String(i)
        if (!set.contains(v)) { out(k) = v; k += 1 }
      }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("excludeSet", this, classOf[StringArrayExcludeSet].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

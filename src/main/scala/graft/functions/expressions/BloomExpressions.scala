package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, LongType}
import org.apache.spark.util.sketch.BloomFilter

/** Bloom-filter membership probe over a long key, for semi-join reduction:
  * the build side's keys are aggregated once into a compact bit array
  * (~1.2 MB per million keys at 1% fpp) that travels with the plan the same
  * way IVF centroids and the SQ8 grid do, and the probe runs inside
  * whole-stage codegen at scan speed. `true` may be a false positive
  * (rate = the filter's fpp); `false` is exact — so a residual exact join
  * over the survivors reproduces semi-join semantics while the filter has
  * already discarded the overwhelming share of a 100 TB fact scan BEFORE
  * anything shuffles. This is the explicit, driver-held form of Spark's
  * own runtime bloom-filter join pruning (which injects the same shape
  * under `spark.sql.optimizer.runtime.bloomFilter.enabled`).
  *
  * The reference has no join-pruning surface (402-line pandas ETL); this
  * extends the engine's join family ([[graft.operators.Joins]]).
  */
case class BloomMightContainLong(child: Expression, bloom: BloomFilter)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_might_contain"

  override def nullSafeEval(input: Any): Any =
    bloom.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bfRef = ctx.addReferenceObj("bloom", bloom,
      "org.apache.spark.util.sketch.BloomFilter")
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $bfRef.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, ByteType, DataType, DoubleType, FloatType}

/** SQ8 scalar quantization for embedding columns: each float component is
  * stored as ONE byte (an unsigned code 0..255 on a per-dimension linear
  * grid). A 64-dim float vector shrinks 4× (256 B → 64 B); at 100 TB of
  * embeddings that is the difference between the ANN verify stage being
  * scan-bandwidth-bound on 25 TB vs 100 TB. The grid (per-dimension
  * min / scale) is a tiny model parameter computed once from the corpus and
  * baked into the expression as literals — the same pattern as IVF
  * centroids ([[graft.ext.Similarity.ivfTopK]]).
  *
  * Both expressions participate in whole-stage codegen via a static
  * primitive-array loop; decode never materializes a float[] — the dot
  * product decodes on the fly inside the accumulation loop.
  *
  * The reference has no vector surface at all; this extends the engine's
  * LLM-pipeline similarity family ([function_app.py] has no analog).
  */

/** Encode array<float> → array<tinyint> (unsigned codes stored in signed
  * bytes): code[d] = clamp(round((v[d] - mins[d]) / scales[d]), 0, 255).
  * Dimensions beyond `mins.length` are dropped (grid defines the space).
  */
case class Sq8Encode(child: Expression, mins: Array[Double], scales: Array[Double])
    extends UnaryExpression with ExpectsInputTypes {

  require(mins.length == scales.length, "mins/scales dimension mismatch")
  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(ByteType, containsNull = false)
  override def prettyName: String = "sq8_encode"

  override def nullSafeEval(input: Any): Any =
    Sq8Encode.compute(input.asInstanceOf[ArrayData], mins, scales)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("scales", scales, "double[]")
    val util = Sq8Encode.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = $util.compute($a, $minsRef, $scalesRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object Sq8Encode {
  def compute(arr: ArrayData, mins: Array[Double], scales: Array[Double]): GenericArrayData = {
    val v = arr.toFloatArray()
    val n = math.min(v.length, mins.length)
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      val q = Math.round((v(i).toDouble - mins(i)) / scales(i))
      val c = if (q < 0L) 0L else if (q > 255L) 255L else q
      out(i) = c.toByte
      i += 1
    }
    new GenericArrayData(out)
  }
}

/** Dot product of two SQ8-encoded vectors on the SAME grid, decoded on the
  * fly: Σ_d (mins[d] + scales[d]·a[d]) · (mins[d] + scales[d]·b[d]).
  * Sequential double accumulation in element order — deterministic and
  * bit-reproducible on any cluster, like [[FloatVectorDot]].
  */
case class Sq8DotDecoded(left: Expression, right: Expression,
    mins: Array[Double], scales: Array[Double])
    extends BinaryExpression with ExpectsInputTypes {

  require(mins.length == scales.length, "mins/scales dimension mismatch")
  override def inputTypes = Seq(ArrayType(ByteType), ArrayType(ByteType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "sq8_dot_decoded"

  override def nullSafeEval(a: Any, b: Any): Any =
    Sq8DotDecoded.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], mins, scales)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val minsRef = ctx.addReferenceObj("mins", mins, "double[]")
    val scalesRef = ctx.addReferenceObj("scales", scales, "double[]")
    val util = Sq8DotDecoded.getClass.getName.stripSuffix("$") + "$.MODULE$"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = $util.compute($a, $b, $minsRef, $scalesRef);")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object Sq8DotDecoded {
  def compute(a: ArrayData, b: ArrayData,
      mins: Array[Double], scales: Array[Double]): Double = {
    val x = a.toByteArray()
    val y = b.toByteArray()
    var n = math.min(x.length, y.length)
    if (mins.length < n) n = mins.length
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xa = mins(i) + scales(i) * (x(i) & 0xFF)
      val yb = mins(i) + scales(i) * (y(i) & 0xFF)
      acc += xa * yb
      i += 1
    }
    acc
  }
}

package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

/** Native Catalyst expressions for the per-pair hot loops of dedup and
  * similarity search. Both participate in whole-stage codegen (`doGenCode`
  * emits a tight primitive-array loop), so a candidate-verification stage
  * over millions of pairs runs at JIT speed instead of through the generic
  * interpreted `array_intersect` / higher-order-function paths — on a
  * 100 TB corpus the verify stage is the dominant cost of MinHash/LSH and
  * prefix-filter joins.
  *
  * The reference has no analog (its only custom scalar work is the Python
  * `get_field_id` loop, [function_app.py:233-256]); these exist for the
  * engine's LLM-pipeline extension surface.
  */

/** Size of the intersection of two SORTED array<long> set representations
  * (two-pointer merge, no allocation). Inputs must be sorted ascending and
  * duplicate-free — the contract of [[graft.ext.Dedup.hashedShingles]].
  */
case class SortedLongIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = IntegerType
  override def prettyName: String = "sorted_long_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toLongArray()
    val y = b.asInstanceOf[ArrayData].toLongArray()
    var i = 0; var j = 0; var c = 0
    while (i < x.length && j < y.length) {
      if (x(i) == y(j)) { c += 1; i += 1; j += 1 }
      else if (x(i) < y(j)) i += 1
      else j += 1
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      s"""
         |long[] $x = $a.toLongArray();
         |long[] $y = $b.toLongArray();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $x.length && $j < $y.length) {
         |  if ($x[$i] == $y[$j]) { $c++; $i++; $j++; }
         |  else if ($x[$i] < $y[$j]) { $i++; } else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Dot product of two array<float> embeddings, accumulated in double in
  * element order — a deterministic sequential fold, bit-reproducible on any
  * cluster. Codegen is a primitive float[] loop (SIMD-friendly after JIT).
  * Array elements must be non-null; lengths are zipped to the shorter.
  */
case class FloatVectorDot(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "float_vector_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData].toFloatArray()
    val y = b.asInstanceOf[ArrayData].toFloatArray()
    val n = math.min(x.length, y.length)
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x(i).toDouble * y(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      val n = ctx.freshName("n"); val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |float[] $x = $a.toFloatArray();
         |float[] $y = $b.toFloatArray();
         |int $n = $x.length < $y.length ? $x.length : $y.length;
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) { $acc += (double) $x[$i] * (double) $y[$i]; }
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

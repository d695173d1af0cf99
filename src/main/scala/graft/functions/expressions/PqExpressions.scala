package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, DoubleType, FloatType}

/** Product-quantization kernels — the compression tier past SQ8 for
  * corpus-scale ANN. SQ8 stores 1 byte per DIMENSION (4× smaller than
  * float32); PQ stores 1 byte per SUBSPACE (`m` bytes per vector — for the
  * 64-dim corpus at m=8 that is 32× smaller than float32), and query-time
  * scoring never reconstructs the vector: each query precomputes one
  * lookup table of subspace-centroid inner products and every corpus code
  * scores with `m` table lookups (ADC — asymmetric distance computation).
  * At 100 TB of embeddings the scan is the bottleneck; PQ's scan reads 8
  * bytes/vector and the per-candidate CPU drops from d multiplies to m
  * adds. The tradeoff is recall: centroids quantize whole subvectors, so
  * the recall witness (q230/q232) is part of the operator's contract, as
  * with every approximate family here.
  *
  * The codebook is a model parameter (driver-fit on a bounded sample, the
  * [[NearestCellIds]] contract): it rides each expression as data, reaches
  * generated code via a reference object, and uses `Seq` so case-class
  * structural equality (canonicalization, subexpression elimination)
  * works. All three kernels participate in whole-stage codegen.
  *
  * The reference has no analog (its only custom scalar work is the Python
  * `get_field_id` loop, [function_app.py:233-256]); this is part of the
  * engine's LLM-pipeline extension surface.
  */

/** Encode an array<float> vector as `m` one-byte codes: per subspace, the
  * index of the L2-nearest codebook centroid (standard PQ uses Euclidean
  * assignment on raw subvectors, not the cosine/argmax-dot rule of the IVF
  * coarse quantizer — subvector norms carry signal the code must keep).
  * Ties break on the smaller code id; requires ksub <= 256 and
  * dims == m * dsub (validated at construction). Output is BinaryType —
  * the m-byte row the corpus scan reads at query time.
  */
case class PqEncode(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression with ExpectsInputTypes {

  require(codebooks.nonEmpty, "codebooks must be non-empty")
  require(codebooks.head.nonEmpty, "each subspace needs >= 1 centroid")
  require(codebooks.head.length <= 256,
    s"ksub must be <= 256 for 1-byte codes, got ${codebooks.head.length}")
  require(codebooks.forall(_.length == codebooks.head.length),
    "all subspaces must have the same centroid count")
  require(codebooks.forall(_.forall(_.length == codebooks.head.head.length)),
    "all centroids must have the same (subspace) dimensionality")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pq_encode"

  @transient private lazy val books: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  def compute(input: ArrayData): Array[Byte] = {
    val v = input.toFloatArray()
    val m = books.length
    val dsub = books(0)(0).length
    require(v.length == m * dsub,
      s"pq_encode: vector has ${v.length} dims, codebook expects ${m * dsub}")
    val out = new Array[Byte](m)
    var j = 0
    while (j < m) {
      val book = books(j)
      val base = j * dsub
      var best = 0
      var bestDist = Double.PositiveInfinity
      var c = 0
      while (c < book.length) {
        val cent = book(c)
        var dist = 0.0
        var i = 0
        while (i < dsub) {
          val diff = v(base + i).toDouble - cent(i).toDouble
          dist += diff * diff
          i += 1
        }
        // strict-less: ties keep the smaller code id — deterministic on
        // any cluster; a NaN distance never wins over a real one
        if (dist < bestDist) { bestDist = dist; best = c }
        c += 1
      }
      out(j) = best.toByte
      j += 1
    }
    out
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqEncode", this, classOf[PqEncode].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-query ADC lookup table: a flattened array<double> of length
  * m * ksub where entry `j * ksub + c` is the inner product of the query's
  * j-th subvector with subspace j's centroid c. Computed ONCE per query
  * row (the query side of the broadcast), so the per-candidate cost in the
  * scoring join is m lookups regardless of dimensionality.
  */
case class PqLut(child: Expression, codebooks: Seq[Seq[Seq[Float]]])
    extends UnaryExpression with ExpectsInputTypes {

  require(codebooks.nonEmpty && codebooks.head.nonEmpty,
    "codebooks must be non-empty")

  override def inputTypes = Seq(ArrayType(FloatType))
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "pq_lut"

  @transient private lazy val books: Array[Array[Array[Float]]] =
    codebooks.map(_.map(_.toArray).toArray).toArray

  def compute(input: ArrayData): GenericArrayData = {
    val v = input.toFloatArray()
    val m = books.length
    val ksub = books(0).length
    val dsub = books(0)(0).length
    require(v.length == m * dsub,
      s"pq_lut: vector has ${v.length} dims, codebook expects ${m * dsub}")
    val out = new Array[Double](m * ksub)
    var j = 0
    while (j < m) {
      val book = books(j)
      val base = j * dsub
      var c = 0
      while (c < ksub) {
        val cent = book(c)
        var acc = 0.0
        var i = 0
        while (i < dsub) { acc += v(base + i).toDouble * cent(i).toDouble; i += 1 }
        out(j * ksub + c) = acc
        c += 1
      }
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("pqLut", this, classOf[PqLut].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ADC score of one PQ code row against one flattened lookup table:
  * sum over subspaces j of lut[j * ksub + codes[j]] — the approximate
  * inner product (or, with a squared-norm table, the approximate squared
  * norm). The per-pair hot loop of [[graft.ext.Similarity.pqTopK]]: m
  * byte loads + m double adds, emitted inline into the join's generated
  * code (no reference-object call — the loop is 4 lines of Java).
  * The LUT is read in place via `ArrayData.getDouble` — the earlier
  * `toDoubleArray()` form copied the whole m·ksub table (8 KB at
  * m=16/ksub=64) once per scored candidate pair, which dominated the
  * advertised m-add ADC cost.
  */
case class PqAdcDot(codes: Expression, lut: Expression, ksub: Int)
    extends BinaryExpression with ExpectsInputTypes {

  require(ksub >= 1 && ksub <= 256, s"need 1 <= ksub <= 256, got $ksub")

  override def left: Expression = codes
  override def right: Expression = lut
  override def inputTypes = Seq(BinaryType, ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val cs = a.asInstanceOf[Array[Byte]]
    val t = b.asInstanceOf[ArrayData]
    var acc = 0.0
    var j = 0
    while (j < cs.length) {
      acc += t.getDouble(j * ksub + (cs(j) & 0xff))
      j += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cs = ctx.freshName("cs")
      val j = ctx.freshName("j")
      val acc = ctx.freshName("acc")
      s"""
         |byte[] $cs = $a;
         |double $acc = 0.0;
         |for (int $j = 0; $j < $cs.length; $j++) {
         |  $acc += $b.getDouble($j * $ksub + ($cs[$j] & 0xff));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(codes = newLeft, lut = newRight)
}

package graft

import org.apache.spark.sql.functions._
import graft.ext.{Recall, Similarity}
import graft.functions.GraftFunctions
import graft.functions.expressions.{Sq8DotDecoded, Sq8Encode}

/** SQ8 scalar quantization: encode bounds, decode-dot accuracy, codegen vs
  * interpreted agreement, SQL registration, and measured recall of the
  * compressed top-k against the exact baseline.
  */
class Sq8Spec extends SparkTestBase {
  import spark.implicits._

  private val mins = Array(-1.0, 0.0, 10.0)
  private val scales = Array(2.0 / 255, 1.0 / 255, 5.0 / 255)

  test("encode clamps to [0,255] and round-trips within half a step") {
    val v = Array(-1.0f, 0.5f, 12.0f)
    val df = Seq(Tuple1(v)).toDF("v")
      .select(GraftFunctions.sq8Encode(col("v"), mins, scales).as("c"))
    val code = df.head().getSeq[Byte](0)
    assert(code.length == 3)
    code.indices.foreach { i =>
      val decoded = mins(i) + scales(i) * (code(i) & 0xFF)
      assert(math.abs(decoded - v(i)) <= scales(i) / 2 + 1e-12,
        s"dim $i decoded $decoded vs ${v(i)}")
    }
    // out-of-grid values clamp, not wrap
    val oob = Seq(Tuple1(Array(-100.0f, 100.0f, 10.0f))).toDF("v")
      .select(GraftFunctions.sq8Encode(col("v"), mins, scales).as("c"))
      .head().getSeq[Byte](0)
    assert((oob(0) & 0xFF) == 0 && (oob(1) & 0xFF) == 255)
  }

  test("sq8 dot of encoded vectors approximates the float dot") {
    val a = Array(0.3f, 0.7f, 11.0f)
    val b = Array(-0.2f, 0.9f, 14.5f)
    val df = Seq((a, b)).toDF("a", "b").select(
      GraftFunctions.sq8Dot(
        GraftFunctions.sq8Encode(col("a"), mins, scales),
        GraftFunctions.sq8Encode(col("b"), mins, scales), mins, scales).as("d"),
      GraftFunctions.floatDot(col("a"), col("b")).as("exact"))
    val row = df.head()
    // error bound: |Σ (a+εa)(b+εb) - Σ ab| with |ε| <= step/2 on this grid
    assert(math.abs(row.getDouble(0) - row.getDouble(1)) < 0.2,
      s"sq8 dot ${row.getDouble(0)} too far from ${row.getDouble(1)}")
  }

  test("interpreted eval matches codegen path") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, ByteType, FloatType}
    val enc = Sq8Encode(
      Literal.create(Array(0.5f, 0.25f, 13.0f), ArrayType(FloatType)), mins, scales)
    val interpCode = enc.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toByteArray()
    val viaDf = Seq(Tuple1(Array(0.5f, 0.25f, 13.0f))).toDF("v")
      .select(GraftFunctions.sq8Encode(col("v"), mins, scales))
      .head().getSeq[Byte](0).toArray
    assert(interpCode.sameElements(viaDf))
    val dot = Sq8DotDecoded(
      Literal.create(interpCode.toSeq, ArrayType(ByteType)),
      Literal.create(interpCode.toSeq, ArrayType(ByteType)), mins, scales)
    val viaDf2 = Seq((viaDf.toSeq, viaDf.toSeq)).toDF("a", "b")
      .select(GraftFunctions.sq8Dot(col("a").cast("array<byte>"),
        col("b").cast("array<byte>"), mins, scales)).as[Double].head()
    assert(dot.eval(null) == viaDf2)
  }

  test("null vector encodes to null; mismatched dims zip to the grid") {
    val df = Seq(Tuple1(null: Array[Float]), Tuple1(Array(1.0f, 0.1f, 11.0f, 9.9f)))
      .toDF("v").select(GraftFunctions.sq8Encode(col("v"), mins, scales).as("c"))
    val out = df.collect()
    assert(out.exists(_.isNullAt(0)))
    // 4-dim vector on a 3-dim grid: extra dimension dropped
    assert(out.find(!_.isNullAt(0)).get.getSeq[Byte](0).length == 3)
  }

  test("sq8 functions are SQL-callable once registered") {
    GraftFunctions.register(spark)
    // note 1.0D: a bare 1.0/255 is DECIMAL division in Spark SQL, which
    // would define a (slightly) different grid than the double math here
    val d = spark.sql(
      """SELECT graft_sq8_dot(
        |  graft_sq8_encode(array(CAST(0.5 AS FLOAT)), array(0.0D), array(1.0D/255)),
        |  graft_sq8_encode(array(CAST(0.5 AS FLOAT)), array(0.0D), array(1.0D/255)),
        |  array(0.0D), array(1.0D/255)) AS d""".stripMargin)
      .as[Double].head()
    // 0.5 quantizes to code 128 → decodes to 128/255 ≈ 0.50196; the squared
    // decode is the exact expected value of the quantized dot
    assert(math.abs(d - math.pow(128.0 / 255, 2)) < 1e-12)
  }

  test("sq8TopK matches bruteForceTopK on well-separated toy vectors") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f)),
      (2L, Array(0.9f, 0.1f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(-1.0f, 0.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val q = vecs.filter(col("vec_id") === 1L)
    val exact = rows(Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", 2))
    val sq8 = rows(Similarity.sq8TopK(vecs, q, "vec_id", "embedding", 2))
    assert(sq8 == exact)
  }

  test("measured recall@5: SQ8 >= 0.9 on corpus embeddings (quantization-only error)") {
    val emb = graft.sources.Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
    val q = emb.filter(col("vec_id") < 10)
    val r = Recall.macroAvg(Recall.topKRecall(
      Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5),
      Similarity.sq8TopK(emb, q, "vec_id", "embedding", 5)))
    assert(r >= 0.9, s"SQ8 recall@5 regressed: $r")
  }
}

package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of a text column in ONE pass: whitespace
  * tokens (`\s+` on the trimmed text — the [[graft.ext.TextAnalysis]]
  * `tokens` contract, ASCII whitespace class to match the oracle's
  * `string_split_regex` exactly), a token is a chunk BOUNDARY iff the
  * first hex digit of its md5 is < `boundaryHexDigits` (the engine-
  * neutral q77 decision rule, so a DuckDB oracle recomputes boundaries
  * bit-exactly), a boundary token ends its chunk, and the tail past the
  * last boundary is the final chunk.
  *
  * Exists because the Column-function formulation (per-position
  * `element_at` + `md5` inside interpreted higher-order lambdas, then
  * zip/posexplode/slice/join) measured 7.4 s at sf0.1 and 72 s at sf10 —
  * ~30× the fixed-window pass — with the whole cost in per-element
  * lambda interpretation. Here the tokenize + hash + split is a single
  * primitive loop per row (md5 via a thread-local MessageDigest; the
  * expression object is shared across tasks, and MessageDigest is not
  * thread-safe).
  */
case class CdcChunksExpr(child: Expression, boundaryHexDigits: Int)
    extends UnaryExpression with ExpectsInputTypes {

  require(boundaryHexDigits >= 1 && boundaryHexDigits <= 16,
    s"need 1 <= boundaryHexDigits <= 16, got $boundaryHexDigits")

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  private def isSpace(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  def compute(input: UTF8String): GenericArrayData = {
    val bytes = input.getBytes // UTF-8; tokenization is byte-exact for \s+
    val md = CdcChunksExpr.digest.get()
    val out = new java.util.ArrayList[UTF8String](8)
    val len = bytes.length
    // chunk text is its tokens joined by ONE space (the oracle's
    // string_agg(tok, ' ') contract — irregular source whitespace must
    // NOT survive into the chunk), so token ranges accumulate and join
    // on chunk close instead of copying the raw byte span
    val buf = new java.io.ByteArrayOutputStream(64)
    def closeChunk(): Unit = {
      out.add(UTF8String.fromBytes(buf.toByteArray))
      buf.reset()
    }
    var i = 0
    while (i < len) {
      while (i < len && isSpace(bytes(i))) i += 1
      val start = i
      while (i < len && !isSpace(bytes(i))) i += 1
      if (i > start) {
        if (buf.size() > 0) buf.write(' ')
        buf.write(bytes, start, i - start)
        md.reset()
        md.update(bytes, start, i - start)
        if (((md.digest()(0) & 0xff) >>> 4) < boundaryHexDigits) closeChunk()
      }
    }
    if (buf.size() > 0) closeChunk()
    new GenericArrayData(out.toArray)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val ref = ctx.addReferenceObj("cdcChunks", this, classOf[CdcChunksExpr].getName)
      s"${ev.value} = $ref.compute($a);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CdcChunksExpr {
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }
}

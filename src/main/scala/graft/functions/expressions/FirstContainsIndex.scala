package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First-containment-match lookup as a scalar expression: returns the
  * 0-based index of the first needle (in the given order) contained in the
  * lowercased haystack, or null when none matches — the reference's
  * `get_field_id` ([function_app.py:233-256]) with its first-match-by-dim-
  * order semantics, fused into ONE codegen'd projection.
  *
  * Compared to the relational form (broadcast nested-loop join + row-id
  * group-back in [[graft.operators.Joins.containsLookup]]) this removes the
  * join AND the shuffle entirely: the dim vocabulary rides along as a
  * task-local array (same memory contract as a broadcast), each fact row is
  * answered in place with early exit at the first match, and the operator
  * composes with whole-stage codegen above and below.
  */
case class FirstContainsIndex(child: Expression, needlesLower: Array[String])
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes = Seq(StringType)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "first_contains_index"

  @transient private lazy val utf8Needles: Array[UTF8String] =
    needlesLower.map(UTF8String.fromString)

  override def nullSafeEval(input: Any): Any = {
    val hay = input.asInstanceOf[UTF8String].toLowerCase
    var i = 0
    while (i < utf8Needles.length) {
      if (hay.contains(utf8Needles(i))) return i
      i += 1
    }
    null
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    // NOT classOf[Array[...]].getName: that is the JVM binary name
    // ("[Lorg...UTF8String;"), which Janino cannot parse as a cast — the
    // whole projection silently fell back to interpreted eval.
    val needlesRef = ctx.addReferenceObj("needles", utf8Needles,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val childGen = child.genCode(ctx)
    val hay = ctx.freshName("hay")
    val i = ctx.freshName("i")
    ev.copy(code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        int ${ev.value} = -1;
        if (!${childGen.isNull}) {
          org.apache.spark.unsafe.types.UTF8String $hay = ${childGen.value}.toLowerCase();
          for (int $i = 0; $i < $needlesRef.length; $i++) {
            if ($hay.contains($needlesRef[$i])) { ${ev.isNull} = false; ${ev.value} = $i; break; }
          }
        }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd max-nesting-depth of a JSON text: one char scan counting
  * structural `{`/`[` vs `}`/`]` outside string literals (escape-aware).
  * `{"v":1}` → 1, `{"v":{"w":[1]}}` → 3; null / non-JSON noise still gets a
  * best-effort bracket depth (never throws).
  *
  * This is the corpus pre-pass behind depth-ADAPTIVE recursive `$ref`
  * unrolling ([[graft.compile.SuiteCompiler.compileAdaptive]]): the same
  * "size the unroll to the document" move the detailed-output validator
  * uses, but distributed — one `max(json_max_depth(col))` aggregation over
  * the validated column instead of a fixed unroll constant. A native
  * `UnaryExpression` with `doGenCode` (not a UDF) so the scan fuses into
  * WholeStageCodegen — at 10^12 rows the pre-pass is itself a full-corpus
  * pass and must run at scan speed.
  *
  * Depth here is an UPPER BOUND on how many times one `$ref` can re-enter
  * along a validation path, because each re-entry requires at least one
  * level of data descent (the compile-stack discipline in
  * [[graft.compile.Refs]]) — so unrolling to this depth makes the typed
  * DepthExceeded cut unreachable for in-corpus data (the reference
  * validates unbounded recursion at runtime, /root/reference/validator.go:
  * 767-811; this engine meets it with corpus-sized compile-time inlining).
  */
case class JsonDepthExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "json_max_depth"

  override protected def nullSafeEval(input: Any): Any =
    JsonDepthExpr.maxDepth(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JsonDepthExpr.maxDepth($c.toString())")

  override protected def withNewChildInternal(newChild: Expression): JsonDepthExpr =
    copy(child = newChild)
}

object JsonDepthExpr {

  /** Escape-aware structural nesting depth; 0 for scalars and null. */
  def maxDepth(s: String): Int = {
    var depth = 0
    var max = 0
    var inStr = false
    var esc = false
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (inStr) {
        if (esc) esc = false
        else if (c == '\\') esc = true
        else if (c == '"') inStr = false
      } else {
        if (c == '"') inStr = true
        else if (c == '{' || c == '[') {
          depth += 1
          if (depth > max) max = depth
        } else if (c == '}' || c == ']') depth -= 1
      }
      i += 1
    }
    max
  }

  def apply(c: Column): Column =
    GraftColumnBridge.column(JsonDepthExpr(GraftColumnBridge.expression(c)))
}

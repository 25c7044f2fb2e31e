package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType, VariantType}
import org.apache.spark.types.variant.{Variant, VariantUtil}
import org.apache.spark.unsafe.types.{UTF8String, VariantVal}

/** Storage-faithful deep canonical JSON of a VARIANT value — the dynamic
  * compiler's deep-equality key for container const/enum and uniqueItems.
  *
  * Walks the variant BINARY directly instead of round-tripping through
  * `to_json` + a text rewrite, because `to_json` destroys the one bit the
  * exact-rational canon needs: which storage class a nested number took.
  * Spark's variant keeps JSON numbers digit-exact as DECIMAL4/8/16 when the
  * parsed BigDecimal has scale 0..38 and precision ≤ 38, and falls back to
  * DOUBLE storage otherwise (negative-scale scientific notation, >38
  * digits). `to_json` renders that nested double via Jackson's legacy
  * `Double.toString` — the JDK-4511638 excess-digit class (~0.3% of
  * doubles) — which is a DIFFERENT rational than the double's shortest
  * repr, and once rendered it is textually indistinguishable from a
  * digit-exact decimal, so no post-hoc rewrite can recover the right
  * rational. Reading the binary keeps the distinction at every depth:
  *
  *  - LONG / DECIMAL storage → digit-exact rational, rendered
  *    `stripTrailingZeros().toString` (injective over rationals, so 2, 2.0, 2e0 collapse while
  *    digit-distinct decimals stay distinct; reference json.Number mode,
  *    /root/reference/util.go:322-325);
  *  - DOUBLE / FLOAT storage → the shortest correctly-rounded repr
  *    ([[ExactRatPredExpr.shortestDouble]]), the same rational the
  *    reference's float64 decode prints through fmt.Sprint
  *    (/root/reference/validator.go:519) and the same rule the top-level
  *    scalar canon (DynamicJson.numCanon) already applies — deep and
  *    shallow now agree at every nesting level;
  *  - objects render with SORTED keys, strings re-escape through the same
  *    Jackson writer as the compile-time constant canon
  *    ([[JsonNumCanonExpr.quote]]), so the runtime key is byte-comparable
  *    to `JsonNumCanonExpr.canonJson(schema-const-text)`;
  *  - non-JSON variant types (date/timestamp/binary/uuid — unreachable
  *    from `parse_json`) fall through to the engine rendering, keeping the
  *    expression total.
  *
  * Codegen'd (single static call inside WholeStageCodegen); one binary walk
  * per value — strictly cheaper than the former `to_json` + Jackson
  * readTree + rewrite chain it replaces.
  */
case class VariantCanonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "variant_canon"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case VariantType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"variant_canon needs a VARIANT input, got $other")
    }

  override protected def nullSafeEval(input: Any): Any =
    VariantCanonExpr.render(input.asInstanceOf[VariantVal])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.VariantCanonExpr.render($c)")

  override protected def withNewChildInternal(newChild: Expression): VariantCanonExpr =
    copy(child = newChild)
}

object VariantCanonExpr {
  def render(v: VariantVal): UTF8String = {
    val sb = new java.lang.StringBuilder(v.getValue.length + 16)
    write(new Variant(v.getValue, v.getMetadata), sb)
    UTF8String.fromString(sb.toString)
  }

  private def write(v: Variant, sb: java.lang.StringBuilder): Unit =
    v.getType match {
      case VariantUtil.Type.OBJECT =>
        val n = v.objectSize()
        val fields = new Array[Variant.ObjectField](n)
        var i = 0
        while (i < n) { fields(i) = v.getFieldAtIndex(i); i += 1 }
        // natural String order — the same Collections.sort the compile-time
        // constant canon uses (JsonNumCanonExpr.write)
        java.util.Arrays.sort(fields,
          (a: Variant.ObjectField, b: Variant.ObjectField) => a.key.compareTo(b.key))
        sb.append('{')
        i = 0
        while (i < n) {
          if (i > 0) sb.append(',')
          sb.append(JsonNumCanonExpr.quote(fields(i).key)).append(':')
          write(fields(i).value, sb)
          i += 1
        }
        sb.append('}')
      case VariantUtil.Type.ARRAY =>
        val n = v.arraySize()
        sb.append('[')
        var i = 0
        while (i < n) {
          if (i > 0) sb.append(',')
          write(v.getElementAtIndex(i), sb)
          i += 1
        }
        sb.append(']')
      case VariantUtil.Type.NULL    => sb.append("null")
      case VariantUtil.Type.BOOLEAN => sb.append(v.getBoolean)
      case VariantUtil.Type.LONG =>
        sb.append(java.math.BigDecimal.valueOf(v.getLong)
          .stripTrailingZeros().toString)
      case VariantUtil.Type.DECIMAL =>
        sb.append(v.getDecimal.stripTrailingZeros().toString)
      case VariantUtil.Type.DOUBLE =>
        val d = v.getDouble
        if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
          sb.append(java.lang.Double.toString(d)) // unreachable from JSON
        else sb.append(ExactRatPredExpr.shortestDouble(d).toString)
      case VariantUtil.Type.FLOAT =>
        val f = v.getFloat
        if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f))
          sb.append(java.lang.Float.toString(f))
        else sb.append(ExactRatPredExpr.shortestFloat(f).toString)
      case VariantUtil.Type.STRING =>
        sb.append(JsonNumCanonExpr.quote(v.getString))
      case _ =>
        // date/timestamp/binary/uuid: not constructible from JSON text;
        // engine rendering keeps the expression total for variant columns
        // fed from non-JSON sources
        sb.append(v.toJson(java.time.ZoneOffset.UTC))
    }

  def col(c: Column): Column =
    GraftColumnBridge.column(VariantCanonExpr(GraftColumnBridge.expression(c)))
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Go-decoder-parity JSON normalization — the FALLBACK arm behind
  * `try_parse_json`.
  *
  * Spark's variant parser REJECTS duplicate object keys
  * (`{"a":1,"a":2}` → null), but the reference decodes instances with Go's
  * `encoding/json`, which silently keeps the LAST value for a repeated key
  * (map assignment order, /root/reference/loader.go decode path) — so a
  * duplicate-key instance that the reference validates fails the engine's
  * `!parse` check. This expression re-serializes the text through Jackson,
  * whose tree reader applies the same last-key-wins rule, producing a
  * duplicate-free equivalent that `try_parse_json` accepts; anything
  * Jackson itself rejects (or trailing tokens after the first value, which
  * Go's Unmarshal also rejects) returns NULL, so the arm only ever moves
  * inputs from "rejected" to "Go-consistent accepted" and never weakens
  * `!parse` (fails closed).
  *
  * Value fidelity: numbers read digit-exact
  * (`USE_BIG_DECIMAL_FOR_FLOATS`) and re-render from the same
  * BigDecimal/BigInteger, preserving both the rational AND the variant
  * storage class (exponent-notation stays exponent-notation via
  * `BigDecimal.toString`'s negative-scale form, plain digits stay plain),
  * so the exact-rational arms downstream see the same number the original
  * text carried.
  *
  * Callers wrap it as `coalesce(try_parse_json(j),
  * try_parse_json(json_go_norm(j)))` — Coalesce short-circuits per row, so
  * well-formed JSON (everything but the degenerate duplicate-key class)
  * never pays the Jackson pass.
  */
case class JsonNormExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "json_go_norm"

  override protected def nullSafeEval(input: Any): Any =
    JsonNormExpr.norm(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.functions.JsonNormExpr.norm($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): JsonNormExpr =
    copy(child = newChild)
}

object JsonNormExpr {
  // digit-exact fractional numbers (a DoubleNode would round before we
  // ever re-render); ObjectMapper is thread-safe for configured reads
  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.configure(
      com.fasterxml.jackson.databind.DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS,
      true)
    m
  }

  /** Last-key-wins re-serialization; null when Jackson rejects the text or
    * a second top-level value follows the first (Go's Unmarshal errors on
    * trailing data too). */
  def norm(s: UTF8String): UTF8String =
    try {
      val p = mapper.createParser(s.toString)
      try {
        val n = mapper.readTree[com.fasterxml.jackson.databind.JsonNode](p)
        if (n == null || n.isMissingNode || p.nextToken() != null) null
        else UTF8String.fromString(mapper.writeValueAsString(n))
      } finally p.close()
    } catch { case _: Exception => null }

  def col(c: Column): Column =
    GraftColumnBridge.column(JsonNormExpr(GraftColumnBridge.expression(c)))
}

/** Lexical one-top-level-value guard — the other half of Go-decoder parity.
  *
  * Spark's variant parser ACCEPTS trailing content after a complete value
  * (`'{"a":2} x'` parses to `{"a":2}`, `'1 2'` to `1` — measured), while
  * the reference rejects it explicitly: loader.go:262-264 drains the
  * decoder after the first value and errors with "invalid character after
  * top-level value". This expression scans the text once (escape-aware
  * string state + container depth for objects/arrays, the JSON token
  * alphabet for scalars) and answers whether exactly ONE value is followed
  * by only whitespace. It does NOT validate the value itself — it runs in
  * CONJUNCTION with `try_parse_json`, which validates the prefix; the
  * conjunction equals Go's accept set on every probed divergence class.
  * Single byte pass, codegen'd — structural chars are ASCII, so UTF-8
  * continuation bytes (only legal inside strings) pass through the
  * in-string state untouched.
  */
case class JsonOneValueExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "json_one_value"

  override protected def nullSafeEval(input: Any): Any =
    JsonOneValueExpr.oneValue(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JsonOneValueExpr.oneValue($c)")

  override protected def withNewChildInternal(newChild: Expression): JsonOneValueExpr =
    copy(child = newChild)
}

object JsonOneValueExpr {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'

  // number/true/false/null token alphabet (a wrong token is the native
  // parser's problem — we only find where it lexically ends)
  private def isScalarByte(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      b == '+' || b == '-' || b == '.'

  def oneValue(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n && isWs(s.getByte(i))) i += 1
    if (i >= n) return false // empty: no value (native rejects too)
    val c0 = s.getByte(i)
    if (c0 == '{' || c0 == '[') {
      var depth = 0
      var inStr = false
      var done = false
      while (i < n && !done) {
        val b = s.getByte(i)
        if (inStr) {
          if (b == '\\') i += 1 // skip the escaped byte
          else if (b == '"') inStr = false
        } else if (b == '"') inStr = true
        else if (b == '{' || b == '[') depth += 1
        else if (b == '}' || b == ']') { depth -= 1; if (depth == 0) done = true }
        i += 1
      }
      if (!done) return false // unterminated (native rejects too)
    } else if (c0 == '"') {
      i += 1
      var closed = false
      while (i < n && !closed) {
        val b = s.getByte(i)
        if (b == '\\') i += 1
        else if (b == '"') closed = true
        i += 1
      }
      if (!closed) return false
    } else {
      while (i < n && isScalarByte(s.getByte(i))) i += 1
    }
    while (i < n && isWs(s.getByte(i))) i += 1
    i == n
  }

  def col(c: Column): Column =
    GraftColumnBridge.column(JsonOneValueExpr(GraftColumnBridge.expression(c)))
}

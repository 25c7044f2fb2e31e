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
    // keep the EXACT digits when re-rendering: the default node factory
    // strips trailing zeros / normalizes to scientific notation, which can
    // flip the variant storage class of the re-parsed text (DECIMAL →
    // DOUBLE for e.g. 99999999999999999900.0 → 9.99999999999999999E+19),
    // silently rounding a value that parses digit-exact without this
    // fallback — same document, different verdicts
    m.setNodeFactory(
      com.fasterxml.jackson.databind.node.JsonNodeFactory.withExactBigDecimals(true))
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

/** Go-decoder lexical acceptance guard — the other half of parse parity.
  *
  * Two measured divergences between Spark's variant parser and the
  * reference's Go decode, both handled by ONE single-pass byte scan:
  *
  *  1. TRAILING CONTENT: Spark accepts text after a complete value
  *     (`'{"a":2} x'` parses to `{"a":2}`, `'1 2'` to `1`), while the
  *     reference drains the decoder and errors "invalid character after
  *     top-level value" (loader.go:262-264). The scan (escape-aware string
  *     state + container depth, JSON token alphabet for scalars) answers
  *     whether exactly one value is followed by only whitespace.
  *  2. NUMBER RANGE: Spark SATURATES out-of-double-range numbers at any
  *     nesting depth (`1e999` → +Infinity, `1e-324` → 0.0 — measured),
  *     silently flipping bound/const/multipleOf verdicts; Go's float64
  *     decode errors loudly on the same inputs (strconv ErrRange →
  *     "cannot unmarshal"), and its json.Number mode keeps them exact —
  *     either way the reference never silently mis-verdicts. Since the
  *     variant CANNOT represent these values, the guard rejects them and
  *     the row fails `!parse` — the reference's float64-mode refusal.
  *     Outside strings, every number token is lexed and its magnitude
  *     exponent checked against the double range; at the two boundary
  *     magnitudes the full significand compares EXACTLY against the IEEE
  *     rounding midpoints (2^1024 - 2^970 overflow, 2^-1075 underflow-to-
  *     zero), so the accept set equals strconv's — including the sub-ulp
  *     band (`1.7976931348623158e308` is a finite MaxValue parse, not an
  *     overflow).
  *
  * The guard does NOT validate syntax — it runs in CONJUNCTION with
  * `try_parse_json`, which validates the value; the conjunction equals
  * Go's accept set on every probed divergence class. Codegen'd; structural
  * chars are ASCII, so UTF-8 continuation bytes (only legal inside
  * strings) pass through the in-string state untouched.
  */
case class JsonGoLexExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "json_go_lex"

  override protected def nullSafeEval(input: Any): Any =
    JsonGoLexExpr.goLexOk(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JsonGoLexExpr.goLexOk($c)")

  override protected def withNewChildInternal(newChild: Expression): JsonGoLexExpr =
    copy(child = newChild)
}

object JsonGoLexExpr {
  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'

  // number/true/false/null token alphabet (a wrong token is the native
  // parser's problem — we only find where it lexically ends)
  private def isScalarByte(b: Byte): Boolean =
    (b >= '0' && b <= '9') || (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      b == '+' || b == '-' || b == '.'

  private def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  // The EXACT IEEE-754 rounding boundaries, as full decimal digit strings
  // (both are exact finite decimals):
  //  - a decimal text parses to a FINITE double iff |x| < 2^1024 - 2^970
  //    (the MaxValue↔Inf midpoint; an exact tie rounds-half-even to the
  //    larger-binade even mantissa, i.e. Inf — strconv ErrRange);
  //  - it rounds to ZERO (Go's nonzero→0 underflow, also ErrRange) iff
  //    |x| <= 2^-1075 (the 0↔min-subnormal midpoint; the tie rounds to 0).
  // Significand digits with magnitude exponent 308 / -324 respectively.
  private final val OverDigits: String = // 2^1024 - 2^970 (309 digits)
    java.math.BigInteger.ONE.shiftLeft(1024)
      .subtract(java.math.BigInteger.ONE.shiftLeft(970)).toString
  private final val UnderDigits: String = // 2^-1075 = 5^1075 × 10^-1075
    java.math.BigInteger.valueOf(5).pow(1075).toString
  // enough collected digits to decide against the longer boundary (752):
  // any nonzero digit past the cap can only make the input LARGER when the
  // compared prefixes tie, which the truncNonzero flag records
  private final val SigCap = 800

  /** sig (+"nonzero digits were truncated past SigCap") vs boundary digits,
    * both read as 0.ddd… at the same magnitude: -1 below, 0 equal, 1 above.
    */
  private def cmpSig(sig: java.lang.StringBuilder, truncNonzero: Boolean,
                     bound: String): Int = {
    val ls = sig.length(); val lb = bound.length
    val l = if (ls > lb) ls else lb
    var k = 0
    while (k < l) {
      val a = if (k < ls) sig.charAt(k) else '0'
      val b = if (k < lb) bound.charAt(k) else '0'
      if (a != b) return if (a < b) -1 else 1
      k += 1
    }
    if (truncNonzero) 1 else 0
  }

  /** Is the number token in s[st, end) within the Go/strconv float64 accept
    * set? Computes the magnitude exponent (value = d.ddd × 10^magExp) from
    * the digit layout + explicit exponent; at the two boundary magnitudes
    * the full significand compares EXACTLY against the IEEE rounding
    * midpoints above (no sub-ulp band). Zero mantissas are always in range.
    */
  private def numInRange(s: UTF8String, st: Int, end: Int): Boolean = {
    var i = st
    if (i < end && (s.getByte(i) == '-' || s.getByte(i) == '+')) i += 1
    var digitsBeforePoint = 0
    var leadingZeros = 0
    var seenNonzero = false
    var sigCount = 0
    var truncNonzero = false
    val sig = new java.lang.StringBuilder(18)
    var inFraction = false
    var exp = 0L
    var break = false
    while (i < end && !break) {
      val b = s.getByte(i)
      if (isDigit(b)) {
        if (!inFraction) digitsBeforePoint += 1
        if (!seenNonzero) {
          if (b == '0') leadingZeros += 1 else seenNonzero = true
        }
        if (seenNonzero) {
          if (sigCount < SigCap) { sig.append(b.toChar); sigCount += 1 }
          else if (b != '0') truncNonzero = true
        }
        i += 1
      } else if (b == '.') { inFraction = true; i += 1 }
      else if (b == 'e' || b == 'E') {
        i += 1
        var negExp = false
        if (i < end && (s.getByte(i) == '-' || s.getByte(i) == '+')) {
          negExp = s.getByte(i) == '-'; i += 1
        }
        var e = 0L
        while (i < end && isDigit(s.getByte(i))) {
          if (e < 10000000L) e = e * 10 + (s.getByte(i) - '0')
          i += 1
        }
        exp = if (negExp) -e else e
        break = true
      } else break = true // malformed tail: the native parser's problem
    }
    if (!seenNonzero) return true // ±0 at any exponent is exactly 0
    val magExp = exp + (digitsBeforePoint - 1 - leadingZeros)
    if (magExp > 308 || magExp < -324) return false
    if (magExp == 308) return cmpSig(sig, truncNonzero, OverDigits) < 0
    if (magExp == -324) return cmpSig(sig, truncNonzero, UnderDigits) > 0
    true
  }

  def goLexOk(s: UTF8String): Boolean = {
    val n = s.numBytes()
    var i = 0
    while (i < n && isWs(s.getByte(i))) i += 1
    if (i >= n) return false // empty: no value (native rejects too)
    val c0 = s.getByte(i)
    if (c0 == '{' || c0 == '[') {
      var depth = 0
      var inStr = false
      var numStart = -1
      var done = false
      while (i < n && !done) {
        val b = s.getByte(i)
        if (inStr) {
          if (b == '\\') i += 1 // skip the escaped byte
          else if (b == '"') inStr = false
        } else {
          // outside strings, a number token starts at '-' or a digit and
          // spans the scalar alphabet ('e'/'E' appear in no other token)
          if (numStart < 0) {
            if (b == '-' || isDigit(b)) numStart = i
          } else if (!isScalarByte(b)) { // '.' is in the scalar alphabet
            if (!numInRange(s, numStart, i)) return false
            numStart = -1
          }
          if (b == '"') inStr = true
          else if (b == '{' || b == '[') depth += 1
          else if (b == '}' || b == ']') { depth -= 1; if (depth == 0) done = true }
        }
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
      val st = i
      while (i < n && isScalarByte(s.getByte(i))) i += 1
      val b0 = s.getByte(st)
      if ((b0 == '-' || isDigit(b0)) && !numInRange(s, st, i)) return false
    }
    while (i < n && isWs(s.getByte(i))) i += 1
    i == n
  }

  def col(c: Column): Column =
    GraftColumnBridge.column(JsonGoLexExpr(GraftColumnBridge.expression(c)))
}

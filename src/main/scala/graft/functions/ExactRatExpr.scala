package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Arbitrary-precision rational numeric predicate — the engine's stand-in
  * for the reference's `big.Rat` arithmetic (/root/reference/schema.go:78-82,
  * validator.go:516-549, util.go:322-325).
  *
  * Every JSON number is a finite decimal, so both operands always have a
  * power-of-10 denominator and exact `java.math.BigDecimal`
  * remainder/compareTo is semantically identical to big.Rat: no rounding,
  * no scale/precision ceiling (unlike the Decimal(38,12) fast arms this
  * expression backstops).
  *
  * Conversion fidelity: the reference feeds values to big.Rat through Go's
  * `fmt.Sprint(float64)` (validator.go:519), i.e. the SHORTEST decimal
  * string that round-trips the IEEE value. Java 17's legacy
  * `Double.toString` is NOT that form — it emits one excess digit for
  * ~0.3% of doubles (JDK-4511638, fixed only in JDK 19), which is a
  * DIFFERENT rational (e.g. 2.6814475343671142E18 vs the true shortest
  * ...114E18) — so float/double inputs here go through
  * [[ExactRatPredExpr.shortestDouble]]/[[ExactRatPredExpr.shortestFloat]],
  * the correctly-rounded shortest repr (the JDK 19+ spec, matching Go),
  * and see the same rational the reference sees — NOT the full binary
  * expansion. String inputs (the dynamic compiler's canonical JSON number
  * text) parse digit-exactly, matching the reference's `json.Number`
  * decode mode where the raw text feeds big.Rat.
  *
  * Codegen'd (no UDF boxing); used only on the fallback arms where the
  * Decimal(38,12) pmod/compare fast paths would round, so the hot
  * integral/low-scale paths keep their native plans.
  */
case class ExactRatPredExpr(child: Expression, op: Int, operand: String)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "exact_rat_pred"

  @transient private lazy val m = new java.math.BigDecimal(operand)

  private def convExpr(c: String): String = child.dataType match {
    case StringType => s"graft.functions.ExactRatPredExpr.ofString($c)"
    case DoubleType => s"graft.functions.ExactRatPredExpr.ofDouble($c)"
    case FloatType  => s"graft.functions.ExactRatPredExpr.ofFloat($c)"
    case _: DecimalType => s"$c.toJavaBigDecimal()"
    case ByteType | ShortType | IntegerType | LongType =>
      s"java.math.BigDecimal.valueOf((long)$c)"
    case dt => throw new IllegalStateException(
      s"exact_rat_pred: unsupported input type $dt")
  }

  override protected def nullSafeEval(input: Any): Any = {
    val bd: java.math.BigDecimal = child.dataType match {
      case StringType => ExactRatPredExpr.ofString(input.asInstanceOf[UTF8String])
      case DoubleType => ExactRatPredExpr.ofDouble(input.asInstanceOf[Double])
      case FloatType  => ExactRatPredExpr.ofFloat(input.asInstanceOf[Float])
      case _: DecimalType =>
        input.asInstanceOf[org.apache.spark.sql.types.Decimal].toJavaBigDecimal
      case ByteType    => java.math.BigDecimal.valueOf(input.asInstanceOf[Byte].toLong)
      case ShortType   => java.math.BigDecimal.valueOf(input.asInstanceOf[Short].toLong)
      case IntegerType => java.math.BigDecimal.valueOf(input.asInstanceOf[Int].toLong)
      case LongType    => java.math.BigDecimal.valueOf(input.asInstanceOf[Long])
      case dt => throw new IllegalStateException(
        s"exact_rat_pred: unsupported input type $dt")
    }
    ExactRatPredExpr.test(bd, op, m)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val mRef = ctx.addReferenceObj("exactRatOperand", m, "java.math.BigDecimal")
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExactRatPredExpr.test(${convExpr(c)}, $op, $mRef)")
  }

  override protected def withNewChildInternal(newChild: Expression): ExactRatPredExpr =
    copy(child = newChild)
}

object ExactRatPredExpr {
  // op codes (kept tiny so the generated call site stays a single static
  // invoke inside WholeStageCodegen)
  final val MultipleOf = 0
  final val Ge = 1
  final val Le = 2
  final val Gt = 3
  final val Lt = 4
  final val Eq = 5

  /** NaN/Infinity are not JSON numbers and are never a multiple of / within
    * bounds of anything — false, not null, so the verdict stays loud. */
  def ofDouble(d: Double): java.math.BigDecimal =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d)) null
    else shortestDouble(d)

  def ofFloat(f: Float): java.math.BigDecimal =
    if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f)) null
    else shortestFloat(f)

  /** Shortest correctly-rounded decimal repr of an IEEE double, as an exact
    * BigDecimal — what Go's strconv shortest mode (fmt.Sprint) and JDK 19+
    * `Double.toString` produce: the fewest significant digits that parse
    * back to `d`, the candidate at that length being the one CLOSEST to
    * `d`'s exact binary value (ties to even). Java 17's legacy toString
    * emits one excess digit for ~0.3% of doubles (JDK-4511638), a different
    * rational, so it only serves as the round-tripping upper bound here.
    *
    * Scan DOWN from the legacy digit count: rounding the exact binary value
    * to p significant digits half-even yields the nearest p-digit decimal,
    * and round-tripping is monotone in p (every p-digit decimal is also a
    * (p+1)-digit decimal, so the nearest (p+1)-digit candidate is at least
    * as close to d and round-trips whenever the p-digit one does) — the
    * last round-tripping candidate is the shortest repr. The candidate at
    * the STARTING precision is recomputed too (not anchored on the legacy
    * value): even at equal length the legacy string need not be the
    * correctly-rounded candidate (~0.001% of doubles), and the spec picks
    * the one closest to d. Legacy excess is ≤1 digit, so this is two
    * roundings + two parses on the common path (validated 0/5M mismatches
    * against the definitional linear-scan oracle).
    */
  def shortestDouble(d: Double): java.math.BigDecimal = {
    if (d == 0.0d) return java.math.BigDecimal.ZERO // covers -0.0: rational 0
    val legacy = new java.math.BigDecimal(java.lang.Double.toString(d))
      .stripTrailingZeros()
    val exact = new java.math.BigDecimal(d)
    var best: java.math.BigDecimal = null
    var p = legacy.precision()
    while (p >= 1) {
      val cand = exact.round(
        new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
      if (cand.doubleValue() == d) { best = cand; p -= 1 }
      else p = 0
    }
    // best == null only if even the full-length nearest candidate fails the
    // round trip (an equidistant tie at an asymmetric binade boundary):
    // the legacy value is then a valid round-tripping repr of the same length
    (if (best == null) legacy else best).stripTrailingZeros()
  }

  /** Float analogue of [[shortestDouble]] (float → double widening is
    * exact, so `new BigDecimal(f.toDouble)` is the exact binary value;
    * candidates round-trip through `floatValue`). */
  def shortestFloat(f: Float): java.math.BigDecimal = {
    if (f == 0.0f) return java.math.BigDecimal.ZERO
    val legacy = new java.math.BigDecimal(java.lang.Float.toString(f))
      .stripTrailingZeros()
    val exact = new java.math.BigDecimal(f.toDouble)
    var best: java.math.BigDecimal = null
    var p = legacy.precision()
    while (p >= 1) {
      val cand = exact.round(
        new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
      if (cand.floatValue() == f) { best = cand; p -= 1 }
      else p = 0
    }
    (if (best == null) legacy else best).stripTrailingZeros()
  }

  def ofString(s: UTF8String): java.math.BigDecimal =
    try new java.math.BigDecimal(s.toString)
    catch { case _: NumberFormatException => null }

  def test(v: java.math.BigDecimal, op: Int, m: java.math.BigDecimal): Boolean =
    if (v == null) false
    else op match {
      case MultipleOf => v.remainder(m).signum() == 0
      case Ge => v.compareTo(m) >= 0
      case Le => v.compareTo(m) <= 0
      case Gt => v.compareTo(m) > 0
      case Lt => v.compareTo(m) < 0
      case Eq => v.compareTo(m) == 0
      case other => throw new IllegalArgumentException(s"op $other")
    }

  /** Column-level builder. `operand` keeps full precision via plain string. */
  def pred(c: Column, op: Int, operand: java.math.BigDecimal): Column =
    GraftColumnBridge.column(
      ExactRatPredExpr(GraftColumnBridge.expression(c), op, operand.toPlainString))
}

/** Shortest-repr decimal text of an IEEE double — the dynamic compiler's
  * number canon for variant-DOUBLE-stored values. Spark's variant cannot
  * hold a decimal with negative scale or >38 digits (e.g. scientific
  * notation ≥ ~1e16), stores such numbers as DOUBLE, and `to_json` renders
  * that double via Jackson's legacy form (the JDK-4511638 excess-digit
  * class) — a DIFFERENT rational than the value's shortest repr. This
  * expression renders the double the way the reference's float64 decode
  * would print it (fmt.Sprint shortest, validator.go:519), so the dynamic
  * exact-rational arms see the same rational as the typed arms.
  * NaN/±Inf (unreachable from JSON) render as their Java names, which the
  * downstream BigDecimal parse rejects into null → predicate false.
  */
case class ShortestReprExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shortest_repr"

  override protected def nullSafeEval(input: Any): Any =
    ShortestReprExpr.render(input.asInstanceOf[Double])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShortestReprExpr.render($c)")

  override protected def withNewChildInternal(newChild: Expression): ShortestReprExpr =
    copy(child = newChild)
}

object ShortestReprExpr {
  def render(d: Double): UTF8String =
    if (java.lang.Double.isNaN(d) || java.lang.Double.isInfinite(d))
      UTF8String.fromString(java.lang.Double.toString(d))
    else UTF8String.fromString(
      ExactRatPredExpr.shortestDouble(d).toString)

  def col(c: Column): Column =
    GraftColumnBridge.column(ShortestReprExpr(GraftColumnBridge.expression(c)))
}

/** Canonical exact-rational rendering of a JSON number text — the engine's
  * big.Rat-equality GROUPING KEY (the predicate form above answers yes/no
  * against one constant; this one makes equal-rational texts collapse to
  * one string for distinct/group operations like uniqueItems).
  *
  * BigDecimal parse → stripTrailingZeros → toString: injective over
  * rationals (the normalized (unscaledValue, scale) pair is unique and
  * toString round-trips it), so "2", "2.0", "2e0", "0.2e1" all render "2"
  * while digit-distinct numbers at ANY scale — 1.0000000000000001 vs
  * 1.00000000000000011 — stay distinct, exactly the reference's numeric
  * equality (/root/reference/util.go:322-325). Unparseable text passes
  * through unchanged (callers feed canonical JSON number text, so this arm
  * never fires in practice; total-ness keeps codegen null handling simple).
  */
case class ExactRatCanonExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "exact_rat_canon"

  override protected def nullSafeEval(input: Any): Any =
    ExactRatCanonExpr.canonNum(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ExactRatCanonExpr.canonNum($c)")

  override protected def withNewChildInternal(newChild: Expression): ExactRatCanonExpr =
    copy(child = newChild)
}

object ExactRatCanonExpr {
  def canonNum(s: UTF8String): UTF8String =
    try UTF8String.fromString(
      new java.math.BigDecimal(s.toString).stripTrailingZeros().toString)
    catch { case _: NumberFormatException => s }

  def canon(c: Column): Column =
    GraftColumnBridge.column(ExactRatCanonExpr(GraftColumnBridge.expression(c)))
}

/** Deep canonical JSON for uniqueItems grouping of CONTAINER elements:
  * every number at ANY depth rewritten to its exact-rational canonical
  * rendering (see [[ExactRatCanonExpr]]), object keys sorted, strings
  * re-escaped deterministically — so `{"a": 1.0}` and `{"a": 1}` collapse
  * to one key (the reference's deep numeric equality,
  * /root/reference/util.go:286-329) while digit-distinct nested numbers
  * stay distinct. Unparseable text passes through unchanged. Scalars are
  * handled too (numbers canonicalize, strings re-escape through one
  * writer), so callers route every JSON value through this one expression
  * with no per-element type dispatch.
  */
case class JsonNumCanonExpr(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "json_num_canon"

  override protected def nullSafeEval(input: Any): Any =
    JsonNumCanonExpr.canonJson(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.JsonNumCanonExpr.canonJson($c)")

  override protected def withNewChildInternal(newChild: Expression): JsonNumCanonExpr =
    copy(child = newChild)
}

object JsonNumCanonExpr {
  // USE_BIG_DECIMAL_FOR_FLOATS: fractional numbers parse digit-exact (a
  // DoubleNode would round >17-significant-digit inputs before we ever see
  // them); ObjectMapper is thread-safe for configured reads
  private val mapper = {
    val m = new com.fasterxml.jackson.databind.ObjectMapper()
    m.configure(
      com.fasterxml.jackson.databind.DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS,
      true)
    m
  }

  /** JSON string-literal quoting, shared with [[VariantCanonExpr]] so the
    * runtime variant-binary canon and this compile-time text canon escape
    * identically (byte-comparable keys). Thread-safe (configured reader). */
  def quote(s: String): String = mapper.writeValueAsString(s)

  def canonJson(s: UTF8String): UTF8String =
    try {
      val sb = new java.lang.StringBuilder(s.numChars() + 8)
      write(mapper.readTree(s.toString), sb)
      UTF8String.fromString(sb.toString)
    } catch { case _: Exception => s }

  private def write(n: com.fasterxml.jackson.databind.JsonNode,
                    sb: java.lang.StringBuilder): Unit =
    if (n.isNumber)
      sb.append(n.decimalValue().stripTrailingZeros().toString)
    else if (n.isTextual)
      sb.append(quote(n.asText()))
    else if (n.isBoolean) sb.append(n.asBoolean())
    else if (n.isNull) sb.append("null")
    else if (n.isArray) {
      sb.append('[')
      var first = true
      n.forEach { e => if (!first) sb.append(','); first = false; write(e, sb) }
      sb.append(']')
    } else { // object: sorted keys for rendering-independent equality
      sb.append('{')
      val keys = new java.util.ArrayList[String]()
      n.fieldNames().forEachRemaining(k => { keys.add(k); () })
      java.util.Collections.sort(keys)
      var first = true
      keys.forEach { k =>
        if (!first) sb.append(',')
        first = false
        sb.append(quote(k)).append(':')
        write(n.get(k), sb)
      }
      sb.append('}')
    }

  def canon(c: Column): Column =
    GraftColumnBridge.column(JsonNumCanonExpr(GraftColumnBridge.expression(c)))
}

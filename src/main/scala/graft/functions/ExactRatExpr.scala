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
    */
  def shortestDouble(d: Double): java.math.BigDecimal =
    if (d == 0.0d) java.math.BigDecimal.ZERO // covers -0.0: rational 0
    else shortest(java.lang.Double.toString(d), new java.math.BigDecimal(d),
      cand => cand.doubleValue() == d)

  /** Float analogue of [[shortestDouble]] (float → double widening is
    * exact, so `new BigDecimal(f.toDouble)` is the exact binary value;
    * candidates round-trip through `floatValue`). */
  def shortestFloat(f: Float): java.math.BigDecimal =
    if (f == 0.0f) java.math.BigDecimal.ZERO
    else shortest(java.lang.Float.toString(f), new java.math.BigDecimal(f.toDouble),
      cand => cand.floatValue() == f)

  /** Scan DOWN from the legacy digit count. Any p-digit decimal that parses
    * back to the value must bracket the exact binary value, so at each p
    * BOTH p-digit neighbours are complete candidates: the HALF_EVEN-nearest
    * one first (the spec prefers the candidate closest to the value, ties
    * to even), then the neighbour on the other side — the nearest candidate
    * alone is NOT sufficient (for ~0.05% of full-exponent-range doubles it
    * fails the round trip while the other neighbour passes, e.g.
    * 7.1202363472230444E-307 whose 16-digit shortest repr is the
    * away-rounded 7.120236347223045E-307). When neither neighbour
    * round-trips, no p-digit decimal does, and the previous level's pick is
    * the shortest repr. The candidate at the STARTING precision is
    * recomputed too (not anchored on the legacy value): even at equal
    * length the legacy string need not be the correctly-rounded candidate,
    * and the fallback to the legacy value only fires if both full-length
    * neighbours fail (legacy round-trips by construction).
    */
  private def shortest(legacyStr: String, exact: java.math.BigDecimal,
                       roundTrips: java.math.BigDecimal => Boolean)
      : java.math.BigDecimal = {
    val legacy = new java.math.BigDecimal(legacyStr).stripTrailingZeros()
    var best: java.math.BigDecimal = null
    var p = legacy.precision()
    var scanning = true
    while (scanning && p >= 1) {
      val near = exact.round(
        new java.math.MathContext(p, java.math.RoundingMode.HALF_EVEN))
      if (roundTrips(near)) { best = near; p -= 1 }
      else {
        val down = exact.round(
          new java.math.MathContext(p, java.math.RoundingMode.DOWN))
        val other =
          if (near.compareTo(down) == 0)
            exact.round(new java.math.MathContext(p, java.math.RoundingMode.UP))
          else down
        if (roundTrips(other)) { best = other; p -= 1 }
        else scanning = false
      }
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

  /** Column-level builder. `operand` keeps full precision via
    * `BigDecimal.toString` — lossless (the lazy parse re-reads the exact
    * (unscaledValue, scale) pair) and COMPACT: scientific notation for
    * huge exponents, where `toPlainString` would materialize the full
    * digit expansion (1e999999999 → a ~10^9-char string → OOM at compile).
    */
  def pred(c: Column, op: Int, operand: java.math.BigDecimal): Column =
    GraftColumnBridge.column(
      ExactRatPredExpr(GraftColumnBridge.expression(c), op, operand.toString))
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

/** Float analogue of [[ShortestReprExpr]] for variant-FLOAT-stored numbers
  * (reachable only on native variant columns fed from non-JSON sources —
  * parse_json never produces FLOAT storage): the float's own shortest repr
  * (≤ 9 digits), NOT shortestDouble of the widened value, matching
  * [[VariantCanonExpr]]'s deep FLOAT arm so scalar and deep canon agree.
  */
case class ShortestFloatReprExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "shortest_float_repr"

  override protected def nullSafeEval(input: Any): Any =
    ShortestFloatReprExpr.render(input.asInstanceOf[Float])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.ShortestFloatReprExpr.render($c)")

  override protected def withNewChildInternal(newChild: Expression): ShortestFloatReprExpr =
    copy(child = newChild)
}

object ShortestFloatReprExpr {
  def render(f: Float): UTF8String =
    if (java.lang.Float.isNaN(f) || java.lang.Float.isInfinite(f))
      UTF8String.fromString(java.lang.Float.toString(f))
    else UTF8String.fromString(
      ExactRatPredExpr.shortestFloat(f).toString)

  def col(c: Column): Column =
    GraftColumnBridge.column(ShortestFloatReprExpr(GraftColumnBridge.expression(c)))
}

/** Deep canonical JSON for uniqueItems grouping of CONTAINER elements:
  * every number at ANY depth rewritten to its exact-rational canonical
  * rendering (BigDecimal parse → stripTrailingZeros → toString — injective
  * over rationals, so "2", "2.0", "2e0" collapse while digit-distinct
  * numbers at any scale stay distinct, the reference's numeric equality
  * /root/reference/util.go:322-325), object keys sorted, strings
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
    * identically (byte-comparable keys). Uses the raw string encoder the
    * ObjectMapper's generator delegates to — identical escaping without
    * constructing a serializer/writer per call (this runs once per key and
    * per string value inside the per-row canon walk). Thread-safe. */
  def quote(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length + 2)
    sb.append('"')
      .append(com.fasterxml.jackson.core.io.JsonStringEncoder.getInstance()
        .quoteAsString(s))
      .append('"')
    sb.toString
  }

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

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Go-decoder surrogate parity — the third half of parse parity, after
  * duplicate keys ([[JsonNormExpr]]) and trailing-content/number-range
  * ([[JsonGoLexExpr]]).
  *
  * Go's `encoding/json` replaces an invalid `\uXXXX` surrogate escape —
  * a high surrogate not followed by a low-surrogate escape, or a bare low
  * surrogate — with U+FFFD (the documented "invalid UTF-16 surrogate pairs
  * are replaced by the Unicode replacement character"; the reference
  * decodes both schemas and instances through it, loader.go:255-266).
  * Spark's variant parser (and Java's String→UTF-8 encoder, which is what
  * a `lit(const)` goes through) instead renders the unpaired surrogate as
  * `?` (0x3F) — so string const/enum/pattern verdicts on that class differ
  * from the reference.
  *
  * The fix is textual and length-preserving: a lone surrogate escape
  * `\uD800` is 6 bytes, and so is `�` — rewrite the escape in place
  * BEFORE any parse, on both the instance path (this expression, ahead of
  * `try_parse_json`/`from_json`) and the schema-document path
  * ([[SurrogateCanon.canonText]], ahead of Jackson). Both decoders then
  * see a plain BMP escape and produce U+FFFD, matching Go on every
  * downstream comparison. A VALID pair (`𐀀`) is left untouched
  * (both engines decode it to the astral code point); after a rewrite the
  * scan re-examines the next escape independently, matching Go's
  * reprocess-after-replacement (`\uD800\uD801` → two U+FFFD).
  *
  * The scan is escape-aware (a literal `\\uD800` — escaped backslash — is
  * text, not an escape) and allocation-free on the no-surrogate common
  * path (returns the input reference). Raw unpaired surrogates cannot
  * occur in well-formed UTF-8 input, so the escape form is the whole
  * class.
  */
object SurrogateCanon {
  private def hexVal(b: Int): Int =
    if (b >= '0' && b <= '9') b - '0'
    else if (b >= 'a' && b <= 'f') b - 'a' + 10
    else if (b >= 'A' && b <= 'F') b - 'A' + 10
    else -1

  /** Code unit of the 4 hex bytes at `at`, or -1 if any is non-hex. */
  private def hex4(get: Int => Int, n: Int, at: Int): Int = {
    if (at + 3 >= n) return -1
    var u = 0
    var k = 0
    while (k < 4) {
      val h = hexVal(get(at + k))
      if (h < 0) return -1
      u = (u << 4) | h
      k += 1
    }
    u
  }

  private def isHigh(u: Int): Boolean = u >= 0xD800 && u <= 0xDBFF
  private def isLow(u: Int): Boolean = u >= 0xDC00 && u <= 0xDFFF

  /** Core scan: calls `fix(i)` for each lone-surrogate escape start i
    * (position of the backslash). Shared by the byte and char variants —
    * every structurally relevant unit is ASCII, so the same state machine
    * is correct over UTF-8 bytes and UTF-16 chars alike.
    */
  private def scan(get: Int => Int, n: Int)(fix: Int => Unit): Unit = {
    var i = 0
    var inStr = false
    while (i < n) {
      val b = get(i)
      if (inStr) {
        if (b == '\\') {
          if (i + 1 < n && get(i + 1) == 'u') {
            val u = hex4(get, n, i + 2)
            if (u < 0) i += 2 // not a real \uXXXX escape: skip just '\','u'
            else if (isHigh(u)) {
              val lo =
                if (i + 7 < n && get(i + 6) == '\\' && get(i + 7) == 'u')
                  hex4(get, n, i + 8)
                else -1
              if (isLow(lo)) i += 12 // valid pair: both engines agree
              else { fix(i); i += 6 }
            } else if (isLow(u)) { fix(i); i += 6 }
            else i += 6
          } else i += 2 // any other escape: skip the escaped unit
        } else if (b == '"') { inStr = false; i += 1 }
        else i += 1
      } else {
        if (b == '"') inStr = true
        i += 1
      }
    }
  }

  /** Instance-text canon over UTF-8 bytes; returns the INPUT reference when
    * no lone surrogate escape exists (the common path — zero allocation).
    */
  def canonUtf8(s: UTF8String): UTF8String = {
    val n = s.numBytes()
    var out: Array[Byte] = null
    scan(i => s.getByte(i) & 0xFF, n) { i =>
      // getBytes may return the UNDERLYING array (aligned byte[] base) —
      // always copy before mutating, or we'd rewrite the input in place
      if (out == null) out = java.util.Arrays.copyOf(s.getBytes, n)
      // keep '\','u', overwrite the 4 hex digits with FFFD
      out(i + 2) = 'F'; out(i + 3) = 'F'; out(i + 4) = 'F'; out(i + 5) = 'D'
    }
    if (out == null) s else UTF8String.fromBytes(out)
  }

  /** Schema-document canon over a Java String (driver side, ahead of the
    * Jackson parse) — same machine over UTF-16 units.
    */
  def canonText(s: String): String = {
    val n = s.length
    var out: StringBuilder = null
    scan(i => s.charAt(i).toInt, n) { i =>
      if (out == null) out = new StringBuilder(s)
      out.setCharAt(i + 2, 'F'); out.setCharAt(i + 3, 'F')
      out.setCharAt(i + 4, 'F'); out.setCharAt(i + 5, 'D')
    }
    if (out == null) s else out.toString
  }

  def col(c: Column): Column =
    GraftColumnBridge.column(SurrogateCanonExpr(GraftColumnBridge.expression(c)))
}

/** Codegen'd wrapper over [[SurrogateCanon.canonUtf8]] for the instance
  * parse paths (dynamic document parse, contentSchema, media-type decode).
  */
case class SurrogateCanonExpr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "json_surrogate_canon"

  override protected def nullSafeEval(input: Any): Any =
    SurrogateCanon.canonUtf8(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.SurrogateCanon.canonUtf8($c)")

  override protected def withNewChildInternal(newChild: Expression): SurrogateCanonExpr =
    copy(child = newChild)
}

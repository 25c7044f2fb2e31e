package graft

import graft.compile.SuiteCompiler
import graft.exec.Validator
import graft.functions.SurrogateCanon
import graft.spec.Spec
import org.apache.spark.unsafe.types.UTF8String

/** Go-decoder surrogate parity: a lone `\uXXXX` surrogate escape decodes to
  * U+FFFD (encoding/json's documented replacement; the reference decodes
  * schemas and instances through it, loader.go:255-266), where Spark's
  * variant parser — and Java's String→UTF-8 encoder on the schema-constant
  * side — produced '?'. The length-preserving textual canon
  * ([[SurrogateCanon]]) runs ahead of every JSON decode on both sides.
  */
class SurrogateSpec extends SparkTestBase {
  import spark.implicits._

  // ---- textual canon unit behavior (driver-side String variant) ----

  test("canonText: lone high, lone low, valid pair, literal backslash-u") {
    // NB: Scala lexes \"\\ud800\" to the 6 chars \ u d 8 0 0 — never a raw
    // surrogate code unit in these sources.
    assert(SurrogateCanon.canonText("\"\\ud800\"") == "\"\\uFFFD\"")
    assert(SurrogateCanon.canonText("\"\\uDFFF\"") == "\"\\uFFFD\"")
    // valid pair: untouched (both engines decode the astral code point)
    assert(SurrogateCanon.canonText("\"\\ud800\\udc00\"") == "\"\\ud800\\udc00\"")
    // two lone highs: each independently replaced (Go reprocesses after a
    // replacement, so \uD800\uD801 is two U+FFFD)
    assert(SurrogateCanon.canonText("\"\\ud800\\ud801\"") == "\"\\uFFFD\\uFFFD\"")
    // escaped backslash before 'u': literal text, not an escape
    assert(SurrogateCanon.canonText("\"\\\\ud800\"") == "\"\\\\ud800\"")
    // outside strings nothing rewrites (structurally impossible anyway)
    assert(SurrogateCanon.canonText("""{"k": 1}""") == """{"k": 1}""")
    // high at end-of-string / truncated hex: lone → replaced / untouched
    assert(SurrogateCanon.canonText("\"\\ud800") == "\"\\uFFFD")
    assert(SurrogateCanon.canonText("\"\\ud8") == "\"\\ud8")
    // uppercase hex recognized; non-surrogate escapes untouched
    assert(SurrogateCanon.canonText("\"\\uD9AB\"") == "\"\\uFFFD\"")
    assert(SurrogateCanon.canonText("\"\\u0041\\n\"") == "\"\\u0041\\n\"")
    // low-then-high: both lone
    assert(SurrogateCanon.canonText("\"\\udc00\\ud800\"") == "\"\\uFFFD\\uFFFD\"")
  }

  test("canonUtf8 agrees with canonText and never mutates its input") {
    val rnd = new scala.util.Random(42)
    val atoms = Array("\\u", "d8", "dc", "00", "ff", "\"", "\\\\", "\\\"",
      "a", "{", "}", "[", "]", ":", ",", "1", "\\ud800", "\\udc00",
      "\\ud800\\udc00", "\\uD83D", "x")
    (1 to 500).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(12))(atoms(rnd.nextInt(atoms.length))).mkString
      val u = UTF8String.fromString(s)
      val before = u.toString
      val got = SurrogateCanon.canonUtf8(u).toString
      assert(got == SurrogateCanon.canonText(s), s"input <$s>")
      assert(u.toString == before, s"input mutated: <$s>")
    }
  }

  test("canonUtf8 returns the input reference on the no-rewrite path") {
    val u = UTF8String.fromString("""{"a":"\u0041 plain"}""")
    assert(SurrogateCanon.canonUtf8(u) eq u)
  }

  // ---- end-to-end: dynamic (variant) instance path ----

  private def validsOf(specJson: String, docs: Seq[String]): Seq[Boolean] = {
    val df = docs.zipWithIndex.map { case (j, i) => (i, j) }.toDF("k", "j")
    val suite = SuiteCompiler.compile(Spec.fromJson(specJson), df.schema)
    Validator.annotate(df, suite).orderBy("k").select("valid")
      .as[Boolean].collect().toSeq
  }

  test("lone surrogate escape decodes to U+FFFD, not '?' (const parity)") {
    // schema const is the RAW replacement char; "?" must NOT match
    val spec = s"""{"columns":{"j":{"json":{"const":"\uFFFD"}}}}"""
    assert(validsOf(spec, Seq(
      "\"\\ud800\"",        // lone high  → U+FFFD → match
      "\"\\udfff\"",        // lone low   → U+FFFD → match
      "\"\uFFFD\"",         // raw replacement char → match
      "\"?\"",              // the old '?' rendering must NOT match
      "\"\\ud800\\udc00\"", // valid pair → astral char → no match
      "\"\\\\ud800\""       // literal text \ud800 → no match
    )) == Seq(true, true, true, false, false, false))
  }

  test("valid pair still decodes to the astral code point") {
    // const written as a real surrogate pair in source = the astral char
    val spec = s"""{"columns":{"j":{"json":{"const":"\uD800\uDC00"}}}}"""
    assert(validsOf(spec, Seq("\"\\ud800\\udc00\"", "\"\\ud800\""))
      == Seq(true, false))
  }

  test("consecutive lone highs become two replacement chars") {
    val spec = s"""{"columns":{"j":{"json":{"const":"\uFFFD\uFFFD"}}}}"""
    assert(validsOf(spec, Seq("\"\\ud800\\ud801\"", "\"\\ud800\""))
      == Seq(true, false))
  }

  test("uniqueItems: distinct lone surrogates are duplicates after canon") {
    val spec = """{"columns":{"j":{"json":{"uniqueItems":true}}}}"""
    assert(validsOf(spec, Seq(
      "[\"\\ud800\", \"\\udfff\"]", // both → U+FFFD → duplicate
      "[\"\\ud800\", \"x\"]"
    )) == Seq(false, true))
  }

  test("schema-side escape: a lone surrogate in the SPEC document also " +
    "canonicalizes to U+FFFD (both sides match Go)") {
    // spec JSON carries the ESCAPE \ud800 in its const
    val spec = "{\"columns\":{\"j\":{\"json\":{\"const\":\"\\ud800\"}}}}"
    assert(validsOf(spec, Seq("\"\\ud800\"", s""""\uFFFD"""", "\"?\""))
      == Seq(true, true, false))
  }

  // ---- end-to-end: static (typed) contentSchema path ----

  test("static contentSchema decodes lone surrogates to U+FFFD") {
    val df = Seq((1, "\"\\ud800\""), (2, "\"?\""), (3, s""""\uFFFD""""))
      .toDF("k", "s")
    val spec =
      s"""{"columns":{"s":{"contentMediaType":"application/json",
            "contentSchema":{"type":"string","const":"\uFFFD"}}}}"""
    val suite = SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    val got = Validator.annotate(df, suite).orderBy("k").select("valid")
      .as[Boolean].collect().toSeq
    assert(got == Seq(true, false, true))
  }
}

package graft

import graft.compile.SuiteCompiler
import graft.exec.Validator
import graft.spec.{Spec, SpecError}
import org.apache.spark.sql.functions.col

/** Dynamic (variant) JSON validation — the reference's dynamically-typed
  * instance model with runtime type dispatch: union types, heterogeneous
  * arrays, JSON null as a first-class type, canonical deep equality.
  */
class DynamicJsonSpec extends SparkTestBase {
  import spark.implicits._

  private def validsOf(specJson: String, docs: Seq[String]): Seq[Boolean] = {
    val df = docs.zipWithIndex.map { case (j, i) => (i, j) }.toDF("k", "j")
    val suite = SuiteCompiler.compile(Spec.fromJson(specJson), df.schema)
    Validator.annotate(df, suite).orderBy("k").select("valid")
      .as[Boolean].collect().toSeq
  }

  test("union types dispatch at runtime (static compiler cannot express this)") {
    val spec = """{"columns":{"j":{"json":{"type":["integer","string"]}}}}"""
    assert(validsOf(spec, Seq(
      "5",            // integer → ok
      "\"hello\"",    // string → ok
      "5.5",          // number with fraction → NOT an integer
      "true",         // boolean → fail
      "[1]",          // array → fail
      "null"          // json null → fail (null not in union)
    )) == Seq(true, true, false, false, false, false))
  }

  test("JSON null is a first-class type, distinct from absent") {
    val spec = """{"columns":{"j":{"json":{"type":["null","boolean"]}}}}"""
    assert(validsOf(spec, Seq("null", "true", "0")) == Seq(true, true, false))
  }

  test("numeric keywords gate on runtime type; booleans are not numbers") {
    val spec = """{"columns":{"j":{"json":{"minimum":0,"maximum":10}}}}"""
    assert(validsOf(spec, Seq("5", "-1", "99", "true", "\"x\""))
      == Seq(true, false, false, true, true)) // non-numbers vacuous
  }

  test("string keywords gate on runtime type; object-to-string cast never leaks") {
    val spec = """{"columns":{"j":{"json":{"minLength":3}}}}"""
    // an OBJECT casts to its JSON text via variant_get — must NOT be length-checked
    assert(validsOf(spec, Seq("\"abc\"", "\"a\"", "{\"k\":1}", "12345"))
      == Seq(true, false, true, true))
  }

  test("dependentSchemas: runtime key-presence gates the whole-object schema") {
    val spec =
      """{"columns":{"j":{"json":{"dependentSchemas":{"bar":{
           "properties":{"foo":{"maximum":10}},"required":["foo"]}}}}}}"""
    assert(validsOf(spec, Seq(
      """{"foo": 5, "bar": "b"}""",  // gated schema passes
      """{"foo": 50, "bar": "b"}""", // foo > 10
      """{"foo": 50}""",             // bar absent → not applied
      """{"bar": "b"}""",            // required foo missing
      """"not an object""""         // non-object → vacuous
    )) == Seq(true, false, true, false, true))
  }

  test("heterogeneous arrays: items + uniqueItems with canonical deep equality") {
    val spec = """{"columns":{"j":{"json":{"items":{"type":["integer","string"]}}}}}"""
    assert(validsOf(spec, Seq(
      """[1, "a", 2]""",
      """[1, true]""",
      """[]"""
    )) == Seq(true, false, true))
    val uniq = """{"columns":{"j":{"json":{"uniqueItems":true}}}}"""
    assert(validsOf(uniq, Seq(
      """[{"a":1,"b":2}, {"b":2,"a":1}]""", // same object, different key order
      """[1, 2]""",
      """[1, 1]"""
    )) == Seq(false, true, false))
    // numeric canonicalization: 2 == 2.0 (reference numeric equality), but
    // numbers differing only BEYOND 12 fractional digits stay distinct —
    // the decimal(38,12) rendering alone would merge them
    assert(validsOf(uniq, Seq(
      """[2, 2.0]""",
      """[1.0000000000001, 1.0000000000002]""",
      """[1.0000000000001, 1.0000000000001]""",
      """[1e308, 1.5e308]""", // beyond decimal range (double storage), in
                              // double range (2e308 would overflow — the
                              // Go-lex guard rejects THAT loudly, see the
                              // range-parity test)
      """[1e308, 2e308]"""    // 2e308 > double max: the whole document
                              // fails !parse (Go float64 decode errors on
                              // range, never silently saturates to Inf)
    )) == Seq(false, true, false, true, false))
  }

  test("nested object properties + required via variant paths") {
    val spec =
      """{"columns":{"j":{"json":{
           "type":"object","required":["user"],
           "properties":{"user":{"type":"object","required":["id"],
             "properties":{"id":{"type":"integer","minimum":1},
                           "tags":{"type":"array","items":{"type":"string"}}}}}}}}}"""
    assert(validsOf(spec, Seq(
      """{"user":{"id":7,"tags":["a","b"]}}""",
      """{"user":{"id":0}}""",            // minimum
      """{"user":{"tags":[1]}}""",        // missing id + non-string tag
      """{"other":1}""",                  // missing user
      """"not an object""""              // type fails
    )) == Seq(true, false, false, false, false))
  }

  test("composition + $ref work dynamically; malformed JSON fails !parse") {
    val spec =
      """{"$defs":{"smallNum":{"type":"number","maximum":10}},
          "columns":{"j":{"json":{"anyOf":[
            {"$ref":"#/$defs/smallNum"},{"type":"string"}]}}}}"""
    assert(validsOf(spec, Seq("5", "\"ok\"", "50", "not json at all"))
      == Seq(true, true, false, false))
  }

  test("const/enum deep equality: 2 == 2.0, canonical objects") {
    val spec = """{"columns":{"j":{"json":{"const":2}}}}"""
    assert(validsOf(spec, Seq("2", "2.0", "2.5", "\"2\""))
      == Seq(true, true, false, false))
    val objConst = """{"columns":{"j":{"json":{"enum":[{"a":1},5]}}}}"""
    assert(validsOf(objConst, Seq("""{"a":1}""", "5", """{"a":2}"""))
      == Seq(true, true, false))
  }

  test("property names containing dots/quotes address the right key (bracket paths)") {
    val spec =
      """{"columns":{"j":{"json":{"type":"object","required":["a.b"],
           "properties":{"a.b":{"minimum":5}}}}}}"""
    assert(validsOf(spec, Seq(
      """{"a.b": 7}""",          // flat dotted key present + ok
      """{"a.b": 1}""",          // present but below minimum
      """{"a": {"b": 7}}"""      // NESTED a.b must NOT satisfy required "a.b"
    )) == Seq(true, false, false))
  }

  test("composite const/enum canonicalize both sides (key order, 2.0 vs 2)") {
    val spec = """{"columns":{"j":{"json":{"const":{"b":2,"a":1}}}}}"""
    assert(validsOf(spec, Seq(
      """{"b":2,"a":1}""", """{"a":1,"b":2}""", """{"a":1,"b":3}"""
    )) == Seq(true, true, false))
    val numArr = """{"columns":{"j":{"json":{"const":[2.0]}}}}"""
    assert(validsOf(numArr, Seq("[2]", "[2.0]", "[2.5]"))
      == Seq(true, true, false))
  }

  test("multibyte strings survive the variant path (rune-exact length, pattern, const)") {
    // Spark's parse_json/variant_get decodes string bytes through the JVM
    // DEFAULT charset; under a POSIX locale on Java 17 that is US-ASCII and
    // every non-ASCII byte silently became U+FFFD (found by
    // DifferentialFuzzSpec; build.sbt pins -Dfile.encoding=UTF-8). Length
    // counts RUNES: "héllo" is 5, an astral emoji is 1
    // (/root/reference/validator.go:435-445).
    val spec = """{"columns":{"j":{"json":{"minLength":5}}}}"""
    assert(validsOf(spec, Seq("\"héllo\"", "\"h\\u00e9llo\"", "\"héll\""))
      == Seq(true, true, false))
    val one = """{"columns":{"j":{"json":{"maxLength":3}}}}"""
    assert(validsOf(one, Seq("\"\\ud83d\\ude00ok\"", "\"héllo\""))
      == Seq(true, false))
    val cst = """{"columns":{"j":{"json":{"const":"héllo"}}}}"""
    assert(validsOf(cst, Seq("\"héllo\"", "\"hello\"")) == Seq(true, false))
  }

  test("container const/enum: NESTED numbers compare with deep exact equality") {
    // {"a":1} must equal const {"a":1.0} (the reference's deep numeric
    // equality, util.go:286-329) while digit-distinct nested numbers stay
    // distinct — both sides go through the deep canonicalizer
    val spec = """{"columns":{"j":{"json":{"const":{"a":1.0}}}}}"""
    assert(validsOf(spec, Seq(
      """{"a":1}""", """{"a":1.0}""", """{"a":1.0000000000001}"""
    )) == Seq(true, true, false))
    val precise = """{"columns":{"j":{"json":{"const":[{"a":1.0000000000001}]}}}}"""
    assert(validsOf(precise, Seq(
      """[{"a":1.0000000000001}]""", """[{"a":1.0000000000002}]""", """[{"a":1}]"""
    )) == Seq(true, false, false))
  }

  test("bounds stay exact past 2^53 (decimal compare, double fallback)") {
    val spec = """{"columns":{"j":{"json":{"minimum":9007199254740993}}}}"""
    assert(validsOf(spec, Seq("9007199254740992", "9007199254740993", "9007199254740994"))
      == Seq(false, true, true))
    // decimal-overflow magnitudes don't false-positive multipleOf
    val mOf = """{"columns":{"j":{"json":{"multipleOf":1}}}}"""
    assert(validsOf(mOf, Seq("1e30", "5")) == Seq(true, true))
  }

  test("dynamic pattern goes through the pluggable regex engine") {
    graft.functions.Formats.setPatternEngine((v, p) => v.rlike("(?i)" + p))
    try {
      val spec = """{"columns":{"j":{"json":{"pattern":"hello"}}}}"""
      assert(validsOf(spec, Seq("\"HELLO\"")) == Seq(true))
    } finally graft.functions.Formats.setPatternEngine((v, p) => v.rlike(p))
  }

  test("every unimplemented dynamic keyword throws (no silent drops)") {
    val df = Seq((1, "{}")).toDF("k", "j")
    Seq("json" -> """{"properties":{"x":{"json":{"type":"object"}}}}""").foreach {
      case (name, frag) =>
        val e = intercept[SpecError] {
          SuiteCompiler.compile(Spec.fromJson(
            s"""{"columns":{"j":{"json":$frag}}}"""), df.schema)
        }
        assert(e.getMessage.contains("not supported in dynamic"), s"$name: ${e.getMessage}")
    }
    // content* keywords are IMPLEMENTED in dynamic mode (validator.go:468-510)
    // — they must compile, and unknown registry names stay typed errors
    SuiteCompiler.compile(Spec.fromJson(
      """{"columns":{"j":{"json":{
           "contentEncoding":"base64","contentMediaType":"application/json",
           "contentSchema":{"type":"object"}}}}}"""), df.schema)
    val e = intercept[SpecError] {
      SuiteCompiler.compile(Spec.fromJson(
        """{"columns":{"j":{"json":{"contentEncoding":"base32"}}}}"""), df.schema)
    }
    assert(e.getMessage.contains("unknown encoding"))
  }

  test("json keyword on a non-string, non-variant column is a typed error") {
    val df = Seq((1, 5)).toDF("k", "j")
    val e = intercept[SpecError] {
      SuiteCompiler.compile(Spec.fromJson(
        """{"columns":{"j":{"json":{"type":"number"}}}}"""), df.schema)
    }
    assert(e.getMessage.contains("applies to string or variant"))
  }

  test("json keyword on a native VariantType column dispatches directly") {
    val df = Seq((1, "5"), (2, "\"x\""), (3, "50"))
      .toDF("k", "raw")
      .select(col("k"), org.apache.spark.sql.functions.parse_json(col("raw")).as("j"))
    val suite = SuiteCompiler.compile(Spec.fromJson(
      """{"columns":{"j":{"json":{"type":"number","maximum":10}}}}"""), df.schema)
    val valids = Validator.annotate(df, suite).orderBy("k").select("valid")
      .as[Boolean].collect().toSeq
    assert(valids == Seq(true, false, false))
  }

  test("dynamic unevaluatedProperties: static closure, schema form, runtime branches") {
    // static closure: properties + allOf-merged evaluations over runtime keys
    val spec =
      """{"columns":{"j":{"json":{
           "properties":{"a":{}},
           "allOf":[{"patternProperties":{"^x_":{}}}],
           "unevaluatedProperties":false}}}}"""
    assert(validsOf(spec, Seq(
      """{"a":1,"x_b":2}""", """{"a":1,"zzz":2}""", "5", "null"
    )) == Seq(true, false, true, true)) // non-objects vacuous
    // schema form: unevaluated values must match
    val schemaForm =
      """{"columns":{"j":{"json":{
           "properties":{"a":{}},
           "unevaluatedProperties":{"type":"string"}}}}}"""
    assert(validsOf(schemaForm, Seq(
      """{"a":1,"b":"ok"}""", """{"a":1,"b":7}"""
    )) == Seq(true, false))
    // runtime branches: keys evaluated iff their anyOf branch VALIDATES
    val runtime =
      """{"columns":{"j":{"json":{
           "anyOf":[{"required":["a"],"properties":{"a":{"type":"number"}}},
                    {"required":["b"],"properties":{"b":{"type":"string"}}}],
           "unevaluatedProperties":false}}}}"""
    assert(validsOf(runtime, Seq(
      """{"a":1}""", """{"b":"x"}""", """{"a":1,"b":"x"}""",
      """{"a":1,"c":2}"""
    )) == Seq(true, true, true, false))
    // $dynamicRef in the closure (r4c): the anchor target's keys count
    // evaluated under the branch's validity, same as the typed compiler
    val dynRef =
      """{"columns":{"j":{"json":{
           "$defs":{"p":{"$dynamicAnchor":"p",
             "properties":{"x":{"type":"string"}}}},
           "properties":{"a":{}},
           "anyOf":[{"$dynamicRef":"#p"},{"minProperties":0}],
           "unevaluatedProperties":false}}}}"""
    assert(validsOf(dynRef, Seq(
      """{"a":1,"x":"s"}""",  // p validates -> x evaluated
      """{"a":1,"x":7}""",    // p fails (x not string) -> x unevaluated
      """{"a":1}"""
    )) == Seq(true, false, true))
  }

  test("dynamic unevaluatedItems: prefix closure, contains lowering, runtime branches") {
    val closed =
      """{"columns":{"j":{"json":{
           "prefixItems":[{"type":"number"}],"unevaluatedItems":false}}}}"""
    assert(validsOf(closed, Seq(
      "[1]", "[1,2]", "[]", "5"
    )) == Seq(true, false, true, true))
    // contains in the unconditional closure: matched items count evaluated
    val withContains =
      """{"columns":{"j":{"json":{
           "contains":{"type":"number"},"unevaluatedItems":false}}}}"""
    assert(validsOf(withContains, Seq(
      "[1,2]", """[1,"x"]""", "[]"
    )) == Seq(true, false, false))
    // runtime: evaluated prefix depends on which oneOf branch validates
    val runtime =
      """{"columns":{"j":{"json":{
           "oneOf":[{"prefixItems":[{"type":"number"},{"type":"number"}]},
                    {"prefixItems":[{"type":"string"}]}],
           "unevaluatedItems":false}}}}"""
    assert(validsOf(runtime, Seq(
      "[1,2]", """["x"]""", """["x",1]"""
    )) == Seq(true, true, false))
  }

  test("dynamic object keywords via variant key enumeration (min/maxProperties, propertyNames, additionalProperties, patternProperties)") {
    val minp = """{"columns":{"j":{"json":{"minProperties":2}}}}"""
    assert(validsOf(minp, Seq(
      """{"a":1,"b":2}""", """{"a":1}""", "5", "null"
    )) == Seq(true, false, true, true)) // non-objects vacuous
    val names = """{"columns":{"j":{"json":{"propertyNames":{"pattern":"^[a-z]+$"}}}}}"""
    assert(validsOf(names, Seq(
      """{"ok":1}""", """{"NOT_OK":1}""", """{}""", "[1]"
    )) == Seq(true, false, true, true))
    val closed =
      """{"columns":{"j":{"json":{"properties":{"a":{}},
          "patternProperties":{"^x_":{"type":"integer"}},
          "additionalProperties":false}}}}"""
    assert(validsOf(closed, Seq(
      """{"a":1,"x_b":2}""",     // both keys evaluated
      """{"a":1,"zzz":2}""",     // zzz is additional
      """{"a":1,"x_b":"str"}""", // patternProperties type fails
      """{}"""
    )) == Seq(true, false, false, true))
    val addSchema =
      """{"columns":{"j":{"json":{"properties":{"a":{}},
          "additionalProperties":{"type":"string"}}}}}"""
    assert(validsOf(addSchema, Seq(
      """{"a":[1],"note":"x"}""", // additional value is a string
      """{"a":[1],"note":5}"""    // additional value wrong dynamic type
    )) == Seq(true, false))
  }

  test("dynamic dependentRequired + prefixItems + items-after-prefix") {
    val dep = """{"columns":{"j":{"json":{"dependentRequired":{"cc":["addr"]}}}}}"""
    assert(validsOf(dep, Seq(
      """{"cc":1,"addr":"s"}""", """{"cc":1}""", """{"other":1}""", "\"str\""
    )) == Seq(true, false, true, true))
    val prefix =
      """{"columns":{"j":{"json":{
          "prefixItems":[{"type":"integer"},{"type":"string"}],
          "items":{"type":"boolean"}}}}}"""
    assert(validsOf(prefix, Seq(
      """[1,"a",true,false]""",
      """[1,"a"]""",
      """["wrong","a"]""",
      """[1,"a",5]""",
      """[]"""
    )) == Seq(true, true, false, false, true))
  }

  test("variant-double storage compares by the shortest repr, not to_json's legacy text") {
    // 3.602879701896397e16 (the shortest repr of 4*2^53) has negative
    // scale, so Spark's variant stores it as DOUBLE and to_json re-renders
    // it via Jackson's legacy form 3.6028797018963968E16 — a DIFFERENT
    // rational (the JDK-4511638 excess-digit class) that read BELOW the
    // minimum and broke multipleOf. numCanon must route such values
    // through the shortest repr (found by the differential fuzz).
    val minSpec =
      """{"columns":{"j":{"json":{"minimum":3.602879701896397e16}}}}"""
    assert(validsOf(minSpec, Seq("3.602879701896397e16")) == Seq(true))
    val multSpec = """{"columns":{"j":{"json":{"multipleOf":5}}}}"""
    // shortest repr ...970 IS a multiple of 5 (the rational the reference's
    // float64 decode sees); the exact integer value ...968 is not
    assert(validsOf(multSpec, Seq("3.602879701896397e16")) == Seq(true))
    val constSpec =
      """{"columns":{"j":{"json":{"const":3.602879701896397e16}}}}"""
    assert(validsOf(constSpec, Seq(
      "3.602879701896397e16",
      // ulp at 2^55 is 8, so ...969 parses to the SAME double as the const
      // (the storage boundary: variant DOUBLE cannot keep the digit-exact
      // text, so the engine — like the reference's float64 decode — sees
      // the same rational) while ...976 is the NEXT double → a different
      // shortest repr → unequal
      "3.6028797018963969e16",
      "3.6028797018963976e16"
    )) == Seq(true, true, false))
    // uniqueItems element keys go through the same canon
    val uniq = """{"columns":{"j":{"json":{"uniqueItems":true}}}}"""
    assert(validsOf(uniq, Seq(
      "[3.602879701896397e16, 3.602879701896397e16]",
      "[3.602879701896397e16, 2]"
    )) == Seq(false, true))
  }

  test("variant-double numbers NESTED in containers canonicalize by storage class") {
    // Deep = shallow: the former to_json-based container canon rendered a
    // nested variant-DOUBLE (any exponent-notation text — Spark's variant
    // decimal parse rejects 'e') via Jackson's LEGACY double text, the
    // JDK-4511638 excess-digit rational, and once rendered it was
    // indistinguishable from a digit-exact decimal. VariantCanonExpr walks
    // the variant binary, so the storage class survives at every depth.
    val constSpec =
      """{"columns":{"j":{"json":{"const":[3.602879701896397e16]}}}}"""
    assert(validsOf(constSpec, Seq(
      "[3.602879701896397e16]",   // DOUBLE storage → shortest repr = const
      "[3.6028797018963969e16]",  // same double (ulp 8 at 2^55) → equal
      "[36028797018963970]",      // digit-exact LONG = the const's rational
      "[36028797018963968]",      // the double's exact integer value is a
                                  // DIFFERENT rational than its shortest repr
      "[3.6028797018963976e16]"   // next double up → unequal
    )) == Seq(true, true, true, false, false))

    val objConst =
      """{"columns":{"j":{"json":{"const":{"x":1e-39,"y":"a"}}}}}"""
    assert(validsOf(objConst, Seq(
      """{"y":"a","x":1e-39}""",     // key order canonical; scale-39 double
      """{"y":"a","x":1.0e-39}"""    // same double, other rendering
    )) == Seq(true, true))

    // uniqueItems over CONTAINER elements: nested storage classes stay
    // distinct (double's shortest repr vs the digit-exact long of its
    // exact integer value), same doubles collapse
    val uniq = """{"columns":{"j":{"json":{"uniqueItems":true}}}}"""
    assert(validsOf(uniq, Seq(
      "[[3.602879701896397e16], [36028797018963968]]",   // distinct rationals
      "[[3.602879701896397e16], [3.6028797018963969e16]]", // same double: dup
      "[[3.602879701896397e16], [36028797018963970]]",   // long == shortest: dup
      """[{"a":2.0}, {"a":2}]"""                         // 2.0 == 2 deep: dup
    )) == Seq(true, false, false, false))
  }

  test("duplicate object keys decode last-wins (Go encoding/json parity)") {
    // Spark's variant parser rejects duplicate keys; the reference decodes
    // with Go's encoding/json, which keeps the LAST value silently. The
    // Jackson-normalize fallback (JsonNormExpr, evaluated only when the
    // native parse rejects) restores parity — and stays fail-closed:
    // malformed text and trailing tokens (which Go also rejects) still
    // fail !parse.
    val spec = """{"columns":{"j":{"json":{"properties":{"a":{"minimum":2}}}}}}"""
    assert(validsOf(spec, Seq(
      """{"a":1,"a":2}""",     // last wins → 2 → valid
      """{"a":2,"a":1}""",     // last wins → 1 → below the bound
      """{"a":1,"a":2""",      // malformed: still !parse
      """{"a":2} {"a":2}"""    // trailing top-level token: Go rejects too
    )) == Seq(true, false, false, false))

    // deep equality sees the DEDUPED object; numbers survive the re-render
    // digit-exact and keep their storage class (exponent notation stays
    // DOUBLE-stored → shortest-repr canon)
    val constSpec =
      """{"columns":{"j":{"json":{"const":{"a":2,"x":3.602879701896397e16}}}}}"""
    assert(validsOf(constSpec, Seq(
      """{"a":1,"a":2,"x":3.602879701896397e16}""",
      """{"x":3.6028797018963969e16,"a":2,"x":3.602879701896397e16}""",
      """{"a":1,"a":3,"x":3.602879701896397e16}"""
    )) == Seq(true, true, false))

    // nested duplicate keys dedup too (the normalize pass is a full-tree
    // re-serialization), and digit-exact fractions are preserved
    val deep = """{"columns":{"j":{"json":{"properties":{"o":{"const":{"b":1.0000000000001}}}}}}}"""
    assert(validsOf(deep, Seq(
      """{"o":{"b":2,"b":1.0000000000001}}""",
      """{"o":{"b":2,"b":1.0000000000002}}"""
    )) == Seq(true, false))

    // trailing content after EVERY value shape fails !parse (Go:
    // "invalid character after top-level value", loader.go:262-264 —
    // Spark's native parser would silently validate the prefix), while
    // whitespace padding and escape-laden strings stay fine
    val anySpec = """{"columns":{"j":{"json":true}}}"""
    assert(validsOf(anySpec, Seq(
      "1 2",                      // scalar then scalar
      """"a" "b"""",              // string then string
      "[1]x",                     // container then junk
      """{"a":2},""",             // container then comma
      "true false",
      """  {"a":2}  """,          // padding ok
      """ "quote \" brace }" """, // escaped quote; structural char in string
      "1e5 "
    )) == Seq(false, false, false, false, false, true, true, true))

    // number RANGE parity: Spark's variant silently saturates
    // out-of-double-range numbers (1e999 → Infinity, 1e-999 → 0.0 —
    // measured), flipping verdicts; Go's float64 decode errors on range
    // (strconv ErrRange), so the Go-lex guard fails such documents at
    // !parse — loud, never silently saturated. In-range extremes (double
    // max, min subnormal) stay accepted; zero mantissa at any exponent is
    // exactly 0; digits INSIDE strings are not numbers.
    assert(validsOf(anySpec, Seq(
      "1e999", "-1e999", "1e-999",
      "0.00001e-320",                 // = 1e-325: underflows to 0
      """[{"x":1e999}]""",            // nested: same rule at any depth
      "2e308",                        // just above double max
      "1e308", "1.7976931348623157e308", // max double: in range
      "4.9e-324",                     // min subnormal: in range
      "0e999999", "-0.0e-999999",     // zero mantissa: exactly 0
      """ "1e999" """,                // a STRING, not a number
      "123456789012345678901234567890123456789012345678"  // 48-digit int:
                                      // huge but finite (1.2e47)
    )) == Seq(false, false, false, false, false, false,
              true, true, true, true, true, true, true))
  }

  test("type integer uses the exact zero-fraction rule on the canonical text") {
    val spec = """{"columns":{"j":{"json":{"type":"integer"}}}}"""
    assert(validsOf(spec, Seq(
      "2.0",                   // zero fraction → integer
      "1.00000000000000001",   // 17 fractional digits: the old double
                               // extract ROUNDED this onto 1 and passed it;
                               // the reference's big.Rat IsInt fails it
      "1e30",                  // integral shortest repr → integer
      "1.0000000000001"        // 13 fractional digits → not integer
    )) == Seq(true, false, true, false))
  }

  test("property names containing quotes extract correctly (variant paths have no escapes)") {
    // Spark's variant path grammar has no escape inside quoted segments —
    // $['it\'s'] is an INVALID path that used to crash the whole query.
    // Single-quote keys route through the double-quoted path form, and a
    // key with BOTH quote kinds through the map view.
    val spec =
      """{"columns":{"j":{"json":{
           "properties":{"it's":{"type":"integer"}},
           "required":["it's"]}}}}"""
    assert(validsOf(spec, Seq(
      """{"it's": 3}""",
      """{"it's": "x"}""",
      """{"other": 1}""")) == Seq(true, false, false))
    val both =
      """{"columns":{"j":{"json":{
           "properties":{"a'\"b":{"minimum":5}},
           "required":["a'\"b"]}}}}"""
    assert(validsOf(both, Seq(
      """{"a'\"b": 9}""",
      """{"a'\"b": 1}""",
      "{}")) == Seq(true, false, false))
  }

  test("duplicate-key fallback keeps exact digits and storage class (no silent rounding)") {
    // The Jackson re-serialization used the default node factory, which
    // normalized 99999999999999999900.0 to 9.99999999999999999E+19 —
    // variant then stored DOUBLE and ROUNDED it, so the same value got
    // different verdicts with vs without a duplicate key in the document.
    val spec =
      """{"columns":{"j":{"json":{
           "properties":{"x":{"const":99999999999999999900.0}}}}}}"""
    assert(validsOf(spec, Seq(
      """{"x": 99999999999999999900.0}""",                  // native parse
      """{"a": 1, "a": 2, "x": 99999999999999999900.0}""",  // dup-key fallback
      """{"a": 1, "a": 2, "x": 99999999999999999901.0}"""   // digit-distinct
    )) == Seq(true, true, false))
  }

  test("dynamic contentSchema fails !parse on unparseable content (static parity)") {
    graft.functions.Content.registerMediaType("text/anything-dyn", _ => org.apache.spark.sql.functions.lit(true))
    val spec =
      """{"columns":{"j":{"json":{
           "contentMediaType":"text/anything-dyn",
           "contentSchema":{"type":"object"}}}}}"""
    assert(validsOf(spec, Seq(
      "\"{\\\"k\\\": 1}\"",   // embedded JSON object → contentSchema ok
      "\"not json\"",         // media type accepts, but NOT JSON → !parse fails
      "5"                     // non-string → content* vacuous
    )) == Seq(true, false, true))
  }

  test("native variant columns: FLOAT storage canon and non-JSON storage classes") {
    import org.apache.spark.sql.functions._
    // a FLOAT-stored variant (unreachable from parse_json): scalar const
    // must use the float's own shortest repr, like the deep canon — pick a
    // float whose legacy Float.toString text is a DIFFERENT rational than
    // its shortest repr, so the to_json fallback would mis-verdict
    val rnd = new java.util.Random(20260820L)
    val f = Iterator.continually(java.lang.Float.intBitsToFloat(rnd.nextInt()))
      .filter(x => !x.isNaN && !x.isInfinite)
      .find { x =>
        new java.math.BigDecimal(java.lang.Float.toString(x)).compareTo(
          graft.functions.ExactRatPredExpr.shortestFloat(x)) != 0
      }.get
    val short = graft.functions.ExactRatPredExpr.shortestFloat(f).toString
    val fdf = Seq(f).toDF("f")
      .select(lit(0).as("k"), expr("cast(f as variant)").as("j"))
    val fsuite = SuiteCompiler.compile(Spec.fromJson(
      s"""{"columns":{"j":{"json":{"const":$short}}}}"""), fdf.schema)
    assert(Validator.annotate(fdf, fsuite).select("valid")
      .as[Boolean].collect().toSeq == Seq(true),
      s"f=$f short=$short legacy=${java.lang.Float.toString(f)}")
    // a TIMESTAMP-stored variant must NOT classify as a JSON number
    val tdf = Seq("2024-01-01 00:00:00").toDF("t")
      .select(lit(0).as("k"),
        expr("cast(cast(t as timestamp) as variant)").as("j"))
    val tsuite = SuiteCompiler.compile(Spec.fromJson(
      """{"columns":{"j":{"json":{"type":"number"}}}}"""), tdf.schema)
    assert(Validator.annotate(tdf, tsuite).select("valid")
      .as[Boolean].collect().toSeq == Seq(false))
  }
}

package graft

import graft.compile.SuiteCompiler
import graft.exec.Validator
import graft.spec.{Spec, SpecError}

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

  test("unsupported dynamic keywords fail at compile with typed errors") {
    val df = Seq((1, "{}")).toDF("k", "j")
    val e = intercept[SpecError] {
      SuiteCompiler.compile(Spec.fromJson(
        """{"columns":{"j":{"json":{"minProperties":1}}}}"""), df.schema)
    }
    assert(e.getMessage.contains("not supported in dynamic"))
  }
}

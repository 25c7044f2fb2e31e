package graft

import graft.exec.{Engine, Validator}
import graft.spec.{Spec, SpecError}
import graft.compile.SuiteCompiler
import org.apache.spark.sql.functions._

/** Row-level keyword semantics — conformance-style cases in the spirit of
  * the reference's test-suite runner (/root/reference/suite_test.go:28-103),
  * flattened to (spec, rows, expected verdicts).
  */
class EngineSpec extends SparkTestBase {
  import spark.implicits._

  private def validsOf(specJson: String, df: org.apache.spark.sql.DataFrame): Seq[Boolean] = {
    val suite = SuiteCompiler.compile(Spec.fromJson(specJson), df.schema)
    Validator.annotate(df, suite).orderBy("k").select("valid").as[Boolean].collect().toSeq
  }

  test("numeric bounds: minimum/maximum/exclusive/multipleOf") {
    val df = Seq((1, 5.0), (2, 8000.0), (3, 48000.0), (4, 96000.0), (5, 7999.5))
      .toDF("k", "v")
    val spec = """{"columns":{"v":{"minimum":8000,"maximum":48000}}}"""
    assert(validsOf(spec, df) == Seq(false, true, true, false, false))
    val mspec = """{"columns":{"v":{"multipleOf":2.5}}}"""
    val mdf = Seq((1, 5.0), (2, 7.5), (3, 7.6), (4, 0.1)).toDF("k", "v")
    assert(validsOf(mspec, mdf) == Seq(true, true, false, false))
  }

  test("string: minLength counts characters (rune semantics), pattern searches") {
    val df = Seq((1, "abc"), (2, "日本語"), (3, ""), (4, "ab")).toDF("k", "v")
    val spec = """{"columns":{"v":{"minLength":3}}}"""
    assert(validsOf(spec, df) == Seq(true, true, false, false))
    // pattern = substring search, not full match (validator.go:455-459)
    val pspec = """{"columns":{"v":{"pattern":"b"}}}"""
    assert(validsOf(pspec, df) == Seq(true, false, false, true))
  }

  test("enum + const with numeric cross-type equality (2 == 2.0)") {
    val df = Seq((1, 2.0), (2, 3.0), (3, 2.5)).toDF("k", "v")
    val spec = """{"columns":{"v":{"const":2}}}"""
    assert(validsOf(spec, df) == Seq(true, false, false))
    val espec = """{"columns":{"v":{"enum":[2, 2.5]}}}"""
    assert(validsOf(espec, df) == Seq(true, false, true))
  }

  test("type: integer is a zero-fraction predicate on numbers") {
    val df = Seq((1, 2.0), (2, 2.5)).toDF("k", "v")
    val spec = """{"columns":{"v":{"type":"integer"}}}"""
    assert(validsOf(spec, df) == Seq(true, false))
    val sspec = """{"columns":{"v":{"type":"string"}}}"""
    assert(validsOf(sspec, df) == Seq(false, false))
  }

  test("NULL is vacuous for keywords; required rejects it") {
    val df = Seq((1, Some("x")), (2, None)).toDF("k", "v")
    val spec = """{"columns":{"v":{"minLength":1}}}"""
    assert(validsOf(spec, df) == Seq(true, true))
    val rspec = """{"columns":{"v":{"minLength":1}},"required":["v"]}"""
    assert(validsOf(rspec, df) == Seq(true, false))
  }

  test("composition: anyOf/oneOf/not/if-then-else") {
    val df = Seq((1, 5), (2, 15), (3, 25)).toDF("k", "v")
    val anyOf = """{"columns":{"v":{"anyOf":[{"maximum":10},{"minimum":20}]}}}"""
    assert(validsOf(anyOf, df) == Seq(true, false, true))
    val oneOf = """{"columns":{"v":{"oneOf":[{"maximum":20},{"minimum":10}]}}}"""
    assert(validsOf(oneOf, df) == Seq(true, false, true)) // 15 matches both
    val notS = """{"columns":{"v":{"not":{"minimum":10}}}}"""
    assert(validsOf(notS, df) == Seq(true, false, false))
    val ite = """{"columns":{"v":{"if":{"minimum":10},"then":{"multipleOf":5},"else":{"multipleOf":2}}}}"""
    // 5 → else (mult 2? no) false; 15 → then (mult 5) true; 25 → true
    assert(validsOf(ite, df) == Seq(false, true, true))
  }

  test("$ref named blocks resolve; cycles rejected") {
    val df = Seq((1, 10), (2, 100)).toDF("k", "v")
    val spec =
      """{"$defs":{"small":{"maximum":50}},"columns":{"v":{"$ref":"#/$defs/small"}}}"""
    assert(validsOf(spec, df) == Seq(true, false))
    val cyc =
      """{"$defs":{"a":{"$ref":"#/$defs/b"},"b":{"$ref":"#/$defs/a"}},"columns":{"v":{"$ref":"#/$defs/a"}}}"""
    val err = intercept[SpecError](validsOf(cyc, df))
    assert(err.getMessage.contains("cyclic"))
  }

  test("arrays: minItems/uniqueItems/items/contains") {
    val df = Seq((1, Seq(1, 2, 3)), (2, Seq(1, 1)), (3, Seq.empty[Int]))
      .toDF("k", "v")
    assert(validsOf("""{"columns":{"v":{"minItems":1}}}""", df) == Seq(true, true, false))
    assert(validsOf("""{"columns":{"v":{"uniqueItems":true}}}""", df) == Seq(true, false, true))
    assert(validsOf("""{"columns":{"v":{"items":{"maximum":2}}}}""", df) == Seq(false, true, true))
    assert(validsOf("""{"columns":{"v":{"contains":{"minimum":3}}}}""", df) == Seq(true, false, false))
  }

  test("violation rows carry keyword path, instance location, detail") {
    val df = Seq((1, 96000), (2, 16000)).toDF("k", "sr_hz")
    val spec = """{"columns":{"sr_hz":{"minimum":8000,"maximum":48000}}}"""
    val suite = SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    val vios = Validator.violations(df, suite, Seq("k")).collect()
    assert(vios.length == 1)
    val r = vios(0)
    assert(r.getAs[Int]("k") == 1)
    assert(r.getAs[String]("keyword") == "columns/sr_hz/maximum")
    assert(r.getAs[String]("instance_path") == "sr_hz")
    assert(r.getAs[String]("detail") == "maximum: got 96000, want <= 48000")
  }

  test("negative compile: typed SpecErrors (metaschema analogue)") {
    val df = Seq((1, "x")).toDF("k", "v")
    def bad(spec: String, frag: String): Unit = {
      val e = intercept[SpecError](validsOf(spec, df))
      assert(e.getMessage.contains(frag), s"'${e.getMessage}' should contain '$frag'")
    }
    bad("""{"columns":{"v":{"frobnicate":1}}}""", "unknown keyword")
    bad("""{"columns":{"v":{"pattern":"["}}}""", "invalid regex")
    bad("""{"columns":{"v":{"minLength":-1}}}""", "non-negative")
    bad("""{"columns":{"v":{"multipleOf":0}}}""", "must be > 0")
    bad("""{"columns":{"v":{"format":"no-such"}}}""", "unknown format")
    bad("""{"columns":{"nope":{"minLength":1}}}""", "unknown column")
    bad("""{"columns":{"v":{"type":"frob"}}}""", "unknown type")
  }

  test("flag mode agrees with violation mode (boolResult equivalence)") {
    val df = Seq((1, 5, "a"), (2, 50, ""), (3, 500, "bb")).toDF("k", "n", "s")
    val spec =
      """{"columns":{"n":{"minimum":10,"maximum":100},"s":{"minLength":1}}}"""
    val suite = SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    val viaFlag = Validator.flag(df, suite).orderBy("k").select("valid").as[Boolean].collect().toSeq
    val viaAnn = Validator.annotate(df, suite).orderBy("k").select("valid").as[Boolean].collect().toSeq
    assert(viaFlag == viaAnn)
    assert(viaFlag == Seq(false, false, false))
  }

  test("combinatorial recursion unroll trips the compile-node budget with a typed error") {
    // 26 subschema positions each re-entering the root: 26^maxRefUnroll
    // expansions — the official-metaschema shape that would otherwise make
    // the compile effectively hang (minutes of Column construction)
    val props = (1 to 26).map(i => s""""p$i": {"$$ref": "#/$$defs/n"}""")
      .mkString(",")
    val spec =
      s"""{"$$defs": {"n": {"properties": {$props}}},
         |"columns": {"j": {"json": {"$$ref": "#/$$defs/n"}}}}""".stripMargin
    val df = Seq((1, "{}")).toDF("k", "j")
    val e = intercept[graft.spec.SpecError] {
      SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    }
    assert(e.getMessage.contains("schema-node expansions"))
  }

  test("JSON content validation: contentMediaType + contentSchema") {
    val df = Seq((1, """{"kk": 5}"""), (2, "not json"), (3, """{"kk": -1}"""))
      .toDF("k", "props")
    val spec =
      """{"columns":{"props":{"contentMediaType":"application/json",
           "contentSchema":{"type":"object","properties":{"kk":{"type":"integer","minimum":0}}}}}}"""
    assert(validsOf(spec, df) == Seq(true, false, false))
  }
}

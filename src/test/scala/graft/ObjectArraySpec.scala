package graft

import graft.compile.SuiteCompiler
import graft.exec.Validator
import graft.spec.Spec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Object (struct + map) and array keyword semantics
  * (/root/reference/validator.go:198-430) over nested Spark columns.
  */
class ObjectArraySpec extends SparkTestBase {
  import spark.implicits._

  private def validsOf(specJson: String, df: org.apache.spark.sql.DataFrame): Seq[Boolean] = {
    val suite = SuiteCompiler.compile(Spec.fromJson(specJson), df.schema)
    Validator.annotate(df, suite).orderBy("k").select("valid").as[Boolean].collect().toSeq
  }

  test("struct column: properties + nested required + bounds") {
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("o", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1, Row(5, "x")),
        Row(2, Row(500, "x")),
        Row(3, Row(5, null)),
        Row(4, null)),
      schema)
    val spec =
      """{"columns":{"o":{"type":"object",
           "properties":{"a":{"maximum":100},"b":{"minLength":1}},
           "required":["b"]}}}"""
    // row3: b null → required fails; row4: o null → vacuous
    assert(validsOf(spec, df) == Seq(true, false, false, true))
  }

  test("struct: dependentRequired + min/maxProperties count non-null fields") {
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("o", StructType(Seq(
        StructField("cc", StringType), StructField("addr", StringType))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1, Row("visa", "street")),
        Row(2, Row("visa", null)),
        Row(3, Row(null, null))),
      schema)
    val dep = """{"columns":{"o":{"dependentRequired":{"cc":["addr"]}}}}"""
    assert(validsOf(dep, df) == Seq(true, false, true))
    val minp = """{"columns":{"o":{"minProperties":1}}}"""
    assert(validsOf(minp, df) == Seq(true, true, false))
  }

  test("map column: required/properties/patternProperties/propertyNames/additionalProperties") {
    val df = Seq(
      (1, Map("size" -> "10", "x_extra" -> "v")),
      (2, Map("size" -> "oops")),
      (3, Map("other" -> "v")),
      (4, Map.empty[String, String])).toDF("k", "m")
    val req = """{"columns":{"m":{"required":["size"]}}}"""
    assert(validsOf(req, df) == Seq(true, true, false, false))
    val props = """{"columns":{"m":{"properties":{"size":{"pattern":"^[0-9]+$"}}}}}"""
    assert(validsOf(props, df) == Seq(true, false, true, true))
    val patProps = """{"columns":{"m":{"patternProperties":{"^x_":{"minLength":1}}}}}"""
    assert(validsOf(patProps, df) == Seq(true, true, true, true))
    val names = """{"columns":{"m":{"propertyNames":{"pattern":"^[a-z]+$"}}}}"""
    assert(validsOf(names, df) == Seq(false, true, true, true)) // "x_extra" has '_'
    val closed =
      """{"columns":{"m":{"properties":{"size":{}},"additionalProperties":false}}}"""
    assert(validsOf(closed, df) == Seq(false, true, false, true))
    val addSchema =
      """{"columns":{"m":{"properties":{"size":{}},
          "additionalProperties":{"maxLength":0}}}}"""
    assert(validsOf(addSchema, df) == Seq(false, true, false, true))
  }

  test("arrays: prefixItems + items-after-prefix + min/maxContains") {
    val df = Seq(
      (1, Seq(10, 1, 1)),
      (2, Seq(10, 99)),
      (3, Seq(99)),
      (4, Seq.empty[Int])).toDF("k", "a")
    val prefix =
      """{"columns":{"a":{"prefixItems":[{"minimum":10}],"items":{"maximum":50}}}}"""
    // r1: prefix ok, rest (1,1) <= 50 ok; r2: rest (99) fails items;
    // r3: prefix fails (99 >= 10 ok! wait 99 >= 10 true) → valid... rest empty
    assert(validsOf(prefix, df) == Seq(true, false, true, true))
    val contains =
      """{"columns":{"a":{"contains":{"minimum":50},"minContains":1,"maxContains":1}}}"""
    assert(validsOf(contains, df) == Seq(false, true, true, false))
  }

  test("dependentSchemas: key present gates the whole-object schema (draft2020-12 suite shape)") {
    // mirrors JSON-Schema-Test-Suite draft2020-12/dependentSchemas.json:
    // {"dependentSchemas":{"bar":{"properties":{"foo":{...}},"required":[...]}}}
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("o", StructType(Seq(
        StructField("foo", IntegerType), StructField("bar", StringType))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1, Row(5, "b")),      // bar present, foo <= 10 → valid
        Row(2, Row(50, "b")),     // bar present, foo > 10 → invalid
        Row(3, Row(50, null)),    // bar absent → schema not applied → valid
        Row(4, Row(null, "b")),   // bar present, foo absent → required fails
        Row(5, null)),            // whole object absent → vacuous
      schema)
    val spec =
      """{"columns":{"o":{"dependentSchemas":{"bar":{
           "properties":{"foo":{"maximum":10}},"required":["foo"]}}}}}"""
    assert(validsOf(spec, df) == Seq(true, false, true, false, true))
    // keyword path points into dependentSchemas
    val suite = SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    val vios = Validator.violations(df, suite, Seq("k"))
      .select("keyword").as[String].collect().toSet
    assert(vios.contains("columns/o/dependentSchemas/bar/properties/foo/maximum"))
    assert(vios.contains("columns/o/dependentSchemas/bar/required"))
  }

  test("dependentSchemas over map columns") {
    val df = Seq(
      (1, Map("credit_card" -> "1234", "billing_address" -> "street")),
      (2, Map("credit_card" -> "1234")),
      (3, Map("name" -> "x"))).toDF("k", "m")
    val spec =
      """{"columns":{"m":{"dependentSchemas":{
           "credit_card":{"required":["billing_address"]}}}}}"""
    assert(validsOf(spec, df) == Seq(true, false, true))
  }

  test("unevaluatedProperties=false: struct + map, merged with allOf/$ref evaluations") {
    // struct: field not mentioned by properties (incl. via allOf) must be absent
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("o", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType),
        StructField("c", StringType))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1, Row(1, "x", null)),
        Row(2, Row(1, "x", "boo")),
        Row(3, Row(1, null, null))),
      schema)
    val spec =
      """{"columns":{"o":{
           "properties":{"a":{}},
           "allOf":[{"properties":{"b":{}}}],
           "unevaluatedProperties":false}}}"""
    assert(validsOf(spec, df) == Seq(true, false, true))
    // map: residual keys against the merged evaluated set (incl. patterns)
    val dfm = Seq(
      (1, Map("a" -> "1", "x_b" -> "2")),
      (2, Map("a" -> "1", "zzz" -> "2"))).toDF("k", "m")
    val specm =
      """{"columns":{"m":{
           "properties":{"a":{}},
           "allOf":[{"patternProperties":{"^x_":{}}}],
           "unevaluatedProperties":false}}}"""
    assert(validsOf(specm, dfm) == Seq(true, false))
    // schema form: unevaluated values must match the subschema
    val specs =
      """{"columns":{"m":{"properties":{"a":{}},
           "unevaluatedProperties":{"maxLength":1}}}}"""
    assert(validsOf(specs, dfm) == Seq(true, true))
    // additionalProperties present → everything evaluated → vacuous
    val specAll =
      """{"columns":{"m":{"properties":{"a":{}},
           "additionalProperties":{"minLength":0},
           "unevaluatedProperties":false}}}"""
    assert(validsOf(specAll, dfm) == Seq(true, true))
  }

  test("unevaluatedItems: static prefix lowering; dynamic evaluated sets rejected") {
    val df = Seq(
      (1, Seq(10)),
      (2, Seq(10, 99)),
      (3, Seq.empty[Int])).toDF("k", "a")
    val closed =
      """{"columns":{"a":{"prefixItems":[{"minimum":10}],"unevaluatedItems":false}}}"""
    assert(validsOf(closed, df) == Seq(true, false, true))
    val schemaForm =
      """{"columns":{"a":{"prefixItems":[{"minimum":10}],
           "unevaluatedItems":{"maximum":50}}}}"""
    assert(validsOf(schemaForm, df) == Seq(true, false, true))
    // `items` present → all items evaluated → vacuous
    val allEval =
      """{"columns":{"a":{"items":{"maximum":1000},"unevaluatedItems":false}}}"""
    assert(validsOf(allEval, df) == Seq(true, true, true))
    // contains in the UNCONDITIONAL closure now lowers (matched items count
    // evaluated, per-element predicate); rows are [10], [10,99], []
    // every element contained -> uneval:false vacuous; [] fails contains itself
    val allContained =
      """{"columns":{"a":{"contains":{"minimum":10},"unevaluatedItems":false}}}"""
    assert(validsOf(allContained, df) == Seq(true, true, false))
    // [10,99]: contains ok (99) but 10 is NOT contained -> uneval:false bites
    val closedContains =
      """{"columns":{"a":{"contains":{"minimum":99},"unevaluatedItems":false}}}"""
    assert(validsOf(closedContains, df) == Seq(false, false, false))
    // schema form: element must match contains OR the uneval schema —
    // [10,99] valid (99 contained, 10 <= 10); [10] fails contains itself
    val mixed =
      """{"columns":{"a":{"contains":{"minimum":50},
           "unevaluatedItems":{"maximum":10}}}}"""
    assert(validsOf(mixed, df) == Seq(false, true, false))
    // contains INSIDE a runtime branch (r4c): matched elements count
    // evaluated ONLY when the branch validates — [10,99] has 99 matching
    // branch 1's contains, but maxItems:1 fails the branch, so the
    // annotation is dropped and 99 stays unevaluated (2020-12 annotation
    // flow); rows are [10], [10,99], []
    val containsInBranch =
      """{"columns":{"a":{"anyOf":[
           {"contains":{"minimum":50},"maxItems":1},
           {"prefixItems":[{"maximum":20}]}],
           "unevaluatedItems":false}}}"""
    assert(validsOf(containsInBranch, df) == Seq(true, false, true))
    // same shape, branch VALIDATES for [10,99] (no maxItems): 99 is
    // contained under the validating branch, 10 covered by the prefix
    val containsInBranchOk =
      """{"columns":{"a":{"anyOf":[
           {"contains":{"minimum":50}},
           {"prefixItems":[{"maximum":20}]}],
           "unevaluatedItems":false}}}"""
    assert(validsOf(containsInBranchOk, df) == Seq(true, true, true))
    // oneOf-dependent evaluated sets now compile via the RUNTIME branch-set
    // lowering (round-4): keys are evaluated iff their branch validates
    val dfm = Seq(
      (1, Map("a" -> "1")),
      (2, Map("a" -> "1", "c" -> "x"))).toDF("k", "m")
    val oneOfSpec =
      """{"columns":{"m":{"oneOf":[{"required":["a"],"properties":{"a":{}}},
          {"required":["b"],"properties":{"b":{}}}],
          "unevaluatedProperties":false}}}"""
    assert(validsOf(oneOfSpec, dfm) == Seq(true, false))
  }

  test("object const over struct + map: structural deep equality incl. numeric cross-type") {
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("o", StructType(Seq(
        StructField("a", DoubleType), StructField("b", StringType))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1, Row(2.0, "x")),   // 2.0 == const 2 (cross-type), b matches
        Row(2, Row(2.5, "x")),   // a differs
        Row(3, Row(2.0, null)),  // b absent but const requires it
        Row(4, null)),           // whole object absent → vacuous
      schema)
    val spec = """{"columns":{"o":{"const":{"a":2,"b":"x"}}}}"""
    assert(validsOf(spec, df) == Seq(true, false, false, true))
    // extra non-null field breaks equality
    val spec2 = """{"columns":{"o":{"const":{"a":2}}}}"""
    assert(validsOf(spec2, df) == Seq(false, false, true, true))
    // map column
    val dfm = Seq(
      (1, Map("a" -> "1", "b" -> "2")),
      (2, Map("a" -> "1")),
      (3, Map("a" -> "1", "b" -> "2", "c" -> "3"))).toDF("k", "m")
    val specm = """{"columns":{"m":{"const":{"a":"1","b":"2"}}}}"""
    assert(validsOf(specm, dfm) == Seq(true, false, false))
  }

  test("propertyNames over struct: static field names checked when present") {
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("o", StructType(Seq(
        StructField("good", IntegerType), StructField("BAD", IntegerType))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1, Row(1, null)),  // only lowercase-named field present → valid
        Row(2, Row(1, 2)),     // 'BAD' present → name fails pattern
        Row(3, null)),
      schema)
    val spec = """{"columns":{"o":{"propertyNames":{"pattern":"^[a-z]+$"}}}}"""
    assert(validsOf(spec, df) == Seq(true, false, true))
  }

  test("static numeric checks fall back to double past Decimal(38,12) range") {
    val df = Seq((1, 1.0e30), (2, 2.5), (3, 5.0)).toDF("k", "v")
    // 1e30 IS an integer-valued double — must not fail closed on decimal overflow
    val ty = """{"columns":{"v":{"type":"integer"}}}"""
    assert(validsOf(ty, df) == Seq(true, false, true))
    val bound = """{"columns":{"v":{"minimum":3}}}"""
    assert(validsOf(bound, df) == Seq(true, false, true))
  }

  test("numeric fidelity: const/enum cross-type equality on decimals (Extra-Test-Suite const.json)") {
    val df = Seq((1, BigDecimal("2.0")), (2, BigDecimal("2.5")), (3, BigDecimal("2.00")))
      .toDF("k", "v")
    val spec = """{"columns":{"v":{"const":2}}}"""
    assert(validsOf(spec, df) == Seq(true, false, true))
  }

  test("nested unevaluated* in allOf counts as all-evaluated (annotates everything)") {
    // inner schema-form unevaluatedProperties evaluates every property, so
    // the outer false sees nothing unevaluated → all valid
    val dfm = Seq((1, Map("a" -> "1", "zzz" -> "2"))).toDF("k", "m")
    val spec =
      """{"columns":{"m":{
           "allOf":[{"unevaluatedProperties":{"minLength":0}}],
           "unevaluatedProperties":false}}}"""
    assert(validsOf(spec, dfm) == Seq(true))
    val dfa = Seq((1, Seq(1L, 2L, 3L))).toDF("k", "a")
    val specA =
      """{"columns":{"a":{
           "allOf":[{"unevaluatedItems":{"maximum":100}}],
           "unevaluatedItems":false}}}"""
    assert(validsOf(specA, dfa) == Seq(true))
  }

  test("out-of-Decimal(38,12) literals take the double arm (no rounding, no div-by-zero)") {
    val df = Seq((1, 2.0e-13), (2, 3.0e-13), (3, 1.0e-13)).toDF("k", "v")
    // divisor 1e-13 would round to ZERO in Decimal(38,12) → ANSI
    // DIVIDE_BY_ZERO without the guard; double arm: 2e-13 and 3e-13 are
    // exact multiples of 1e-13? floating-point: 2e-13 pmod 1e-13 — allow
    // either verdict, the point is NO exception and no all-rows-flagged
    val spec = """{"columns":{"v":{"multipleOf":1e-13}}}"""
    val suite = SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    Validator.annotate(df, suite).select("valid").collect() // must not throw
    // bound 1e-13 would round to 0 → -5e-14 would wrongly pass minimum
    val df2 = Seq((1, 5.0e-14), (2, 2.0e-13)).toDF("k", "v")
    val bound = """{"columns":{"v":{"minimum":1e-13}}}"""
    assert(validsOf(bound, df2) == Seq(false, true))
  }

  test("compiled checks carry typed ErrorKinds (kind ADT, reference kind/kind.go)") {
    import graft.compile.ErrorKind
    val df = Seq((1, 5.0, "abc")).toDF("k", "num", "s")
    val suite = SuiteCompiler.compile(Spec.fromJson(
      """{"columns":{
           "num":{"minimum":3,"multipleOf":0.5},
           "s":{"pattern":"^a","maxLength":10,"format":"uuid"}},
          "required":["k"]}"""), df.schema)
    val kinds = suite.rowChecks.map(_.kind).toSet
    assert(kinds.contains(ErrorKind.Minimum(BigDecimal(3))))
    assert(kinds.contains(ErrorKind.MultipleOf(BigDecimal("0.5"))))
    assert(kinds.contains(ErrorKind.PatternK("^a")))
    assert(kinds.contains(ErrorKind.MaxLength(10)))
    assert(kinds.contains(ErrorKind.FormatK("uuid")))
    assert(kinds.contains(ErrorKind.RequiredK("k")))
    // kind keyword matches the keywordPath leaf for every compiled check
    suite.rowChecks.foreach { c =>
      assert(c.keywordPath.split("/").contains(c.kind.keyword) ||
        c.kind.keyword == "required", s"${c.keywordPath} vs ${c.kind}")
    }
  }

  test("violation rows for nested paths carry the inner instance location") {
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("o", StructType(Seq(StructField("a", IntegerType))))))
    val df = spark.createDataFrame(
      java.util.List.of(Row(1, Row(500))), schema)
    val spec = """{"columns":{"o":{"properties":{"a":{"maximum":100}}}}}"""
    val suite = SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    val v = Validator.violations(df, suite, Seq("k")).collect()(0)
    assert(v.getAs[String]("keyword") == "columns/o/properties/a/maximum")
    assert(v.getAs[String]("instance_path") == "o/a")
  }

  test("uneval closure behind $dynamicRef resolves through the compile-time scope chain (r4c)") {
    // the walkers resolve `$dynamicRef` with the SAME outermost-anchor rule
    // the main compile path inlines with (Refs.resolveDynamic), so the keys
    // its target evaluates join the evaluated set instead of the former
    // typed rejection. STATIC arm first: dynRef inside allOf (unconditional
    // closure) — x is evaluated via the anchor target, z is not.
    val dfm = Seq(
      (1, Map("a" -> "1", "x" -> "2")),
      (2, Map("a" -> "1", "x" -> "2", "z" -> "3"))).toDF("k", "m")
    val staticSpec =
      """{"$defs":{"p":{"$dynamicAnchor":"p","properties":{"x":{}}}},
          "columns":{"m":{"properties":{"a":{}},
          "allOf":[{"$dynamicRef":"#p"}],
          "unevaluatedProperties":false}}}"""
    assert(validsOf(staticSpec, dfm) == Seq(true, false))
    // RUNTIME arm: dynRef inside an anyOf branch — its target's keys count
    // evaluated ONLY when the branch validates (2020-12 annotation flow);
    // branch 2 (minProperties) keeps anyOf green when branch 1 fails
    val dfr = Seq(
      (1, Map("a" -> "1", "x" -> "2")),   // p validates -> x evaluated
      (2, Map("a" -> "1", "x" -> "22")),  // p fails (maxLength) -> x unevaluated
      (3, Map("a" -> "1"))).toDF("k", "m")
    val runtimeSpec =
      """{"$defs":{"p":{"$dynamicAnchor":"p",
            "properties":{"x":{"maxLength":1}}}},
          "columns":{"m":{"properties":{"a":{}},
          "anyOf":[{"$dynamicRef":"#p"},{"minProperties":0}],
          "unevaluatedProperties":false}}}"""
    assert(validsOf(runtimeSpec, dfr) == Seq(true, false, true))
  }

  test("unevaluatedItems closure behind $dynamicRef: prefix from the anchor target (r4c)") {
    val df = Seq(
      (1, Seq(5L)),      // prefix covers the single element
      (2, Seq(5L, 7L)),  // second element beyond the evaluated prefix
      (3, Seq.empty[Long])).toDF("k", "a")
    val spec =
      """{"$defs":{"t":{"$dynamicAnchor":"t","prefixItems":[{"maximum":10}]}},
          "columns":{"a":{"anyOf":[{"$dynamicRef":"#t"},{"maxItems":0}],
          "unevaluatedItems":false}}}"""
    assert(validsOf(spec, df) == Seq(true, false, true))
  }

  test("bounded-unroll recursion WITH an unevaluatedProperties closure compiles (no false cycle)") {
    // wrap recurses through a data descent (properties/inner) — legal under
    // bounded unroll — and the recursion loop contains an
    // unevaluatedProperties check; the evaluated-set walkers must not read
    // the compiler's unroll stack as a cycle of their own walk
    val innermost = StructType(Seq(StructField("extra", StringType)))
    val mid = StructType(Seq(
      StructField("inner", innermost), StructField("extra", StringType)))
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("o", StructType(Seq(StructField("inner", mid))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1, Row(Row(Row(null), null))), // no extras anywhere -> valid
        Row(2, Row(Row(Row(null), "y"))),  // mid.extra unevaluated -> invalid
        Row(3, Row(Row(Row("z"), null)))), // innermost.extra unevaluated -> invalid
      schema)
    val spec =
      """{"$defs":{"wrap":{"type":"object","properties":{
           "inner":{"allOf":[{"$ref":"#/$defs/wrap"}],
                    "unevaluatedProperties":false}}}},
          "columns":{"o":{"$ref":"#/$defs/wrap"}}}"""
    assert(validsOf(spec, df) == Seq(true, false, false))
  }

  test("runtime uneval arm with a recursive $ref branch: contributions compile, no false cycle") {
    // the anyOf branch recurses into wrap (a data-descent recursion); the
    // runtime branch-set walker must fold its evaluated keys instead of
    // reading the unroll as a cycle
    val innermost = StructType(Seq(StructField("alt", StringType)))
    val mid = StructType(Seq(
      StructField("inner", innermost), StructField("alt", StringType),
      StructField("extra", StringType)))
    val schema = StructType(Seq(
      StructField("k", IntegerType),
      StructField("o", StructType(Seq(StructField("inner", mid))))))
    val df = spark.createDataFrame(
      java.util.List.of(
        Row(1, Row(Row(Row(null), "x", null))),    // alt evaluated by branch2
        Row(2, Row(Row(Row(null), "x", "boom"))),  // extra never evaluated
        Row(3, Row(Row(Row("y"), null, null)))),   // inner evaluated by branch1
      schema)
    val spec =
      """{"$defs":{"wrap":{"type":"object","properties":{
           "inner":{"anyOf":[{"$ref":"#/$defs/wrap"},
                             {"required":["alt"],"properties":{"alt":{}}}],
                    "unevaluatedProperties":false}}}},
          "columns":{"o":{"$ref":"#/$defs/wrap"}}}"""
    assert(validsOf(spec, df) == Seq(true, false, true))
  }
}

package graft

import graft.output.Output
import graft.output.Output.Unit

/** Output renderers vs the reference's formats (/root/reference/output.go):
  * flat basic units, hierarchical detailed with single-child elision, simple
  * text.
  */
class OutputSpec extends SparkTestBase {

  private val units = Seq(
    Unit("columns/sr_hz/maximum", "abc/sr_hz", "maximum: got 96000, want <= 48000"),
    Unit("columns/sr_hz/maximum", "def/sr_hz", "maximum: got 95000, want <= 48000"),
    Unit("columns/codec/enum", "abc/codec", "enum: got codec_9"))

  test("flag output") {
    assert(Output.flagJson(true) == """{"valid":true}""")
    assert(Output.flagJson(false) == """{"valid":false}""")
  }

  test("basic output: flat unit list with keyword + instance locations") {
    val json = Output.basicJson(units)
    assert(json.startsWith("""{"valid":false,"errors":["""))
    assert(json.contains(""""keywordLocation":"/columns/sr_hz/maximum""""))
    assert(json.contains(""""instanceLocation":"/abc/sr_hz""""))
    assert(json.contains(""""error":"enum: got codec_9""""))
    assert(Output.basicJson(Nil) == """{"valid":true,"errors":[]}""")
    // valid JSON (Jackson parses it)
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
  }

  test("detailed output: hierarchy along keyword path, single-child chains elided") {
    val json = Output.detailedJson(units)
    new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    // 'columns' has two children (sr_hz, codec) so it is a real node...
    assert(json.contains(""""keywordLocation":"/columns""""))
    // ...but the sr_hz -> maximum single-child chain collapses into one node
    assert(json.contains(""""keywordLocation":"/sr_hz/maximum""""))
    assert(json.contains(""""keywordLocation":"/codec/enum""""))
    // both sr_hz failures grouped under the same node
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val tree = mapper.readTree(json)
    assert(Output.detailedJson(Nil) == """{"valid":true}""")
    assert(tree.toString.contains("96000") && tree.toString.contains("95000"))
  }

  test("simple text: counts are honest, groups sorted") {
    val txt = Output.simpleText(units, totalViolations = 42)
    assert(txt.startsWith("invalid: 42 violation(s)"))
    assert(txt.contains("- columns/codec/enum (showing 1 of 1 collected)"))
    assert(txt.contains("- columns/sr_hz/maximum (showing 2 of 2 collected)"))
    assert(txt.contains("    at abc/sr_hz: maximum: got 96000"))
  }

  test("alt text: verbose lines carry the #-relative keyword location") {
    val txt = Output.altText(units, totalViolations = 42)
    assert(txt.startsWith("invalid: 42 violation(s)"))
    assert(txt.contains("- at abc/sr_hz [#/columns/sr_hz/maximum]: maximum: got 96000"))
  }

  test("self-conformance: the engine validates its own rendered outputs " +
      "(output_test.go:15-141 analogue)") {
    import graft.output.OutputSchema
    // flag
    assert(OutputSchema.violations(spark, Output.flagJson(true), "flag").isEmpty)
    assert(OutputSchema.violations(spark, Output.flagJson(false), "flag").isEmpty)
    // basic — with units, empty, and nasty escaping
    assert(OutputSchema.violations(spark, Output.basicJson(units), "basic").isEmpty)
    assert(OutputSchema.violations(spark, Output.basicJson(Nil), "basic").isEmpty)
    val nasty = Seq(Unit("""a"b\c""", "p\nq", "d\te"))
    assert(OutputSchema.violations(spark, Output.basicJson(nasty), "basic").isEmpty)
    // detailed — hierarchical with elided chains, and the valid-only form
    assert(OutputSchema.violations(spark, Output.detailedJson(units), "detailed").isEmpty)
    assert(OutputSchema.violations(spark, Output.detailedJson(Nil), "detailed").isEmpty)
    // units rendered from a REAL engine run round-trip too
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("a", 96000), org.apache.spark.sql.Row("b", 100)),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("sr",
          org.apache.spark.sql.types.IntegerType))))
    val suite = graft.compile.SuiteCompiler.compile(
      graft.spec.Spec.fromJson("""{"columns":{"sr":{"minimum":8000,"maximum":48000}}}"""),
      df.schema)
    val real = Output.collect(graft.exec.Validator.violations(df, suite, Seq("id")))
    assert(real.nonEmpty)
    assert(OutputSchema.violations(spark, Output.basicJson(real), "basic").isEmpty)
    assert(OutputSchema.violations(spark, Output.detailedJson(real), "detailed").isEmpty)
  }

  test("self-conformance: renderer drift is CAUGHT (negative cases)") {
    import graft.output.OutputSchema
    // missing required 'errors' in basic
    assert(OutputSchema.violations(spark, """{"valid":false}""", "basic")
      .exists(_._1.contains("required")))
    // unit with valid:true (must be const false) — unit-level breakage
    // surfaces as the containing array's items check
    assert(OutputSchema.violations(spark,
      """{"valid":false,"errors":[{"valid":true,"keywordLocation":"/x",
         "instanceLocation":"/y","error":"e"}]}""".replace("\n", ""), "basic")
      .exists(_._1.contains("errors/items")))
    // keywordLocation not a JSON pointer
    assert(OutputSchema.violations(spark,
      """{"valid":false,"errors":[{"valid":false,"keywordLocation":"x",
         "instanceLocation":"/y","error":"e"}]}""".replace("\n", ""), "basic")
      .exists(_._1.contains("errors/items")))
    // unknown field sneaking into a detailed node
    assert(OutputSchema.violations(spark,
      """{"valid":false,"keywordLocation":"/a","oops":1}""", "detailed")
      .exists(_._1.contains("additionalProperties")))
    // malformed JSON
    assert(OutputSchema.violations(spark, "{broken", "flag")
      .exists(_._1.contains("!parse")))
  }

  test("escaping: quotes, backslashes, control chars survive JSON rendering") {
    val nasty = Seq(Unit("""a"b\c""", "p\nq", "d\te"))
    val json = Output.basicJson(nasty)
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(tree.get("errors").get(0).get("keywordLocation").asText() == "/a\"b\\c")
  }
  test("Messages: locale catalogs render typed kinds; partial catalogs fall back per kind") {
    import graft.output.{Messages, Output}
    import graft.compile.ErrorKind
    assert(Messages.render(ErrorKind.Minimum(5)) == "value must be >= 5")
    // partial German catalog: untranslated kinds fall back to English
    Messages.register("de", {
      case ErrorKind.Minimum(b)   => s"Wert muss >= $b sein"
      case ErrorKind.RequiredK(p) => s"Eigenschaft '$p' ist erforderlich"
    })
    assert(Messages.render(ErrorKind.Minimum(5), "de") == "Wert muss >= 5 sein")
    assert(Messages.render(ErrorKind.MaxLength(3), "de") == "length must be <= 3 characters")
    assert(Messages.render(ErrorKind.Minimum(5), "xx") == "value must be >= 5")
    // suite-level index + unit localization
    import spark.implicits._
    val df = Seq((1, 4000)).toDF("id", "sr_hz")
    val suite = graft.compile.SuiteCompiler.compile(
      graft.spec.Spec.fromJson("""{"columns":{"sr_hz":{"minimum":8000}}}"""),
      df.schema)
    val idx2 = Messages.forSuite(suite, "de")
    assert(idx2("columns/sr_hz/minimum") == "Wert muss >= 8000 sein")
    val us = Output.collect(
      graft.exec.Validator.violations(df, suite, Seq("id")))
    val localized = Output.localize(us, idx2)
    assert(localized.head.detail == "Wert muss >= 8000 sein")
    // every ErrorKind case renders something better than the bare keyword
    val kinds: Seq[ErrorKind] = Seq(ErrorKind.FalseSchema, ErrorKind.NotK,
      ErrorKind.AnyOfK, ErrorKind.OneOfK(2), ErrorKind.TypeMismatch(Set("string")),
      ErrorKind.EnumK(Seq("a")), ErrorKind.ConstK("1"), ErrorKind.FormatK("uuid"),
      ErrorKind.Minimum(1), ErrorKind.Maximum(1), ErrorKind.ExclusiveMinimum(1),
      ErrorKind.ExclusiveMaximum(1), ErrorKind.MultipleOf(2), ErrorKind.MinLength(1),
      ErrorKind.MaxLength(1), ErrorKind.PatternK("x"), ErrorKind.ContentEncodingK("base64"),
      ErrorKind.ContentMediaTypeK("application/json"), ErrorKind.ParseError,
      ErrorKind.MinItems(1), ErrorKind.MaxItems(1), ErrorKind.UniqueItemsK,
      ErrorKind.ItemsK, ErrorKind.PrefixItemsK(0), ErrorKind.ContainsK(1, None),
      ErrorKind.UnevaluatedItemsK, ErrorKind.MinProperties(1), ErrorKind.MaxProperties(1),
      ErrorKind.RequiredK("p"), ErrorKind.DependentRequiredK("a", Seq("b")),
      ErrorKind.AdditionalPropertiesK, ErrorKind.PropertyNamesK("p"),
      ErrorKind.PatternPropertiesK("x"), ErrorKind.PropertiesK("k"),
      ErrorKind.UnevaluatedPropertiesK, ErrorKind.DepthExceeded(4),
      ErrorKind.TableConstraintK("unique"), ErrorKind.CustomK("zz"))
    kinds.foreach(k => assert(Messages.render(k) != k.keyword, k.toString))
  }

  test("Messages.forSuite indexes table-constraint keyword paths (not just row checks)") {
    import graft.spec.{Spec, Unique, ForeignKey, Drift}
    import graft.output.Messages
    val spec = Spec(
      columns = Vector.empty, required = Vector.empty,
      rowRules = Vector.empty,
      table = Vector(
        Unique(Vector("clip_id")),
        ForeignKey(Vector("codec"), "ref_codecs", Vector("codec")),
        Drift("dur_ms", "psi", 0.2, Vector(0, 1), Vector(0.3, 0.4, 0.3))),
      defs = Map.empty)
    val suite = graft.compile.CompiledSuite(spec, Nil, spec.table)
    Messages.register("xx", { case graft.compile.ErrorKind.TableConstraintK(f) =>
      s"xx:$f" })
    val idx = Messages.forSuite(suite, "xx")
    assert(idx.get("table/unique/clip_id").contains("xx:unique"), idx.toString)
    assert(idx.get("table/foreignKey/codec->ref_codecs").contains("xx:foreignKey"))
    assert(idx.get("table/drift/psi/dur_ms").contains("xx:drift"))
    // the emitter and the index share ONE keywordPath definition
    assert(spec.table.collect { case u: Unique => u.keywordPath }
      == Seq("table/unique/clip_id"))
  }
}

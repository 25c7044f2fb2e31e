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

  test("numeric fidelity: const/enum cross-type equality on decimals (Extra-Test-Suite const.json)") {
    val df = Seq((1, BigDecimal("2.0")), (2, BigDecimal("2.5")), (3, BigDecimal("2.00")))
      .toDF("k", "v")
    val spec = """{"columns":{"v":{"const":2}}}"""
    assert(validsOf(spec, df) == Seq(true, false, true))
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
}

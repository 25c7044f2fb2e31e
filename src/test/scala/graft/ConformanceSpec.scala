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

  private val mapper = new ObjectMapper()

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
    "refs.json", "draft7_compat.json", "crossdoc.json")

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
}

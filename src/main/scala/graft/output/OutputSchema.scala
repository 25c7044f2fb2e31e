package graft.output

import graft.compile.SuiteCompiler
import graft.exec.Validator
import graft.spec.Spec
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import scala.jdk.CollectionConverters._

/** Spec-language port of the official JSON-Schema output schemas, enforced by
  * the engine's own dynamic `json` keyword — the self-check the reference
  * runs over its renderers (/root/reference/output_test.go:15-141, which
  * validates Basic/Detailed output against the published output schema).
  * Renderer drift (a missing required field, a mistyped `valid`) becomes an
  * engine violation instead of a silent format change.
  *
  * `detailed` output nests along keyword-path segments, so its schema is
  * recursive; the engine inlines refs at compile time, so we unroll to a
  * fixed depth (nesting depth is bounded by keyword-path length — depth 12
  * covers every path the compiler can emit; deeper nodes degrade to a bare
  * object check rather than failing).
  */
object OutputSchema {

  private val unitSchema: String =
    """{"type":"object",
        "required":["valid","keywordLocation","instanceLocation","error"],
        "properties":{
          "valid":{"const":false},
          "keywordLocation":{"type":"string","pattern":"^/"},
          "instanceLocation":{"type":"string","pattern":"^/"},
          "error":{"type":"string"}},
        "additionalProperties":false}"""

  val flagSchema: String =
    """{"type":"object","required":["valid"],
        "properties":{"valid":{"type":"boolean"}},
        "additionalProperties":false}"""

  val basicSchema: String =
    s"""{"type":"object","required":["valid","errors"],
         "properties":{
           "valid":{"type":"boolean"},
           "errors":{"type":"array","items":$unitSchema}},
         "additionalProperties":false}"""

  /** Detailed-output node schema unrolled to `depth` levels. */
  def detailedSchema(depth: Int): String = {
    def node(d: Int): String =
      if (d <= 0) """{"type":"object"}"""
      else
        s"""{"type":"object","required":["valid"],
             "properties":{
               "valid":{"type":"boolean"},
               "keywordLocation":{"type":"string"},
               "errors":{"type":"array","minItems":1,
                 "items":{"type":"object",
                   "required":["instanceLocation","error"],
                   "properties":{
                     "instanceLocation":{"type":"string","pattern":"^/"},
                     "error":{"type":"string"}},
                   "additionalProperties":false}},
               "details":{"type":"array","minItems":1,"items":${node(d - 1)}}},
             "additionalProperties":false}"""
    node(depth)
  }

  private def specFor(format: String): Spec = {
    val schema = format match {
      case "flag"     => flagSchema
      case "basic"    => basicSchema
      case "detailed" => detailedSchema(12)
      case other => throw graft.spec.SpecError("output",
        s"no output schema for format '$other' (flag|basic|detailed)")
    }
    Spec.fromJson(s"""{"columns":{"out":{"json":$schema}}}""")
  }

  private val inputSchema =
    StructType(Seq(StructField("out", StringType, nullable = true)))

  // compiled once per format per classloader — the specs are constants
  private lazy val suites = Map(
    "flag" -> SuiteCompiler.compile(specFor("flag"), inputSchema),
    "basic" -> SuiteCompiler.compile(specFor("basic"), inputSchema),
    "detailed" -> SuiteCompiler.compile(specFor("detailed"), inputSchema))

  /** Engine-validate a rendered output document. Empty = conformant. */
  def violations(spark: SparkSession, outputJson: String, format: String)
      : Vector[(String, String, String)] = {
    val suite = suites.getOrElse(format,
      throw graft.spec.SpecError("output", s"no output schema for format '$format'"))
    val df = spark.createDataFrame(Seq(Row(outputJson)).asJava, inputSchema)
    Validator.violations(df, suite, Seq.empty)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toVector
  }
}

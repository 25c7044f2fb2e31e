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

  private def specJsonFor(format: String, depth: Int): String = format match {
    case "flag"     => flagSchema
    case "basic"    => basicSchema
    case "detailed" => detailedSchema(depth)
    case other => throw graft.spec.SpecError("output",
      s"no output schema for format '$other' (flag|basic|detailed)")
  }

  private def specFor(format: String, depth: Int = 1): Spec =
    Spec.fromJson(s"""{"columns":{"out":{"json":${specJsonFor(format, depth)}}}}""")

  private val inputSchema =
    StructType(Seq(StructField("out", StringType, nullable = true)))

  // flat formats compile once per classloader; the detailed suite compiles
  // PER OBSERVED NESTING DEPTH (memoized) — the unroll is sized to the
  // document being validated instead of a fixed magic depth, so shallow
  // outputs (the common case) get a tiny expression tree and deep ones get
  // exactly enough levels (no optimizer-straining depth-12 constant)
  private lazy val flatSuites = Map(
    "flag" -> SuiteCompiler.compile(specFor("flag"), inputSchema),
    "basic" -> SuiteCompiler.compile(specFor("basic"), inputSchema))

  private val detailedSuites =
    scala.collection.concurrent.TrieMap.empty[Int, graft.compile.CompiledSuite]

  /** Nesting depth of a detailed-output document's `details` tree. */
  private def detailsDepth(n: com.fasterxml.jackson.databind.JsonNode): Int =
    if (n == null || !n.isObject) 0
    else 1 + Option(n.get("details")).filter(_.isArray)
      .map(_.elements().asScala.map(detailsDepth).maxOption.getOrElse(0))
      .getOrElse(0)

  /** Engine-validate a rendered output document. Empty = conformant. */
  def violations(spark: SparkSession, outputJson: String, format: String)
      : Vector[(String, String, String)] = {
    val suite = format match {
      case "detailed" =>
        val depth = try {
          math.max(1, detailsDepth(
            new com.fasterxml.jackson.databind.ObjectMapper().readTree(outputJson)))
        } catch { case scala.util.control.NonFatal(_) => 1 }
        detailedSuites.getOrElseUpdate(depth,
          SuiteCompiler.compile(specFor("detailed", depth), inputSchema))
      case other => flatSuites.getOrElse(other,
        throw graft.spec.SpecError("output", s"no output schema for format '$format'"))
    }
    val df = spark.createDataFrame(Seq(Row(outputJson)).asJava, inputSchema)
    Validator.violations(df, suite, Seq.empty)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2)))
      .toVector
  }
}

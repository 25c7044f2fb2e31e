package graft

import graft.compile.SuiteCompiler
import graft.exec.Validator
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Reference-parity assertion gating — the reference compiler's
  * AssertFormat/AssertContent switches and their draft-dependent defaults
  * (/root/reference/compiler.go:47-66, objcompiler.go:186,239,305,432-440;
  * CLI flags cmd/jv/main.go:28-29):
  *   - format: asserted for draft<2019 always; for 2019-09 only when the
  *     meta-schema REQUIRES the `format` vocabulary; for 2020-12 only when
  *     it requires `format-assertion`; `--assert-format` forces it on.
  *   - content*: never asserted by default, any draft; `--assert-content`
  *     turns them on.
  * Engine-native mode (no jv flags — the spec language and the suite
  * harness) keeps both always-asserted, which is how the reference runs its
  * own test suite (suite_test.go:54-55).
  */
class AssertModeSpec extends SparkTestBase {

  private val instSchema = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("j", StringType)))

  /** jv-mode verdict: one JSON text against a bare JSON Schema, with the
    * reference CLI's assertion defaults + the two override flags.
    */
  private def jvValid(schemaJson: String, doc: String,
                      assertFormat: Boolean = false,
                      assertContent: Boolean = false): Boolean = {
    val df = spark.createDataFrame(Seq(Row(0, doc)).asJava, instSchema)
    val suite = SuiteCompiler.compile(
      Queries5.wrapSchema(schemaJson, Some((assertFormat, assertContent))),
      df.schema)
    Validator.annotate(df, suite).select("valid").head().getBoolean(0)
  }

  /** Engine-native verdict (no jv flags): format/content always asserted. */
  private def nativeValid(schemaJson: String, doc: String): Boolean = {
    val df = spark.createDataFrame(Seq(Row(0, doc)).asJava, instSchema)
    val suite = SuiteCompiler.compile(Queries5.wrapSchema(schemaJson), df.schema)
    Validator.annotate(df, suite).select("valid").head().getBoolean(0)
  }

  private val d2020 = "https://json-schema.org/draft/2020-12/schema"
  private val d2019 = "https://json-schema.org/draft/2019-09/schema"
  private val d7 = "http://json-schema.org/draft-07/schema#"

  test("2020-12: format is annotation-only by default, asserted with the flag") {
    val sch = s"""{"$$schema": "$d2020", "format": "ipv4"}"""
    assert(jvValid(sch, "\"not-an-ip\""))                       // annotation
    assert(!jvValid(sch, "\"not-an-ip\"", assertFormat = true)) // asserted
    assert(jvValid(sch, "\"1.2.3.4\"", assertFormat = true))
  }

  test("2019-09: official meta lists format:false — annotation-only by default") {
    val sch = s"""{"$$schema": "$d2019", "format": "uuid"}"""
    assert(jvValid(sch, "\"nope\""))
    assert(!jvValid(sch, "\"nope\"", assertFormat = true))
  }

  test("draft-07: format asserted by default (draft<2019 rule)") {
    val sch = s"""{"$$schema": "$d7", "format": "ipv4"}"""
    assert(!jvValid(sch, "\"not-an-ip\""))
    assert(jvValid(sch, "\"10.0.0.1\""))
  }

  test("no $schema: jv default draft is latest (2020-12) — annotation-only") {
    val sch = """{"format": "date"}"""
    assert(jvValid(sch, "\"not-a-date\""))
    assert(!jvValid(sch, "\"not-a-date\"", assertFormat = true))
  }

  test("content*: never asserted by default (even draft-07), flag turns them on") {
    val sch = s"""{"$$schema": "$d7", "contentEncoding": "base64"}"""
    assert(jvValid(sch, "\"@@not-base64@@\""))
    assert(!jvValid(sch, "\"@@not-base64@@\"", assertContent = true))
    assert(jvValid(sch, "\"aGVsbG8=\"", assertContent = true))
  }

  test("2020-12 custom meta-schema requiring format-assertion asserts without the flag") {
    val dir = java.nio.file.Files.createTempDirectory("graft_meta_fa")
    val meta = dir.resolve("meta.json")
    java.nio.file.Files.writeString(meta,
      s"""{"$$schema": "$d2020",
         |"$$vocabulary": {
         |  "https://json-schema.org/draft/2020-12/vocab/core": true,
         |  "https://json-schema.org/draft/2020-12/vocab/applicator": true,
         |  "https://json-schema.org/draft/2020-12/vocab/validation": true,
         |  "https://json-schema.org/draft/2020-12/vocab/format-assertion": true
         |}}""".stripMargin)
    val sch = s"""{"$$schema": "file://$meta", "format": "ipv4"}"""
    assert(!jvValid(sch, "\"not-an-ip\"")) // vocab-required → asserted
    assert(jvValid(sch, "\"1.2.3.4\""))
  }

  test("2019-09 custom meta-schema requiring the format vocabulary asserts without the flag") {
    val dir = java.nio.file.Files.createTempDirectory("graft_meta_f19")
    val meta = dir.resolve("meta.json")
    java.nio.file.Files.writeString(meta,
      s"""{"$$schema": "$d2019",
         |"$$vocabulary": {
         |  "https://json-schema.org/draft/2019-09/vocab/core": true,
         |  "https://json-schema.org/draft/2019-09/vocab/applicator": true,
         |  "https://json-schema.org/draft/2019-09/vocab/validation": true,
         |  "https://json-schema.org/draft/2019-09/vocab/format": true
         |}}""".stripMargin)
    val sch = s"""{"$$schema": "file://$meta", "format": "uuid"}"""
    assert(!jvValid(sch, "\"nope\""))
  }

  test("mixed dialects: a draft-07 embedded resource asserts format, the 2020-12 host does not") {
    val sch =
      s"""{"$$schema": "$d2020",
         |"$$defs": {"sub": {"$$id": "urn:graft:d7res", "$$schema": "$d7",
         |                   "format": "ipv4"}},
         |"properties": {"a": {"$$ref": "urn:graft:d7res"},
         |               "b": {"format": "ipv4"}}}""".stripMargin
    // "b" is annotation-only (2020-12 default), "a" asserts (draft-07 rule)
    assert(jvValid(sch, """{"a": "1.2.3.4", "b": "not-an-ip"}"""))
    assert(!jvValid(sch, """{"a": "not-an-ip", "b": "1.2.3.4"}"""))
  }

  test("engine-native mode still asserts both (suite-harness semantics)") {
    assert(!nativeValid(s"""{"$$schema": "$d2020", "format": "ipv4"}""",
      "\"not-an-ip\""))
    assert(!nativeValid(s"""{"$$schema": "$d2020", "contentEncoding": "base64"}""",
      "\"@@not-base64@@\""))
  }
}

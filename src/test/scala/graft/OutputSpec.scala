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

  test("escaping: quotes, backslashes, control chars survive JSON rendering") {
    val nasty = Seq(Unit("""a"b\c""", "p\nq", "d\te"))
    val json = Output.basicJson(nasty)
    val tree = new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
    assert(tree.get("errors").get(0).get("keywordLocation").asText() == "/a\"b\\c")
  }
}

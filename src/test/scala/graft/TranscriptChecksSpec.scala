package graft

import graft.audio.TranscriptChecks
import graft.compile.SuiteCompiler
import graft.exec.Engine
import graft.spec.{Spec, SpecError}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** The transcript↔audio consistency family: handcrafted clips with known
  * rate/emptiness defects must produce exactly the expected violation set;
  * non-measurable rows (null/zero duration, empty transcript) are rate-
  * vacuous; the shape gate and the min>max window check are typed errors.
  */
class TranscriptChecksSpec extends SparkTestBase {

  TranscriptChecks.register()

  private val schema = StructType(Seq(
    StructField("clip_id", StringType),
    StructField("transcript", StringType),
    StructField("dur_ms", LongType)))

  private val fullSpec =
    """{"columns": {},
       "table": {"transcriptConsistency": {
         "transcript": "transcript", "key": "clip_id", "durMs": "dur_ms",
         "minCharsPerSec": 6, "maxCharsPerSec": 40,
         "requireNonEmptyOverMs": 1000}}}"""

  private def vios(rows: Seq[Row]): Set[(String, String)] = {
    val df = spark.createDataFrame(rows.asJava, schema)
    val suite = SuiteCompiler.compile(Spec.fromJson(fullSpec), df.schema)
    Engine.tableViolations(df, suite)
      .collect().map(r => (r.getString(1).takeWhile(_ != '/'), r.getString(0)))
      .toSet
  }

  test("each consistency defect produces exactly its own violation") {
    val kw = "table/transcriptConsistency"
    val got = vios(Seq(
      Row("ok", "a" * 30, 2000L),            // 15 chars/sec — in window
      Row("slow", "a" * 10, 5000L),           // 2 chars/sec — below floor
      Row("fast", "a" * 500, 2000L),          // 250 chars/sec — above ceiling
      Row("empty-long", "", 3000L),           // empty over the threshold
      Row("null-long", null, 3000L),          // null counts as empty
      Row("empty-short", "", 800L),           // under threshold: allowed
      Row("zero-dur", "a" * 30, 0L),          // not measurable: rate-vacuous
      Row("null-dur", "a" * 30, null)))       // not measurable, not "over" any ms
    assert(got == Set(
      ("slow", s"$kw/minCharsPerSec"),
      ("fast", s"$kw/maxCharsPerSec"),
      ("empty-long", s"$kw/requireNonEmptyOverMs"),
      ("null-long", s"$kw/requireNonEmptyOverMs")), got)
  }

  test("rate boundary is inclusive (exactly min or max chars/sec passes)") {
    // 12 chars over 2000 ms = exactly 6.0 chars/sec; 80 over 2000 = 40.0
    assert(vios(Seq(
      Row("at-min", "a" * 12, 2000L),
      Row("at-max", "a" * 80, 2000L))).isEmpty)
  }

  test("rune semantics: multi-byte characters count once (engine length convention)") {
    // 10 CJK chars over 5000 ms = 2 chars/sec → below the floor of 6
    val got = vios(Seq(Row("cjk", "世界" * 5, 5000L)))
    assert(got == Set(("cjk", "table/transcriptConsistency/minCharsPerSec")), got)
  }

  test("details carry the computed rate and duration") {
    val df = spark.createDataFrame(
      Seq(Row("fast", "a" * 500, 2000L), Row("empty", "", 3000L)).asJava, schema)
    val suite = SuiteCompiler.compile(Spec.fromJson(fullSpec), df.schema)
    val details = Engine.tableViolations(df, suite)
      .collect().map(r => r.getString(1).takeWhile(_ != '/') -> r.getString(2)).toMap
    assert(details("fast").contains("250") && details("fast").contains("40"),
      details("fast"))
    assert(details("empty").contains("3000") && details("empty").contains("1000"),
      details("empty"))
  }

  test("family spec shape gate rejects malformed transcriptConsistency specs") {
    Seq(
      """{"columns":{},"table":{"transcriptConsistency": []}}""" -> "type",
      """{"columns":{},"table":{"transcriptConsistency": {"transcript":"t"}}}""" -> "required",
      """{"columns":{},"table":{"transcriptConsistency":
           {"transcript":"t","key":"k","durMs":"d","minCharsPerSec":0}}}""" -> "exclusiveMinimum",
      """{"columns":{},"table":{"transcriptConsistency":
           {"transcript":"t","key":"k","durMs":"d","oops":1}}}""" -> "additionalProperties"
    ).foreach { case (s, frag) =>
      val e = intercept[SpecError](Spec.fromJson(s))
      assert(e.getMessage.contains("transcriptConsistency") &&
        e.getMessage.contains(frag), e.getMessage)
    }
  }

  test("an empty rate window (min > max) is a typed error at compile time") {
    val e = intercept[SpecError](Spec.fromJson(
      """{"columns":{},"table":{"transcriptConsistency":
           {"transcript":"t","key":"k","durMs":"d",
            "minCharsPerSec":40,"maxCharsPerSec":6}}}"""))
    assert(e.getMessage.contains("window is empty"), e.getMessage)
  }

  test("the checks are pure column arithmetic: no UDF in the plan, scan prunes to 3 columns") {
    val df = spark.createDataFrame(
      Seq(Row("x", "hello", 1000L)).asJava,
      StructType(schema.fields :+ StructField("extra", StringType)))
    val suite = SuiteCompiler.compile(Spec.fromJson(fullSpec), df.schema)
    val plan = Engine.tableViolations(df, suite).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), plan)
    assert(!plan.contains("extra"), plan)
  }
}

package graft

import graft.audio.{AudioChecks, AudioGen, Wav}
import graft.compile.SuiteCompiler
import graft.exec.Engine
import graft.spec.{Spec, SpecError}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** The decode-derived `audioSignal` constraint family: handcrafted clips
  * with known signal defects must produce exactly the expected violation
  * set, one decode feeding every check.
  */
class AudioChecksSpec extends SparkTestBase {

  AudioGen.registerFormats() // also registers the audioSignal family

  private val clipSchema = StructType(Seq(
    StructField("clip_id", StringType),
    StructField("bytes", BinaryType),
    StructField("sr_hz", IntegerType),
    StructField("dur_ms", IntegerType)))

  private def sine(n: Int, amp: Double, sr: Int): Array[Short] =
    Array.tabulate(n)(i =>
      (amp * math.sin(2 * math.Pi * 440.0 * i / sr)).toShort)

  private val sr = 16000
  private def clip(id: String, pcm: Array[Short], srMeta: Int = sr,
                   durMs: Int = -1): Row = {
    val d = if (durMs >= 0) durMs else (pcm.length * 1000L / sr).toInt
    Row(id, Wav.encode(pcm, sr), srMeta, d)
  }

  private val fullSpec =
    """{"columns": {},
       "table": {"audioSignal": {
         "bytes": "bytes", "key": "clip_id", "srHz": "sr_hz",
         "durMs": "dur_ms",
         "maxClippingRatio": 0.01, "minRmsDb": -60.0,
         "maxAbsDcOffset": 0.05, "srConsistent": true,
         "durToleranceMs": 50}}}"""

  test("each signal defect produces exactly its own violation") {
    val half = sr / 2 // 500 ms of samples
    val rows = Seq(
      clip("clean", sine(half, 16000, sr)),
      clip("clipped", Array.tabulate[Short](half)(i => // symmetric square:
        if (i % 2 == 0) Short.MaxValue else Short.MinValue)), // clips, no DC
      clip("silent", Array.fill[Short](half)(0)),
      clip("dc", sine(half, 12000, sr).map(v => (v + 8000).toShort)),
      clip("sr-mismatch", sine(half, 16000, sr), srMeta = 48000),
      clip("dur-mismatch", sine(half, 16000, sr), durMs = 2000),
      Row("undecodable", Array[Byte](1, 2, 3), sr, 500) // vacuous here
    )
    val df = spark.createDataFrame(rows.asJava, clipSchema)
    val suite = SuiteCompiler.compile(Spec.fromJson(fullSpec), df.schema)
    val vios = Engine.allViolations(df, suite, Seq("clip_id"))
      .collect().map(r => (r.getString(1).takeWhile(_ != '/'), r.getString(0)))
      .toSet
    assert(vios == Set(
      ("clipped", "table/audioSignal/maxClippingRatio"),
      ("silent", "table/audioSignal/minRmsDb"),
      ("dc", "table/audioSignal/maxAbsDcOffset"),
      ("sr-mismatch", "table/audioSignal/srConsistent"),
      ("dur-mismatch", "table/audioSignal/durToleranceMs")))
  }

  test("details carry runtime values") {
    val rows = Seq(clip("dur-mismatch", sine(sr / 2, 16000, sr), durMs = 2000))
    val df = spark.createDataFrame(rows.asJava, clipSchema)
    val suite = SuiteCompiler.compile(Spec.fromJson(fullSpec), df.schema)
    val d = Engine.allViolations(df, suite, Seq("clip_id"))
      .collect().head.getString(2)
    assert(d.contains("500") && d.contains("2000"), d)
  }

  test("signal clip-suite over the generated corpus: srConsistent fires on the seeded sr corruptions only") {
    val n = 4000L
    val clips = AudioGen.clips(spark, n, seed = 42L)
    val suite = SuiteCompiler.compile(
      Spec.fromJson(ClipSuite.signalSpecJson), clips.schema)
    val vios = Engine.allViolations(clips, suite, Seq("clip_id"),
      Map("ref_codecs" -> ClipSuite.refCodecs(spark)))
    val signal = vios.filter(org.apache.spark.sql.functions.col("keyword")
      .startsWith("table/audioSignal")).collect()
    // expected: ids with id%293==3 whose picked corrupt metadata sr is 0 or
    // -1 (the container stays 16 kHz) — sr=96000 re-encodes at 96 kHz and
    // stays CONSISTENT; corrupted-header rows (id%677==29) are undecodable
    // and vacuous for signal checks. Compare by generated clip_id.
    val expected = (0L until n)
      .filter(id => id % 293 == 3 && id % 3 != 0)
      .filterNot(id => id % 677 == 29)
      .map(id => AudioGen.generate(42L, id).clip_id).toSet
    val got = signal.map(_.getString(1).stripSuffix("/bytes")).toSet
    assert(signal.forall(_.getString(0) == "table/audioSignal/srConsistent"))
    assert(got == expected, s"got ${got.size}, expected ${expected.size}")
  }

  test("family spec shape gate rejects malformed audioSignal specs with a typed error") {
    Seq(
      """{"columns":{},"table":{"audioSignal": 5}}""" -> "type",
      """{"columns":{},"table":{"audioSignal": {"bytes":"b"}}}""" -> "required",
      """{"columns":{},"table":{"audioSignal": {"bytes":"b","key":"k","maxClippingRatio":2}}}""" -> "maximum",
      """{"columns":{},"table":{"audioSignal": {"bytes":"b","key":"k","oops":1}}}""" -> "additionalProperties"
    ).foreach { case (s, frag) =>
      val e = intercept[SpecError](Spec.fromJson(s))
      assert(e.getMessage.contains("audioSignal") && e.getMessage.contains(frag),
        s"$s -> ${e.getMessage}")
    }
    // semantic cross-field checks live in the parse callback
    val e2 = intercept[SpecError](Spec.fromJson(
      """{"columns":{},"table":{"audioSignal":
          {"bytes":"b","key":"k","srConsistent":true}}}"""))
    assert(e2.getMessage.contains("srHz"))
  }
}

package graft

import graft.audio.{AudioGen, MagicChecks, Wav}
import graft.compile.SuiteCompiler
import graft.exec.Engine
import graft.spec.{Spec, SpecError}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** The zero-decode `containerMagic` constraint family: codec-column claims
  * must match the container magic bytes at the declared offsets, with rows
  * whose codec is undeclared out of scope.
  */
class MagicChecksSpec extends SparkTestBase {

  MagicChecks.register()

  private val clipSchema = StructType(Seq(
    StructField("clip_id", StringType),
    StructField("bytes", BinaryType),
    StructField("codec", StringType)))

  private val wavBytes = Wav.encode(Array.tabulate[Short](64)(i => (i * 100).toShort), 16000)

  private val spec =
    """{"columns": {},
       "table": {"containerMagic": {
         "bytes": "bytes", "key": "clip_id", "codec": "codec",
         "magics": {
           "wav":  [{"offset": 0, "ascii": "RIFF"}, {"offset": 8, "ascii": "WAVE"}],
           "flac": [{"offset": 0, "ascii": "fLaC"}]}}}}"""

  test("only mislabeled / corrupted / truncated declared-codec rows fire") {
    val mangled = wavBytes.clone(); mangled(0) = 'X'.toByte
    val waveMangled = wavBytes.clone(); waveMangled(9) = 'Z'.toByte
    val rows = Seq(
      Row("good-wav", wavBytes, "wav"),
      Row("mangled-riff", mangled, "wav"),        // offset-0 magic broken
      Row("mangled-wave", waveMangled, "wav"),    // offset-8 magic broken
      Row("short", wavBytes.take(6), "wav"),      // too short for WAVE@8
      Row("null-bytes", null, "wav"),             // declared codec, no bytes
      Row("flac-label", wavBytes, "flac"),        // wav container labeled flac
      Row("undeclared", Array[Byte](1, 2, 3), "opus"), // not in magics: pass
      Row("null-codec", wavBytes, null)           // no claim: pass
    )
    val df = spark.createDataFrame(rows.asJava, clipSchema)
    val suite = SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    val vios = Engine.allViolations(df, suite, Seq("clip_id"))
      .collect().map(r => (r.getString(1).takeWhile(_ != '/'), r.getString(0)))
      .toSet
    assert(vios == Set(
      ("mangled-riff", "table/containerMagic/wav"),
      ("mangled-wave", "table/containerMagic/wav"),
      ("short", "table/containerMagic/wav"),
      ("null-bytes", "table/containerMagic/wav"),
      ("flac-label", "table/containerMagic/flac")))
  }

  test("detail carries the wanted magic and the whole declared window") {
    val mangled = wavBytes.clone(); mangled(0) = 'X'.toByte
    val waveMangled = wavBytes.clone(); waveMangled(9) = 'Z'.toByte
    val df = spark.createDataFrame(
      Seq(Row("m", mangled, "wav"), Row("w", waveMangled, "wav"),
        Row("n", null, "wav")).asJava, clipSchema)
    val suite = SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    val d = Engine.allViolations(df, suite, Seq("clip_id"))
      .collect().map(r => r.getString(1).takeWhile(_ != '/') -> r.getString(2)).toMap
    assert(d("m").contains("RIFF@0+WAVE@8") && d("m").contains("0x58"), d("m"))
    // the dump spans to the END of the declared window, so an offset-8
    // defect ('Z' = 0x5A at byte 9) is visible, not just a healthy prefix
    assert(d("w").contains("575A5645"), d("w"))
    assert(d("n").contains("NULL"), d("n"))
  }

  test("signal clip-suite over the generated corpus: magic fires on exactly the RIFF-mangled wav/pcm rows") {
    AudioGen.registerFormats()
    val n = 4000L
    val clips = AudioGen.clips(spark, n, seed = 42L)
    val suite = SuiteCompiler.compile(
      Spec.fromJson(ClipSuite.signalSpecJson), clips.schema)
    val vios = Engine.allViolations(clips, suite, Seq("clip_id"),
      Map("ref_codecs" -> ClipSuite.refCodecs(spark)))
    val magic = vios.filter(org.apache.spark.sql.functions.col("keyword")
      .startsWith("table/containerMagic")).collect()
    // expected: RIFF-mangled rows (id%677==29) whose codec landed on a
    // declared container (wav or pcm_s16le) — including the rows whose
    // codec was REPLACED by the unknown-codec corruption (id%443==17),
    // which are then undeclared and out of scope.
    val expected = (0L until n)
      .map(id => AudioGen.generate(42L, id))
      .filter(c => c.bytes(0) == 'X'.toByte &&
        (c.codec == "wav" || c.codec == "pcm_s16le"))
      .map(_.clip_id).toSet
    val got = magic.map(_.getString(1).stripSuffix("/bytes")).toSet
    assert(expected.nonEmpty)
    assert(got == expected, s"got ${got.size}, expected ${expected.size}")
  }

  test("the checks are pure column ops: no UDF in the plan, scan prunes to 3 columns") {
    val df = spark.createDataFrame(
      Seq(Row("x", wavBytes, "wav", "unrelated")).asJava,
      StructType(clipSchema.fields :+ StructField("extra", StringType)))
    val suite = SuiteCompiler.compile(Spec.fromJson(spec), df.schema)
    val plan = Engine.tableViolations(df, suite).queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("udf"), plan)
    assert(!plan.contains("extra"), plan)
  }

  test("differential property: engine verdicts equal a plain-Scala oracle on 600 random rows") {
    val rnd = new scala.util.Random(20260820L)
    val magics: Seq[(String, Seq[(Int, String)])] = Seq(
      "wav"  -> Seq(0 -> "RIFF", 8 -> "WAVE"),
      "flac" -> Seq(0 -> "fLaC"),
      "ogg"  -> Seq(1 -> "ggS")) // nonzero base offset arm
    val magicJson = magics.map { case (c, ps) =>
      s""""$c": [${ps.map(p => s"""{"offset": ${p._1}, "ascii": "${p._2}"}""").mkString(",")}]"""
    }.mkString(",")
    val codecs = Seq("wav", "flac", "ogg", "opus", null)
    val rows = (0 until 600).map { i =>
      val codec = codecs(rnd.nextInt(codecs.size))
      val bytes: Array[Byte] = rnd.nextInt(5) match {
        case 0 => null
        case 1 => Array.fill(rnd.nextInt(12))(rnd.nextInt(256).toByte) // short/garbage
        case _ =>
          // start from a plausible container, then maybe corrupt one byte
          val base = ("RIFF0000WAVE" + "x" * rnd.nextInt(8)).getBytes("US-ASCII")
          if (rnd.nextBoolean() && base.nonEmpty)
            base(rnd.nextInt(base.length)) = rnd.nextInt(256).toByte
          base
      }
      Row(s"r$i", bytes, codec)
    }
    // plain-Scala oracle: declared codec must match every (offset, ascii)
    def expectViolation(bytes: Array[Byte], codec: String): Boolean =
      magics.toMap.get(codec) match {
        case None => false
        case Some(ps) => bytes == null || ps.exists { case (off, ascii) =>
          val want = ascii.getBytes("US-ASCII")
          bytes.length < off + want.length ||
            !java.util.Arrays.equals(
              java.util.Arrays.copyOfRange(bytes, off, off + want.length), want)
        }
      }
    val expected = rows.collect {
      case r if expectViolation(r.get(1).asInstanceOf[Array[Byte]], r.getString(2)) =>
        r.getString(0)
    }.toSet
    val df = spark.createDataFrame(rows.asJava, clipSchema)
    val suite = SuiteCompiler.compile(Spec.fromJson(
      s"""{"columns": {}, "table": {"containerMagic": {
           "bytes": "bytes", "key": "clip_id", "codec": "codec",
           "magics": {$magicJson}}}}"""), df.schema)
    val got = Engine.allViolations(df, suite, Seq("clip_id"))
      .collect().map(_.getString(1).stripSuffix("/bytes")).toSet
    assert(got == expected,
      s"diff: engine-only=${got diff expected}, oracle-only=${expected diff got}")
    assert(expected.nonEmpty && expected.size < rows.size)
  }

  test("family spec shape gate rejects malformed containerMagic specs with a typed error") {
    Seq(
      """{"columns":{},"table":{"containerMagic": 5}}""" -> "type",
      """{"columns":{},"table":{"containerMagic": {"bytes":"b","key":"k","codec":"c"}}}""" -> "required",
      """{"columns":{},"table":{"containerMagic": {"bytes":"b","key":"k","codec":"c","magics":{}}}}""" -> "minProperties",
      """{"columns":{},"table":{"containerMagic": {"bytes":"b","key":"k","codec":"c",
          "magics":{"wav":[]}}}}""" -> "minItems",
      """{"columns":{},"table":{"containerMagic": {"bytes":"b","key":"k","codec":"c",
          "magics":{"wav":[{"offset":-1,"ascii":"RIFF"}]}}}}""" -> "minimum",
      """{"columns":{},"table":{"containerMagic": {"bytes":"b","key":"k","codec":"c",
          "magics":{"wav":[{"offset":0,"ascii":"RÏFF"}]}}}}""" -> "pattern"
    ).foreach { case (s, frag) =>
      val e = intercept[SpecError](Spec.fromJson(s))
      assert(e.getMessage.contains("containerMagic") && e.getMessage.contains(frag),
        s"$s -> ${e.getMessage}")
    }
    // semantic cross-field check: overlapping magic ranges
    val e2 = intercept[SpecError](Spec.fromJson(
      """{"columns":{},"table":{"containerMagic":
          {"bytes":"b","key":"k","codec":"c",
           "magics":{"wav":[{"offset":0,"ascii":"RIFF"},{"offset":2,"ascii":"FFWA"}]}}}}"""))
    assert(e2.getMessage.contains("overlap"))
  }
}

package graft

import graft.audio.{AudioGen, Wav}
import graft.exec.Engine
import org.apache.spark.sql.functions._

/** Flagship end-to-end: the audio clip table (BASELINE.json input_hint shape)
  * through the full constraint suite, plus the per-row PCM/transcript oracle.
  */
class AudioSpec extends SparkTestBase {
  import spark.implicits._

  private val N = 5000L
  private lazy val clips = AudioGen.clips(spark, N, seed = 42L).cache()

  test("generator emits the exact input_hint schema") {
    val s = clips.schema
    assert(s.fieldNames.toSeq ==
      Seq("clip_id", "bytes", "sr_hz", "dur_ms", "codec", "transcript"))
    assert(s("clip_id").dataType.typeName == "string")
    assert(s("bytes").dataType.typeName == "binary")
    assert(s("sr_hz").dataType.typeName == "integer")
    assert(s("dur_ms").dataType.typeName == "integer")
    assert(clips.count() == N)
  }

  test("generation is deterministic and partitioning-independent") {
    val a = AudioGen.clips(spark, 500, seed = 42L).repartition(13)
      .select("clip_id", "sr_hz", "dur_ms", "codec")
      .collect().map(_.toString).toSet
    val b = AudioGen.clips(spark, 500, seed = 42L).repartition(2)
      .select("clip_id", "sr_hz", "dur_ms", "codec")
      .collect().map(_.toString).toSet
    assert(a == b && a.size >= 499) // dup-injected rows may collapse by key
  }

  test("full constraint suite: verdicts + violations match injected rates") {
    val report = Engine.run(clips, ClipSuite.specJson, Seq("clip_id"),
      Map("ref_codecs" -> ClipSuite.refCodecs(spark)))
    val vios = report.violations.cache()
    val byKeyword = vios.groupBy("keyword").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

    // exact injected counts for N=5000 (id-modulus rates, AudioGen scaladoc)
    def cnt(p: Long => Boolean): Long = (0L until N).count(p)
    // sr violations: minimum fires for 0/-1, maximum for 96000 (id%3 picks)
    val srBad = cnt(id => id % 293 == 3)
    assert(byKeyword.getOrElse("$defs/validSr/minimum", 0L)
      + byKeyword.getOrElse("$defs/validSr/maximum", 0L) == srBad)
    val durBad = cnt(id => id % 397 == 11)
    assert(byKeyword.getOrElse("columns/dur_ms/exclusiveMinimum", 0L) == durBad)
    val codecBad = cnt(id => id % 443 == 17)
    assert(byKeyword.getOrElse("columns/codec/enum", 0L) == codecBad)
    // pattern + format both fire on malformed clip_id
    val idBad = cnt(id => id % 499 == 13)
    assert(byKeyword.getOrElse("columns/clip_id/pattern", 0L) == idBad)
    assert(byKeyword.getOrElse("columns/clip_id/format", 0L) == idBad)
    // nulls hit required only (vacuous elsewhere)
    val nullT = cnt(id => id % 997 == 23)
    assert(byKeyword.getOrElse("required/transcript", 0L) == nullT)
    val emptyT = cnt(id => id % 587 == 19 && id % 997 != 23)
    assert(byKeyword.getOrElse("columns/transcript/minLength", 0L) == emptyT)
    // uniqueness: duplicated ids (dup rows whose source row still exists)
    val dups = vios.filter($"keyword".startsWith("table/unique")).count()
    val expDups = cnt(id => id % 211 == 7 && id > 0 &&
      !((id - 1) % 499 == 13) && !(id % 499 == 13))
    assert(dups == expDups)
    // referential: unknown codecs are exactly the enum violations
    val fkBad = vios.filter($"keyword".startsWith("table/foreignKey")).count()
    assert(fkBad == codecBad)
    // drift within threshold on the nominal corpus
    assert(vios.filter($"keyword".startsWith("table/drift")).count() == 0)
    // stats present
    assert(report.stats.get.count() == 4)
  }

  test("deep suite: adds exactly the decode violations on top of the shallow set") {
    AudioGen.registerFormats()
    import org.apache.spark.sql.functions.col
    val shallow = Engine.run(clips, ClipSuite.specJson, Seq("clip_id"),
      Map("ref_codecs" -> ClipSuite.refCodecs(spark))).violations
    val deep = Engine.run(clips, ClipSuite.deepSpecJson, Seq("clip_id"),
      Map("ref_codecs" -> ClipSuite.refCodecs(spark))).violations
    val extra = deep.filter(col("keyword") === "columns/bytes/format")
    val mangled = (0L until N).count(_ % 677 == 29)
    assert(extra.count() == mangled)
    assert(deep.count() == shallow.count() + mangled)
  }

  test("typed Dataset[Clip] round-trips through the engine") {
    import spark.implicits._
    val ds: org.apache.spark.sql.Dataset[AudioGen.Clip] =
      clips.as[AudioGen.Clip]
    val suite = graft.compile.SuiteCompiler.compile(
      graft.spec.Spec.fromJson(ClipSuite.specJson), ds.schema)
    val invalid = graft.exec.Validator.flag(ds.toDF(), suite)
      .filter(!org.apache.spark.sql.functions.col("valid")).count()
    assert(invalid > 0) // seeded violations visible through the typed path
  }

  test("audio decode oracle: PCM SNR >= 30dB except mangled rows; transcripts equal") {
    val withId = AudioGen.clips(spark, 1000, seed = 42L, keepId = true)
    val snr = AudioGen.snrVsExpected(42L)
    val scored = withId.withColumn("snr",
      snr(col("id"), col("bytes"), col("sr_hz"), col("dur_ms")))
    val mangled = (0L until 1000L).count(_ % 677 == 29)
    assert(scored.filter($"snr" >= 30.0).count() == 1000 - mangled)
    assert(scored.filter($"snr" < 30.0).count() == mangled)
    // transcript equality oracle: regenerate independently and compare
    val regen = AudioGen.clips(spark, 1000, seed = 42L, keepId = true)
      .select($"id", $"transcript".as("t2"))
    val joined = withId.join(regen, "id")
    assert(joined.filter(!($"transcript" <=> $"t2")).count() == 0)
  }

  test("decodability as a registered format (custom vocabulary surface)") {
    AudioGen.registerFormats()
    val spec = """{"columns":{"bytes":{"format":"wav"}}}"""
    val report = Engine.run(clips, spec, Seq("clip_id"))
    val bad = report.violations.count()
    assert(bad == (0L until N).count(_ % 677 == 29))
  }

  test("wav codec round-trips exactly (SNR capped at 999)") {
    val pcm = AudioGen.expectedPcm(42L, 7L, 16000, 500)
    val Some((decoded, sr)) = Wav.decode(Wav.encode(pcm, 16000))
    assert(sr == 16000)
    assert(Wav.snrDb(pcm, decoded) == 999.0)
    assert(Wav.decode("XXXX".getBytes ++ Array.fill[Byte](100)(0)).isEmpty)
  }

  test("scan pruning: default constraint pass never reads bytes") {
    val suite = graft.compile.SuiteCompiler.compile(
      graft.spec.Spec.fromJson(ClipSuite.specJson), clips.schema)
    val dir = java.nio.file.Files.createTempDirectory("clips").toString
    clips.write.mode("overwrite").parquet(dir)
    val onDisk = spark.read.parquet(dir)
    val plan = graft.exec.Validator.annotate(onDisk, suite)
      .select("valid").queryExecution.executedPlan.toString
    val readSchema = "ReadSchema: [^\\n]*".r.findFirstIn(plan).getOrElse("")
    assert(!readSchema.contains("bytes"), s"bytes must be pruned: $readSchema")
  }
}

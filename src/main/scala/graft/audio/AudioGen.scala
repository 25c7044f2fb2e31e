package graft.audio

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic synthetic audio clip corpus, exactly the BASELINE.json
  * input_hint shape:
  * (clip_id:string, bytes:binary, sr_hz:int, dur_ms:int, codec:string,
  *  transcript:string).
  *
  * Generation is a pure function of (seed, row id) — fully distributed via
  * `spark.range(n)` (no driver-side loop, no collect): identical output at
  * any partitioning/parallelism, which is what makes the two-cluster-size
  * scaling evidence honest. Violation rows are injected at fixed id-modulus
  * rates (FIXTURES.md §1) so expected verdict counts are exact constants:
  *
  *   id % 211 == 7  → duplicate clip_id (uniqueness violation)
  *   id % 499 == 13 → malformed clip_id (pattern/format violation)
  *   id % 293 == 3  → sr_hz out of range (96000 / 0 / -1)
  *   id % 397 == 11 → dur_ms <= 0
  *   id % 443 == 17 → unknown codec string
  *   id % 587 == 19 → empty transcript
  *   id % 997 == 23 → null transcript
  *   id % 677 == 29 → RIFF-mangled bytes (decode failure)
  *
  * Skew mirrors FIXTURES.md: codec 'wav' ≈ 80%, sr 44100 ≈ 70%.
  */
object AudioGen {

  final case class Clip(
      clip_id: String,
      bytes: Array[Byte],
      sr_hz: Int,
      dur_ms: Int,
      codec: String,
      transcript: String
  )

  private val srChoices = Array(44100, 16000, 8000, 22050, 48000)
  // cumulative weights: 44100 at 70%, rest split
  private val srCum = Array(0.70, 0.80, 0.88, 0.95, 1.0)
  private val codecChoices = Array("wav", "flac", "opus", "mp3", "pcm_s16le")
  private val codecCum = Array(0.80, 0.86, 0.91, 0.96, 1.0)
  private val words = Array(
    "the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog", "audio",
    "clip", "speech", "noise", "signal", "sample", "voice", "sound", "test",
    "zürich", "naïve", "こんにちは") // multibyte rows exercise char-length semantics

  /** splitmix64 — public-domain mixing function; deterministic per (seed,id). */
  private def mix(seed: Long, id: Long, salt: Long): Long = {
    var z = seed ^ (id * 0x9E3779B97F4A7C15L) ^ (salt * 0xBF58476D1CE4E5B9L)
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def unit(seed: Long, id: Long, salt: Long): Double =
    (mix(seed, id, salt) >>> 11).toDouble / (1L << 53).toDouble

  private def pick[T](choices: Array[T], cum: Array[Double], u: Double): T = {
    var i = 0
    while (i < cum.length - 1 && u >= cum(i)) i += 1
    choices(i)
  }

  private def hexUuid(seed: Long, id: Long): String = {
    val a = mix(seed, id, 101)
    val b = mix(seed, id, 102)
    f"${a >>> 32}%08x-${(a >>> 16) & 0xFFFF}%04x-${a & 0xFFFF}%04x-${(b >>> 48) & 0xFFFF}%04x-${b & 0xFFFFFFFFFFFFL}%012x"
  }

  /** Expected PCM for row `id` — the generation-side "reference decode" the
    * SNR oracle compares against. Capped sample count keeps the corpus dense
    * enough to bench while still exercising real decode.
    */
  def expectedPcm(seed: Long, id: Long, srHz: Int, durMs: Int): Array[Short] = {
    val n = math.min(math.max((srHz.toLong * math.max(durMs, 1)) / 1000L, 16L), 1600L).toInt
    val freq = 100.0 + unit(seed, id, 201) * 1000.0
    val phase = unit(seed, id, 202) * 2 * math.Pi
    val amp = 8000.0 + unit(seed, id, 203) * 16000.0
    Array.tabulate(n) { i =>
      val t = i.toDouble / srHz
      val noise = (unit(seed, id + i, 204) - 0.5) * 500.0
      (amp * math.sin(2 * math.Pi * freq * t + phase) + noise).toShort
    }
  }

  def generate(seed: Long, id: Long): Clip = {
    val dup = id % 211 == 7 && id > 0
    val baseId = if (dup) id - 1 else id
    val uuid =
      if (id % 499 == 13) s"not-a-uuid-$id"
      else hexUuid(seed, baseId)
    val srOk = pick(srChoices, srCum, unit(seed, id, 1))
    val sr = if (id % 293 == 3) Array(96000, 0, -1)((id % 3).toInt) else srOk
    val dur =
      if (id % 397 == 11) (-(id % 2)).toInt
      else (200 + (math.exp(unit(seed, id, 2) * 3.4) * 120)).toInt // 200..~3800ms
    val codec =
      if (id % 443 == 17) s"codec_$id"
      else pick(codecChoices, codecCum, unit(seed, id, 3))
    val transcript =
      if (id % 997 == 23) null
      else if (id % 587 == 19) ""
      else {
        val nw = 3 + java.lang.Math.floorMod(mix(seed, id, 4) >>> 7, 10L).toInt
        (0 until nw)
          .map(i => words(java.lang.Math.floorMod(mix(seed, id, 5 + i), words.length.toLong).toInt))
          .mkString(" ")
      }
    val pcm = expectedPcm(seed, id, if (sr > 0) sr else 16000, math.max(dur, 1))
    val wav = Wav.encode(pcm, if (sr > 0) sr else 16000)
    val bytes =
      if (id % 677 == 29) { val b = wav.clone(); b(0) = 'X'.toByte; b(1) = 'X'.toByte; b }
      else wav
    Clip(uuid, bytes, sr, dur, codec, transcript)
  }

  /** Distributed generator: n rows, exact input_hint schema (+ optional id). */
  def clips(spark: SparkSession, n: Long, seed: Long = 42L, keepId: Boolean = false): DataFrame = {
    import spark.implicits._
    val gen = udf((id: Long) => generate(seed, id))
    val df = spark.range(n).select(col("id"), gen(col("id")).as("c"))
      .select(col("id"), col("c.*"))
    if (keepId) df else df.drop("id")
  }

  /** bytes → decoded sample count (NULL on undecodable) — the codec
    * decodability check (contentEncoding analogue,
    * /root/reference/validator.go:468-475 mapped per SURVEY.md §2.2).
    */
  val decodedSamples: Column => Column = {
    val f = udf((b: Array[Byte]) => Wav.decode(b).map(_._1.length))
    c => f(c)
  }

  /** bytes → sample rate declared inside the container (NULL if undecodable);
    * lets a row rule assert container-vs-column consistency.
    */
  val containerSr: Column => Column = {
    val f = udf((b: Array[Byte]) => Wav.decode(b).map(_._2))
    c => f(c)
  }

  /** Registers the audio decodability check as a named format — the custom
    * Decoder/MediaType surface (/root/reference/compiler.go:85-95,
    * content.go:9-38) mapped to this engine's format registry. A spec can
    * then say `"bytes": {"format": "wav"}`; it is the ONLY path that touches
    * the `bytes` column, keeping the default pass scan-pruned.
    */
  def registerFormats(): Unit = {
    graft.functions.Formats.register("wav", c => decodedSamples(c).isNotNull)
    // the audio bootstrap also brings the decode-derived signal constraint
    // family (clipping / silence / DC / sr + duration consistency) and its
    // metadata-side companion (transcript↔duration consistency)
    AudioChecks.register()
    TranscriptChecks.register()
    MagicChecks.register()
  }

  /** SNR (dB) of stored bytes vs the expected generated signal, keyed by id —
    * the per-row PCM allclose oracle (SNR ≥ 30 dB).
    */
  def snrVsExpected(seed: Long): (Column, Column, Column, Column) => Column = {
    val f = udf((id: Long, b: Array[Byte], sr: Int, dur: Int) =>
      Wav.decode(b) match {
        case Some((pcm, _)) =>
          Wav.snrDb(expectedPcm(seed, id, if (sr > 0) sr else 16000, math.max(dur, 1)), pcm)
        case None => Double.NegativeInfinity
      })
    (id, b, sr, dur) => f(id, b, sr, dur)
  }
}

package graft.audio

import graft.spec.{ConstraintFamilies, CustomConstraint, SpecError}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Decode-derived SIGNAL constraints over the audio clip table — the audio
  * analogue of the reference's custom-vocabulary examples
  * (/root/reference/example_vocab_uniquekeys_test.go,
  * example_vocab_discriminator_test.go): a registered constraint family
  * (`#/table/audioSignal`) with a declared spec shape, compiling to ONE
  * decode per row that feeds every enabled check.
  *
  * Checks (all optional, enabled by presence in the family spec):
  *  - `maxClippingRatio`  — fraction of full-scale samples (clipped audio)
  *  - `minRmsDb`          — RMS floor in dBFS (silent / dead-air clips)
  *  - `maxAbsDcOffset`    — mean-sample bound (DC-biased capture chains)
  *  - `srConsistent`      — container sample rate must equal the `sr_hz`
  *                          metadata column (mismatched resample pipelines)
  *  - `durToleranceMs`    — decoded duration vs the `dur_ms` metadata column
  *
  * Scale note: the WAV decode happens in a single projected UDF whose
  * struct output is BOUND once (`__sig`) before the per-check violation
  * array is built — N checks cost one decode, and the bytes column never
  * crosses a shuffle (violation rows are tiny).
  */
object AudioChecks {

  final case class SignalStats(
      n_samples: Int, wav_sr_hz: Int, rms_db: Double,
      clipping_ratio: Double, dc_offset: Double)

  /** One-pass signal statistics from WAV bytes (NULL when undecodable —
    * decodability itself is the `wav` FORMAT check's verdict, not ours).
    */
  val signalStats: Column => Column = {
    val f = udf { (b: Array[Byte]) =>
      Wav.decode(b).map { case (pcm, sr) =>
        var sum = 0.0; var sum2 = 0.0; var clipped = 0; var i = 0
        while (i < pcm.length) {
          val v = pcm(i) / 32768.0
          sum += v; sum2 += v * v
          if (pcm(i) >= Short.MaxValue || pcm(i) <= Short.MinValue) clipped += 1
          i += 1
        }
        val n = math.max(pcm.length, 1)
        SignalStats(pcm.length, sr,
          10.0 * math.log10(sum2 / n + 1e-12),
          clipped.toDouble / n, sum / n)
      }
    }
    c => f(c)
  }

  final case class AudioSignal(
      bytesCol: String, keyCol: String,
      srCol: Option[String], durMsCol: Option[String],
      maxClippingRatio: Option[Double], minRmsDb: Option[Double],
      maxAbsDcOffset: Option[Double], srConsistent: Boolean,
      durToleranceMs: Option[Long]) extends CustomConstraint {

    def name = s"audioSignal($bytesCol)"

    def violations(df: DataFrame, refs: Map[String, DataFrame]): DataFrame = {
      val kwBase = "table/audioSignal"
      // decode ONCE: project the stats struct first, then build every check
      // against the bound column (no per-check re-decode)
      val projected = df.select(
        (Seq(col(keyCol).cast("string").as("__key"),
          signalStats(col(bytesCol)).as("__sig")) ++
          srCol.map(c => col(c).cast("int").as("__sr")) ++
          durMsCol.map(c => col(c).cast("long").as("__dur"))): _*)
      val sig = col("__sig")
      val path = concat(col("__key"), lit(s"/$bytesCol"))
      def vio(kw: String, pred: Column, detail: Column): Column =
        when(sig.isNotNull && pred,
          struct(lit(s"$kwBase/$kw").as("keyword"),
            path.as("instance_path"), detail.as("detail")))
      val checks: Seq[Column] =
        maxClippingRatio.map(m => vio("maxClippingRatio",
          sig("clipping_ratio") > m,
          concat(lit("clipping ratio "), format_number(sig("clipping_ratio"), 4),
            lit(s", want <= $m")))).toSeq ++
        minRmsDb.map(m => vio("minRmsDb",
          sig("rms_db") < m,
          concat(lit("rms "), format_number(sig("rms_db"), 1),
            lit(s" dBFS, want >= $m")))) ++
        maxAbsDcOffset.map(m => vio("maxAbsDcOffset",
          abs(sig("dc_offset")) > m,
          concat(lit("dc offset "), format_number(sig("dc_offset"), 4),
            lit(s", want |dc| <= $m")))) ++
        (if (srConsistent && srCol.nonEmpty)
          Seq(vio("srConsistent",
            sig("wav_sr_hz") =!= col("__sr"),
            concat(lit("container sr "), sig("wav_sr_hz").cast("string"),
              lit(" != metadata sr "), col("__sr").cast("string"))))
         else Nil) ++
        durToleranceMs.flatMap { tol =>
          durMsCol.map { _ =>
            val decodedMs = sig("n_samples") * 1000.0 / sig("wav_sr_hz")
            vio("durToleranceMs",
              abs(decodedMs - col("__dur")) > tol,
              concat(lit("decoded "), round(decodedMs).cast("long").cast("string"),
                lit(" ms vs metadata "), col("__dur").cast("string"),
                lit(s" ms, want |diff| <= $tol")))
          }
        }.toSeq
      if (checks.isEmpty) return df.sparkSession.emptyDataFrame.select(
        lit("").as("keyword"), lit("").as("instance_path"), lit("").as("detail"))
      projected
        .select(explode(array(checks: _*)).as("v"))
        .where(col("v").isNotNull)
        .select(col("v.keyword"), col("v.instance_path"), col("v.detail"))
    }
  }

  /** Family spec shape — the `Vocabulary.Schema` analogue, checked before
    * the parse callback (/root/reference/vocab.go:19-35).
    */
  private val shapeJson =
    """{"type": "object", "required": ["bytes", "key"],
        "properties": {
          "bytes": {"type": "string"}, "key": {"type": "string"},
          "srHz": {"type": "string"}, "durMs": {"type": "string"},
          "maxClippingRatio": {"type": "number", "minimum": 0, "maximum": 1},
          "minRmsDb": {"type": "number"},
          "maxAbsDcOffset": {"type": "number", "minimum": 0},
          "srConsistent": {"type": "boolean"},
          "durToleranceMs": {"type": "integer", "minimum": 0}},
        "additionalProperties": false}"""

  @volatile private var registered = false

  /** Register the `audioSignal` family (idempotent). */
  def register(): Unit = synchronized {
    if (!registered) {
      ConstraintFamilies.register("audioSignal", shapeJson, { node =>
        def str(k: String): Option[String] =
          Option(node.get(k)).filter(_.isTextual).map(_.asText())
        def dbl(k: String): Option[Double] =
          Option(node.get(k)).filter(_.isNumber).map(_.asDouble())
        val srConsistent =
          Option(node.get("srConsistent")).exists(v => v.isBoolean && v.asBoolean())
        if (srConsistent && str("srHz").isEmpty)
          throw SpecError("#/table/audioSignal",
            "srConsistent needs the 'srHz' column name")
        val tol = Option(node.get("durToleranceMs"))
          .filter(_.isIntegralNumber).map(_.asLong())
        if (tol.nonEmpty && str("durMs").isEmpty)
          throw SpecError("#/table/audioSignal",
            "durToleranceMs needs the 'durMs' column name")
        AudioSignal(
          bytesCol = str("bytes").get, keyCol = str("key").get,
          srCol = str("srHz"), durMsCol = str("durMs"),
          maxClippingRatio = dbl("maxClippingRatio"),
          minRmsDb = dbl("minRmsDb"),
          maxAbsDcOffset = dbl("maxAbsDcOffset"),
          srConsistent = srConsistent,
          durToleranceMs = tol)
      })
      registered = true
    }
  }
}

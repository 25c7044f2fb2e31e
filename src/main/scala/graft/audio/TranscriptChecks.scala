package graft.audio

import graft.spec.{ConstraintFamilies, CustomConstraint, SpecError}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Transcript↔audio consistency constraints over the clip table — the
  * metadata-side companion of [[AudioChecks]] (same registered-family
  * surface, /root/reference/vocab.go:19-44): catches mispaired, truncated
  * or hallucinated transcripts without touching the `bytes` column at all.
  *
  * Checks (all optional, enabled by presence in the family spec):
  *  - `minCharsPerSec` — speaking-rate floor: transcript characters per
  *    second of audio below this bound means the transcript is likely
  *    truncated relative to the clip (typical speech sits near 12-18
  *    chars/sec in Latin-script languages)
  *  - `maxCharsPerSec` — speaking-rate ceiling: far more text than the
  *    audio could contain (wrong pairing / duplicated transcript)
  *  - `requireNonEmptyOverMs` — clips longer than this must carry a
  *    non-empty transcript (dead rows in an ASR corpus)
  *
  * The rate checks only fire on MEASURABLE rows (non-null non-empty
  * transcript, positive duration): emptiness is `requireNonEmptyOverMs`'s
  * verdict, not a rate of 0 — one condition, one keyword, mirroring the
  * reference's one-error-per-keyword model (validator.go:171-195).
  *
  * Scale note: pure column arithmetic over (key, transcript, dur_ms) —
  * codegen'd, no UDF, no decode, no shuffle; the scan prunes to exactly
  * three columns. Character counts use rune semantics (Spark `length` =
  * code points), matching the engine's minLength/maxLength convention.
  */
object TranscriptChecks {

  final case class TranscriptConsistency(
      transcriptCol: String, keyCol: String, durMsCol: String,
      minCharsPerSec: Option[Double], maxCharsPerSec: Option[Double],
      requireNonEmptyOverMs: Option[Long]) extends CustomConstraint {

    def name = s"transcriptConsistency($transcriptCol)"

    def violations(df: DataFrame, refs: Map[String, DataFrame]): DataFrame = {
      val kwBase = "table/transcriptConsistency"
      val projected = df.select(
        col(keyCol).cast("string").as("__key"),
        col(transcriptCol).as("__tr"),
        col(durMsCol).cast("long").as("__dur"))
      val tr = col("__tr")
      val dur = col("__dur")
      val rate = length(tr).cast("double") * 1000.0 / dur.cast("double")
      val measurable = tr.isNotNull && dur.isNotNull && dur > 0 && length(tr) > 0
      val path = concat(col("__key"), lit(s"/$transcriptCol"))
      def vio(kw: String, pred: Column, detail: Column): Column =
        when(pred, struct(lit(s"$kwBase/$kw").as("keyword"),
          path.as("instance_path"), detail.as("detail")))
      val checks: Seq[Column] =
        minCharsPerSec.map(m => vio("minCharsPerSec",
          measurable && rate < m,
          concat(format_number(rate, 2), lit(s" chars/sec, want >= $m")))).toSeq ++
        maxCharsPerSec.map(m => vio("maxCharsPerSec",
          measurable && rate > m,
          concat(format_number(rate, 2), lit(s" chars/sec, want <= $m")))) ++
        requireNonEmptyOverMs.map(t => vio("requireNonEmptyOverMs",
          dur.isNotNull && dur > t && (tr.isNull || length(tr) === 0),
          concat(dur.cast("string"),
            lit(s" ms of audio with an empty transcript, want text over $t ms"))))
      // derive the empty frame from the INPUT (not spark.emptyDataFrame,
      // which is a batch frame): a streaming df then yields a streaming
      // empty frame, so StreamValidate.familyViolations can union it into
      // a writeStream without a batch/stream AnalysisException
      if (checks.isEmpty) return df.where(lit(false)).select(
        lit("").as("keyword"), lit("").as("instance_path"), lit("").as("detail"))
      projected
        .select(explode(array(checks: _*)).as("v"))
        .where(col("v").isNotNull)
        .select(col("v.keyword"), col("v.instance_path"), col("v.detail"))
    }
  }

  /** Family spec shape (the `Vocabulary.Schema` analogue, checked before
    * the parse callback — /root/reference/vocab.go:19-35).
    */
  private val shapeJson =
    """{"type": "object", "required": ["transcript", "key", "durMs"],
        "properties": {
          "transcript": {"type": "string"}, "key": {"type": "string"},
          "durMs": {"type": "string"},
          "minCharsPerSec": {"type": "number", "exclusiveMinimum": 0},
          "maxCharsPerSec": {"type": "number", "exclusiveMinimum": 0},
          "requireNonEmptyOverMs": {"type": "integer", "minimum": 0}},
        "additionalProperties": false}"""

  @volatile private var registered = false

  /** Register the `transcriptConsistency` family (idempotent). */
  def register(): Unit = synchronized {
    if (!registered) {
      ConstraintFamilies.register("transcriptConsistency", shapeJson, { node =>
        def str(k: String): Option[String] =
          Option(node.get(k)).filter(_.isTextual).map(_.asText())
        def dbl(k: String): Option[Double] =
          Option(node.get(k)).filter(_.isNumber).map(_.asDouble())
        val lo = dbl("minCharsPerSec")
        val hi = dbl("maxCharsPerSec")
        for (l <- lo; h <- hi; if l > h)
          throw SpecError("#/table/transcriptConsistency",
            s"minCharsPerSec ($l) > maxCharsPerSec ($h): the rate window is empty")
        TranscriptConsistency(
          transcriptCol = str("transcript").get,
          keyCol = str("key").get,
          durMsCol = str("durMs").get,
          minCharsPerSec = lo,
          maxCharsPerSec = hi,
          requireNonEmptyOverMs = Option(node.get("requireNonEmptyOverMs"))
            .filter(_.isIntegralNumber).map(_.asLong()))
      })
      registered = true
    }
  }
}

package graft

import graft.exec.Engine
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Batch 8: the transcript↔audio consistency family
  * ([[graft.audio.TranscriptChecks]]) as an oracle-checked query. The
  * audioSignal family needs a WAV decode and so can only be ScalaTest-
  * covered; this family is pure column arithmetic, so the FULL registered-
  * constraint-family path (spec parse → shape gate → compile callback →
  * violation frame) gets a DuckDB hash gate too.
  *
  * The clip frame is DERIVED deterministically from the driver's documents
  * table (no synthetic side data): transcript = text (emptied on every
  * 97th doc to seed requireNonEmptyOverMs rows), dur_ms = arithmetic in
  * doc_id spanning 2.0–41.2 s so the chars/sec window [6, 40] is violated
  * on both sides. The oracle reproduces the derivation and the checks in
  * ANSI SQL — both engines compute the rate in IEEE double, so the compare
  * is exact even when a row lands on a bound.
  */
object Queries8 {

  def qTranscriptConsistency(spark: SparkSession, dir: String): DataFrame = {
    graft.audio.TranscriptChecks.register()
    val clips = spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id").as("clip_id"),
      when(col("doc_id") % 97 === 0, lit("")).otherwise(col("text")).as("transcript"),
      (lit(2000L) + col("doc_id") % 50 * 800).as("dur_ms"))
    val spec =
      """{"table": {"transcriptConsistency": {
           "transcript": "transcript", "key": "clip_id", "durMs": "dur_ms",
           "minCharsPerSec": 6, "maxCharsPerSec": 40,
           "requireNonEmptyOverMs": 1000}}}"""
    Engine.tableViolations(clips, Engine.compile(spec, clips))
      .select(col("instance_path"), col("keyword"))
      .orderBy("instance_path", "keyword")
  }

  val sqlTranscriptConsistency: String =
    """WITH clips AS (
         SELECT doc_id AS clip_id,
                CASE WHEN doc_id % 97 = 0 THEN '' ELSE text END AS transcript,
                2000 + (doc_id % 50) * 800 AS dur_ms
         FROM documents
       )
       SELECT * FROM (
         SELECT CAST(clip_id AS VARCHAR) || '/transcript' AS instance_path,
                'table/transcriptConsistency/minCharsPerSec' AS keyword
         FROM clips
         WHERE transcript IS NOT NULL AND length(transcript) > 0 AND dur_ms > 0
           AND length(transcript) * 1000.0 / dur_ms < 6.0
         UNION ALL
         SELECT CAST(clip_id AS VARCHAR) || '/transcript',
                'table/transcriptConsistency/maxCharsPerSec'
         FROM clips
         WHERE transcript IS NOT NULL AND length(transcript) > 0 AND dur_ms > 0
           AND length(transcript) * 1000.0 / dur_ms > 40.0
         UNION ALL
         SELECT CAST(clip_id AS VARCHAR) || '/transcript',
                'table/transcriptConsistency/requireNonEmptyOverMs'
         FROM clips
         WHERE dur_ms > 1000 AND (transcript IS NULL OR length(transcript) = 0)
       ) ORDER BY instance_path, keyword"""

  /** The container-magic family ([[graft.audio.MagicChecks]]) as an
    * oracle-checked query: like the transcript family it is pure column
    * ops (binary substring/compare, zero decode), so the full registered-
    * family path gets a DuckDB hash gate. The clip frame is derived from
    * the documents table with ASCII-only synthetic containers (UTF-8 cast
    * = byte-identical to the SQL string), corruptions seeded on fixed
    * doc_id moduli: %31 mangles the RIFF magic, %43 truncates below the
    * WAVE offset, %7 relabels the codec out of the declared-magics scope.
    */
  def qContainerMagic(spark: SparkSession, dir: String): DataFrame = {
    graft.audio.MagicChecks.register()
    val clips = spark.read.parquet(s"$dir/documents.parquet").select(
      col("doc_id").cast("string").as("clip_id"),
      when(col("doc_id") % 31 === 0, lit("XXXX9999WAVE"))
        .when(col("doc_id") % 43 === 0, lit("RI"))
        .otherwise(lit("RIFF9999WAVEdata")).cast("binary").as("bytes"),
      when(col("doc_id") % 7 === 0, lit("opus")).otherwise(lit("wav")).as("codec"))
    val spec =
      """{"table": {"containerMagic": {
           "bytes": "bytes", "key": "clip_id", "codec": "codec",
           "magics": {"wav": [{"offset": 0, "ascii": "RIFF"},
                              {"offset": 8, "ascii": "WAVE"}]}}}}"""
    Engine.tableViolations(clips, Engine.compile(spec, clips))
      .select(col("instance_path"), col("keyword"))
      .orderBy("instance_path", "keyword")
  }

  val sqlContainerMagic: String =
    """WITH clips AS (
         SELECT CAST(doc_id AS VARCHAR) AS clip_id,
                CASE WHEN doc_id % 31 = 0 THEN 'XXXX9999WAVE'
                     WHEN doc_id % 43 = 0 THEN 'RI'
                     ELSE 'RIFF9999WAVEdata' END AS bytes_s,
                CASE WHEN doc_id % 7 = 0 THEN 'opus' ELSE 'wav' END AS codec
         FROM documents
       )
       SELECT clip_id || '/bytes' AS instance_path,
              'table/containerMagic/wav' AS keyword
       FROM clips
       WHERE codec = 'wav'
         AND NOT (substring(bytes_s, 1, 4) = 'RIFF'
                  AND substring(bytes_s, 9, 4) = 'WAVE')
       ORDER BY instance_path, keyword"""

  /** (query, oracle) registry for this batch. */
  def registry: Map[String, ((SparkSession, String) => DataFrame, String)] = Map(
    "q_transcript_consistency" -> ((qTranscriptConsistency _, sqlTranscriptConsistency)),
    "q_container_magic" -> ((qContainerMagic _, sqlContainerMagic))
  )
}

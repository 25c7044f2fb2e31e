package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for pipeline curation: token counting (whitespace
  * + BPE-ish regex), quality counters, n-gram-profile language ID, and
  * document fingerprinting. All pure codegen'd expressions — the whole
  * battery fuses into the scan pass (verified: single WholeStageCodegen
  * span, no shuffle).
  */
object TextStats {

  def tokenCount(text: Column): Column = size(split(text, " "))

  /** BPE-ish subword token estimate: runs of letters, runs of digits, or a
    * single other non-space char.
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"), lit(0)))

  def punctCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[.,!?;:]"), lit(0)))

  def digitCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[0-9]"), lit(0)))

  /** Count of tokens exactly equal to `w`. */
  def wordCount(text: Column, w: String): Column =
    size(filter(split(text, " "), t => t === w))

  /** Stopword profiles per language — the n-gram-heuristic language ID.
    * Deterministic argmax with fixed preference order on ties.
    */
  val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "a"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(text: Column, words: Seq[String]): Column =
    words.map(w => wordCount(text, w)).reduce(_ + _)

  /** Predicted language: highest stopword-profile score; ties resolved by
    * profile order (en, de, es, fr, zh).
    */
  def langId(text: Column): Column = {
    val scores = langProfiles.map { case (l, ws) => l -> langScore(text, ws) }
    scores.tail.foldLeft(
      (when(lit(true), scores.head._2), when(lit(true), lit(scores.head._1)))) {
      case ((bestScore, bestLang), (l, s)) =>
        (when(s > bestScore, s).otherwise(bestScore),
          when(s > bestScore, lit(l)).otherwise(bestLang))
    }._2
  }

  /** Canonical content fingerprint: md5 of lowercased text with all
    * non-alphanumerics removed (rolling-hash analogue, collision-checked by
    * the exact-dedup arm).
    */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(text), "[^a-z0-9]", ""))

  /** The full battery over a document table. */
  def battery(df: DataFrame, keyCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    df.select(
      col(keyCol),
      length(t).as("n_chars"),
      tokenCount(t).as("n_tokens"),
      bpeTokenCount(t).as("n_bpe_tokens"),
      punctCount(t).as("n_punct"),
      digitCount(t).as("n_digits"),
      langId(t).as("lang_pred"),
      fingerprint(t).as("fingerprint"))
  }
}

package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Registries for `contentEncoding` decoders and `contentMediaType`
  * validators — the Spark analogue of the reference's Decoder / MediaType
  * registration surface (/root/reference/content.go:9-38, hooks
  * RegisterContentEncoding / RegisterContentMediaType at
  * /root/reference/compiler.go:85-95).
  *
  * A decoder maps the encoded string column to its decoded string form and
  * must yield NULL on undecodable input (try_* semantics) — the compiler
  * turns that NULL into a contentEncoding violation and downstream checks
  * become vacuous, mirroring the reference's decode-then-parse pipeline.
  * A media-type validator is a boolean predicate over the DECODED value.
  *
  * Everything registered must be a pure Column transform so the whole
  * content pipeline stays inside WholeStageCodegen.
  */
object Content {

  @volatile private var encodings: Map[String, Column => Column] = Map(
    "base64" -> (v => try_to_binary(v, lit("base64")).cast(StringType))
  )

  @volatile private var mediaTypes: Map[String, Column => Column] = Map(
    // Go-decoder parity (the reference checks content via the same
    // UnmarshalJSON, loader.go:255-266): duplicate keys are valid (last
    // wins — Jackson-normalize fallback, evaluated only when the native
    // parse rejects), trailing content after the first value is NOT
    // (one-pass lexical guard) — see JsonNormExpr / JsonGoLexExpr
    "application/json" -> (v => JsonGoLexExpr.col(v) &&
      coalesce(try_parse_json(v), try_parse_json(JsonNormExpr.col(v))).isNotNull)
  )

  def registerEncoding(name: String, decode: Column => Column): Unit =
    synchronized { encodings = encodings + (name -> decode) }

  def registerMediaType(name: String, parseOk: Column => Column): Unit =
    synchronized { mediaTypes = mediaTypes + (name -> parseOk) }

  def encoding(name: String): Option[Column => Column] = encodings.get(name)
  def mediaType(name: String): Option[Column => Column] = mediaTypes.get(name)
  def knownEncodings: Set[String] = encodings.keySet
  def knownMediaTypes: Set[String] = mediaTypes.keySet
}

package graft.audio

import graft.spec.{ConstraintFamilies, CustomConstraint, SpecError}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Container magic-byte ↔ codec-column consistency over the clip table —
  * the zero-decode companion of [[AudioChecks]]: a row whose `codec` column
  * claims a container format must carry that container's magic bytes at the
  * declared offsets. Catches mislabeled codec metadata and header-corrupted
  * payloads at WIRE SPEED — pure codegen'd `substring`/compare over the
  * binary column, no UDF, no decode, no shuffle — where the decode-derived
  * signal family pays a full PCM parse per row. At 100 TB this is the check
  * you run on EVERY row; the decode family is the check you sample or gate
  * behind it.
  *
  * Spec shape (same registered-family surface as the reference's custom
  * vocabularies, /root/reference/vocab.go:19-44):
  *
  * {{{
  * "containerMagic": {
  *   "bytes": "bytes", "key": "clip_id", "codec": "codec",
  *   "magics": {
  *     "wav":  [{"offset": 0, "ascii": "RIFF"}, {"offset": 8, "ascii": "WAVE"}],
  *     "flac": [{"offset": 0, "ascii": "fLaC"}]
  *   }
  * }
  * }}}
  *
  * Rows whose codec value has no `magics` entry are out of scope (pass);
  * rows whose codec is declared must match EVERY (offset, ascii) pair —
  * null or too-short `bytes` is a violation (the container cannot carry the
  * magic it claims). One keyword per declared codec
  * (`table/containerMagic/<codec>`), mirroring the one-error-per-keyword
  * model (/root/reference/validator.go:171-195).
  */
object MagicChecks {

  final case class MagicPair(offset: Int, ascii: String)

  final case class ContainerMagic(
      bytesCol: String, keyCol: String, codecCol: String,
      magics: Seq[(String, Seq[MagicPair])]) extends CustomConstraint {

    def name = s"containerMagic($bytesCol)"

    def violations(df: DataFrame, refs: Map[String, DataFrame]): DataFrame = {
      val kwBase = "table/containerMagic"
      // prune the scan to exactly (key, codec, bytes) — bytes stays columnar
      // and never crosses a shuffle (violation rows are tiny strings)
      val projected = df.select(
        col(keyCol).cast("string").as("__key"),
        col(codecCol).cast("string").as("__codec"),
        col(bytesCol).as("__bytes"))
      val bytes = col("__bytes")
      val path = concat(col("__key"), lit(s"/$bytesCol"))
      val checks: Seq[Column] = magics.map { case (codec, pairs) =>
        val matchesAll = pairs.map { p =>
          val want = p.ascii.getBytes("US-ASCII")
          length(bytes) >= p.offset + want.length &&
            substring(bytes, p.offset + 1, want.length) === lit(want)
        }.reduce(_ && _)
        val wantDesc = pairs.map(p => s"${p.ascii}@${p.offset}").mkString("+")
        // dump the whole declared-magic window so the defective region is
        // always visible in the detail (not just a healthy prefix)
        val dumpLen = pairs.map(p => p.offset + p.ascii.length).max
        when(col("__codec") === codec && !(bytes.isNotNull && matchesAll),
          struct(lit(s"$kwBase/$codec").as("keyword"),
            path.as("instance_path"),
            concat(lit(s"codec '$codec' requires container magic $wantDesc, bytes carry "),
              when(bytes.isNull, lit("NULL"))
                .otherwise(concat(lit("0x"), hex(substring(bytes, 1, dumpLen)))))
              .as("detail")))
      }
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
    """{"type": "object", "required": ["bytes", "key", "codec", "magics"],
        "properties": {
          "bytes": {"type": "string"}, "key": {"type": "string"},
          "codec": {"type": "string"},
          "magics": {"type": "object", "minProperties": 1,
            "additionalProperties": {"type": "array", "minItems": 1,
              "items": {"type": "object", "required": ["offset", "ascii"],
                "properties": {
                  "offset": {"type": "integer", "minimum": 0,
                             "maximum": 1048576},
                  "ascii": {"type": "string", "minLength": 1,
                            "pattern": "^[\\u0020-\\u007e]+$"}},
                "additionalProperties": false}}}},
        "additionalProperties": false}"""

  @volatile private var registered = false

  /** Register the `containerMagic` family (idempotent). */
  def register(): Unit = synchronized {
    if (!registered) {
      ConstraintFamilies.register("containerMagic", shapeJson, { node =>
        def str(k: String): String = node.get(k).asText()
        val magicsNode = node.get("magics")
        val magics = {
          val it = magicsNode.fields()
          val buf = Seq.newBuilder[(String, Seq[MagicPair])]
          while (it.hasNext) {
            val e = it.next()
            val pairs = (0 until e.getValue.size()).map { i =>
              val p = e.getValue.get(i)
              MagicPair(p.get("offset").asInt(), p.get("ascii").asText())
            }
            val overlapping = pairs.sortBy(_.offset).sliding(2).exists {
              case Seq(a, b) => a.offset + a.ascii.length > b.offset
              case _         => false
            }
            if (overlapping)
              throw SpecError("#/table/containerMagic",
                s"codec '${e.getKey}': magic ranges overlap")
            buf += e.getKey -> pairs
          }
          buf.result()
        }
        ContainerMagic(
          bytesCol = str("bytes"), keyCol = str("key"),
          codecCol = str("codec"), magics = magics)
      })
      registered = true
    }
  }
}

package graft

/** The flagship constraint suite over the audio clip table (BASELINE.json
  * north_star): row-level keyword checks + table-level uniqueness,
  * referential integrity and drift — the full constraint suite the
  * clips/sec metric is measured on.
  */
object ClipSuite {

  /** Row-level + table-level spec. Per-codec sr_hz dispatch mirrors the
    * reference's discriminator vocabulary example
    * (/root/reference/example_vocab_discriminator_test.go:13-41) as
    * if/then row rules.
    */
  val specJson: String =
    """{
      "$defs": {
        "validSr": { "type": "integer", "minimum": 8000, "maximum": 48000 }
      },
      "columns": {
        "clip_id": { "type": "string", "format": "uuid",
                     "pattern": "^[0-9a-f]{8}-" },
        "sr_hz":   { "$ref": "#/$defs/validSr" },
        "dur_ms":  { "type": "integer", "exclusiveMinimum": 0, "maximum": 36000000 },
        "codec":   { "enum": ["flac", "wav", "opus", "mp3", "pcm_s16le"] },
        "transcript": { "type": "string", "minLength": 1, "maxLength": 100000 }
      },
      "required": ["clip_id", "sr_hz", "dur_ms", "codec", "transcript"],
      "row": [
        { "if":   { "properties": { "codec": { "const": "opus" } } },
          "then": { "properties": { "sr_hz": { "enum": [8000, 16000, 24000, 48000] } } } }
      ],
      "table": {
        "unique": ["clip_id"],
        "foreignKey": [
          { "columns": "codec", "refTable": "ref_codecs", "refColumns": "codec" }
        ],
        "drift": [
          { "column": "sr_hz", "method": "psi", "threshold": 0.25,
            "edges": [8001, 16001, 22051, 44101],
            "refProportions": [0.08, 0.10, 0.07, 0.70, 0.05] }
        ],
        "stats": ["sr_hz", "dur_ms", "codec", "transcript"]
      }
    }"""

  /** Deep suite: everything in [[specJson]] PLUS the audio decodability
    * check over `bytes` (contentEncoding analogue, SURVEY.md §2.2) — the
    * representative production workload where per-row decode compute
    * dominates I/O. Requires [[graft.audio.AudioGen.registerFormats]].
    */
  val deepSpecJson: String = {
    val withBytes = """"bytes":   { "format": "wav" },"""
    specJson.replace(""""clip_id":""", withBytes + "\n        \"clip_id\":")
  }

  /** Signal suite: [[deepSpecJson]] PLUS the decode-derived `audioSignal`
    * constraint family ([[graft.audio.AudioChecks]]) — clipping and silence
    * checks plus container-vs-metadata sr consistency — and the zero-decode
    * `containerMagic` family ([[graft.audio.MagicChecks]]): codec-column
    * claims must match the container magic bytes (the corpus's RIFF-mangled
    * rows fire it on wav/pcm_s16le-labeled rows at wire speed, no decode). (The family also
    * supports DC-offset and duration-consistency checks, exercised with
    * handcrafted clips in AudioChecksSpec; they are left out of THIS suite
    * because the generated corpus deliberately truncates PCM to 1600
    * samples, which would trip them on every clean row.) The corpus seeds
    * sr mismatches — metadata sr 0 / -1 while the WAV container is 16 kHz —
    * so srConsistent fires on real rows.
    */
  val signalSpecJson: String =
    deepSpecJson.replace(""""stats":""",
      """"audioSignal": { "bytes": "bytes", "key": "clip_id",
            "srHz": "sr_hz",
            "maxClippingRatio": 0.01, "minRmsDb": -60.0,
            "srConsistent": true },
        "containerMagic": { "bytes": "bytes", "key": "clip_id",
            "codec": "codec",
            "magics": { "wav": [ {"offset": 0, "ascii": "RIFF"},
                                 {"offset": 8, "ascii": "WAVE"} ],
                        "pcm_s16le": [ {"offset": 0, "ascii": "RIFF"},
                                       {"offset": 8, "ascii": "WAVE"} ] } },
        "stats":""")

  /** The reference codec dimension table (FIXTURES.md §2). */
  def refCodecs(spark: org.apache.spark.sql.SparkSession)
      : org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    Seq(("flac", 48000), ("wav", 48000), ("opus", 48000),
      ("mp3", 48000), ("pcm_s16le", 48000))
      .toDF("codec", "max_sr_hz")
  }
}

package graft.audio

import java.nio.{ByteBuffer, ByteOrder}

/** Minimal PCM s16le mono WAV codec, public-format only (RIFF/WAVE spec).
  * Used by the deterministic synthetic corpus (FIXTURES.md §1) and by the
  * decode-oracle: per-row PCM allclose vs the expected signal (SNR ≥ 30 dB,
  * BASELINE.json input_hint). Pure JVM functions — wrapped as UDFs by
  * [[AudioGen]]; kept OFF the default constraint path so the scan never reads
  * `bytes` unless an audio-content check is active (SURVEY.md §7.4).
  */
object Wav {

  /** Encode 16-bit mono PCM samples to a standard 44-byte-header WAV. */
  def encode(samples: Array[Short], srHz: Int): Array[Byte] = {
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("ASCII"))
    buf.put("fmt ".getBytes("ASCII")).putInt(16)
    buf.putShort(1.toShort)            // PCM
    buf.putShort(1.toShort)            // mono
    buf.putInt(srHz)
    buf.putInt(srHz * 2)               // byte rate
    buf.putShort(2.toShort)            // block align
    buf.putShort(16.toShort)           // bits per sample
    buf.put("data".getBytes("ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a PCM s16le mono WAV; None when the container/format is invalid
    * (the decodability constraint's failure arm).
    */
  def decode(bytes: Array[Byte]): Option[(Array[Short], Int)] = {
    if (bytes == null || bytes.length < 44) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val riff = new Array[Byte](4); buf.get(riff)
    if (new String(riff, "ASCII") != "RIFF") return None
    buf.getInt // chunk size (unchecked: tolerate truncated writers)
    val wave = new Array[Byte](4); buf.get(wave)
    if (new String(wave, "ASCII") != "WAVE") return None
    var srHz = 0
    var data: Array[Short] = null
    // walk chunks
    while (buf.remaining() >= 8) {
      val idBytes = new Array[Byte](4); buf.get(idBytes)
      val id = new String(idBytes, "ASCII")
      val len = buf.getInt
      if (len < 0 || len > buf.remaining()) return None
      id match {
        case "fmt " =>
          if (len < 16) return None
          val fmtStart = buf.position()
          val audioFormat = buf.getShort
          val channels = buf.getShort
          srHz = buf.getInt
          buf.getInt; buf.getShort
          val bits = buf.getShort
          if (audioFormat != 1 || channels != 1 || bits != 16) return None
          buf.position(fmtStart + len)
        case "data" =>
          val n = len / 2
          data = new Array[Short](n)
          var i = 0
          while (i < n) { data(i) = buf.getShort; i += 1 }
          buf.position(buf.position() + (len - n * 2))
        case _ =>
          buf.position(buf.position() + len)
      }
    }
    if (srHz <= 0 || data == null) None else Some((data, srHz))
  }

  /** Signal-to-noise ratio in dB of `test` against `ref` (allclose oracle:
    * SNR ≥ 30 dB per BASELINE.json). Identical signals → capped at 999.0.
    */
  def snrDb(ref: Array[Short], test: Array[Short]): Double = {
    if (ref == null || test == null || ref.length != test.length) return Double.NegativeInfinity
    var sig = 0.0
    var err = 0.0
    var i = 0
    while (i < ref.length) {
      val r = ref(i).toDouble
      val d = r - test(i).toDouble
      sig += r * r
      err += d * d
      i += 1
    }
    if (err == 0.0) 999.0
    else if (sig == 0.0) Double.NegativeInfinity
    else 10.0 * math.log10(sig / err)
  }
}

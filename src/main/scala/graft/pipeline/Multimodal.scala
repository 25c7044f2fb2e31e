package graft.pipeline

import graft.audio.Wav
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` + typed metadata structs.
  *
  * The AUDIO arm is fully real (the repo ships a WAV codec): decode, feature
  * extraction, and frame sampling run as typed UDFs over the binary column.
  * The IMAGE arm is the Spark-side plumbing (schema, batching, partition
  * shape) around a STUBBED decoder — this container has no image libs, so
  * `decodeImageStub` produces a deterministic fake (hash-derived dimensions
  * + intensity) with the exact struct shape a real decoder would emit.
  * Swapping in a real decoder changes one function body, nothing in the
  * plan.
  *
  * Scale note: these UDFs are the ONLY operators allowed to touch the bytes
  * column, and callers must project (key, bytes) only — the feature frames
  * produced are small, so the expensive column never crosses a shuffle.
  */
object Multimodal {

  final case class AudioFeatures(
      n_samples: Int, sr_hz: Int, duration_s: Double,
      rms: Double, peak: Double, zero_cross_rate: Double)

  final case class ImageMeta(width: Int, height: Int, channels: Int, format: String)

  /** Real audio feature extraction from WAV bytes (NULL if undecodable). */
  val audioFeatures: Column => Column = {
    val f = udf { (b: Array[Byte]) =>
      Wav.decode(b).map { case (pcm, sr) =>
        var sum2 = 0.0
        var peak = 0.0
        var zc = 0
        var i = 0
        while (i < pcm.length) {
          val v = pcm(i) / 32768.0
          sum2 += v * v
          if (math.abs(v) > peak) peak = math.abs(v)
          if (i > 0 && ((pcm(i) >= 0) != (pcm(i - 1) >= 0))) zc += 1
          i += 1
        }
        val n = math.max(pcm.length, 1)
        AudioFeatures(pcm.length, sr, pcm.length.toDouble / sr,
          math.sqrt(sum2 / n), peak, zc.toDouble / n)
      }
    }
    c => f(c)
  }

  /** Frame-sampled RMS energies: one value per frame of `frameLen` samples,
    * keeping every `stride`-th frame — the audio analogue of video
    * frame-sampling.
    */
  def frameEnergies(frameLen: Int, stride: Int): Column => Column = {
    val f = udf { (b: Array[Byte]) =>
      Wav.decode(b).map { case (pcm, _) =>
        val nFrames = pcm.length / frameLen
        (0 until nFrames by stride).map { fi =>
          var s = 0.0
          var i = fi * frameLen
          val end = i + frameLen
          while (i < end) { val v = pcm(i) / 32768.0; s += v * v; i += 1 }
          math.sqrt(s / frameLen)
        }.toArray
      }
    }
    c => f(c)
  }

  /** STUB image decode: deterministic fake metadata from the byte content.
    * Real plumbing, fake pixels — replace the body with an actual codec
    * (javax.imageio etc.) when the runtime ships one.
    */
  val decodeImageStub: Column => Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null || b.length < 8) None
      else {
        var h = 1125899906842597L
        var i = 0
        while (i < math.min(b.length, 64)) { h = 31 * h + b(i); i += 1 }
        val w = 64 + math.floorMod(h, 1024L).toInt
        val ht = 64 + math.floorMod(h >>> 20, 1024L).toInt
        Some(ImageMeta(w, ht, 3, "stub/rgb"))
      }
    }
    c => f(c)
  }

  /** Resize stub: maps metadata through an exact integer scale — the shape
    * contract of a real resampler.
    */
  def resizeMeta(meta: Column, maxSide: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val scale = greatest(w, h).cast("double") / lit(maxSide.toDouble)
    struct(
      when(scale > 1, (w / scale).cast("int")).otherwise(w).as("width"),
      when(scale > 1, (h / scale).cast("int")).otherwise(h).as("height"),
      meta.getField("channels").as("channels"),
      meta.getField("format").as("format"))
  }

  /** Feature table over a media-bearing frame: project only (key, bytes),
    * extract, never carry bytes past this operator.
    */
  def audioFeatureTable(df: DataFrame, keyCol: String, bytesCol: String): DataFrame =
    df.select(col(keyCol), audioFeatures(col(bytesCol)).as("f"))
      .select(col(keyCol), col("f.*"))
}

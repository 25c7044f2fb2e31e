package graft.pipeline

import graft.audio.Wav
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal columns: media as opaque `binary` + typed metadata structs.
  *
  * Both arms are REAL:
  *  - AUDIO: the repo ships a WAV codec — decode, feature extraction and
  *    frame sampling run as typed UDFs over the binary column.
  *  - IMAGE: decode/feature-extract/resize via the JDK's own
  *    `javax.imageio` (headless-safe, no external libs — PNG/JPEG/BMP/GIF
  *    readers ship with the JVM). [[decodeImageStub]] remains as the
  *    documented template for codecs the runtime genuinely lacks (e.g.
  *    video): real plumbing, deterministic fake payloads.
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

  final case class ImageFeatures(
      width: Int, height: Int, channels: Int, format: String, mean_luma: Double)

  /** Container sniff from magic bytes (the format ImageIO decoded FROM —
    * ImageIO itself does not report it).
    */
  private def sniffFormat(b: Array[Byte]): String =
    if (b.length >= 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P') "png"
    else if (b.length >= 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8) "jpeg"
    else if (b.length >= 2 && b(0) == 'B' && b(1) == 'M') "bmp"
    else if (b.length >= 4 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') "gif"
    else "unknown"

  /** Decoded-pixel budget: a decompression bomb (kilobytes of PNG declaring
    * a 60000×60000 canvas) must NOT reach the full decode — dimensions are
    * peeked from the container header first and oversized inputs yield NULL
    * like any other undecodable payload.
    */
  private val MaxDecodedPixels = 64L * 1024 * 1024 // 64 MP ≈ 256 MB of ARGB

  /** ImageIO defaults to DISK-backed stream caches — one temp file per
    * decode — which is pure churn for already-in-memory byte arrays; flip
    * the process-global switch once per executor JVM.
    */
  private lazy val imageIoInMemory: Unit =
    javax.imageio.ImageIO.setUseCache(false)

  /** Header-peek + bounded decode: NULL on undecodable bytes, unknown
    * containers, and over-budget dimensions.
    */
  private def readBounded(b: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    imageIoInMemory
    val iis = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(b))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(iis)
      if (!readers.hasNext) None
      else {
        val r = readers.next()
        try {
          r.setInput(iis)
          val w = r.getWidth(0).toLong
          val h = r.getHeight(0).toLong
          if (w <= 0 || h <= 0 || w * h > MaxDecodedPixels) None
          else Option(r.read(0))
        } finally r.dispose()
      }
    } catch {
      case scala.util.control.NonFatal(_) => None
    } finally iis.close()
  }

  /** REAL image decode + feature extraction via the JDK's javax.imageio
    * (PNG/JPEG/BMP/GIF; headless-safe; NULL on undecodable or over-budget
    * bytes). mean_luma is Rec.601 luma in [0,1], sampled on a bounded
    * ≤64×64 pixel grid (ceil-division strides) so a huge input costs the
    * same as a thumbnail.
    */
  val imageFeatures: Column => Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null) None
      else try {
        readBounded(b)
          .map { img =>
            val w = img.getWidth
            val h = img.getHeight
            val sx = math.max(1, (w + 63) / 64)
            val sy = math.max(1, (h + 63) / 64)
            var sum = 0.0
            var n = 0
            var y = 0
            while (y < h) {
              var x = 0
              while (x < w) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xFF) * 0.299 +
                  ((rgb >> 8) & 0xFF) * 0.587 + (rgb & 0xFF) * 0.114) / 255.0
                n += 1
                x += sx
              }
              y += sy
            }
            ImageFeatures(w, h, img.getColorModel.getNumComponents,
              sniffFormat(b), if (n == 0) 0.0 else sum / n)
          }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    c => f(c)
  }

  /** REAL resize: bilinear down-scale so max(side) ≤ maxSide (no-op pass
    * through for smaller images), re-encoded as PNG bytes. Headless
    * BufferedImage + Graphics2D — deterministic output.
    */
  def resizeImage(maxSide: Int): Column => Column = {
    val f = udf { (b: Array[Byte]) =>
      if (b == null) None
      else try {
        readBounded(b)
          .map { img =>
            val w = img.getWidth
            val h = img.getHeight
            if (math.max(w, h) <= maxSide) b
            else {
              val scale = maxSide.toDouble / math.max(w, h)
              val nw = math.max(1, math.round(w * scale).toInt)
              val nh = math.max(1, math.round(h * scale).toInt)
              val out = new java.awt.image.BufferedImage(
                nw, nh, java.awt.image.BufferedImage.TYPE_INT_RGB)
              val g = out.createGraphics()
              g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
                java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
              g.drawImage(img, 0, 0, nw, nh, null)
              g.dispose()
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              bos.toByteArray
            }
          }
      } catch { case scala.util.control.NonFatal(_) => None }
    }
    c => f(c)
  }

  /** Image feature table: project only (key, bytes), extract, drop bytes.
    * Fan-out before the decode (see [[PipelineUtil.fanOut]]): per-row image
    * decode is the most CPU-heavy pass in the module, and a small corpus
    * arriving as one parquet split would otherwise decode on one core —
    * no-op at real scale.
    */
  def imageFeatureTable(df: DataFrame, keyCol: String, bytesCol: String): DataFrame =
    PipelineUtil.fanOut(df.select(col(keyCol), col(bytesCol)))
      .select(col(keyCol), imageFeatures(col(bytesCol)).as("f"))
      .select(col(keyCol), col("f.*"))

  /** STUB image decode: deterministic fake metadata from the byte content.
    * Retained as the documented TEMPLATE for codecs the runtime genuinely
    * lacks (e.g. video) — for PNG/JPEG/BMP/GIF use the real
    * [[imageFeatures]] above.
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
    * extract, never carry bytes past this operator. Fan-out before the
    * per-row WAV decode for the same reason as [[imageFeatureTable]].
    */
  def audioFeatureTable(df: DataFrame, keyCol: String, bytesCol: String): DataFrame =
    PipelineUtil.fanOut(df.select(col(keyCol), col(bytesCol)))
      .select(col(keyCol), audioFeatures(col(bytesCol)).as("f"))
      .select(col(keyCol), col("f.*"))
}

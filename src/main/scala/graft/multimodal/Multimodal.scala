package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column plumbing.
  *
  * Media payloads are opaque `binary` columns traveling next to typed
  * metadata — the schema/partitioning pattern for a 100 TB multimodal
  * corpus. Decode/feature-extract runs as a typed `mapPartitions` over a
  * `Dataset[MediaRecord]` so per-partition state (a decoder handle, a
  * model session) is initialized once per task, not per row — the Scala
  * analogue of a batched pandas UDF.
  *
  * IMAGES and AUDIO decode for real: [[ImageCodec]] binds
  * `javax.imageio` (in the JDK, zero-egress) for PNG/BMP/GIF, reading
  * actual pixel data through the raster; [[AudioCodec]] binds
  * `javax.sound.sampled` (also JDK) for WAV/PCM, reading actual sample
  * data frame by frame. The one format family the JDK lacks (video)
  * falls back to the deterministic [[DecodeStub]] so the pipeline
  * around it — schema, batching, partitioning, feature columns — stays
  * fully testable; swap the stub for a codec binding (JNI/FFI) in
  * production.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media: Array[Byte], media_type: String)
  /** `pixel_sum` is the sum of band-0 samples from a REAL image decode;
    * `sample_sum` is the sum of PCM samples from a REAL audio decode —
    * each 0 on every other path (no such data exists to sum). For audio
    * media, width = sample rate (Hz), height = channel count, and
    * n_frames = number of 1024-frame analysis windows (the audio ->
    * windows fan-out unit, mirroring video -> frames). */
  case class MediaFeatures(doc_id: Long, byte_len: Int, content_md5: String,
                           width: Int, height: Int, n_frames: Int,
                           pixel_sum: Long, sample_sum: Long)

  /** STUB decoder for the one format family the JDK can't decode
    * (video): derives fake-but-deterministic media dimensions from the
    * payload bytes. Replace with a real codec (JNI/FFI) binding. */
  object DecodeStub {
    def decode(media: Array[Byte]): (Int, Int, Int) = {
      val n = media.length
      (n % 640 + 1, (n * 7) % 480 + 1, n % 30 + 1)
    }
  }

  /** REAL image codec on `javax.imageio` (JDK-bundled, headless-safe).
    * Encode writes an 8-bit grayscale PNG; decode reads the image back
    * and extracts width/height plus the sum of all pixel samples
    * through the raster — an actual pixel-data pass, so a broken
    * decode (wrong dims, corrupted pixels) changes the output. */
  object ImageCodec {
    import java.awt.image.BufferedImage
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.imageio.ImageIO

    /** Deterministic grayscale test pattern:
      * pixel(x, y) = (31x + 7y + base) mod 256. Lossless PNG, so the
      * decoded raster reproduces it exactly. */
    def encodePng(w: Int, h: Int, base: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          raster.setSample(x, y, 0, (x * 31 + y * 7 + base) % 256)
          x += 1
        }
        y += 1
      }
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }

    /** (width, height, sum of band-0 samples), or None when no
      * registered reader recognizes the payload. */
    def decode(media: Array[Byte]): Option[(Int, Int, Long)] = {
      val img = ImageIO.read(new ByteArrayInputStream(media))
      if (img == null) None
      else {
        val raster = img.getRaster
        val (w, h) = (img.getWidth, img.getHeight)
        var sum = 0L
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            sum += raster.getSample(x, y, 0)
            x += 1
          }
          y += 1
        }
        Some((w, h, sum))
      }
    }
  }

  /** REAL audio codec on `javax.sound.sampled` (JDK-bundled,
    * headless-safe): WAV container, 16-bit signed PCM. Encode writes a
    * mono little-endian WAV; decode accepts any 16-bit PCM_SIGNED
    * WAV/AU/AIFF the JDK recognizes (either endianness, any channel
    * count) and reads EVERY sample through the frame stream — an
    * actual sample-data pass, so a broken decode (wrong rate, dropped
    * frames, corrupted samples) changes the output. */
  object AudioCodec {
    import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat,
      AudioInputStream, AudioSystem, UnsupportedAudioFileException}

    /** 16-bit mono little-endian PCM samples -> WAV bytes. */
    def encodeWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        sampleRate.toFloat, 16, 1, 2, sampleRate.toFloat, false)
      val pcm = new Array[Byte](samples.length * 2)
      var i = 0
      while (i < samples.length) {
        pcm(i * 2) = (samples(i) & 0xff).toByte
        pcm(i * 2 + 1) = ((samples(i) >> 8) & 0xff).toByte
        i += 1
      }
      val ais = new AudioInputStream(
        new ByteArrayInputStream(pcm), fmt, samples.length.toLong)
      val out = new ByteArrayOutputStream()
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE, out)
      out.toByteArray
    }

    /** (sampleRateHz, channels, pcmFrameCount, sum of ALL samples
      * across channels), or None when the payload isn't a 16-bit
      * PCM_SIGNED stream the JDK recognizes. */
    def decode(media: Array[Byte]): Option[(Int, Int, Long, Long)] =
      try {
        val ais = AudioSystem.getAudioInputStream(
          new ByteArrayInputStream(media))
        try {
          val fmt = ais.getFormat
          if (fmt.getEncoding != AudioFormat.Encoding.PCM_SIGNED ||
              fmt.getSampleSizeInBits != 16) None
          else {
            val frameSize = fmt.getFrameSize
            val big = fmt.isBigEndian
            val buf = new Array[Byte](8192 - 8192 % frameSize)
            var sum = 0L
            var frames = 0L
            var n = ais.read(buf)
            while (n > 0) {
              var i = 0
              while (i + 1 < n) {
                val s =
                  if (big) (buf(i).toInt << 8) | (buf(i + 1) & 0xff)
                  else (buf(i + 1).toInt << 8) | (buf(i) & 0xff)
                sum += s
                i += 2
              }
              frames += n / frameSize
              n = ais.read(buf)
            }
            Some((fmt.getSampleRate.toInt, fmt.getChannels, frames, sum))
          }
        } finally ais.close()
      } catch {
        case _: UnsupportedAudioFileException => None
        case _: java.io.IOException => None
      }
  }

  /** PCM frames per [[sampleFrames]] analysis window (audio -> windows
    * fan-out unit). */
  val AudioWindowFrames = 1024L

  private val HexChars = "0123456789abcdef".toCharArray

  /** Lowercase hex without per-byte String.format (which dominated the
    * frame-sampling profile at ~16 format calls per row). */
  private def hex(bytes: Array[Byte]): String = {
    val out = new Array[Char](bytes.length * 2)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      out(i * 2) = HexChars(b >>> 4)
      out(i * 2 + 1) = HexChars(b & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Wrap a text/binary-source DataFrame into the canonical media frame:
    * (doc_id, media binary, media_type). */
  def toMediaFrame(df: DataFrame, idCol: String, payloadCol: String,
                   mediaType: String): DataFrame =
    df.select(col(idCol).cast("long").as("doc_id"),
      col(payloadCol).cast("binary").as("media"),
      lit(mediaType).as("media_type"))

  case class FrameSample(doc_id: Long, frame_idx: Int, frame_md5: String)

  /** Decode dispatch: image media goes through the real [[ImageCodec]]
    * (an image is one frame, width x height, pixel_sum from the
    * raster); audio media through the real [[AudioCodec]] (sample rate
    * x channels, n_frames = 1024-frame windows, sample_sum from the
    * PCM stream); everything else — and any payload its codec doesn't
    * recognize — takes the deterministic [[DecodeStub]] with both sums
    * 0. Returns (width, height, n_frames, pixel_sum, sample_sum). */
  private def decodeAny(rec: MediaRecord): (Int, Int, Int, Long, Long) = {
    val mt = rec.media_type
    if (mt.startsWith("image")) ImageCodec.decode(rec.media) match {
      case Some((w, h, pixelSum)) => return (w, h, 1, pixelSum, 0L)
      case None =>
    }
    if (mt.startsWith("audio")) AudioCodec.decode(rec.media) match {
      case Some((rate, channels, frames, sampleSum)) =>
        val windows =
          ((frames + AudioWindowFrames - 1) / AudioWindowFrames).toInt
        return (rate, channels, windows, 0L, sampleSum)
      case None =>
    }
    val (w, h, f) = DecodeStub.decode(rec.media)
    (w, h, f, 0L, 0L)
  }

  /** Frame sampling: one output row per sampled frame — the canonical
    * media fan-out (video -> frames, audio -> windows). Image media
    * decodes for real (one frame); audio media decodes for real (one
    * row per 1024-frame PCM window); video uses the [[DecodeStub]]
    * frame count. The SHAPE (typed flatMap fan-out, per-partition
    * decoder reuse, frame index + content hash schema) is the real
    * plumbing a video-codec drop-in would inherit. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   everyNth: Int = 1): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { rec =>
        val (_, _, frames, _, _) = decodeAny(rec)
        (0 until frames by everyNth).iterator.map { i =>
          digest.reset()
          digest.update(rec.media)
          digest.update(s"_$i".getBytes("UTF-8"))
          FrameSample(rec.doc_id, i, hex(digest.digest()))
        }
      }
    }
  }

  /** Decode + feature-extract via typed mapPartitions (per-partition
    * decoder init; rows stream through without materializing the
    * partition). */
  def extractFeatures(spark: SparkSession, media: DataFrame): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      // per-partition decoder/session init would go here
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.map { rec =>
        val (w, h, f, pixelSum, sampleSum) = decodeAny(rec)
        digest.reset()
        MediaFeatures(rec.doc_id, rec.media.length, hex(digest.digest(rec.media)),
          w, h, f, pixelSum, sampleSum)
      }
    }
  }
}

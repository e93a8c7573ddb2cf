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
  * IMAGES decode for real: [[ImageCodec]] binds `javax.imageio` (in the
  * JDK, zero-egress) for PNG/BMP/GIF, reading actual pixel data through
  * the raster. Formats the JDK lacks (video/audio) fall back to the
  * deterministic [[DecodeStub]] so the pipeline around them — schema,
  * batching, partitioning, feature columns — stays fully testable; swap
  * the stub for a codec binding (JNI/FFI) in production.
  */
object Multimodal {

  case class MediaRecord(doc_id: Long, media: Array[Byte], media_type: String)
  /** `pixel_sum` is the sum of band-0 samples from a REAL decode (image
    * media); 0 on the stub path, where no pixel data exists to sum. */
  case class MediaFeatures(doc_id: Long, byte_len: Int, content_md5: String,
                           width: Int, height: Int, n_frames: Int,
                           pixel_sum: Long)

  /** STUB decoder for formats the JDK can't decode (video/audio):
    * derives fake-but-deterministic media dimensions from the payload
    * bytes. Replace with a real codec (JNI/FFI) binding. */
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
    * (an image is one frame); everything else — and any image payload no
    * registered reader recognizes — takes the deterministic
    * [[DecodeStub]] with pixel_sum 0. */
  private def decodeAny(rec: MediaRecord): (Int, Int, Int, Long) =
    (if (rec.media_type.startsWith("image")) ImageCodec.decode(rec.media)
     else None) match {
      case Some((w, h, pixelSum)) => (w, h, 1, pixelSum)
      case None =>
        val (w, h, f) = DecodeStub.decode(rec.media)
        (w, h, f, 0L)
    }

  /** Frame sampling: one output row per sampled frame — the canonical
    * media fan-out (video -> frames, audio -> windows). Image media
    * decodes for real (one frame); other media use the [[DecodeStub]]
    * frame count. The SHAPE (typed flatMap fan-out, per-partition
    * decoder reuse, frame index + content hash schema) is the real
    * plumbing a video-codec drop-in would inherit. */
  def sampleFrames(spark: SparkSession, media: DataFrame,
                   everyNth: Int = 1): Dataset[FrameSample] = {
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("MD5")
      it.flatMap { rec =>
        val (_, _, frames, _) = decodeAny(rec)
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
        val (w, h, f, pixelSum) = decodeAny(rec)
        digest.reset()
        MediaFeatures(rec.doc_id, rec.media.length, hex(digest.digest(rec.media)),
          w, h, f, pixelSum)
      }
    }
  }
}

package graft.media

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.ImageIO

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Real image decode over opaque binary media columns, JDK-only
  * (`javax.imageio` ships with the JRE — PNG/JPEG/BMP/GIF readers, no
  * external libs). This is the multimodal-column contract: media travels
  * as a `binary` column next to typed metadata; decode/feature-extract
  * runs partition-wise so a 100 TB image corpus decodes as a narrow map
  * (no shuffle, no driver involvement), and a corrupt payload becomes a
  * `decode_ok = false` row instead of a task failure.
  *
  * Reference treats columns as opaque typed slots the same way
  * (`core/dtrain/CommonConstants` feature payloads); the decode stage
  * here is what its Hadoop pipeline leaves to external UDF jars.
  */
object ImageOps {

  /** One decoded payload: dimensions + mean luma ((r+g+b)/3 averaged over
    * all pixels). `decode_ok = false` (dims 0, luma 0.0) marks payloads
    * ImageIO rejects — kept as rows so corpus accounting stays exact. */
  final case class Decoded(doc_id: Long, width: Long, height: Long,
                           mean_luma: Double, decode_ok: Boolean)

  /** Decode a binary image column into typed (width, height, mean_luma,
    * decode_ok) columns. Narrow map over partitions: each task decodes its
    * own payloads in place — the plan has zero exchanges, so throughput
    * scales linearly with executors regardless of corpus size. */
  def decodeImages(df: DataFrame, idCol: String = "doc_id",
                   payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeOne(bytes) match {
            case Some((w, h, luma)) => Decoded(id, w, h, luma, decode_ok = true)
            case None => Decoded(id, 0L, 0L, 0.0, decode_ok = false)
          }
        }
      }
      .toDF()
  }

  /** Decode one payload; None when the bytes are not a decodable image. */
  def decodeOne(bytes: Array[Byte]): Option[(Long, Long, Double)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        var sum = 0.0
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val rgb = img.getRGB(x, y)
            val r = (rgb >> 16) & 0xff
            val g = (rgb >> 8) & 0xff
            val b = rgb & 0xff
            sum += (r + g + b) / 3.0
            x += 1
          }
          y += 1
        }
        Some((w.toLong, h.toLong, sum / (w.toLong * h)))
      }
    } catch {
      case _: Exception => None
    }
  }

  /** Deterministic PNG payload: solid gray `gray & 0xff` at width×height.
    * PNG is lossless, so decode round-trips the exact pixel values — used
    * by the oracle query and specs to generate payloads whose decoded
    * dims/luma are arithmetically predictable. */
  def syntheticPng(width: Int, height: Int, gray: Int): Array[Byte] = {
    val v = gray & 0xff
    pngOf(width, height, (_, _) => (v << 16) | (v << 8) | v)
  }

  /** Deterministic gradient PNG: pixel (x, y) holds gray `(x + y) % 256`
    * in all three channels — exercises per-pixel luma math in specs. */
  def gradientPng(width: Int, height: Int): Array[Byte] =
    pngOf(width, height, (x, y) => {
      val v = (x + y) % 256
      (v << 16) | (v << 8) | v
    })

  private def pngOf(width: Int, height: Int,
                    rgbAt: (Int, Int) => Int): Array[Byte] = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, rgbAt(x, y))
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }
}

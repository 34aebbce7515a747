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

  /** One fingerprinted payload: 64-bit average-hash. `phash = 0` with
    * `decode_ok = false` marks undecodable payloads. */
  final case class Hashed(doc_id: Long, phash: Long, decode_ok: Boolean)

  /** 8×8 average-hash (aHash) perceptual fingerprint over a binary image
    * column — the image-side analogue of SimHash: near-identical images
    * land within a few hamming bits, so image dedup reuses the SAME
    * banded-pair + connected-components machinery as text
    * ([[graft.text.TextOps.hashBandPairs]] / `dedupClusters`).
    *
    * Decode → average-pool the gray channel ((r+g+b)/3 per pixel) onto an
    * 8×8 grid (block boundaries at `i·dim/8` integer division; an
    * already-8×8 image pools to itself) → floor each pooled mean to an
    * int → set bit (y·8 + x) iff `64·v(x,y) ≥ Σv`. The threshold is an
    * integer cross-multiplied mean compare, NO floating point, so the
    * bits are engine-exact and the oracle can recompute them
    * arithmetically on deterministic pattern images.
    *
    * Narrow map like [[decodeImages]] — zero shuffles, linear scale-out. */
  def aHash64(df: DataFrame, idCol: String = "doc_id",
              payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          aHashOne(bytes) match {
            case Some(h) => Hashed(id, h, decode_ok = true)
            case None    => Hashed(id, 0L, decode_ok = false)
          }
        }
      }
      .toDF()
  }

  /** aHash a single payload; None when not a decodable image. The
    * 8x8 pooling IS [[resizeOne]] — one copy of the box-filter
    * arithmetic, so a boundary fix there can never silently diverge
    * the hash (the "aHash is pure arithmetic in key" oracle contract
    * depends on the two agreeing). */
  def aHashOne(bytes: Array[Byte]): Option[Long] =
    resizeOne(bytes, 8, 8).map { case (_, _, pooled) =>
      val total = pooled.sum
      var hash = 0L
      var b = 0
      while (b < 64) {
        if (64L * pooled(b) >= total) hash |= (1L << b)
        b += 1
      }
      hash
    }

  /** Near-duplicate image pairs: aHash + banded hamming join
    * ([[graft.text.TextOps.hashBandPairs]]) — same candidate policy as
    * text SimHash dedup; undecodable payloads never pair (their phash-0
    * rows are filtered before banding). */
  def imageNearDupPairs(df: DataFrame, maxHamming: Int = 2,
                        maxBucket: Int = 1000): DataFrame =
    graft.text.TextOps.hashBandPairs(
      aHash64(df).filter(col("decode_ok")).select(col("doc_id"), col("phash")),
      "phash", 64, maxHamming, 16, maxBucket)

  /** Deterministic 8×8 pattern PNG: gray pixel value at (x, y) is
    * `(key·31 + x·7 + y·13) mod 256` — the aHash of this image is pure
    * arithmetic in `key`, so an oracle can recompute it without a
    * decoder. Same `key` ⇒ identical image (planted duplicates). */
  def patternPng(key: Long): Array[Byte] =
    pngOf(8, 8, (x, y) => {
      val v = ((key * 31 + x * 7 + y * 13) % 256).toInt
      (v << 16) | (v << 8) | v
    })

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

  /** Thumbnail row: box-filtered resize output (see [[resizeBox]]). */
  final case class Thumb(id: Long, src_w: Long, src_h: Long,
    thumb_w: Long, thumb_h: Long, luma_sum: Long, luma_min: Long,
    luma_max: Long, checksum: Long, decode_ok: Boolean)

  /** Deterministic box-filter RESIZE (the multimodal `resize` step): the
    * decoded image pools into a tw×th gray thumbnail with integer-floor
    * cell means — OUR OWN raster loop, not Graphics2D interpolation, so
    * the result is bit-reproducible on any JVM and arithmetically
    * checkable by an oracle on lossless payloads. Emits per image the
    * thumbnail's luma sum/min/max plus a positional checksum
    * Σ pooled(i)·(i+1) that pins every cell value; zero-shuffle narrow
    * map like the decode path. */
  def resizeBox(df: DataFrame, tw: Int, th: Int,
                idCol: String = "doc_id",
                payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          resizeOne(bytes, tw, th) match {
            case Some((w, h, pooled)) =>
              var sum = 0L; var mn = Long.MaxValue; var mx = Long.MinValue
              var ck = 0L
              var i = 0
              while (i < pooled.length) {
                val v = pooled(i)
                sum += v; if (v < mn) mn = v; if (v > mx) mx = v
                ck += v * (i + 1)
                i += 1
              }
              Thumb(id, w, h, tw.toLong, th.toLong, sum, mn, mx, ck,
                decode_ok = true)
            case None =>
              Thumb(id, 0L, 0L, tw.toLong, th.toLong, 0L, 0L, 0L, 0L,
                decode_ok = false)
          }
        }
      }
      .toDF()
  }

  /** Box-filter one payload to tw×th pooled gray cells (row-major). */
  def resizeOne(bytes: Array[Byte], tw: Int,
                th: Int): Option[(Long, Long, Array[Long])] = {
    // zero/negative targets would return an EMPTY pooled array marked
    // decode_ok (luma_min = Long.MaxValue nonsense downstream) or
    // throw NegativeArraySizeException inside an executor task
    require(tw >= 1 && th >= 1, s"target must be >= 1x1, got ${tw}x$th")
    if (bytes == null || bytes.isEmpty) return None
    try {
      val img = ImageIO.read(new ByteArrayInputStream(bytes))
      if (img == null || img.getWidth < 1 || img.getHeight < 1) None
      else {
        val w = img.getWidth
        val h = img.getHeight
        val pooled = new Array[Long](tw * th)
        var cy = 0
        while (cy < th) {
          var cx = 0
          while (cx < tw) {
            val x0 = cx * w / tw; val x1 = math.max((cx + 1) * w / tw, x0 + 1)
            val y0 = cy * h / th; val y1 = math.max((cy + 1) * h / th, y0 + 1)
            var sum = 0.0
            var y = y0
            while (y < h.min(y1)) {
              var x = x0
              while (x < w.min(x1)) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) + ((rgb >> 8) & 0xff) +
                  (rgb & 0xff)) / 3.0
                x += 1
              }
              y += 1
            }
            val cnt = (h.min(y1) - y0).toLong * (w.min(x1) - x0)
            pooled(cy * tw + cx) = math.floor(sum / cnt).toLong
            cx += 1
          }
          cy += 1
        }
        Some((w.toLong, h.toLong, pooled))
      }
    } catch {
      case _: Exception => None
    }
  }

  /** General deterministic PNG builder: `rgbAt(x, y)` supplies each
    * pixel's packed 0xRRGGBB value. Public so specs/fixtures can craft
    * targeted images (perturbations, inversions) without a second
    * encoder. */
  def pngOf(width: Int, height: Int,
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

package graft.media

import java.io.ByteArrayInputStream
import javax.sound.sampled.AudioSystem

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Real audio decode over opaque binary media columns, JDK-only
  * (`javax.sound.sampled` ships with the JRE — WAV/AIFF/AU readers, no
  * external libs). Same multimodal-column contract as [[ImageOps]]: audio
  * travels as a `binary` column, metadata extraction runs partition-wise
  * as a narrow map (zero shuffles, linear scale-out), and a corrupt
  * payload becomes a `decode_ok = false` row instead of a task failure.
  *
  * Reference leaves media to external UDF jars on its Hadoop pipeline
  * (`core/dtrain/CommonConstants` treats columns as opaque typed slots);
  * here the decode is in-engine and the oracle checks the decoded numbers
  * arithmetically (WAV PCM is lossless).
  */
object AudioOps {

  /** One decoded payload: format + content stats. `mean_abs_amp` is the
    * mean |sample| over all channels of the 16-bit PCM stream — enough to
    * screen silence/clipping without any DSP dependency. */
  final case class DecodedAudio(doc_id: Long, sample_rate: Long,
                                channels: Long, n_frames: Long,
                                duration_sec: Double, mean_abs_amp: Double,
                                decode_ok: Boolean)

  /** Decode a binary audio column into typed metadata columns. Narrow
    * map over partitions — each task decodes its own payloads; nothing
    * shuffles and nothing reaches the driver. */
  def decodeAudio(df: DataFrame, idCol: String = "doc_id",
                  payloadCol: String = "payload"): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          decodeOne(bytes) match {
            case Some((rate, ch, frames, amp)) =>
              DecodedAudio(id, rate, ch, frames,
                frames.toDouble / rate, amp, decode_ok = true)
            case None =>
              DecodedAudio(id, 0L, 0L, 0L, 0.0, 0.0, decode_ok = false)
          }
        }
      }
      .toDF()
  }

  /** Decode one payload; None when the bytes are not decodable 16-bit
    * PCM audio. Mean |amplitude| sums longs (exact for any real-world
    * frame count) and divides once — deterministic at any parallelism. */
  def decodeOne(bytes: Array[Byte]): Option[(Long, Long, Long, Double)] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) return None
        val channels = fmt.getChannels
        val frames = in.getFrameLength
        val data = in.readAllBytes()
        val n = data.length / 2
        if (n == 0) return None
        var i = 0
        var sum = 0L
        while (i < n) {
          val lo = data(2 * i) & 0xff
          val hi = data(2 * i + 1).toInt
          val s = if (fmt.isBigEndian) (lo << 8) | (hi & 0xff)
          else (hi << 8) | lo
          sum += math.abs(s.toShort.toLong)
          i += 1
        }
        Some((fmt.getSampleRate.toLong, channels.toLong, frames,
          sum.toDouble / n))
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Voice-activity row (see [[activityWindows]]). */
  final case class Activity(doc_id: Long, n_samples: Long, n_windows: Long,
    n_active: Long, energy_sum: Long, first_active: Long,
    last_active: Long, decode_ok: Boolean)

  /** Fixed-window activity detection over decoded PCM16 (the
    * silence-trim / VAD front of an audio pipeline): samples split into
    * `frameLen`-sample windows; a window is ACTIVE when its |amplitude|
    * sum reaches `thresholdMeanAbs · windowSize` (pure integer compare —
    * no division, engine-exact). Emits per payload the window count,
    * active count, total energy, and the first/last active window
    * (-1 when silent) — zero-shuffle narrow map like the decode. */
  def activityWindows(df: DataFrame, frameLen: Int = 4,
                      thresholdMeanAbs: Long = 8192L,
                      idCol: String = "doc_id",
                      payloadCol: String = "payload"): DataFrame = {
    require(frameLen >= 1, s"frameLen must be >= 1, got $frameLen")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          samplesOf(bytes) match {
            case Some(samples) =>
              val nw = (samples.length + frameLen - 1) / frameLen
              var energy = 0L
              var nAct = 0L
              var first = -1L
              var last = -1L
              var w = 0
              while (w < nw) {
                var sa = 0L
                var c = 0
                var i = w * frameLen
                while (i < samples.length && c < frameLen) {
                  sa += math.abs(samples(i).toLong); i += 1; c += 1
                }
                energy += sa
                if (sa >= thresholdMeanAbs * c) {
                  nAct += 1
                  if (first < 0) first = w
                  last = w
                }
                w += 1
              }
              Activity(id, samples.length.toLong, nw.toLong, nAct, energy,
                first, last, decode_ok = true)
            case None =>
              Activity(id, 0L, 0L, 0L, 0L, -1L, -1L, decode_ok = false)
          }
        }
      }
      .toDF()
  }

  /** Resampled row (see [[decimate]]). */
  final case class Resampled(doc_id: Long, src_rate: Long, out_rate: Long,
    n_in: Long, n_out: Long, out_energy: Long, out_checksum: Long,
    decode_ok: Boolean)

  /** Integer decimation resample (the pipeline's cheap rate reducer —
    * a proper polyphase filter is a DSP-library job, but stride
    * decimation is what metadata/VAD passes actually run at corpus
    * scale): keep every k-th sample; emit the output sample count,
    * |amplitude| energy, and a positional checksum Σ|s_i|·(i+1) pinning
    * every kept sample. Zero-shuffle narrow map. */
  def decimate(df: DataFrame, factor: Int, srcRate: Long = 8000L,
               idCol: String = "doc_id",
               payloadCol: String = "payload"): DataFrame = {
    require(factor >= 1, s"factor=$factor")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(payloadCol).cast("binary"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          samplesOf(bytes) match {
            case Some(samples) =>
              var i = 0
              var j = 0
              var energy = 0L
              var ck = 0L
              while (i < samples.length) {
                val a = math.abs(samples(i).toLong)
                energy += a
                ck += a * (j + 1)
                j += 1
                i += factor
              }
              Resampled(id, srcRate, srcRate / factor,
                samples.length.toLong, j.toLong, energy, ck,
                decode_ok = true)
            case None =>
              Resampled(id, srcRate, srcRate / factor, 0L, 0L, 0L, 0L,
                decode_ok = false)
          }
        }
      }
      .toDF()
  }

  /** Decode a payload to its PCM16 samples (None when undecodable). */
  def samplesOf(bytes: Array[Byte]): Option[Array[Short]] = {
    if (bytes == null || bytes.isEmpty) return None
    try {
      val in = AudioSystem.getAudioInputStream(new ByteArrayInputStream(bytes))
      try {
        val fmt = in.getFormat
        if (fmt.getSampleSizeInBits != 16) return None
        val data = in.readAllBytes()
        val n = data.length / 2
        if (n == 0) return None
        val out = new Array[Short](n)
        var i = 0
        while (i < n) {
          val lo = data(2 * i) & 0xff
          val hi = data(2 * i + 1).toInt
          out(i) = (if (fmt.isBigEndian) (lo << 8) | (hi & 0xff)
                    else (hi << 8) | lo).toShort
          i += 1
        }
        Some(out)
      } finally in.close()
    } catch { case _: Exception => None }
  }

  /** Minimal PCM16LE mono WAV container around the given samples —
    * deterministic byte-for-byte, so tests and oracles can re-derive
    * every decoded number arithmetically. */
  def syntheticWav(sampleRate: Int, samples: Array[Short]): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    out.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
      .put("WAVE".getBytes("US-ASCII"))
    out.put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(1)                       // mono
      .putInt(sampleRate)
      .putInt(sampleRate * 2)            // byte rate
      .putShort(2)                       // block align
      .putShort(16)                      // bits per sample
    out.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(out.putShort)
    out.array()
  }
}

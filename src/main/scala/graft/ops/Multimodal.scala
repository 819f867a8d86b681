package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side structure — schema, partition-friendly
  * batch iteration, deterministic sampling — is real and tested.
  *
  * IMAGE decode is REAL: PNG/JPEG payloads go through the JDK's built-in
  * `javax.imageio` (no external codec jars needed) inside the mapPartitions
  * batch loop. AUDIO decode is REAL for PCM WAV: RIFF/WAVE payloads go
  * through the JDK's `javax.sound.sampled` (also codec-jar-free) and report
  * true sample rate + duration. VIDEO decode remains a clearly-marked
  * deterministic STUB (no ffmpeg/codec libraries in this container) that
  * parses our own synthetic 16-byte header; swap `decodeStub` for a real
  * codec without touching any plumbing.
  */
object Multimodal {

  case class MediaRow(media_id: Long, media_type: String, content: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, byte_hist: Array[Double], frames_sampled: Int,
      sample_rate_hz: Int, duration_ms: Int)

  /** Deterministic synthetic media corpus. IMAGE rows carry a real PNG
    * (deterministic pixels from a seeded xorshift, encoded in-memory by
    * ImageIO), AUDIO rows a real 16-bit mono PCM WAV (deterministic samples,
    * `160 + id % 320` frames at 16 kHz, written by AudioSystem — so both
    * decode paths are exercised end-to-end); video rows carry the
    * 16-byte-header synthetic container the stub parses.
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val typ = id % 3 match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val w = 16 + (id % 64).toInt * 4
      val h = 16 + (id % 48).toInt * 4
      val sr = if (typ == "audio") 16000 else 0
      var s = id * 6364136223846793005L + 1442695040888963407L
      def nextByte(): Byte = {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        (s & 0xff).toByte
      }
      val bytes =
        if (typ == "image") {
          // real PNG: deterministic RGB raster, JDK encoder (no timestamps →
          // byte-stable across runs)
          val img = new java.awt.image.BufferedImage(
            w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              val rgb = ((nextByte() & 0xff) << 16) | ((nextByte() & 0xff) << 8) |
                (nextByte() & 0xff)
              img.setRGB(x, y, rgb)
              x += 1
            }
            y += 1
          }
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(img, "png", bos)
          bos.toByteArray
        } else if (typ == "audio") {
          // real PCM WAV: 16-bit mono little-endian at 16 kHz, deterministic
          // sample bytes; RIFF output is header + raw frames → byte-stable
          val frames = 160 + (id % 320).toInt
          val data = new Array[Byte](frames * 2)
          var i = 0
          while (i < data.length) { data(i) = nextByte(); i += 1 }
          val fmt = new javax.sound.sampled.AudioFormat(16000f, 16, 1, true, false)
          val ais = new javax.sound.sampled.AudioInputStream(
            new java.io.ByteArrayInputStream(data), fmt, frames.toLong)
          val bos = new java.io.ByteArrayOutputStream()
          javax.sound.sampled.AudioSystem.write(ais,
            javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
          bos.toByteArray
        } else {
          val payloadLen = 256 + (id % 512).toInt
          val b = new Array[Byte](16 + payloadLen)
          b(0) = typ(0).toByte
          b(1) = (w & 0xff).toByte; b(2) = ((w >> 8) & 0xff).toByte
          b(3) = (h & 0xff).toByte; b(4) = ((h >> 8) & 0xff).toByte
          var i = 16
          while (i < b.length) { b(i) = nextByte(); i += 1 }
          b
        }
      MediaRow(id, typ, bytes, w, h, sr)
    }
  }

  /** REAL image decode via the JDK's `javax.imageio` (PNG + JPEG). Returns
    * the decoded (width, height), or None when the payload isn't a
    * decodable image — magic-byte gated so non-image payloads never pay the
    * decoder attempt.
    */
  private[graft] def decodeImage(content: Array[Byte]): Option[(Int, Int)] = {
    if (content == null || content.length < 8) return None
    val isPng = (content(0) & 0xff) == 0x89 && content(1) == 'P'.toByte &&
      content(2) == 'N'.toByte && content(3) == 'G'.toByte
    val isJpeg = (content(0) & 0xff) == 0xff && (content(1) & 0xff) == 0xd8
    if (!isPng && !isJpeg) return None
    try {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(content))
      if (img == null) None else Some((img.getWidth, img.getHeight))
    } catch {
      case _: java.io.IOException | _: RuntimeException => None
    }
  }

  /** REAL audio decode for PCM WAV via the JDK's `javax.sound.sampled`
    * (RIFF/WAVE magic-gated). Returns (sample_rate_hz, duration_ms), or
    * None for non-WAV payloads.
    */
  private[graft] def decodeAudio(content: Array[Byte]): Option[(Int, Int)] = {
    if (content == null || content.length < 12) return None
    val riffWave = content(0) == 'R'.toByte && content(1) == 'I'.toByte &&
      content(2) == 'F'.toByte && content(3) == 'F'.toByte &&
      content(8) == 'W'.toByte && content(9) == 'A'.toByte &&
      content(10) == 'V'.toByte && content(11) == 'E'.toByte
    if (!riffWave) return None
    try {
      val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(content))
      try {
        val rate = ais.getFormat.getSampleRate.toInt
        val frames = ais.getFrameLength
        val durMs = if (rate > 0 && frames >= 0) (frames * 1000L / rate).toInt else 0
        Some((rate, durMs))
      } finally ais.close()
    } catch {
      case _: javax.sound.sampled.UnsupportedAudioFileException |
          _: java.io.IOException | _: RuntimeException => None
    }
  }

  /** ===== STUB ===== Video codec decode. A real implementation would parse
    * the container format here (MP4 via a codec library); this deterministic
    * fake reads our synthetic 16-byte header. Plumbing (batch iteration,
    * schema) is the production shape.
    */
  private def decodeStub(content: Array[Byte]): (Int, Int) = {
    if (content.length < 16) (0, 0)
    else ((content(1) & 0xff) | ((content(2) & 0xff) << 8),
      (content(3) & 0xff) | ((content(4) & 0xff) << 8))
  }

  /** Feature extraction over the binary column: batched per partition
    * (mapPartitions — the Scala analogue of mapInPandas batch iteration).
    * Images decode for REAL (ImageIO, decoded dims), PCM WAV audio decodes
    * for REAL (javax.sound, true sample rate + duration); the byte histogram
    * runs over the payload (the stand-in for real visual features), and
    * frame sampling is deterministic.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
      frameStride: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // ImageIO's default disk-backed stream cache is a per-call temp file —
      // pure-memory decoding in executor threads instead
      javax.imageio.ImageIO.setUseCache(false)
      rows.map { r =>
        val img = decodeImage(r.content)
        val audio = if (img.isDefined) None else decodeAudio(r.content)
        val (w, h) = img.getOrElse(if (audio.isDefined) (0, 0) else decodeStub(r.content))
        val (rate, durMs) = audio.getOrElse((0, 0))
        // real containers hash the whole payload; the synthetic stub skips
        // its fake 16-byte header
        val start = if (img.isDefined || audio.isDefined) 0 else 16
        val hist = new Array[Double](16)
        var i = start
        while (i < r.content.length) {
          hist((r.content(i) & 0xff) >> 4) += 1.0
          i += 1
        }
        val total = math.max(r.content.length - start, 1).toDouble
        var j = 0
        while (j < 16) { hist(j) /= total; j += 1 }
        // deterministic frame sampling: every frameStride-th payload offset
        val frames = math.max((r.content.length - start) / frameStride, 0)
        MediaFeatures(r.media_id, r.media_type, r.content.length, w, h, hist,
          frames, rate, durMs)
      }
    }
  }

  /** Filter + project pattern over media metadata WITHOUT touching payload
    * bytes: demonstrates column pruning — the binary column never leaves the
    * scan when only metadata is selected.
    */
  def metadataOnly(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("media_type"), col("width"), col("height"))
      .filter(col("width") >= 32)
}

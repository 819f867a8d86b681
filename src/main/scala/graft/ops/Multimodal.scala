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
  * true sample rate + duration. VIDEO container metadata is REAL for MP4:
  * `decodeVideo` walks the ISO base-media (ISO/IEC 14496-12) box tree —
  * ftyp gate, moov → mvhd (timescale/duration, version 0 and 1) → trak →
  * tkhd (16.16 fixed-point width/height) — as plain big-endian byte
  * parsing; only FRAME decode (actual pixel data) remains out of scope
  * here, since that genuinely needs a codec library this container lacks.
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
    * `160 + id % 320` frames at 16 kHz, written by AudioSystem), VIDEO rows
    * a spec-compliant minimal MP4 (ftyp + moov{mvhd,trak{tkhd}} + mdat,
    * timescale 1000, duration `500 + id % 1000` ms, 16.16 fixed-point dims)
    * — so all three decode/parse paths are exercised end-to-end.
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
          // real minimal MP4 (ISO/IEC 14496-12 base-media boxes): ftyp +
          // moov{mvhd(timescale 1000, duration ms), trak{tkhd(16.16 dims)}}
          // + mdat carrying deterministic payload bytes
          val durMs = 500 + (id % 1000).toInt
          val payloadLen = 256 + (id % 512).toInt
          val bb = java.nio.ByteBuffer.allocate(24 + 216 + 8 + payloadLen)
          def fourcc(s: String): Unit = s.foreach(c => bb.put(c.toByte))
          // ftyp (24): major brand isom, minor 0, compatible isom/mp41
          bb.putInt(24); fourcc("ftyp"); fourcc("isom"); bb.putInt(0)
          fourcc("isom"); fourcc("mp41")
          // moov (216) = mvhd (108) + trak (100)
          bb.putInt(216); fourcc("moov")
          bb.putInt(108); fourcc("mvhd"); bb.putInt(0) // version 0, flags 0
          bb.putInt(0); bb.putInt(0)                   // ctime, mtime
          bb.putInt(1000); bb.putInt(durMs)            // timescale, duration
          bb.putInt(0x00010000); bb.putShort(0x0100.toShort) // rate, volume
          bb.putShort(0); bb.putInt(0); bb.putInt(0)   // reserved (10)
          bb.putInt(0x00010000); bb.putInt(0); bb.putInt(0) // unity matrix
          bb.putInt(0); bb.putInt(0x00010000); bb.putInt(0) // (36 bytes)
          bb.putInt(0); bb.putInt(0); bb.putInt(0x40000000)
          (0 until 6).foreach(_ => bb.putInt(0))       // pre_defined (24)
          bb.putInt(2)                                 // next_track_ID
          bb.putInt(100); fourcc("trak")
          bb.putInt(92); fourcc("tkhd"); bb.putInt(0x000007) // v0, enabled
          bb.putInt(0); bb.putInt(0)                   // ctime, mtime
          bb.putInt(1); bb.putInt(0); bb.putInt(durMs) // track_ID, rsvd, dur
          bb.putLong(0L)                               // reserved (8)
          bb.putShort(0); bb.putShort(0); bb.putShort(0); bb.putShort(0)
          bb.putInt(0x00010000); bb.putInt(0); bb.putInt(0) // unity matrix
          bb.putInt(0); bb.putInt(0x00010000); bb.putInt(0)
          bb.putInt(0); bb.putInt(0); bb.putInt(0x40000000)
          bb.putInt(w << 16); bb.putInt(h << 16)       // 16.16 fixed dims
          // mdat
          bb.putInt(8 + payloadLen); fourcc("mdat")
          val payload = new Array[Byte](payloadLen)
          var i = 0
          while (i < payloadLen) { payload(i) = nextByte(); i += 1 }
          bb.put(payload)
          bb.array()
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

  /** REAL video container metadata parse for MP4 (ISO/IEC 14496-12 base
    * media file format): walks the big-endian box tree — ftyp magic gate,
    * moov → mvhd (movie timescale + duration, versions 0 and 1) and
    * moov → trak → tkhd (16.16 fixed-point presentation width/height,
    * versions 0 and 1); handles 64-bit `largesize` and to-end-of-file
    * (size 0) boxes. Returns (width, height, duration_ms), or None for
    * non-MP4 payloads. Only FRAME decode (pixel data) is out of scope —
    * that needs a codec library this container lacks.
    */
  private[graft] def decodeVideo(content: Array[Byte]): Option[(Int, Int, Int)] = {
    if (content == null || content.length < 16) return None
    def be32(o: Int): Long =
      ((content(o) & 0xffL) << 24) | ((content(o + 1) & 0xffL) << 16) |
        ((content(o + 2) & 0xffL) << 8) | (content(o + 3) & 0xffL)
    def be64(o: Int): Long = (be32(o) << 32) | be32(o + 4)
    def boxType(o: Int): String =
      new String(content, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
    // (bodyStart, bodyEnd) of every box of `typ` in [start, end), in order
    def findBoxes(typ: String, start: Int, end: Int): List[(Int, Int)] = {
      val found = List.newBuilder[(Int, Int)]
      var o = start
      while (o + 8 <= end) {
        val size32 = be32(o)
        val (bodyOff, size) =
          if (size32 == 1L && o + 16 <= end) (16, be64(o + 8))
          else if (size32 == 0L) (8, (end - o).toLong) // box extends to end
          else (8, size32)
        if (size < bodyOff || o + size > end) return found.result() // malformed tail
        if (boxType(o) == typ) found += ((o + bodyOff, o + size.toInt))
        o += size.toInt
      }
      found.result()
    }
    def findBox(typ: String, start: Int, end: Int): Option[(Int, Int)] =
      findBoxes(typ, start, end).headOption
    if (boxType(0) != "ftyp") return None
    try {
      findBox("moov", 0, content.length).flatMap { case (moovS, moovE) =>
        val durMs = findBox("mvhd", moovS, moovE).flatMap { case (s, e) =>
          val version = content(s) & 0xff
          // body after the 4 version/flags bytes: v0 = 32-bit ctime, mtime,
          // timescale, duration; v1 = 64-bit times, 32-bit timescale,
          // 64-bit duration
          if (version == 0 && s + 20 <= e)
            Some((be32(s + 12), be32(s + 16)))
          else if (version == 1 && s + 32 <= e)
            Some((be32(s + 20), be64(s + 24)))
          else None
        }.collect { case (ts, dur) if ts > 0 => (dur * 1000L / ts).toInt }
        // real files order tracks arbitrarily (audio tracks carry 0×0): scan
        // every trak and prefer the first with nonzero presentation dims
        val allDims = findBoxes("trak", moovS, moovE).flatMap { case (tkS, tkE) =>
          findBox("tkhd", tkS, tkE).flatMap { case (s, e) =>
            val version = content(s) & 0xff
            // width/height are the last 8 body bytes in both versions:
            // 16.16 fixed point after the matrix (v0 body: 4 verflags +
            // 2×4 times + 4 id + 4 rsvd + 4 dur + 8 rsvd + 8 layer/alt/
            // vol/rsvd + 36 matrix = 76; v1 times/duration are 64-bit)
            val wOff = if (version == 0) s + 76 else s + 88
            if (wOff + 8 <= e) Some(((be32(wOff) >> 16).toInt, (be32(wOff + 4) >> 16).toInt))
            else None
          }
        }
        val dims = allDims.find(d => d._1 > 0 && d._2 > 0).orElse(allDims.headOption)
        dims.map { case (w, h) => (w, h, durMs.getOrElse(0)) }
      }
    } catch {
      case _: IndexOutOfBoundsException | _: RuntimeException => None
    }
  }

  /** Feature extraction over the binary column: batched per partition
    * (mapPartitions — the Scala analogue of mapInPandas batch iteration).
    * Images decode for REAL (ImageIO, decoded dims), PCM WAV audio decodes
    * for REAL (javax.sound, true sample rate + duration), MP4 container
    * metadata parses for REAL (ISO-BMFF box walk: tkhd dims + mvhd
    * duration); the byte histogram runs over the payload (the stand-in for
    * real visual features), and frame sampling is deterministic.
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
        val video =
          if (img.isDefined || audio.isDefined) None else decodeVideo(r.content)
        val (w, h) = img.orElse(video.map(v => (v._1, v._2))).getOrElse((0, 0))
        val durMs = audio.map(_._2).orElse(video.map(_._3)).getOrElse(0)
        val rate = audio.map(_._1).getOrElse(0)
        val hist = new Array[Double](16)
        var i = 0
        while (i < r.content.length) {
          hist((r.content(i) & 0xff) >> 4) += 1.0
          i += 1
        }
        val total = math.max(r.content.length, 1).toDouble
        var j = 0
        while (j < 16) { hist(j) /= total; j += 1 }
        // deterministic frame sampling: every frameStride-th payload offset
        val frames = math.max(r.content.length / frameStride, 0)
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

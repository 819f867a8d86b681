package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata. The Spark-side structure — schema, partition-friendly
  * batch iteration, deterministic sampling — is real and tested; the actual
  * codec decode is STUBBED (no image/audio libraries in this container) with
  * a deterministic fake that parses our own synthetic header, clearly marked
  * below. Swap `decodeStub` for a real codec (e.g. javax.imageio / ffmpeg via
  * mapPartitions) without touching any plumbing.
  */
object Multimodal {

  case class MediaRow(media_id: Long, media_type: String, content: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  case class MediaFeatures(media_id: Long, media_type: String, n_bytes: Int,
      width: Int, height: Int, byte_hist: Array[Double], frames_sampled: Int)

  /** Deterministic synthetic media corpus: content = 16-byte header
    * (type tag, dims) + pseudo-random payload seeded by id.
    */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { id =>
      val typ = id % 3 match { case 0 => "image"; case 1 => "audio"; case _ => "video" }
      val w = 16 + (id % 64).toInt * 4
      val h = 16 + (id % 48).toInt * 4
      val sr = if (typ == "audio") 16000 else 0
      val payloadLen = 256 + (id % 512).toInt
      val bytes = new Array[Byte](16 + payloadLen)
      bytes(0) = typ(0).toByte
      bytes(1) = (w & 0xff).toByte; bytes(2) = ((w >> 8) & 0xff).toByte
      bytes(3) = (h & 0xff).toByte; bytes(4) = ((h >> 8) & 0xff).toByte
      var i = 16
      var s = id * 6364136223846793005L + 1442695040888963407L
      while (i < bytes.length) {
        s ^= s << 13; s ^= s >>> 7; s ^= s << 17
        bytes(i) = (s & 0xff).toByte
        i += 1
      }
      MediaRow(id, typ, bytes, w, h, sr)
    }
  }

  /** ===== STUB ===== Codec decode. A real implementation would parse the
    * container format here (JPEG/PNG/WAV/MP4); this deterministic fake reads
    * our synthetic 16-byte header. Plumbing (batch iteration, schema) is the
    * production shape.
    */
  private def decodeStub(content: Array[Byte]): (Int, Int) = {
    if (content.length < 16) (0, 0)
    else ((content(1) & 0xff) | ((content(2) & 0xff) << 8),
      (content(3) & 0xff) | ((content(4) & 0xff) << 8))
  }

  /** Feature extraction over the binary column: batched per partition
    * (mapPartitions — the Scala analogue of mapInPandas batch iteration),
    * emitting decode-derived dims, a 16-bin byte histogram (the stand-in for
    * real visual features), and a deterministic frame-sample count.
    */
  def extractFeatures(spark: SparkSession, media: Dataset[MediaRow],
      frameStride: Int = 64): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val (w, h) = decodeStub(r.content)
        val hist = new Array[Double](16)
        var i = 16
        while (i < r.content.length) {
          hist((r.content(i) & 0xff) >> 4) += 1.0
          i += 1
        }
        val total = math.max(r.content.length - 16, 1).toDouble
        var j = 0
        while (j < 16) { hist(j) /= total; j += 1 }
        // deterministic frame sampling: every frameStride-th payload offset
        val frames = math.max((r.content.length - 16) / frameStride, 0)
        MediaFeatures(r.media_id, r.media_type, r.content.length, w, h, hist, frames)
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

package graft.app

import org.apache.spark.sql.SparkSession
import graft.chunk.TurnChunker
import graft.extract.TripleExtractor
import graft.canon.EntityDedup
import graft.synth.TranscriptGen
import graft.model._

object StageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.getOrElse("32").toInt
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import org.apache.spark.storage.StorageLevel
    val cfg = TranscriptGen.Config(numConvs = 2493, turnsPerConv = 400, skew = 8)
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name: ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    val turns = TranscriptGen.transcripts(spark, cfg)
    t("gen+count")(turns.count())
    val chunks = TurnChunker.chunk(spark, turns).persist(StorageLevel.MEMORY_AND_DISK)
    t("chunker")(chunks.count())
    val raw = TripleExtractor.extract(spark, chunks).persist(StorageLevel.MEMORY_AND_DISK)
    t("extract")(raw.count())
    val mentions = TripleExtractor.mentions(spark, raw)
    t("mentions")(mentions.count())
    t("dedup") {
      val (e, r) = EntityDedup.dedup(spark, mentions)
      e.count(); r.count()
    }
    spark.stop()
  }
}

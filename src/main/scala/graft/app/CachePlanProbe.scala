package graft.app

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Checks whether actions on a persisted Dataset still execute subtree
  * broadcast subqueries (i.e., whether cache replacement covers them). */
object CachePlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val stages = mutable.ArrayBuffer.empty[(Int, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages += ((sc.stageInfo.stageId, sc.stageInfo.taskMetrics.executorRunTime))
    })
    val turns = graft.synth.TranscriptGen.transcripts(spark,
      graft.synth.TranscriptGen.Config(100, 400, 3))
    val chunks = graft.chunk.TurnChunker.chunk(spark, turns)
    val raw = graft.extract.TripleExtractor.extract(spark, chunks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    raw.count() // materialize
    Thread.sleep(300); stages.clear()
    raw.count() // pure cache read?
    Thread.sleep(300)
    println(s"[cache] second count stages=${stages.size} " +
      s"taskMs=${stages.map(_._2).sum}")
    stages.clear()
    val tn = raw.select(explode($"topics").as("n")).distinct()
    tn.count()
    Thread.sleep(300)
    println(s"[cache] derived query stages=${stages.size} " +
      s"taskMs=${stages.map(_._2).sum}")
    spark.stop()
  }
}

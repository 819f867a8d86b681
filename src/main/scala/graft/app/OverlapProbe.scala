package graft.app

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Prints stage submission/completion windows for one chunk+extract run —
  * shows whether the window-shuffle map stage and the stats-broadcast stage
  * (independent subtrees) actually run concurrently. */
object OverlapProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(8)
    val dir = args.lift(1).getOrElse("/tmp/scale-corpus")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val rows = mutable.ArrayBuffer.empty[(Int, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        rows += ((i.stageId, i.submissionTime.getOrElse(0L),
          i.completionTime.getOrElse(0L), i.taskMetrics.executorRunTime))
      }
    })
    val turns = spark.read.parquet(dir).as[graft.model.Turn]
    graft.extract.TripleExtractor.extract(spark,
      graft.chunk.TurnChunker.chunk(spark, turns.limit(10000)))
      .write.mode("overwrite").format("noop").save() // warmup
    rows.clear()
    val t0 = System.currentTimeMillis()
    graft.extract.TripleExtractor.extract(spark,
      graft.chunk.TurnChunker.chunk(spark, turns))
      .write.mode("overwrite").format("noop").save()
    Thread.sleep(300)
    rows.sortBy(_._2).foreach { case (id, sub, done, run) =>
      println(f"[overlap] stage=$id start=${(sub - t0) / 1e3}%.2f end=${(done - t0) / 1e3}%.2f taskRun=${run / 1e3}%.1f")
    }
    spark.stop()
  }
}

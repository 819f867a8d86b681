package graft.app

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Per-stage wall/CPU profile of the chunk-only job at a given parallelism —
  * identifies which physical stage eats the 32-core budget (backs BASELINE.md).
  * Usage: ChunkStageProbe <cores> <corpusDir>
  */
object ChunkStageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val dir = args.lift(1).getOrElse("/tmp/scale-corpus")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val stages = mutable.ArrayBuffer.empty[(Int, String, Long, Long, Long, Long)]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val m = i.taskMetrics
        stages += ((i.stageId, i.name.take(60),
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          m.executorRunTime, m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.bytesRead))
      }
    })
    val turns = spark.read.parquet(dir).as[graft.model.Turn]
    // warmup on a slice
    graft.chunk.TurnChunker.chunk(spark, turns.limit(10000))
      .write.mode("overwrite").format("noop").save()
    stages.clear()
    val t0 = System.nanoTime()
    graft.chunk.TurnChunker.chunk(spark, turns)
      .write.mode("overwrite").format("noop").save()
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[probe] total=$secs%.2f s cores=$cores")
    stages.sortBy(-_._3).foreach { case (id, name, wall, cpu, sw, in) =>
      println(f"[probe] stage=$id wall=${wall / 1e3}%.2fs taskRun=${cpu / 1e3}%.1fs " +
        f"shufWrite=${sw / 1e6}%.0fMB input=${in / 1e6}%.0fMB  $name%s")
    }
    spark.stop()
  }
}

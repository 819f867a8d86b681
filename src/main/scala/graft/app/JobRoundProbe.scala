package graft.app

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Decomposes the per-run fixed cost F of the extract job (BASELINE.md's
  * t(N) = W/N + F model): per-JOB wall clock plus the driver-side gaps
  * between jobs, measured on a tiny corpus (W ≈ 0, so everything left IS F)
  * in a JIT-warmed JVM. Usage: JobRoundProbe <cores> <corpusDir>
  */
object JobRoundProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val dir = args.lift(1).getOrElse("/tmp/sc-tiny")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = mutable.ArrayBuffer.empty[(Int, Long, Long, Int)]
    spark.sparkContext.addSparkListener(new SparkListener {
      private val starts = mutable.Map.empty[Int, (Long, Int)]
      override def onJobStart(j: SparkListenerJobStart): Unit =
        starts(j.jobId) = (j.time, j.stageInfos.size)
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        val (t0, nStages) = starts.getOrElse(j.jobId, (j.time, 0))
        jobs += ((j.jobId, t0, j.time, nStages))
      }
    })
    def run(): Double = {
      val turns = spark.read.parquet(dir).as[graft.model.Turn]
      val t0 = System.nanoTime()
      val chunks = graft.chunk.TurnChunker.chunk(spark, turns)
      graft.extract.TripleExtractor.extract(spark, chunks)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(); run() // JIT + codegen warm
    jobs.clear()
    val wallT0 = System.currentTimeMillis()
    val secs = run()
    val wallT1 = System.currentTimeMillis()
    println(f"[jobs] total=$secs%.3f s cores=$cores jobs=${jobs.size}")
    val sorted = jobs.sortBy(_._2)
    var prevEnd = wallT0
    sorted.foreach { case (id, t0, t1, nStages) =>
      val gap = t0 - prevEnd
      println(f"[jobs] job=$id stages=$nStages wall=${(t1 - t0) / 1e3}%.3fs " +
        f"gapBefore=${gap / 1e3}%.3fs")
      prevEnd = t1
    }
    println(f"[jobs] tailGap=${(wallT1 - prevEnd) / 1e3}%.3fs")
    spark.stop()
  }
}

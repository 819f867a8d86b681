package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.pipeline.Ingest

/** Wall-clock split of the full in-memory pipeline on a materialized corpus
  * (same shape Bench measures): runs the pipeline once, then each stage
  * boundary separately, so the Bench number can be attributed. Backs
  * BASELINE.md. Usage: PipelineStageProbe <cores> <corpusDir>
  */
object PipelineStageProbe {
  def main(args: Array[String]): Unit = {
    val cores = args.headOption.map(_.toInt).getOrElse(32)
    val dir = args.lift(1).getOrElse("/tmp/bench-corpus-1m")
    val sorted = args.lift(2).contains("sorted")
    val spark = SparkSession.builder().master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cores.toString).toInt)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    import spark.implicits._
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val turns = spark.read.parquet(dir).as[graft.model.Turn]
    // warmup
    Ingest.runInMemory(spark,
      graft.synth.TranscriptGen.transcripts(spark, graft.synth.TranscriptGen.Config(2, 10, 2)))
      .triples.write.mode("overwrite").format("noop").save()
    val stages = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, Long, String)]
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = sc.stageInfo
        val site = i.details.linesIterator.find(l => l.contains("graft."))
          .getOrElse(i.name).take(90)
        stages += ((i.stageId,
          i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L),
          i.taskMetrics.executorRunTime, site))
      }
    })
    val icfg = Ingest.Config(chunker = graft.chunk.TurnChunker.Config(
      sortedInput = sorted))
    t(s"full pipeline (noop sink, sorted=$sorted)") {
      Ingest.runInMemory(spark, turns, icfg).triples
        .write.mode("overwrite").format("noop").save()
    }
    Thread.sleep(500)
    stages.sortBy(-_._2).take(12).foreach { case (id, wall, run, name) =>
      println(f"[probe]   stage=$id wall=${wall / 1e3}%.2fs taskRun=${run / 1e3}%.1fs $name%s")
    }
    spark.catalog.clearCache()
    import org.apache.spark.storage.StorageLevel
    val chunks = graft.chunk.TurnChunker.chunk(spark, turns,
      graft.chunk.TurnChunker.Config(sortedInput = sorted))
    t("chunk only")(chunks.write.mode("overwrite").format("noop").save())
    val raw = graft.extract.TripleExtractor.extract(spark, chunks)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("chunk+extract (persist raw)")(raw.count())
    val mentions = graft.extract.TripleExtractor.mentions(spark, raw)
    t("dedup (pending+edges+CC+canon)") {
      val (e, r) = graft.canon.EntityDedup.dedup(spark, mentions)
      r.write.mode("overwrite").format("noop").save()
    }
    // sub-steps (re-run; cache warm where dedup caches)
    val cfg = graft.canon.EntityDedup.Config()
    val pending = graft.canon.EntityDedup.pendingEntities(spark, mentions, cfg)
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("  pending")(pending.count())
    val edges = graft.canon.EntityDedup.candidateEdges(spark, pending, cfg)
    t("  edges")(edges.write.mode("overwrite").format("noop").save())
    t("  cc")(graft.canon.ConnectedComponents.run(spark, edges)
      .write.mode("overwrite").format("noop").save())
    println(s"[probe] counts: raw=${raw.count()} mentions=${mentions.count()} " +
      s"pending=${pending.count()} edges=${edges.count()}")
    // assembly decomposition (cache-warm raw): where does the final job's
    // task CPU go — cache scan, lookup joins + id UDFs, or the fact_uuid
    // dedup exchange?
    locally {
      val (e2, r2) = graft.canon.EntityDedup.dedup(spark, mentions)
      val topicNames = raw.toDF().select(
        explode(concat($"topics",
          when(lower($"subject_type") === "topic", array($"subject")).otherwise(array()),
          when(lower($"object_type") === "topic", array($"object")).otherwise(array())))
          .as("name"), $"group_id").distinct()
      val Seq(_, remapT, topicsT) = graft.tables.Checkpoints.truncateAll(
        e2.toDF(), r2,
        graft.link.TopicResolver.resolve(spark, topicNames, graft.synth.TranscriptGen.ontology,
          graft.link.TopicResolver.Config()))
      t("  raw cache scan only")(raw.toDF().write.mode("overwrite").format("noop").save())
      val asm = graft.assemble.TripleAssembler.assemble(spark, raw, remapT, topicsT)
      t("  assemble (joins+udfs+dedup)")(asm.write.mode("overwrite").format("noop").save())
      t("  assemble rep2")(asm.write.mode("overwrite").format("noop").save())
    }
    pending.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Aggregate") || l.contains("Sort") || l.contains("Exchange"))
      .foreach(l => println(s"[probe] plan: ${l.take(160)}"))
    spark.stop()
  }
}

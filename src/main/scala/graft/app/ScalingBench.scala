package graft.app

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.pipeline.Ingest
import graft.synth.TranscriptGen

/** Scaling-evidence harness (north rule): run the identical KG pipeline on
  * the identical *materialized* transcript table (parquet — the sandbox
  * stand-in for the Iceberg input) at several parallelism levels (local[N]
  * proxies N executors) and report turns/sec per level plus N→4N efficiency.
  *
  * Methodology: the corpus is generated once and written to parquet so every
  * level reads the same bytes; each level runs in a fresh session with one
  * warmup pass (codegen/planning) and `reps` measured passes, best-of —
  * the sandbox VM shows multi-second host noise, best-of-n isolates the
  * engine's own cost.
  *
  * Usage: ScalingBench [turns] [cores,cores,...] [reps]   (default: 1000000 8,32 2)
  */
object ScalingBench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scaling-$cores")
      // 4 waves per core smooths stragglers; AQE coalesces the small ones
      .config("spark.sql.shuffle.partitions", cores * 4)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Generate the corpus once → parquet. Returns (path, totalTurns). */
  def materializeCorpus(turnsTarget: Long, dir: String): Long = {
    val base = 400
    val skew = 8
    val numConvs = math.max(((turnsTarget - skew.toLong * base) / base + 1).toInt, 2)
    val cfg = TranscriptGen.Config(numConvs = numConvs, turnsPerConv = base, skew = skew)
    val spark = session(8)
    TranscriptGen.transcripts(spark, cfg).write.mode("overwrite").parquet(dir)
    spark.stop()
    cfg.totalTurns
  }

  /** Best-of-reps pipeline wall time at one parallelism level.
    * mode "full" = chunk→…→assembled triples; mode "extract" = chunk→extract
    * only (the north-rule throughput metric), a straight-line scan+window+
    * mapPartitions job with no persists.
    */
  def measure(cores: Int, corpusDir: String, reps: Int, mode: String = "full"): Double = {
    val spark = session(cores)
    import spark.implicits._
    def once(): Double = {
      val turns = spark.read.parquet(corpusDir).as[graft.model.Turn]
      val t0 = System.nanoTime()
      if (mode == "extract") {
        val chunks = graft.chunk.TurnChunker.chunk(spark, turns)
        graft.extract.TripleExtractor.extract(spark, chunks)
          .write.mode("overwrite").format("noop").save()
      } else {
        Ingest.runInMemory(spark, turns).triples
          .write.mode("overwrite").format("noop").save()
      }
      (System.nanoTime() - t0) / 1e9
    }
    // warmup on a tiny corpus: codegen + planner init
    Ingest.runInMemory(spark,
      TranscriptGen.transcripts(spark, TranscriptGen.Config(2, 10, 2)))
      .triples.write.mode("overwrite").format("noop").save()
    val best = (1 to reps).map { _ =>
      spark.catalog.clearCache() // drop the previous rep's persisted stages
      once()
    }.min
    spark.stop()
    best
  }

  def run(turnsTarget: Long, cores: Seq[Int], reps: Int = 2,
      mode: String = "full"): Map[Int, Double] = {
    val dir = Files.createTempDirectory("graft-scaling-corpus").toString
    val total = materializeCorpus(turnsTarget, dir)
    val out = cores.map { n =>
      val secs = measure(n, dir, reps, mode)
      println(f"[scaling] mode=$mode cores=$n turns=$total secs=$secs%.2f " +
        f"turns_per_sec=${total / secs}%.0f")
      n -> total / secs
    }.toMap
    out
  }

  def main(args: Array[String]): Unit = {
    val turns = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cores = args.lift(1).map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(8, 32))
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val mode = args.lift(3).getOrElse("full")
    val tps = run(turns, cores, reps, mode)
    cores.sliding(2).foreach {
      case Seq(a, b) =>
        val ratio = b.toDouble / a
        println(f"[scaling] efficiency $a->$b: ${tps(b) / tps(a) / ratio}%.3f " +
          f"(speedup ${tps(b) / tps(a)}%.2fx over $ratio%.0fx cores)")
      case _ =>
    }
  }
}

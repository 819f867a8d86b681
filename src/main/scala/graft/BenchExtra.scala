package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Optimization-evidence bench (round 6): times arbitrary declared queries
  * with a noop sink inside ONE warmed JVM, printing every sample — the
  * in-JVM A/B harness the guide's §1 empirical loop needs (fork-to-fork
  * best-of numbers carry host-window noise larger than sub-0.1 s deltas).
  * NOT part of the driver bench contract (`graft.Bench` is frozen); numbers
  * from here are cited as same-JVM A/B evidence in OPTIMIZATION_r06.md.
  *
  * Usage: BenchExtra <sfDir> <reps> [query ...]   (default: the 12 headline
  * queries). Session shape matches the frozen bench child (local[$cpus],
  * shuffle partitions = cores, AQE on).
  */
object BenchExtra {

  private val headline = Seq(
    "q1_agg", "kg_chunk_window", "kg_min_length_filter", "kg_connected_components",
    "dedup_token_jaccard", "dedup_minhash_pairs", "dedup_simhash_pairs",
    "ann_topk", "text_stats", "text_langid", "rrf_fusion", "q_window_topk")

  private def exec(df: DataFrame): Unit =
    df.write.mode("overwrite").format("noop").save()

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val names = if (args.length > 2) args.drop(2).toSeq else headline
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-extra")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    spark.read.parquet(s"$sfDir/lineitem.parquet").count() // scan/codegen init
    names.foreach { name =>
      spark.sparkContext.setJobDescription(s"bench-extra: $name")
      val samples = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        exec(SparkEntry.queries(name)(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[extra] $name%s best=${samples.min}%.3f " +
        s"samples=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}

package graft.app

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.tables.SnapshotLog

/** Backs the BASELINE.md bloom-pruning A/B: build a 4×5M-row keyed table
  * (`build <dir>`), then time a 10k disjoint-key mergeAppend (`incr <dir>`).
  * Deleting the `*.bloom` files from a copy of the warehouse yields the
  * unpruned (legacy full-scan) arm on identical code — SnapshotLog treats a
  * bloom-less segment as always-scanned.
  */
object BloomProbe {
  def main(args: Array[String]): Unit = {
    val Array(phase, wh) = args
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val log = new SnapshotLog(spark, wh, bloomExpectedItems = 8L * 1000 * 1000)
    if (phase == "build") {
      for (s <- 0 until 4) {
        val seg = spark.range(s * 5000000L, (s + 1) * 5000000L)
          .select($"id", concat(lit("fact-payload-"), $"id", lit("-" * 40)).as("v"))
        log.mergeAppend("t", seg, Seq("id"))
      }
      println(s"[bloomprobe] built segments=${log.snapshots("t").size}")
    } else {
      val incr = spark.range(900000000L, 900010000L)
        .select($"id", concat(lit("fact-payload-"), $"id", lit("-" * 40)).as("v"))
      val t0 = System.nanoTime()
      log.mergeAppend("t", incr, Seq("id"))
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[bloomprobe] incr secs=$secs%.2f scan=${log.lastMergeScan}")
    }
    spark.stop()
  }
}

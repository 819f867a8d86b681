package graft.app

import org.apache.spark.sql.SparkSession

/** Plan/measurement probe for the chunker (backs BASELINE.md claims):
  * prints the executed physical plan after one run (AQE-final), so exchange
  * reuse / unexpected extra sorts are visible, then times chunk-only passes.
  */
object ChunkPlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val turns = graft.synth.TranscriptGen.transcripts(spark,
      graft.synth.TranscriptGen.Config(6, 50, 3))
    val c = graft.chunk.TurnChunker.chunk(spark, turns)
    c.write.mode("overwrite").format("noop").save()
    println(c.queryExecution.executedPlan.toString)
  }
}

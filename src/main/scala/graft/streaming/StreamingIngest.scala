package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.chunk.TurnChunker
import graft.extract.TripleExtractor
import graft.model.Turn
import graft.pipeline.Ingest
import graft.tables.SnapshotLog

/** Incremental (streaming) ingest. The reference is batch-only (SURVEY.md
  * §2.9); this is the optional append-stream path it anticipates: phase-1
  * extraction is a `foreachBatch` over an append stream of turns, landing
  * raw triples idempotently (MERGE on deterministic identity); the global
  * resolution phases (dedup/link) stay batch barriers, run via
  * `Ingest.runIncremental` on a cadence.
  *
  * Also provides the watermark + windowed-aggregation building block
  * (turn volume per conversation per event-time window) used for
  * monitoring/backpressure decisions.
  */
object StreamingIngest {

  /** Append-stream extraction: each micro-batch is chunked + extracted, raw
    * triples MERGE-append on (chunk_uuid, fact, subject, object) — replays
    * and overlapping batches are no-ops (exactly-once on content).
    */
  def start(spark: SparkSession, turns: Dataset[Turn], warehouseDir: String,
      cfg: Ingest.Config = Ingest.Config()): StreamingQuery = {
    turns.writeStream
      .outputMode("append")
      .foreachBatch { (batch: Dataset[Turn], batchId: Long) =>
        val log = new SnapshotLog(spark, warehouseDir)
        val chunks = TurnChunker.chunk(spark, batch, cfg.chunker)
        val raw = TripleExtractor.extract(spark, chunks)
        log.mergeAppend("raw_triples", raw.toDF(),
          Seq("chunk_uuid", "fact", "subject", "relationship", "object"),
          Seq("group_id"))
        log.mergeAppend("chunks", chunks.toDF(), Seq("chunk_uuid"), Seq("group_id"))
        ()
      }
      .start()
  }

  /** Watermarked event-time aggregation: turns per conversation per window.
    * Late data beyond the watermark is dropped (state is bounded — required
    * for an unbounded 10^12-turn stream).
    */
  def turnVolume(turns: Dataset[Turn], window: String = "10 minutes",
      watermark: String = "30 minutes"): DataFrame =
    turns.toDF()
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window), col("conv_id"))
      .agg(count(lit(1)).as("n_turns"))
}

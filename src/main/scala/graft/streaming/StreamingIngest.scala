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

  /** Per-conversation state summary. */
  case class ConvState(n_turns: Long, n_fact_turns: Long, first_ts: Long, last_ts: Long)
  case class ConvSessionUpdate(conv_id: String, n_turns: Long, n_fact_turns: Long,
      duration_ms: Long, closed: Boolean)

  /** Custom stateful streaming (KeyValueGroupedDataset.flatMapGroupsWithState):
    * tracks per-conversation turn counts + activity span across micro-batches;
    * with `idleTimeout` set, idle conversations close via processing-time
    * timeout and their state is evicted — bounded state for an unbounded
    * stream of conversations. (Tests use `idleTimeout = None`:
    * processing-time timeouts schedule perpetual empty batches, which makes
    * `processAllAvailable` spin — drive timed queries with a real trigger
    * clock in production.)
    */
  def sessionTracker(turns: Dataset[Turn],
      idleTimeout: Option[String] = Some("10 minutes")): Dataset[ConvSessionUpdate] = {
    import turns.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val timeoutConf = idleTimeout.fold[GroupStateTimeout](GroupStateTimeout.NoTimeout())(
      _ => GroupStateTimeout.ProcessingTimeTimeout())
    turns.groupByKey(_.conv_id)
      .flatMapGroupsWithState[ConvState, ConvSessionUpdate](
        OutputMode.Append(), timeoutConf) {
        (convId: String, rows: Iterator[Turn], state: GroupState[ConvState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(ConvSessionUpdate(convId, s.n_turns, s.n_fact_turns,
              s.last_ts - s.first_ts, closed = true))
          } else {
            val batch = rows.toSeq
            val prev = state.getOption.getOrElse(ConvState(0, 0, Long.MaxValue, 0))
            val factTurns = batch.count(t => t.text != null && t.text.length >= 50)
            val next = ConvState(
              prev.n_turns + batch.size,
              prev.n_fact_turns + factTurns,
              math.min(prev.first_ts, batch.map(_.ts.getTime).min),
              math.max(prev.last_ts, batch.map(_.ts.getTime).max))
            state.update(next)
            idleTimeout.foreach(state.setTimeoutDuration)
            Iterator.single(ConvSessionUpdate(convId, next.n_turns, next.n_fact_turns,
              next.last_ts - next.first_ts, closed = false))
          }
      }
  }
}

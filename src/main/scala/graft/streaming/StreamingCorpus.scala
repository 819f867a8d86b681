package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Pii, TextAnalysis}

/** Streaming training-corpus preparation: the gate/annotate/dedup front of
  * [[graft.ops.TrainingMix]] expressed over an append STREAM of documents —
  * the shape a continuously-crawled corpus arrives in.
  *
  * Everything here is chosen for streaming-correct state behavior:
  *   - annotation + quality gates + PII redaction are pure expressions
  *     (stateless, fused into each micro-batch's scan — identical plans to
  *     the batch path, so batch/stream parity is by construction);
  *   - exact dedup uses `dropDuplicatesWithinWatermark` on the content
  *     hash: a plain streaming `dropDuplicates` keys state on every hash
  *     FOREVER (state O(corpus) — the classic unbounded-state trap), while
  *     the watermark variant expires each key once the event-time watermark
  *     passes it, bounding state to the duplication horizon. Cross-horizon
  *     dedup belongs to the batch layer (one `Dedup.exact` pass or a MERGE
  *     into a keyed [[graft.tables.SnapshotLog]] table, which is content-
  *     idempotent anyway).
  */
object StreamingCorpus {

  /** Stateless per-document annotation + gating, applicable to a streaming
    * or batch DataFrame alike: language/token/quality columns, PII-redacted
    * text, and the configured floors applied as filters.
    */
  def gated(docs: DataFrame, minTokens: Int = 20, minQuality: Double = 0.5,
            textCol: String = "text"): DataFrame =
    docs
      .withColumn("lang_pred", TextAnalysis.langId(col(textCol)))
      .withColumn("n_tokens", TextAnalysis.tokenCount(col(textCol)).cast("long"))
      .withColumn("quality", TextAnalysis.qualityScore(col(textCol)))
      .withColumn("text_redacted", Pii.redact(col(textCol)))
      .filter(col("n_tokens") >= minTokens && col("quality") >= minQuality)

  /** Exact content dedup over an append stream with BOUNDED state: documents
    * whose `md5(text)` was already seen within the watermark horizon are
    * dropped; state for a hash is freed once the watermark passes its event
    * time. `tsCol` must be the event-time column the watermark rides on.
    */
  def dedupedWithinWatermark(docs: DataFrame, horizon: String = "10 minutes",
                             tsCol: String = "ts",
                             textCol: String = "text"): DataFrame =
    docs
      .withColumn("text_hash", md5(col(textCol)))
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark("text_hash")
}

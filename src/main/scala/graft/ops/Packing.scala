package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for pretraining: lay documents end-to-end in a
  * deterministic global order (concat-and-chunk) and report, per document,
  * its global `token_offset` and the first/last context window
  * (`first_bin`/`last_bin` of width `windowTokens`) it lands in — the
  * bookkeeping a trainer needs to cut fixed-length sequences without
  * materializing the concatenated stream.
  *
  * The global running sum is PrefixScan.inclusiveRunningSum with no strata
  * (the bucketed distributed scan — see that scaladoc; a plain
  * `Window.orderBy(ord)` would collapse 100 TB onto one task).
  */
object Packing {

  def packSequences(docs: DataFrame, windowTokens: Long,
                    idCol: String = "doc_id", lenCol: String = "n_tokens",
                    numBuckets: Int = 0): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    // pre-project so the scan's internal persist stays narrow
    val slim = docs.select(col(idCol), col(lenCol))
    PrefixScan.inclusiveRunningSum(slim, Nil, idCol, lenCol, numBuckets) match {
      case None =>
        // empty input keeps the documented 5-column output schema
        slim.select(col(idCol), col(lenCol).cast("long").as(lenCol),
          lit(0L).as("token_offset"), lit(0L).as("first_bin"),
          lit(0L).as("last_bin")).limit(0)
      case Some(scanned) =>
        // exclusive offset = inclusive cum − own length (all-long arithmetic)
        scanned
          .withColumn("token_offset", col("_cum") - col("_len"))
          .select(col(idCol), col("_len").as(lenCol),
            col("token_offset"),
            floor(col("token_offset") / windowTokens).as("first_bin"),
            floor((col("token_offset") + greatest(col("_len"), lit(1L)) - 1) / windowTokens)
              .as("last_bin"))
    }
  }
}

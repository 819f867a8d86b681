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
  * The global running sum is a textbook distributed scan, NOT a global
  * window (`Window.orderBy(ord)` collapses 100 TB onto one task):
  *   1. bucket each row by its ORDER-column value range (pure expression —
  *      deterministic, no sampling, buckets are contiguous key ranges);
  *   2. per-bucket totals → driver (numBuckets rows) → exclusive prefix;
  *   3. one partial sum per bucket via `Window.partitionBy(bucket)` plus the
  *      broadcast bucket prefix.
  * One full shuffle of a 3-column projection; every stage is
  * whole-stage-codegen'd. Skewed order-key distributions skew buckets —
  * pick `numBuckets` ≥ shuffle parallelism (default: shuffle partitions).
  */
object Packing {

  def packSequences(docs: DataFrame, windowTokens: Long,
                    idCol: String = "doc_id", lenCol: String = "n_tokens",
                    numBuckets: Int = 0): DataFrame = {
    require(windowTokens >= 1, s"windowTokens must be >= 1, got $windowTokens")
    val spark = docs.sparkSession
    val nb = if (numBuckets > 0) numBuckets
             else spark.sessionState.conf.numShufflePartitions

    // one narrow persisted projection feeds all three consumers (bounds agg,
    // per-bucket totals, final join) — without it the caller's upstream plan
    // (possibly a whole gate/dedup pipeline) re-executes per action
    val base = docs.select(col(idCol), col(lenCol).cast("long").as("_len"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bounds = base.agg(
      min(col(idCol)).cast("double").as("lo"),
      max(col(idCol)).cast("double").as("hi")).head()
    if (bounds.isNullAt(0)) {
      base.unpersist()
      // empty input keeps the documented 5-column output schema
      return base.select(col(idCol), col("_len").as(lenCol),
        lit(0L).as("token_offset"), lit(0L).as("first_bin"),
        lit(0L).as("last_bin")).limit(0)
    }
    val lo = bounds.getDouble(0)
    val span = math.max(bounds.getDouble(1) - lo, 0.0) + 1.0

    // Monotone in the order column, so buckets are contiguous key ranges.
    val bucket = least(
      floor((col(idCol).cast("double") - lit(lo)) * nb / lit(span)),
      lit(nb - 1L)).cast("int").as("_bucket")
    val rows = base.select(col(idCol), col("_len"), bucket)

    val totals = rows.groupBy(col("_bucket"))
      .agg(sum(col("_len")).as("_tot"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
    var acc = 0L
    val prefixRows = totals.map { case (b, tot) =>
      val p = acc; acc += tot; (b, p)
    }.toSeq
    val prefixes = spark.createDataFrame(prefixRows)
      .toDF("_bucket", "_prefix")

    val w = Window.partitionBy(col("_bucket")).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows
      .join(broadcast(prefixes), Seq("_bucket"))
      .withColumn("token_offset", col("_prefix") + sum(col("_len")).over(w) - col("_len"))
      .select(col(idCol), col("_len").as(lenCol),
        col("token_offset"),
        floor(col("token_offset") / windowTokens).as("first_bin"),
        floor((col("token_offset") + greatest(col("_len"), lit(1L)) - 1) / windowTokens)
          .as("last_bin"))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running sum in a deterministic order — the shared scaffolding
  * behind Packing.packSequences (global scan) and Sampling.tokenBudgetCap
  * (per-stratum scan). A plain `Window.orderBy(ord)` collapses the whole
  * frame (or the largest stratum) onto ONE task; this is the textbook
  * bucketed alternative:
  *   1. bucket each row by its order-column value range (pure expression —
  *      deterministic, no sampling; buckets are contiguous key ranges
  *      because the bucket function is monotone in the order column);
  *   2. per-(stratum, bucket) totals → driver (strata × buckets rows, a
  *      catalog not data) → exclusive prefix per stratum in bucket order;
  *   3. one in-bucket partial sum via `Window.partitionBy(stratum, bucket)`
  *      plus the broadcast prefix.
  * One full shuffle of a narrow projection; every stage whole-stage-codegen.
  * Skewed order-key distributions skew buckets — pick `numBuckets` >= shuffle
  * parallelism (default: shuffle partitions).
  */
private[ops] object PrefixScan {

  /** Input plus `_cum` = inclusive running sum of `lenCol` within each
    * stratum, ordered by `idCol` (global scan when `stratumCols` is empty).
    * `idCol` must be numeric (the range-bucketing casts it to double).
    *
    * NULL strata must survive the scan (SQL window semantics keep a NULL
    * partition) but an equi-join drops them, so strata are keyed by a
    * string image: per-column `coalesce(cast-to-string, NUL sentinel)`.
    * Two distinct stratum values with an identical string image collide —
    * fine for the catalog-like strata this is meant for.
    *
    * Returns None on empty input (callers own their empty-schema shape).
    */
  def inclusiveRunningSum(df: DataFrame, stratumCols: Seq[String],
      idCol: String, lenCol: String, numBuckets: Int): Option[DataFrame] = {
    val spark = df.sparkSession
    val nb = if (numBuckets > 0) numBuckets
             else spark.sessionState.conf.numShufflePartitions

    val skey = if (stratumCols.isEmpty) lit("")
      else concat_ws("",
        stratumCols.map(c => coalesce(col(c).cast("string"), lit("\u0000"))): _*)
    // one narrow persisted projection feeds all three consumers (bounds agg,
    // per-bucket totals, final join) — without it the caller's upstream plan
    // (possibly a whole gate/dedup pipeline) re-executes per action.
    // Deliberately left persisted on return: the result still reads from it,
    // and an eager unpersist would force a third upstream execution.
    val base = df
      .withColumn("_skey", skey)
      .withColumn("_len", col(lenCol).cast("long"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val bounds = base.agg(
      min(col(idCol)).cast("double").as("lo"),
      max(col(idCol)).cast("double").as("hi")).head()
    if (bounds.isNullAt(0)) {
      base.unpersist()
      return None
    }
    val lo = bounds.getDouble(0)
    val span = math.max(bounds.getDouble(1) - lo, 0.0) + 1.0

    // monotone in the order column, so buckets are contiguous key ranges
    val bucket = least(
      floor((col(idCol).cast("double") - lit(lo)) * nb / lit(span)),
      lit(nb - 1L)).cast("int").as("_bucket")
    val rows = base.withColumn("_bucket", bucket)

    val totals = rows.groupBy(col("_skey"), col("_bucket"))
      .agg(sum(col("_len")).as("_tot"))
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    val prefixRows = totals.toSeq.flatMap { case (sk, bs) =>
      var acc = 0L
      bs.sortBy(_._2).map { case (_, b, tot) =>
        val p = acc; acc += tot; (sk, b, p)
      }
    }
    val prefixes = spark.createDataFrame(prefixRows)
      .toDF("_skey", "_bucket", "_prefix")

    val w = Window.partitionBy(col("_skey"), col("_bucket"))
      .orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Some(rows
      .join(broadcast(prefixes), Seq("_skey", "_bucket"))
      .withColumn("_cum", col("_prefix") + sum(col("_len")).over(w))
      .drop("_skey", "_bucket", "_prefix"))
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** DSIR-style data selection (Xie et al. 2023, "Data Selection for Language
  * Models via Importance Resampling"): score every raw-pool document by how
  * much its hashed n-gram feature distribution resembles a TARGET corpus
  * rather than the raw pool itself, then keep the top-scored slice — the
  * distribution-matching member of the training-data family (quality gates
  * filter junk, mixtures balance sources; THIS selects for domain fit).
  *
  * score(doc) = Σ over the doc's n-gram OCCURRENCES of
  * ln( p̂_target(b(gram)) / p̂_raw(b(gram)) ), where b = a 16-bit md5 bucket
  * mod `buckets` (the same engine-portable hash trick as
  * [[Sketch.cmsBucket]]) and both distributions are add-one smoothed over
  * the bucket domain. Deterministic end to end: retries, layouts, and the
  * DuckDB oracle reproduce identical scores.
  *
  * Scale shape: two narrow explode → aggregate passes build the bucket
  * histograms — at most `buckets` rows each, broadcastable BY CONSTRUCTION
  * no matter how big the corpora; the scoring pass explodes raw grams once
  * and hash-joins the broadcast weight table; per-doc sums combine
  * map-side. Gram text never crosses a shuffle except inside the two
  * histogram aggregations (and those shuffle post-combine bucket counts,
  * not text).
  */
object DataSelection {

  /** Engine-portable feature bucket: first 16 md5 bits of "dsir:gram". */
  def bucketOf(gram: Column, buckets: Int): Column =
    conv(substring(md5(concat(lit("dsir:"), gram)), 1, 4), 16, 10)
      .cast("int") % buckets

  /** Importance score per raw document: (idCol, n_grams, score). Documents
    * too short for any n-gram keep score 0 (no evidence either way).
    */
  def dsirScores(raw: DataFrame, target: DataFrame, n: Int = 2,
      buckets: Int = 1024, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(n >= 1, s"n must be >= 1, got $n")
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
    val rawGrams = raw
      .select(col(idCol), explode(TextAnalysis.ngrams(col(textCol), n)).as("gram"))
      .select(col(idCol), bucketOf(col("gram"), buckets).as("bucket"))
    val tgtBuckets = target
      .select(explode(TextAnalysis.ngrams(col(textCol), n)).as("gram"))
      .select(bucketOf(col("gram"), buckets).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("ct"))
    val rawBuckets = rawGrams.groupBy(col("bucket")).agg(count(lit(1)).as("cr"))
    val tTot = tgtBuckets.agg(coalesce(sum(col("ct")), lit(0L)).as("tt"))
    val rTot = rawBuckets.agg(coalesce(sum(col("cr")), lit(0L)).as("tr"))
    // only buckets the raw pool actually hits need weights; totals ride in
    // as 1-row broadcasts (the pageRank dangling-mass idiom)
    val weights = rawBuckets
      .join(tgtBuckets, Seq("bucket"), "left")
      .crossJoin(broadcast(tTot)).crossJoin(broadcast(rTot))
      .select(col("bucket"),
        (log((coalesce(col("ct"), lit(0L)) + 1).cast("double")
            / (col("tt") + buckets).cast("double"))
          - log((col("cr") + 1).cast("double")
            / (col("tr") + buckets).cast("double"))).as("lw"))
    val perDoc = rawGrams.join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_grams"), sum(col("lw")).as("score"))
    raw.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("score"), lit(0.0)).as("score"))
  }

  /** The selection step: the `keep` highest-scored raw documents
    * (ties break on idCol — deterministic membership, the top-k contract
    * every other operator here follows).
    */
  def dsirSelect(raw: DataFrame, target: DataFrame, keep: Int, n: Int = 2,
      buckets: Int = 1024, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    dsirScores(raw, target, n, buckets, idCol, textCol)
      .orderBy(col("score").desc, col(idCol))
      .limit(keep)
}

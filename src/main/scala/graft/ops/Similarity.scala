package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score every corpus vector with codegen'd column arithmetic (zip_with +
  * aggregate dot product), per-query top-k via window. One corpus scan, no
  * corpus shuffle beyond the rank window.
  *
  * Scale path: IVF — corpus is assigned to the nearest of C centroids once
  * (narrow), queries probe only `nprobe` nearest centroid partitions. Recall
  * is tunable; at 100 TB the scan reduction is C/nprobe ×. Centroids here are
  * deterministic samples (hash-picked rows) rather than trained k-means —
  * the partitioning/shuffle structure is identical to trained IVF.
  */
object Similarity {

  /** Brute-force cosine top-k: for each query row, the k nearest corpus rows.
    * @param corpus  (id, vec: array<float|double>)
    * @param queries (qid, qvec)
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("score", VectorOps.cosine(col(qvecCol), col(vecCol)))
      .filter(col(qidCol) =!= col(idCol)) // a vector is not its own neighbor
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol).as("neighbor_id"), col("score"))
  }

  /** IVF-style ANN: assign corpus rows to their nearest centroid (one narrow
    * pass), then score queries only against the union of their `nprobe`
    * closest centroids' rows. Returns the same shape as bruteForceTopK.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nCentroids: Int = 16,
      nprobe: Int = 4, idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    // deterministic centroid pick: the nCentroids corpus rows with the
    // smallest abs(hash(id)) — a TakeOrderedAndProject (per-partition top-k +
    // driver merge of nCentroids rows), NOT a global window: a partition-less
    // Window.orderBy would funnel the whole corpus through one task.
    // nCentroids is small by contract, so the driver-side materialization is
    // bounded and the centroid table broadcasts.
    val picked = corpus
      .orderBy(abs(hash(col(idCol))), col(idCol))
      .limit(nCentroids)
      .select(col(vecCol).cast("array<double>").as("cvec"))
      .collect()
    val centroids = picked.zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Double](0)) }
      .toSeq.toDF("centroid_id", "cvec")

    def nearestCentroids(df: DataFrame, keyCol: String, v: String, outCol: String,
        take: Int): DataFrame = {
      val w = Window.partitionBy(col(keyCol)).orderBy(col("cscore").desc, col("centroid_id"))
      df.crossJoin(broadcast(centroids))
        .withColumn("cscore", VectorOps.cosine(col(v), col("cvec")))
        .withColumn("crank", row_number().over(w))
        .filter(col("crank") <= take)
        .drop("cvec", "cscore", "crank")
        .withColumnRenamed("centroid_id", outCol)
    }

    val assigned = nearestCentroids(corpus, idCol, vecCol, "cell", take = 1)
    val probed = nearestCentroids(queries, qidCol, qvecCol, "cell", take = nprobe)

    val scored = probed.join(assigned, Seq("cell"))
      .withColumn("score", VectorOps.cosine(col(qvecCol), col(vecCol)))
      .filter(col(qidCol) =!= col(idCol))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol).as("neighbor_id"), col("score"))
  }
}

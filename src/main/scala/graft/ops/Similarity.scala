package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set,
  * score every corpus vector with codegen'd column arithmetic (zip_with +
  * aggregate dot product), per-query top-k via a rank window. The
  * `row_number ≤ k` filter triggers Spark's rank-limit pushdown
  * (InferWindowGroupLimit, 3.5+): the plan carries a PARTIAL
  * WindowGroupLimit below the per-query exchange, so each input partition
  * ships only its own top-k rows per query — the exchange moves
  * ≤ k·partitions rows per query, never a query's full candidate set, and
  * no single task ever sorts the corpus (PlanSpec pins this shape). One
  * corpus scan, no corpus shuffle.
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

  /** Symmetric int8 quantization of an embedding column: per-vector scale
    * 127/max|x|, q_i = floor(x_i·scale + 0.5) ∈ [−127, 127] — the standard
    * 4× vector-storage compression. The rounding formula is pinned (floor
    * of +0.5, not banker's rounding) so any engine replays the quantized
    * values bit-for-bit; all-zero vectors quantize to all zeros (scale
    * null-guarded). Pure narrow expressions — fused into the scan.
    * Returns the input plus `qvec: array<int>` and `qscale: double`.
    */
  def quantize(embeddings: DataFrame,
      vecCol: String = "embedding"): DataFrame = {
    val x = transform(col(vecCol), v => v.cast("double"))
    val mx = array_max(transform(x, abs(_)))
    val scale = when(mx > 0.0, lit(127.0) / mx).otherwise(lit(0.0))
    embeddings
      .withColumn("qscale", scale)
      .withColumn("qvec",
        transform(x, v => floor(v * col("qscale") + 0.5).cast("int")))
  }

  /** Top-k neighbors under the QUANTIZED dot product. The metric is the
    * MAX-NORMALIZED dot (each vector carries its own 127/max|x| scale), so
    * it agrees with cosine when vector max-to-norm ratios are comparable —
    * the usual case for same-encoder embeddings — and the scores are exact
    * 64-bit integer sums: ranking is bit-reproducible on any engine with
    * no floating-point hedging at all (a property cosine scores can only
    * approximate through rounding). Same broadcast + group-limit-pruned rank
    * shape as [[bruteForceTopK]]; drift vs the full-precision max-
    * normalized dot is bounded by the 1/254 quantization step.
    */
  def quantizedTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val qc = quantize(corpus, vecCol)
      .select(col(idCol), col("qvec").as("cq"))
    val qq = quantize(queries, qvecCol)
      .select(col(qidCol), col("qvec").as("qq"))
    val dot = aggregate(
      zip_with(col("cq"), col("qq"), (a, b) => a.cast("long") * b),
      lit(0L), (acc, v) => acc + v)
    val scored = qc.crossJoin(broadcast(qq))
      .filter(col(qidCol) =!= col(idCol))
      .withColumn("qdot", dot)
    val w = Window.partitionBy(col(qidCol)).orderBy(col("qdot").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol).as("neighbor_id"), col("qdot"))
  }

  /** Deterministic k-means (Lloyd) centroid training: seeded with the
    * nCentroids corpus rows of smallest abs(hash(id)) — a
    * TakeOrderedAndProject, NOT a global window — then `iters` rounds of
    * assign (broadcast centroids, narrow) + recompute (posexplode →
    * per-(cell, dim) mean → rebuild arrays: one shuffle of nCentroids × dim
    * scalars per round, never the corpus). Deterministic for a fixed
    * partitioning (floating-point mean accumulation order follows the data
    * layout; seed order and empty-cell carry-over are layout-independent).
    *
    * @return (centroid_id, cvec) rows, collected (bounded: nCentroids).
    */
  def kmeansCentroids(corpus: DataFrame, nCentroids: Int, iters: Int,
      idCol: String = "vec_id", vecCol: String = "embedding"): Seq[(Int, Seq[Double])] = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val vecs = corpus.select(col(idCol).as("id"), col(vecCol).cast("array<double>").as("v"))
    var centroids: Seq[(Int, Seq[Double])] = vecs
      .orderBy(abs(hash(col("id"))), col("id"))
      .limit(nCentroids)
      .collect().zipWithIndex
      .map { case (r, i) => (i + 1, r.getSeq[Double](1)) }.toSeq
    var it = 0
    while (it < iters) {
      val assign = nearestCells(centroids, take = 1)
      val means = vecs
        .select(element_at(assign(col("v")), 1).as("centroid_id"),
          posexplode(col("v")).as(Seq("dim", "x")))
        .groupBy(col("centroid_id"), col("dim")).agg(avg(col("x")).as("m"))
        .groupBy(col("centroid_id"))
        .agg(transform(array_sort(collect_list(struct(col("dim"), col("m")))),
          e => e.getField("m")).as("cvec"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1)).toMap
      centroids = centroids.map { case (cid, old) => (cid, means.getOrElse(cid, old)) }
      it += 1
    }
    centroids
  }

  /** Closure-captured argmax-cosine cell assignment — a NARROW per-row UDF
    * over the broadcast-sized centroid list. The declarative alternative
    * (crossJoin(centroids) + rank-1 window) shuffles corpus × nCentroids rows
    * by id — a non-starter at corpus scale. Ties break to the smaller id.
    * Returns the top-`take` cell ids, nearest first.
    */
  private def nearestCells(centroids: Seq[(Int, Seq[Double])], take: Int)
      : org.apache.spark.sql.expressions.UserDefinedFunction = {
    val cents = centroids.map { case (cid, v) => (cid, v.toArray) }.toArray
    udf { (v: Seq[Double]) =>
      val x = v.toArray
      cents.map { case (cid, c) => (graft.functions.Embed.cosine(x, c), cid) }
        .sortBy { case (s, cid) => (-s, cid) }
        .take(take).map(_._2)
    }
  }

  /** IVF-style ANN: assign corpus rows to their nearest centroid (one narrow
    * pass), then score queries only against the union of their `nprobe`
    * closest centroids' rows. Returns the same shape as bruteForceTopK.
    * `kmeansIters` > 0 trains the centroids with that many deterministic
    * Lloyd rounds (better-balanced cells → better recall per probe); 0 keeps
    * the hash-seeded sample (the partitioning/shuffle structure is identical).
    *
    * `multiAssign` > 1 stores each corpus row in its `multiAssign` nearest
    * cells (redundant assignment, as in SPANN-style spill lists): a neighbor
    * sitting near a cell boundary is then reachable from either side, which
    * buys more recall per scanned row than raising nprobe on
    * weakly-clustered data (measured: recall 0.71 @ 23% corpus scanned for
    * C=64/nprobe=8/r=2 vs 0.68 @ 25% for C=64/nprobe=16/r=1 on uniform
    * embeddings — IvfRecallProbe prints the full curve). Cost: index storage
    * and cell sizes scale ×r; candidate pairs reached through two shared
    * cells are deduped before ranking (else top-k would double-count).
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, nCentroids: Int = 16,
      nprobe: Int = 4, kmeansIters: Int = 0, multiAssign: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    require(multiAssign >= 1 && multiAssign <= nCentroids, "multiAssign out of range")
    // one definition of probe/dedupe/score/rank for the ad-hoc and the
    // persisted-index paths: ad-hoc IS build-then-serve without the commit
    val (centroidsDf, assigned) = buildIvfIndex(corpus, nCentroids, kmeansIters,
      multiAssign, idCol, vecCol)
    ivfTopKIndexed(centroidsDf, assigned, queries, k, nprobe, multiAssign,
      idCol, vecCol, qidCol, qvecCol)
  }

  // ---------- persisted IVF index (train once, serve + extend forever) ----

  /** Materialize an IVF index as two DataFrames ready to commit to a
    * [[graft.tables.SnapshotLog]] warehouse: a tiny `centroids` relation
    * (cell, cvec — nCentroids rows) and the cell-exploded `assignments`
    * relation (cell, id, vec — ×multiAssign the corpus). At serving scale
    * the training cost (Lloyd rounds over 100 TB) and the assignment pass
    * amortize across every later query session instead of re-running per
    * session; committing `assignments` partitioned BY `cell` makes a probe
    * read only its nprobe partitions (partition pruning on the cell join).
    */
  def buildIvfIndex(corpus: DataFrame, nCentroids: Int = 16,
      kmeansIters: Int = 0, multiAssign: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding")
      : (DataFrame, DataFrame) = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val centroids = kmeansCentroids(corpus, nCentroids, kmeansIters, idCol, vecCol)
    val centroidsDf = centroids.toDF("cell", "cvec")
    (centroidsDf, assignToIndex(centroidsDf, corpus, multiAssign, idCol, vecCol))
  }

  /** Assign (new) corpus rows to an EXISTING index's cells — the incremental
    * path: a corpus increment is assigned against the committed centroids
    * and merge-appended to the assignments table; no retraining, no touch of
    * the standing assignment rows. Row shape matches [[buildIvfIndex]]'s
    * assignments relation.
    */
  def assignToIndex(centroidsDf: DataFrame, corpus: DataFrame,
      multiAssign: Int = 1, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val assign = nearestCells(collectCentroids(centroidsDf), take = multiAssign)
    corpus.select(col(idCol), col(vecCol).cast("array<double>").as(vecCol))
      .withColumn("cell", explode(assign(col(vecCol))))
      .select(col("cell"), col(idCol), col(vecCol))
  }

  /** ANN top-k served FROM a persisted index (the read side of
    * [[buildIvfIndex]]): identical semantics and output shape to [[ivfTopK]]
    * with the same parameters — proven by spec — but the corpus-side work is
    * a pruned scan of the probed cells' rows instead of a fresh train+assign.
    */
  def ivfTopKIndexed(centroidsDf: DataFrame, assignments: DataFrame,
      queries: DataFrame, k: Int, nprobe: Int = 4, multiAssign: Int = 1,
      idCol: String = "vec_id", vecCol: String = "embedding",
      qidCol: String = "qid", qvecCol: String = "qvec"): DataFrame = {
    val assignP = nearestCells(collectCentroids(centroidsDf), take = nprobe)
    val probed = queries
      .withColumn("cell", explode(assignP(col(qvecCol).cast("array<double>"))))
    val joined0 = probed.join(assignments, Seq("cell"))
    // r > 1: a (query, row) pair can meet through two shared cells — dedupe
    // BEFORE scoring/ranking (row_number would otherwise rank the duplicate
    // and shift true neighbors out of the top k). The dedupe keys are the
    // same (qid-led) keys the rank window shuffles on next, so AQE/exchange
    // reuse keeps it one effective repartitioning on the candidate set —
    // never the corpus.
    val joined = if (multiAssign > 1) joined0.dropDuplicates(qidCol, idCol) else joined0
    val scored = joined
      .withColumn("score", VectorOps.cosine(col(qvecCol), col(vecCol)))
      .filter(col(qidCol) =!= col(idCol))
    val w = Window.partitionBy(col(qidCol)).orderBy(col("score").desc, col(idCol))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qidCol), col("rank"), col(idCol).as("neighbor_id"), col("score"))
  }

  /** Driver-side fetch of a centroid relation (bounded: nCentroids rows). */
  private def collectCentroids(centroidsDf: DataFrame): Seq[(Int, Seq[Double])] =
    centroidsDf.select(col("cell").cast("int"), col("cvec").cast("array<double>"))
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).toSeq
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trained quality classifier in the fastText shape (Joulin et al. 2017,
  * "Bag of Tricks for Efficient Text Classification") — the discriminative
  * member of the corpus-quality family: [[TextAnalysis.qualityScore]] is a
  * fixed heuristic, [[LanguageModel]] scores target-LM fit, [[DataSelection]]
  * matches a target distribution; THIS one learns from labeled positive /
  * negative documents, the way the GPT-3 / LLaMA / CCNet pipelines gate
  * their crawl (a linear classifier over hashed word + word-bigram features).
  *
  * Model = multinomial Naive Bayes with add-one smoothing over a hashed
  * feature space (unigrams ++ word bigrams, each md5-bucketed — the fastText
  * hashing trick, which is what makes the model size independent of corpus
  * vocabulary and the train/score passes pure hash-joins):
  *
  * score(doc) = ln(Npos/Nneg)
  *            + Σ over feature OCCURRENCES of
  *              [ ln((cpos(b)+1)/(Tpos+B)) − ln((cneg(b)+1)/(Tneg+B)) ]
  *
  * predicted = 1 iff score > 0. NB's per-feature log-ratio IS a linear
  * weight vector, so this is the same model class fastText trains by SGD —
  * computed in closed form from two count aggregations, which is what makes
  * it deterministic and DuckDB-replayable end to end (no SGD order
  * dependence, no learning-rate schedule).
  *
  * Scale shape (the [[DataSelection.dsirScores]] discipline): the two class
  * histograms and the per-bucket weight table are at most `buckets` rows —
  * broadcastable BY CONSTRUCTION regardless of corpus size; the scoring pass
  * explodes each doc's features once and hash-joins the broadcast weights;
  * per-doc sums combine map-side. Feature text never crosses a shuffle
  * except inside the two histogram aggregations (post-combine bucket
  * counts, not text).
  */
object QualityClassifier {

  /** Hashed feature bucket: first 16 md5 bits of "nbq:gram" mod `buckets`
    * (the [[DataSelection.bucketOf]] trick under its own salt, so the
    * classifier's feature space is decorrelated from DSIR's).
    */
  def bucketOf(gram: Column, buckets: Int): Column =
    conv(substring(md5(concat(lit("nbq:"), gram)), 1, 4), 16, 10)
      .cast("int") % buckets

  /** fastText wordNgrams=2 feature set: unigrams ++ word bigrams. */
  private def featureGrams(textCol: Column): Column =
    concat(TextAnalysis.ngrams(textCol, 1), TextAnalysis.ngrams(textCol, 2))

  private def bucketsOf(df: DataFrame, textCol: String, buckets: Int,
      extra: Column*): DataFrame =
    df.select(extra :+ explode(featureGrams(col(textCol))).as("gram"): _*)
      .withColumn("bucket", bucketOf(col("gram"), buckets)).drop("gram")

  /** The trained model as a DataFrame: (bucket, cpos, cneg) occurrence
    * counts per hashed feature bucket — at most `buckets` rows, mergeable
    * across corpus increments by plain addition (the [[Sketch]] property).
    */
  def trainCounts(pos: DataFrame, neg: DataFrame, buckets: Int = 4096,
      textCol: String = "text"): DataFrame = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
    bucketsOf(pos, textCol, buckets).groupBy(col("bucket"))
      .agg(count(lit(1)).as("cpos"))
      .join(bucketsOf(neg, textCol, buckets).groupBy(col("bucket"))
        .agg(count(lit(1)).as("cneg")), Seq("bucket"), "full")
      .select(col("bucket"), coalesce(col("cpos"), lit(0L)).as("cpos"),
        coalesce(col("cneg"), lit(0L)).as("cneg"))
  }

  /** Train on (pos, neg) and score `docs`: (idCol, n_features, score,
    * predicted). Documents with no features score the class prior alone.
    */
  def scores(docs: DataFrame, pos: DataFrame, neg: DataFrame,
      buckets: Int = 4096, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame =
    scoreWithModel(docs, trainCounts(pos, neg, buckets, textCol),
      pos.agg(count(lit(1))).collect()(0).getLong(0),
      neg.agg(count(lit(1))).collect()(0).getLong(0),
      buckets, idCol, textCol)

  /** Score `docs` against an ALREADY-TRAINED model (the [[trainCounts]]
    * shape plus the two class doc counts for the prior) — the apply path
    * for a model committed to the warehouse and refreshed O(delta)
    * (TableApp `classifier`): counts are mergeable, so the model a full
    * retrain produces and the model increments folded into are identical,
    * and so are the scores.
    */
  def scoreWithModel(docs: DataFrame, model: DataFrame, nPos: Long,
      nNeg: Long, buckets: Int = 4096, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    require(buckets >= 2 && buckets <= 65536,
      s"buckets must be in [2, 65536], got $buckets")
    require(nPos > 0 && nNeg > 0,
      s"both classes need training documents, got pos=$nPos neg=$nNeg")
    val docFeats = bucketsOf(docs, textCol, buckets, col(idCol))
    // totals + prior ride in as a 1-row broadcast (the pageRank
    // dangling-mass idiom); weights only for buckets the scored docs hit
    val tots = model
      .agg(coalesce(sum(col("cpos")), lit(0L)).as("tp"),
        coalesce(sum(col("cneg")), lit(0L)).as("tn"))
      .withColumn("np", lit(nPos)).withColumn("nn", lit(nNeg))
    val weights = docFeats.select(col("bucket")).distinct()
      .join(model, Seq("bucket"), "left")
      .crossJoin(broadcast(tots))
      .select(col("bucket"),
        (log((coalesce(col("cpos"), lit(0L)) + 1).cast("double")
            / (col("tp") + buckets).cast("double"))
          - log((coalesce(col("cneg"), lit(0L)) + 1).cast("double")
            / (col("tn") + buckets).cast("double"))).as("lw"))
    val perDoc = docFeats.join(broadcast(weights), Seq("bucket"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_features"), sum(col("lw")).as("fsum"))
    docs.select(col(idCol)).join(perDoc, Seq(idCol), "left")
      .crossJoin(broadcast(tots.select(
        log(col("np").cast("double") / col("nn").cast("double")).as("prior"))))
      .select(col(idCol),
        coalesce(col("n_features"), lit(0L)).as("n_features"),
        (col("prior") + coalesce(col("fsum"), lit(0.0))).as("score"))
      .withColumn("predicted",
        when(col("score") > 0, lit(1)).otherwise(lit(0)))
  }
}

package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CCNet-style perplexity filtering (Wenzek et al. 2020): score every
  * document by its perplexity under a bigram language model trained on a
  * high-quality reference corpus — the quality signal that separates fluent
  * text from boilerplate/gibberish where rule scores ([[TextAnalysis]]) and
  * domain fit ([[DataSelection]]) cannot.
  *
  * Model: add-one-smoothed bigram LM over [[TextAnalysis]] tokens.
  * p(w | u) = (c(u,w) + 1) / (c(u) + V); the first token scores against the
  * unigram p(w) = (c(w) + 1) / (T + V); unseen contexts back off to
  * c(u) = 0 (pure smoothing mass). All counts are integers and every log is
  * over an exact integer ratio, so scores replay bit-comparably in any
  * engine (the DuckDB oracle re-derives the whole model).
  *
  * Scale shape: the LM is two count tables keyed by token — at reference-
  * corpus scale they exceed broadcast size, so scoring joins are SHUFFLED
  * hash joins on the token/bigram key with map-side-combined per-doc sums
  * (unlike [[DataSelection]]'s by-construction-bounded bucket histograms;
  * hash the keys the same way if a bounded model is wanted). Token text
  * crosses the shuffle once per side, post-combine.
  */
object LanguageModel {

  /** Train the count tables: (bigrams (u, w, c), unigrams (u, cu), vocabV,
    * totalT) — returned as DataFrames plus scalars so callers can persist
    * the model with SnapshotLog like any other table.
    */
  def trainBigram(corpus: DataFrame, textCol: String = "text")
      : (DataFrame, DataFrame, Long, Long) = {
    val toks = corpus.select(TextAnalysis.tokens(col(textCol)).as("t"))
    val unigrams = toks.select(explode(col("t")).as("u"))
      .groupBy(col("u")).agg(count(lit(1)).as("cu"))
    val bigrams = toks
      .select(explode(TextAnalysis.ngrams(concat_ws(" ", col("t")), 2)).as("g"))
      .select(split(col("g"), " ").getItem(0).as("u"),
        split(col("g"), " ").getItem(1).as("w"))
      .groupBy(col("u"), col("w")).agg(count(lit(1)).as("c"))
    val row = unigrams.agg(count(lit(1)).as("v"),
      coalesce(sum(col("cu")), lit(0L)).as("t")).collect()(0)
    (bigrams, unigrams, row.getLong(0), row.getLong(1))
  }

  /** Per-document perplexity under the trained model:
    * (idCol, n_tokens, avg_logprob, ppl = exp(-avg_logprob)). Empty docs
    * keep n_tokens 0 and null scores (no evidence, not "perfect").
    */
  def perplexity(docs: DataFrame, bigrams: DataFrame, unigrams: DataFrame,
      vocabV: Long, totalT: Long, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol), TextAnalysis.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) >= 1)
    // first token: unigram probability
    val first = toks.select(col(idCol), col("t").getItem(0).as("w"))
      .join(unigrams.select(col("u").as("w"), col("cu").as("cw")), Seq("w"), "left")
      .select(col(idCol),
        log((coalesce(col("cw"), lit(0L)) + 1).cast("double")
          / lit((totalT + vocabV).toDouble)).as("lp"))
    // remaining tokens: bigram conditionals with unigram-context backoff
    val pairs = toks
      .select(col(idCol),
        explode(TextAnalysis.ngrams(concat_ws(" ", col("t")), 2)).as("g"))
      .select(col(idCol), split(col("g"), " ").getItem(0).as("u"),
        split(col("g"), " ").getItem(1).as("w"))
      .join(bigrams, Seq("u", "w"), "left")
      .join(unigrams, Seq("u"), "left")
      .select(col(idCol),
        log((coalesce(col("c"), lit(0L)) + 1).cast("double")
          / (coalesce(col("cu"), lit(0L)) + vocabV).cast("double")).as("lp"))
    val scored = first.unionByName(pairs)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"), avg(col("lp")).as("avg_logprob"))
      .select(col(idCol), col("n_tokens"), col("avg_logprob"),
        exp(-col("avg_logprob")).as("ppl"))
    docs.select(col(idCol)).join(scored, Seq(idCol), "left")
      .select(col(idCol), coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        col("avg_logprob"), col("ppl"))
  }
}

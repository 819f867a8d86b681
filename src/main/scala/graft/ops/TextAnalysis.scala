package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: language-ID, quality
  * scoring, token counting, document fingerprinting. All pure column
  * expressions (whole-stage codegen; no UDFs in the hot path) so they fuse
  * into the scan at 100 TB.
  */
object TextAnalysis {

  /** Per-language high-frequency word lists (n-gram heuristic langid). */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "in", "that", "for", "with", "on"),
    "es" -> Seq("el", "la", "de", "que", "y", "en", "los", "del", "las", "por"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "mit", "ein", "für", "auf"),
    "fr" -> Seq("le", "la", "les", "des", "est", "dans", "pour", "que", "une", "sur"),
    "zh" -> Seq("的", "是", "在", "了", "和", "有", "我", "不", "这", "中"))

  private[graft] def tokens(textCol: Column): Column =
    array_remove(split(lower(textCol), "[^\\p{L}0-9]+"), "")

  /** Heuristic language id: argmax over marker-word hit counts; "und"
    * (undetermined) when nothing matches.
    */
  def langId(textCol: Column): Column = langIdOf(tokens(textCol))

  /** [[langId]] over a PRE-TOKENIZED array column. The marker intersections
    * reference the token array 5×; callers that project `tokens(text)` once
    * and pass the reference pay ONE regex split per row instead of five —
    * higher-order lambdas block codegen subexpression elimination, so the
    * repeated `split` is otherwise re-evaluated per use (guide §1.2 per-task
    * work; value-identical by construction).
    */
  def langIdOf(toks: Column): Column = {
    // one O(|tokens|) pass against the UNION of all marker words, then the
    // five per-language intersections run over the ≤50-element distinct-hit
    // array instead of the full token stream. Value-identical:
    // array_intersect(t, m) = array_intersect(array_intersect(t, all), m)
    // for m ⊆ all (both count t's distinct members of m).
    val allMarkers = langMarkers.flatMap(_._2).distinct.toArray
    val hits = array_intersect(toks, lit(allMarkers))
    val scores = langMarkers.map { case (lang, words) =>
      struct(size(array_intersect(hits, lit(words.toArray))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Whitespace-ish token count. */
  def tokenCount(textCol: Column): Column = size(tokens(textCol))

  /** [[tokenCount]] over a pre-tokenized array column. */
  def tokenCountOf(toks: Column): Column = size(toks)

  /** BPE-ish subword count: word-initial pieces + length-based continuation
    * pieces (≈ len/4 per long token) — the standard pretraining-corpus sizing
    * heuristic, as a pure expression.
    */
  def bpeTokenCount(textCol: Column): Column = bpeTokenCountOf(tokens(textCol))

  /** [[bpeTokenCount]] over a pre-tokenized array column. */
  def bpeTokenCountOf(toks: Column): Column =
    aggregate(toks, lit(0L),
      (acc, w) => acc + lit(1L) + floor(length(w) / lit(5.0)).cast("long"))

  /** Quality score in [0,1]: blend of length band, alphabetic ratio,
    * stop-word presence, and mean word length (doc-quality heuristics à la
    * C4/Gopher rules), as one expression.
    */
  def qualityScore(textCol: Column): Column =
    qualityScoreOf(textCol, tokens(textCol))

  /** [[qualityScore]] over a pre-tokenized array column (the token array is
    * referenced 5× here — see [[langIdOf]] for why pre-projection matters).
    */
  def qualityScoreOf(textCol: Column, toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val nChar = length(textCol).cast("double")
    // count of a-z chars without the regex engine: strip them with a
    // single-pass translate and diff the lengths — value-identical to
    // length(regexp_replace(lower(text), "[^a-z]", ""))
    val lowered = lower(textCol)
    val alphaChars = length(lowered) -
      length(translate(lowered, "abcdefghijklmnopqrstuvwxyz", ""))
    val alphaRatio = (alphaChars / greatest(nChar, lit(1.0)))
    val stopHits = size(array_intersect(toks,
      lit(Array("the", "and", "of", "to", "is", "in", "a", "that")))).cast("double")
    val stopRatio = least(stopHits / lit(4.0), lit(1.0))
    val lenBand = when(nTok.between(20, 5000), lit(1.0))
      .when(nTok.between(5, 20000), lit(0.5)).otherwise(lit(0.0))
    val meanWordLen = (aggregate(toks, lit(0L), (acc, w) => acc + length(w)).cast("double") /
      greatest(nTok, lit(1.0)))
    val wordLenOk = when(meanWordLen.between(2.5, 10.0), lit(1.0)).otherwise(lit(0.0))
    round((lenBand + alphaRatio + stopRatio + wordLenOk) / lit(4.0), 4)
  }

  /** Content fingerprint: md5 of whitespace/case-normalized text — stable
    * under formatting noise; use as exact-dedup key.
    */
  def fingerprint(textCol: Column): Column = fingerprintOf(tokens(textCol))

  /** [[fingerprint]] over a pre-tokenized array column. */
  def fingerprintOf(toks: Column): Column = md5(array_join(toks, " "))

  /** Rolling Karp-Rabin 64-bit hash of the token stream (order-sensitive
    * fingerprint; xxhash-based fold, overflow-safe via bitwise ops).
    */
  def rollingHash(textCol: Column): Column = rollingHashOf(tokens(textCol))

  /** [[rollingHash]] over a pre-tokenized array column. */
  def rollingHashOf(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, w) => xxhash64(acc, w))

  /** Array of word `n`-grams (space-joined), over [[tokens]]. Empty array when
    * the document has fewer than `n` tokens. Pure expression (codegen).
    */
  def ngrams(textCol: Column, n: Int): Column = ngramsOf(tokens(textCol), n)

  /** [[ngrams]] over a pre-tokenized array column. */
  def ngramsOf(toks: Column, n: Int): Column = {
    require(n >= 1, s"ngram size must be >= 1, got $n")
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + lit(1), lit(n)), " ")))
      .otherwise(array().cast("array<string>"))
  }

  /** Gopher-style repetition signals per document:
    * `dup_ngram_frac`  = fraction of n-gram instances that are repeats of an
    *                     earlier instance ((total − distinct) / total), and
    * `top_bigram_frac` = occurrences of the most frequent 2-gram / total
    *                     2-grams — the "fraction of characters in the most
    *                     common n-gram" family of quality filters from the
    *                     Gopher/MassiveText rules, on token counts.
    * Both rounded to 4 dp; 0.0 for documents too short to form a gram.
    *
    * Scale shape: the dup fraction is a pure expression fused into the scan;
    * the top-bigram mode runs explode → two-level aggregation keyed by
    * (id, gram) — partial aggregation combines map-side, the shuffle key is
    * the doc id + gram, and no per-doc state exceeds its distinct-gram count
    * (never O(corpus)). An expression-only mode (filter-count per distinct
    * gram) would be O(grams²) per document and melt on a 1M-token doc.
    */
  def repetitionSignals(docs: DataFrame, idCol: String = "doc_id",
                        textCol: String = "text", n: Int = 5): DataFrame = {
    // tokenize once, materialize the n-gram array once: `g5` is referenced
    // 3× below and each inline ngrams() call would re-split the text —
    // staged projections keep it one split + one gram build per row
    val g5 = col("_g5")
    val base = docs
      .select(col(idCol), tokens(col(textCol)).as("_toks"))
      .select(col(idCol), ngramsOf(col("_toks"), n).as("_g5"),
        ngramsOf(col("_toks"), 2).as("g2"))
      .select(
        col(idCol),
        round((size(g5) - size(array_distinct(g5))).cast("double") /
          greatest(size(g5), lit(1)).cast("double"), 4).as("dup_ngram_frac"),
        col("g2"))
    val topBigram = base
      .select(col(idCol), explode(col("g2")).as("g"))
      .groupBy(col(idCol), col("g")).agg(count(lit(1)).as("cnt"))
      .groupBy(col(idCol))
      .agg(max(col("cnt")).as("max_cnt"), sum(col("cnt")).as("tot_cnt"))
    base.drop("g2")
      .join(topBigram, Seq(idCol), "left")
      .select(col(idCol), col("dup_ngram_frac"),
        round(coalesce(col("max_cnt").cast("double") / col("tot_cnt"), lit(0.0)), 4)
          .as("top_bigram_frac"))
  }

  /** Convenience: annotate a documents DataFrame with all analysis columns.
    * Tokenizes once (staged projection) — the six analyses reference the
    * token array ~14× between them.
    */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("_toks", tokens(col(textCol)))
      .withColumn("lang_pred", langIdOf(col("_toks")))
      .withColumn("n_tokens", tokenCountOf(col("_toks")))
      .withColumn("n_bpe_tokens", bpeTokenCountOf(col("_toks")))
      .withColumn("quality", qualityScoreOf(col(textCol), col("_toks")))
      .withColumn("fingerprint", fingerprintOf(col("_toks")))
      .withColumn("rolling_hash", rollingHashOf(col("_toks")))
      .drop("_toks")
}

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
  def langId(textCol: Column): Column = {
    val t = tokens(textCol)
    val scores = langMarkers.map { case (lang, words) =>
      struct(size(array_intersect(t, lit(words.toArray))).as("hits"),
        lit(lang).as("lang"))
    }
    val best = greatest(scores: _*)
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Whitespace-ish token count. */
  def tokenCount(textCol: Column): Column = size(tokens(textCol))

  /** BPE-ish subword count: word-initial pieces + length-based continuation
    * pieces (≈ len/4 per long token) — the standard pretraining-corpus sizing
    * heuristic, as a pure expression.
    */
  def bpeTokenCount(textCol: Column): Column =
    aggregate(tokens(textCol), lit(0L),
      (acc, w) => acc + lit(1L) + floor(length(w) / lit(5.0)).cast("long"))

  /** Quality score in [0,1]: blend of length band, alphabetic ratio,
    * stop-word presence, and mean word length (doc-quality heuristics à la
    * C4/Gopher rules), as one expression.
    */
  def qualityScore(textCol: Column): Column = {
    val t = tokens(textCol)
    val nTok = size(t).cast("double")
    val nChar = length(textCol).cast("double")
    val alphaRatio = (length(regexp_replace(lower(textCol), "[^a-z]", "")) / greatest(nChar, lit(1.0)))
    val stopHits = size(array_intersect(t,
      lit(Array("the", "and", "of", "to", "is", "in", "a", "that")))).cast("double")
    val stopRatio = least(stopHits / lit(4.0), lit(1.0))
    val lenBand = when(nTok.between(20, 5000), lit(1.0))
      .when(nTok.between(5, 20000), lit(0.5)).otherwise(lit(0.0))
    val meanWordLen = (aggregate(t, lit(0L), (acc, w) => acc + length(w)).cast("double") /
      greatest(nTok, lit(1.0)))
    val wordLenOk = when(meanWordLen.between(2.5, 10.0), lit(1.0)).otherwise(lit(0.0))
    round((lenBand + alphaRatio + stopRatio + wordLenOk) / lit(4.0), 4)
  }

  /** Content fingerprint: md5 of whitespace/case-normalized text — stable
    * under formatting noise; use as exact-dedup key.
    */
  def fingerprint(textCol: Column): Column =
    md5(array_join(tokens(textCol), " "))

  /** Rolling Karp-Rabin 64-bit hash of the token stream (order-sensitive
    * fingerprint; xxhash-based fold, overflow-safe via bitwise ops).
    */
  def rollingHash(textCol: Column): Column =
    aggregate(tokens(textCol), lit(0L),
      (acc, w) => xxhash64(acc, w))

  /** Convenience: annotate a documents DataFrame with all analysis columns. */
  def annotate(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs
      .withColumn("lang_pred", langId(col(textCol)))
      .withColumn("n_tokens", tokenCount(col(textCol)))
      .withColumn("n_bpe_tokens", bpeTokenCount(col(textCol)))
      .withColumn("quality", qualityScore(col(textCol)))
      .withColumn("fingerprint", fingerprint(col(textCol)))
      .withColumn("rolling_hash", rollingHash(col(textCol)))
}

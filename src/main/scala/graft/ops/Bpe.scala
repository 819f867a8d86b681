package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.tables.Checkpoints

/** Byte-pair-encoding vocabulary induction (Sennrich et al. 2016), the
  * tokenizer-training step of an LLM data pipeline, as iterative DataFrame
  * rounds over the WORD-COUNT table (the standard reduction: a corpus of any
  * size collapses to its distinct words × frequencies before training ever
  * starts — the per-round work is O(vocab), not O(corpus)).
  *
  * Representation: a word is a space-joined sequence of sentinel-wrapped
  * symbols ("<a> <b> <c>"); [[TextAnalysis.tokens]] admits only letters and
  * digits, so '<', '>' and ' ' are safe sentinels. One merge round =
  *  (1) count adjacent symbol pairs weighted by word frequency (overlapping
  *      occurrences count, the textbook rule),
  *  (2) pick the max-count pair (ties → lexicographically smallest pair —
  *      one deterministic total order shared with the oracle),
  *  (3) rewrite every word with `replace(s, "<a> <b>", "<ab>")` — string
  *      replace is greedy left-to-right non-overlapping, which IS the BPE
  *      merge fold ("aaa" under (a,a) → [aa, a]); stripping the inner
  *      sentinel pair keeps the symbol identity equal to its STRING (two
  *      merge histories reaching "abc" are the same symbol, as in the
  *      paper's algorithm).
  *
  * Scale shape: each round is one explode + partial-aggregated groupBy over
  * the word table, a 1-row top-pair broadcast (the pageRank dangling-mass
  * idiom — no driver collect), and one narrow rewrite pass. Lineage is
  * truncated per round so `rounds` can grow without plan blowup.
  */
object Bpe {

  /** (word-as-symbols string, freq) from a corpus: the training state. */
  private[ops] def wordTable(corpus: DataFrame, textCol: String): DataFrame = {
    val w = col("w")
    corpus.select(explode(TextAnalysis.tokens(col(textCol))).as("w"))
      .groupBy(w).agg(count(lit(1)).as("freq"))
      .select(array_join(transform(sequence(lit(1), length(w)),
        i => concat(lit("<"), w.substr(i, lit(1)), lit(">"))), " ").as("s"),
        col("freq"))
  }

  private def pairCounts(words: DataFrame): DataFrame = {
    val syms = split(col("s"), " ")
    words.select(col("freq"), explode(
        when(size(syms) >= 2,
          transform(sequence(lit(0), size(syms) - 2),
            i => concat(element_at(syms, i + 1), lit(" "),
              element_at(syms, i + 2))))
          .otherwise(array().cast("array<string>"))).as("pair"))
      .groupBy(col("pair")).agg(sum(col("freq")).as("cnt"))
  }

  /** Train `rounds` merges: (round, left, right, freq) — left/right are the
    * plain merged-symbol strings (sentinels stripped), freq the pair count
    * that won the round. Fewer rows than `rounds` when the corpus runs out
    * of mergeable pairs.
    */
  def trainMerges(corpus: DataFrame, rounds: Int,
      textCol: String = "text"): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var words = Checkpoints.truncate(wordTable(corpus, textCol))
    var merges: DataFrame = null
    var r = 1
    while (r <= rounds) {
      val top = Checkpoints.truncate(
        pairCounts(words).orderBy(col("cnt").desc, col("pair")).limit(1)
          .select(lit(r).as("round"), col("pair"), col("cnt")))
      merges = if (merges == null) top else merges.unionByName(top)
      // left join on TRUE: an empty top (nothing left to merge) must keep
      // the word table intact, not annihilate it the way crossJoin would
      words = Checkpoints.truncate(
        words.join(broadcast(top.select(col("pair").as("mp"))), lit(true), "left")
          .select(when(col("mp").isNull, col("s"))
            .otherwise(expr("replace(s, mp, replace(mp, '> <', ''))")).as("s"),
            col("freq")))
      r += 1
    }
    merges.select(col("round"),
      translate(element_at(split(col("pair"), " "), 1), "<>", "").as("left"),
      translate(element_at(split(col("pair"), " "), 2), "<>", "").as("right"),
      col("cnt").as("freq"))
  }

  /** The symbol vocabulary after `rounds` merges: (symbol, freq) — the
    * alphabet plus one new symbol per effective merge, each with its corpus
    * occurrence count under the final segmentation.
    */
  def vocab(corpus: DataFrame, rounds: Int, textCol: String = "text"): DataFrame = {
    var words = Checkpoints.truncate(wordTable(corpus, textCol))
    var r = 1
    while (r <= rounds) {
      val top = Checkpoints.truncate(
        pairCounts(words).orderBy(col("cnt").desc, col("pair")).limit(1)
          .select(col("pair").as("mp")))
      words = Checkpoints.truncate(
        words.join(broadcast(top), lit(true), "left")
          .select(when(col("mp").isNull, col("s"))
            .otherwise(expr("replace(s, mp, replace(mp, '> <', ''))")).as("s"),
            col("freq")))
      r += 1
    }
    words.select(col("freq"), explode(split(col("s"), " ")).as("sym"))
      .groupBy(translate(col("sym"), "<>", "").as("symbol"))
      .agg(sum(col("freq")).as("freq"))
  }

  /** The APPLY step: per-document token counts under a trained merge list.
    * `merges` is the ordered (left, right) model — tiny by construction
    * (one row per merge round), so it folds into ONE codegen'd
    * nested-replace expression: no joins, no shuffle, a single narrow pass
    * over the corpus (the right 100 TB shape for "how many tokens is this
    * corpus under my tokenizer", the input [[Packing.packSequences]] and
    * [[Sampling.tokenBudgetCap]] want).
    *
    * Words are joined with " / " before the fold — merge patterns require a
    * single space between symbols, so merges can never jump a word
    * boundary, exactly as in training (where each word is its own row).
    */
  def encodeTokenCounts(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val s0 = array_join(transform(TextAnalysis.tokens(col(textCol)),
      w => array_join(transform(sequence(lit(1), length(w)),
        i => concat(lit("<"), w.substr(i, lit(1)), lit(">"))), " ")), " / ")
    val sFinal = merges.foldLeft(s0) { case (acc, (l, r)) =>
      replace(acc, lit(s"<$l> <$r>"), lit(s"<$l$r>"))
    }
    docs.select(col(idCol),
      (length(sFinal) - length(replace(sFinal, lit("<"), lit(""))))
        .cast("long").as("n_bpe_tokens"))
  }
}

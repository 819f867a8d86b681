package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end training-mix preparation: the composition a pretraining data
  * pipeline actually runs over a raw document table —
  *
  *   1. quality gates (token count, quality score, language) — pure
  *      expressions, fused into the scan, so the corpus shrinks BEFORE the
  *      first shuffle — plus optional Gopher-style repetition ceilings
  *      (dup-n-gram / top-bigram fractions) applied to the survivors;
  *   2. exact dedup ([[Dedup.exactDropList]]: keep the min-id representative
  *      per md5(text) group), plus optional MinHash near-dup clustering
  *      ([[Dedup.minhashLshPairs]] → [[Dedup.dedupFuzzy]]) when
  *      `fuzzyThreshold` is set;
  *   3. benchmark decontamination ([[Decontam]], n-gram overlap against the
  *      held-out eval set, broadcast on the eval side);
  *   4. deterministic mixture downsampling per source ([[Sampling]] salted
  *      hash gates — task-retry-safe, partitioning-independent);
  *   5. deterministic train/valid/test split assignment.
  *
  * Shuffle budget at 100 TB: one groupBy(md5) + one semi-join keyed by id
  * (dedup), one broadcast semi-join (decontam); every filter and the split
  * assignment ride along as expressions. Nothing is O(corpus) on the driver.
  */
object TrainingMix {

  def prepare(docs: DataFrame, evalDocs: DataFrame,
              minTokens: Int = 20, minQuality: Double = 0.5,
              allowedLangs: Seq[String] = Seq("en", "es", "de", "fr", "zh"),
              decontamN: Int = 5,
              mixtureRates: Map[String, Double] = Map.empty,
              defaultRate: Double = 1.0,
              temperatureAlpha: Option[Double] = None,
              maxDupNgramFrac: Option[Double] = None,
              maxTopBigramFrac: Option[Double] = None,
              fuzzyThreshold: Option[Double] = None,
              idCol: String = "doc_id", textCol: String = "text",
              sourceCol: String = "source"): DataFrame = {
    val annotated = docs.select(
      col(idCol), col(sourceCol), col(textCol),
      TextAnalysis.langId(col(textCol)).as("lang_pred"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("n_tokens"),
      TextAnalysis.qualityScore(col(textCol)).as("quality"))
    val cheapGated = annotated
      .filter(col("n_tokens") >= minTokens)
      .filter(col("quality") >= minQuality)
      .filter(col("lang_pred").isin(allowedLangs: _*))
    // Gopher-style repetition gates ride AFTER the cheap expression gates
    // (the top-bigram mode is the one aggregation in the gate stack — run it
    // over the already-shrunk survivor set, not the raw corpus) and only
    // when a ceiling is configured.
    val gated =
      if (maxDupNgramFrac.isEmpty && maxTopBigramFrac.isEmpty) cheapGated
      else {
        val rep = TextAnalysis.repetitionSignals(cheapGated, idCol, textCol)
        cheapGated.join(rep, Seq(idCol))
          .filter(maxDupNgramFrac.map(col("dup_ngram_frac") <= _).getOrElse(lit(true)))
          .filter(maxTopBigramFrac.map(col("top_bigram_frac") <= _).getOrElse(lit(true)))
          .drop("dup_ngram_frac", "top_bigram_frac")
      }

    val exactDeduped = gated.join(
      Dedup.exactDropList(gated, idCol, textCol).withColumnRenamed("drop_id", idCol),
      Seq(idCol), "left_anti")

    // optional NEAR-dup stage (the MinHash pass of the GPT-3/Llama recipes):
    // LSH candidate pairs → transitive clusters → one canonical survivor.
    // Runs after exact dedup (byte-identical copies are already gone, so the
    // pair generator sees each distinct text once).
    val deduped = fuzzyThreshold match {
      case None => exactDeduped
      case Some(th) =>
        Dedup.dedupFuzzy(exactDeduped,
          Dedup.minhashLshPairs(exactDeduped, threshold = th,
            idCol = idCol, textCol = textCol), idCol)
    }

    val clean = Decontam.decontaminate(deduped, evalDocs, decontamN, idCol, textCol)

    // mixture stage: hand-configured per-source rates, or temperature-
    // scaled rates COMPUTED from the surviving corpus's token masses
    // (Sampling.temperatureRates — the mT5/XLM-R rule). One or the other:
    // composing both would double-gate every stratum.
    val mixed = temperatureAlpha match {
      case Some(alpha) =>
        require(mixtureRates.isEmpty,
          "set mixtureRates or temperatureAlpha, not both")
        Sampling.temperatureKeep(clean, alpha, sourceCol, "n_tokens", idCol)
      case None =>
        clean.filter(Sampling.stratifiedKeep(col(idCol), col(sourceCol),
          mixtureRates, defaultRate))
    }
    mixed
      .select(col(idCol), col(sourceCol), col("lang_pred"),
        col("n_tokens"), col("quality"),
        Sampling.datasetSplit(col(idCol)).as("split"))
  }
}

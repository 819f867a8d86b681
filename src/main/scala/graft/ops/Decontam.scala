package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training corpora: flag (and drop) training
  * documents that share any word n-gram with a held-out evaluation set — the
  * standard 13-gram overlap rule from the GPT-3 / Llama data pipelines,
  * parameterized on n.
  *
  * Scale shape: the eval side of the join is the BENCHMARK corpus — a few
  * thousand documents against a 100 TB training set — so its distinct gram
  * set is broadcast; the training side streams through one narrow
  * explode → broadcast-hash-semi-join pass with no shuffle of the corpus.
  * Per-doc hit counts aggregate keyed by doc id (partial aggregation
  * combines map-side). The broadcast hint is EXPLICIT, so Spark honors it
  * regardless of size — it does not auto-degrade past the threshold; if an
  * eval corpus could outgrow executor memory, pass `broadcastEval = false`
  * and the same plan becomes a shuffled hash join on the gram.
  */
object Decontam {

  /** Training docs sharing ≥1 word n-gram with `evalDocs`:
    * (idCol, n_shared) where n_shared = distinct contaminating n-grams.
    */
  def contaminationReport(train: DataFrame, evalDocs: DataFrame, n: Int,
                          idCol: String = "doc_id",
                          textCol: String = "text",
                          broadcastEval: Boolean = true): DataFrame = {
    val evalGrams = evalDocs
      .select(explode(TextAnalysis.ngrams(col(textCol), n)).as("gram"))
      .distinct()
    train
      .select(col(idCol), explode(TextAnalysis.ngrams(col(textCol), n)).as("gram"))
      .join(if (broadcastEval) broadcast(evalGrams) else evalGrams, Seq("gram"))
      .groupBy(col(idCol))
      .agg(count_distinct(col("gram")).as("n_shared"))
  }

  /** `train` minus every document [[contaminationReport]] flags. */
  def decontaminate(train: DataFrame, evalDocs: DataFrame, n: Int,
                    idCol: String = "doc_id",
                    textCol: String = "text",
                    broadcastEval: Boolean = true): DataFrame =
    train.join(
      contaminationReport(train, evalDocs, n, idCol, textCol, broadcastEval)
        .select(col(idCol)),
      Seq(idCol), "left_anti")
}

package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Embed

/** Deterministic v6 research flow (SURVEY.md §3.2, reference
  * /root/reference/src/querying_system/v6/researcher.py:134-500) — the LLM
  * steps (decompose, gap detect, synthesis) are out of rebuild scope; every
  * retrieval/scoring step is reproduced:
  *
  *  1. hint resolution: entity hints matched against the entity table
  *     (exact alias key, then embedding kNN floor 0.3 — graph_store:208-329);
  *  2. dual-path retrieval: per-entity scoped ∪ per-topic scoped ∪ global
  *     vector search, ALWAYS all paths (researcher:274-326);
  *  3. merge by fact id keeping max score + source set, threshold ≥ 0.65,
  *     cross-source boost +0.15/extra source, cap max_facts_to_score
  *     (researcher:357-414);
  *  4. heuristic gap expansion — when evidence is thin (<5 facts), 1-hop
  *     expand from the top facts' subjects at score 0.45 with the 0.8 merge
  *     penalty (researcher:442-449,617-651);
  *  5. evidence cap per question type (15; 40 for enumeration).
  *
  * The result is the evidence set a synthesizer would consume, as a
  * DataFrame (fact_uuid, fact, final_score, sources).
  */
object Researcher {

  case class Config(
      retriever: Retriever.Config = Retriever.Config(),
      resolveFloor: Double = 0.3, // graph_store.py:219
      expansionMergePenalty: Double = 0.8, // researcher.py:640
      thinEvidence: Int = 5, // researcher.py:445
      topKEvidence: Int = 15, // v6/schemas.py:40
      topKEvidenceEnumeration: Int = 40)

  /** Step 1: resolve entity name hints → entity uuids (exact alias-key match
    * first, else embedding cosine ≥ floor, top-1 per hint).
    */
  def resolveHints(entities: DataFrame, hints: Seq[String],
      cfg: Config = Config()): DataFrame = {
    if (hints.isEmpty) return entities.limit(0)
      .select(col("entity_uuid"), col("canonical_name"), lit("").as("hint"))
    val spark = entities.sparkSession
    import spark.implicits._
    val hintDf = hints.map(h => (h, h.trim.toLowerCase, Embed.embed(h)))
      .toDF("hint", "hint_key", "hint_emb")
    val scored = entities.crossJoin(broadcast(hintDf))
      .withColumn("exact",
        lower(col("canonical_name")) === col("hint_key") ||
          exists(col("aliases"), a => lower(a) === col("hint_key")))
      .withColumn("sim",
        graft.functions.expr.CosineSimilarity(col("embedding"), col("hint_emb")))
      .withColumn("score", when(col("exact"), lit(2.0)).otherwise(col("sim")))
      .filter(col("exact") || col("sim") >= cfg.resolveFloor)
    val top1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hint")).orderBy(col("score").desc, col("entity_uuid"))
    scored.withColumn("rn", row_number().over(top1)).filter(col("rn") === 1)
      .select(col("entity_uuid"), col("canonical_name"), col("hint"))
  }

  /** Steps 2-5. `facts` must carry an `embedding` column
    * (Retriever.withFactEmbeddings). Topic hints are ontology labels.
    */
  def research(facts: DataFrame, entities: DataFrame, question: String,
      entityHints: Seq[String] = Nil, topicHints: Seq[String] = Nil,
      enumeration: Boolean = false, cfg: Config = Config()): DataFrame = {
    val resolved = resolveHints(entities, entityHints, cfg)
      .select(col("entity_uuid")).collect().map(_.getString(0)).toSeq

    // step 2: dual path — scoped per entity ∪ topic-scoped ∪ global (always)
    val parts = Seq.newBuilder[DataFrame]
    resolved.foreach { e =>
      parts += Retriever.scopedSearch(facts, e, question, cfg.retriever)
        .select(col("fact_uuid"), col("fact"), col("score"), col("source"))
    }
    topicHints.foreach { t =>
      parts += GraphLookup.topicScoped(facts, t, question, cfg.retriever.scopedFloor)
        .select(col("fact_uuid"), col("fact"), col("score"), col("source"))
    }
    parts += Retriever.globalSearch(facts, question, cfg.retriever)
      .select(col("fact_uuid"), col("fact"), col("score"), col("source"))
    val union = parts.result().reduce(_ union _)

    // step 3: merge + threshold + boost + cap
    val scored = Retriever.thresholdAndBoost(union, cfg.retriever)

    // step 4: heuristic gap expansion when evidence is thin
    val nScored = scored.count()
    val expanded =
      if (nScored >= cfg.thinEvidence || nScored == 0) scored
      else {
        val anchors = scored.orderBy(col("final_score").desc, col("fact_uuid")).limit(3)
          .join(facts.select(col("fact_uuid"), col("subject_uuid")), Seq("fact_uuid"))
          .select(col("subject_uuid")).collect().map(_.getString(0)).toSeq.distinct
        val extra = Retriever.expandOneHop(facts, anchors,
            cfg.retriever.scopedTopK, cfg.retriever)
          .join(scored.select(col("fact_uuid")), Seq("fact_uuid"), "left_anti")
          .select(col("fact_uuid"), col("fact"),
            // merge penalty on expansion-score facts (researcher.py:640)
            (col("score") * cfg.expansionMergePenalty).as("vector_score"),
            array(col("source")).as("sources"))
          .withColumn("final_score", col("vector_score"))
        scored.select(col("fact_uuid"), col("fact"), col("vector_score"),
            col("sources"), col("final_score"))
          .unionByName(extra.select(col("fact_uuid"), col("fact"),
            col("vector_score"), col("sources"), col("final_score")))
      }

    // step 5: evidence cap by question type
    val k = if (enumeration) cfg.topKEvidenceEnumeration else cfg.topKEvidence
    expanded
      .select(col("fact_uuid"), col("fact"), col("final_score"),
        array_sort(col("sources")).as("sources"))
      .orderBy(col("final_score").desc, col("fact_uuid"))
      .limit(k)
  }
}

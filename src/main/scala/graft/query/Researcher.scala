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
      topKEvidenceEnumeration: Int = 40,
      refinementTopK: Int = 20) // refinement_search_top_k, researcher.py:703-860

  /** Step 1: resolve entity name hints → entity uuids (exact alias-key match
    * first, else embedding cosine ≥ floor, top-1 per hint).
    */
  def resolveHints(entities: DataFrame, hints: Seq[String],
      cfg: Config = Config()): DataFrame = {
    if (hints.isEmpty) return entities.limit(0)
      .select(col("entity_uuid"), col("canonical_name"), lit("").as("hint"))
    val spark = entities.sparkSession
    import spark.implicits._
    val hintDf = hints.map(h => (h, h.trim.toLowerCase(java.util.Locale.ROOT), Embed.embed(h)))
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
    val resolvedRows = resolveHints(entities, entityHints, cfg)
      .select(col("entity_uuid"), col("hint")).collect()
    val resolved = resolvedRows.map(_.getString(0)).toSeq.distinct
    val resolvedHints = resolvedRows.map(_.getString(1)).toSet

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

    // step 4: heuristic gap expansion when evidence is thin. ONE bounded
    // driver action (≤ thinEvidence rows) decides expansion AND supplies the
    // anchors — a separate count() would add a full job per question.
    val top = scored.orderBy(col("final_score").desc, col("fact_uuid"))
      .limit(cfg.thinEvidence)
      .join(facts.select(col("fact_uuid"), col("subject_uuid")), Seq("fact_uuid"), "left")
      .select(col("fact_uuid"), col("subject_uuid"), col("final_score"))
      .collect()
    val expanded =
      if (top.length >= cfg.thinEvidence || top.isEmpty) scored
      else {
        val anchors = top.sortBy(r => (-r.getDouble(2), r.getString(0))).take(3)
          .map(_.getString(1)).filter(_ != null).toSeq.distinct
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
    val expandedNorm = expanded.select(col("fact_uuid"), col("fact"),
      col("vector_score"), col("sources"), col("final_score"))

    // step 4b (v6 step 7 analogue): deterministic REFINEMENT. The reference
    // detects a vague answer (confidence < 0.85) and re-searches with
    // targeted queries at refinement_search_top_k=20, merging with the 0.8
    // penalty, one pass (researcher.py:703-860). The confidence gate is LLM;
    // the deterministic trigger here is the same thin-evidence floor the gap
    // expansion uses (reusing the bounded `top` collect — no extra job) plus
    // at least one UNRESOLVED entity hint to target: each such hint runs one
    // targeted global search (the hint text as the query), and the recovered
    // facts merge under the penalty before the final re-rank.
    val unresolved = entityHints.filterNot(resolvedHints)
    val refined =
      if (top.length >= cfg.thinEvidence || unresolved.isEmpty) expandedNorm
      else {
        val targeted = unresolved.map { h =>
          Retriever.globalSearch(facts, h,
              cfg.retriever.copy(globalTopK = cfg.refinementTopK))
            .select(col("fact_uuid"), col("fact"), col("score"))
        }.reduce(_ unionByName _)
          .groupBy(col("fact_uuid"))
          .agg(max(col("score")).as("score"), first(col("fact")).as("fact"))
          .join(expandedNorm.select(col("fact_uuid")), Seq("fact_uuid"), "left_anti")
          .select(col("fact_uuid"), col("fact"),
            (col("score") * cfg.expansionMergePenalty).as("vector_score"),
            array(lit("refinement")).as("sources"))
          .withColumn("final_score", col("vector_score"))
        expandedNorm.unionByName(targeted)
      }

    // step 5: evidence cap by question type
    val k = if (enumeration) cfg.topKEvidenceEnumeration else cfg.topKEvidence
    refined
      .select(col("fact_uuid"), col("fact"), col("final_score"),
        array_sort(col("sources")).as("sources"))
      .orderBy(col("final_score").desc, col("fact_uuid"))
      .limit(k)
  }

  /** Full question-driven flow: deterministic decomposition (entity hints,
    * topic hints, question type — Decomposer) feeding `research`, so the v6
    * pipeline runs from a bare question with NO pre-supplied hints (the
    * reference's decomposer step, shared/decomposer.py:97-165).
    */
  def researchQuestion(facts: DataFrame, entities: DataFrame, question: String,
      ontology: Seq[graft.model.OntologyTopic] = Nil, cfg: Config = Config()): DataFrame = {
    val d = Decomposer.decompose(question, ontology)
    research(facts, entities, question, d.entityHints, d.topicHints,
      enumeration = d.questionType == Decomposer.Enumeration, cfg)
  }

  /** ENUMERATION drilldown — deterministic analogue of the reference's step 5
    * entity expansion (v6/researcher.py:502-615: the LLM selects ≤10 entities
    * and expands 3 facts each; here selection = top entities by incident-fact
    * count within the evidence set). Returns the extra facts, labeled.
    */
  def enumerationDrilldown(facts: DataFrame, evidence: DataFrame,
      maxEntities: Int = 10, factsPerEntity: Int = 3): DataFrame = {
    val ev = evidence.select(col("fact_uuid"))
    val evFacts = facts.join(ev, Seq("fact_uuid"), "left_semi")
    val topEntities = evFacts
      .select(explode(array(col("subject_uuid"), col("object_uuid"))).as("drill_uuid"))
      .groupBy(col("drill_uuid")).agg(count(lit(1)).as("n_incident"))
      .orderBy(col("n_incident").desc, col("drill_uuid"))
      .limit(maxEntities)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("drill_uuid")).orderBy(col("fact_uuid"))
    facts
      .join(org.apache.spark.sql.functions.broadcast(topEntities),
        facts("subject_uuid") === col("drill_uuid") ||
          facts("object_uuid") === col("drill_uuid"))
      .join(ev, Seq("fact_uuid"), "left_anti") // only NEW facts
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= factsPerEntity)
      .select(col("fact_uuid"), col("fact"), col("drill_uuid").as("entity_uuid"),
        lit("enumeration").as("source"))
  }
}

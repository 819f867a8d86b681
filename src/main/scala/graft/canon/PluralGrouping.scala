package graft.canon

import java.util.Locale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Plural/collective entity grouping → INCLUDES edges (the reference's
  * PLANNED feature, /root/reference/docs/plans/2026-01-22-plural-grouping-
  * design.md:28-46): a plural entity ("Districts") INCLUDES each entity whose
  * name's last token singularizes to it ("Boston District"), so query-time
  * expansion can traverse from a fact about the collective to facts about its
  * members. Per the design's decisions table: flat (no nested hierarchies)
  * and homogeneous-typed members only. The design gates grouping through an
  * LLM; this deterministic analogue uses the surface-form rule.
  *
  * Scale shape: equi-join on (singular key, entity_type); the plural side
  * (single-token plural names) is a sliver of the entity table and is
  * broadcast.
  */
object PluralGrouping {

  /** Naive English singularization of a lowercase token; null when the token
    * is not plural-shaped ("ies" → "y", trailing "s" dropped unless "ss").
    */
  private[graft] def singularize(token: String): String = {
    if (token == null) return null
    val t = token.toLowerCase(Locale.ROOT)
    if (t.length <= 3) null
    else if (t.endsWith("ies")) t.dropRight(3) + "y"
    else if (t.endsWith("s") && !t.endsWith("ss")) t.dropRight(1)
    else null
  }

  private val singUdf = udf(singularize _)

  private def lastTokenLower(c: Column): Column =
    lower(element_at(split(c, " "), -1))

  /** @param entities columns (entity_uuid, canonical_name, entity_type)
    * @return (plural_uuid, plural_name, predicate = "INCLUDES", member_uuid,
    *         member_name)
    */
  def includesEdges(entities: DataFrame): DataFrame = {
    val base = entities.select(col("entity_uuid"), col("canonical_name"), col("entity_type"))
    val plurals = base
      .filter(!col("canonical_name").contains(" ")) // collective = bare plural noun
      .select(col("entity_uuid").as("plural_uuid"),
        col("canonical_name").as("plural_name"),
        // renamed, not just re-selected: both join sides derive from `base`,
        // and a members("entity_type") === plurals("entity_type") predicate
        // on a self-join resolves only through the analyzer's dataset-id
        // disambiguation (and WARNs "trivially true equals predicate");
        // distinct names make the cross-side condition unambiguous
        col("entity_type").as("plural_type"),
        singUdf(col("canonical_name")).as("skey"))
      .filter(col("skey").isNotNull)
    val members = base.select(col("entity_uuid").as("member_uuid"),
      col("canonical_name").as("member_name"), col("entity_type"),
      lastTokenLower(col("canonical_name")).as("mkey"))
    members.join(broadcast(plurals),
        col("mkey") === col("skey") &&
          col("entity_type") === col("plural_type") &&
          col("member_uuid") =!= col("plural_uuid"))
      .select(col("plural_uuid"), col("plural_name"),
        lit("INCLUDES").as("predicate"), col("member_uuid"), col("member_name"))
  }

  /** Query-time expansion (the design's purpose): facts incident to the
    * MEMBERS of a plural entity, reached through its INCLUDES edges.
    */
  def memberFacts(triples: DataFrame, includes: DataFrame, pluralUuid: String): DataFrame = {
    val m = includes.filter(col("plural_uuid") === pluralUuid)
      .select(col("member_uuid"))
    triples.join(broadcast(m),
        triples("subject_uuid") === m("member_uuid") ||
          triples("object_uuid") === m("member_uuid"))
      .drop("member_uuid")
  }
}

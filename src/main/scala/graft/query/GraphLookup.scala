package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Point-lookup / traversal API over the graph tables — the MCP tool surface
  * (SURVEY.md §3.3; reference src/querying_system/mcp_server.py:849-1023):
  * resolve_entity_or_topic, get_chunk(s), get_chunks_by_edge, get_entity_info,
  * explore_neighbors, search_relationships. Each is a parameterized DataFrame
  * lookup (J8-J12) — partition-pruned by group_id, equi-joined on ids.
  */
object GraphLookup {

  /** resolve_entity_or_topic: case-insensitive name/alias match against the
    * entity table (exact key first — the graph_store's exact-match shortcut).
    */
  def resolveEntity(entities: DataFrame, name: String, groupId: String = "default"): DataFrame = {
    val key = name.trim.toLowerCase(java.util.Locale.ROOT)
    entities.filter(col("group_id") === groupId)
      .filter(lower(col("canonical_name")) === key ||
        exists(col("aliases"), a => lower(a) === key))
      .select(col("entity_uuid"), col("canonical_name"), col("entity_type"), col("summary"))
  }

  /** get_chunk(entity_one, entity_two, edge_type): provenance chunks of the
    * facts connecting two entities via an edge type (mcp_server get_chunk).
    */
  def chunksBetween(triples: DataFrame, chunks: DataFrame, entityA: String,
      entityB: String, edgeType: Option[String] = None): DataFrame = {
    val pair = triples.filter(
      (col("subject_uuid") === entityA && col("object_uuid") === entityB) ||
        (col("subject_uuid") === entityB && col("object_uuid") === entityA))
    // edge types are stored in F1-canonical form (UPPER_SNAKE); canonicalize
    // the request the same way — exact for well-formed callers, and a
    // case-mangled "Acquired" matches its stored "ACQUIRED" instead of
    // silently reporting not-found while both entity names matched
    val filtered = edgeType.fold(pair)(e =>
      pair.filter(col("predicate") === graft.functions.Norm.normalizeRelType(e)))
    filtered.select(col("fact_uuid"), col("fact"), col("predicate"), col("chunk_uuid"))
      .join(chunks.select(col("chunk_uuid"), col("chunk_id"), col("text"),
        col("conv_id"), col("header_path")), Seq("chunk_uuid"), "left")
  }

  /** get_chunks_by_edge(entity, edge, direction): facts of one edge type
    * incident to an entity, direction ∈ outgoing|incoming|both.
    */
  def chunksByEdge(triples: DataFrame, entity: String, edgeType: String,
      direction: String = "both"): DataFrame = {
    val side = direction match {
      case "outgoing" => col("subject_uuid") === entity
      case "incoming" => col("object_uuid") === entity
      case _ => col("subject_uuid") === entity || col("object_uuid") === entity
    }
    triples.filter(side &&
        col("predicate") === graft.functions.Norm.normalizeRelType(edgeType))
      .select(col("fact_uuid"), col("subject"), col("predicate"), col("object"),
        col("fact"), col("chunk_uuid"), col("date_context"))
  }

  /** explore_neighbors: distinct (predicate, neighbor) pairs around an
    * entity with fact counts — 1-hop adjacency summary.
    */
  def exploreNeighbors(triples: DataFrame, entity: String): DataFrame = {
    val out = triples.filter(col("subject_uuid") === entity)
      .select(col("predicate"), col("object_uuid").as("neighbor_uuid"),
        col("object").as("neighbor"), lit("outgoing").as("direction"))
    val in = triples.filter(col("object_uuid") === entity)
      .select(col("predicate"), col("subject_uuid").as("neighbor_uuid"),
        col("subject").as("neighbor"), lit("incoming").as("direction"))
    out.union(in)
      .groupBy(col("predicate"), col("neighbor_uuid"), col("neighbor"), col("direction"))
      .agg(count(lit(1)).as("n_facts"))
      .orderBy(col("n_facts").desc, col("neighbor"), col("predicate"))
  }

  /** get_entity_info (mcp_server.py:475-510): exact-name metadata lookup —
    * name, node type, entity_type, summary with the reference's fallback
    * text for a missing summary. Empty result = the reference's found:false
    * ("use resolve_entity_or_topic first to get exact names" — so the match
    * is exact, not fuzzy).
    */
  def getEntityInfo(entities: DataFrame, name: String,
      groupId: String = "default"): DataFrame =
    entities.filter(col("group_id") === groupId)
      .filter(col("canonical_name") === name)
      .limit(1)
      .select(col("canonical_name").as("name"),
        lit("Entity").as("node_type"),
        col("entity_type"),
        coalesce(nullif(col("summary"), lit("")),
          lit("No summary available for this entity.")).as("summary"))

  /** explore_neighbors_semantic (mcp_server.py:605-698): the entity's
    * incident facts ranked by similarity to a free-text hint (top-k fact
    * search first, as the reference's fact-store query does), then edges
    * deduped by (predicate, neighbor, direction) keeping the best-scoring
    * fact and its date annotation. `factsWithEmb` = triples with
    * pre-normalized fact embeddings (Retriever.withFactEmbeddings), so the
    * score is the codegen'd dot product.
    */
  def exploreNeighborsSemantic(factsWithEmb: DataFrame, entityUuid: String,
      queryHint: String, topK: Int = 15): DataFrame = {
    val q = lit(graft.functions.Embed.embed(queryHint))
    val out = factsWithEmb.filter(col("subject_uuid") === entityUuid)
      .select(col("predicate"), col("object").as("neighbor"),
        lit("outgoing").as("direction"), col("embedding"),
        col("date_context"), col("fact_uuid"))
    // self-loop facts (subject_uuid == object_uuid == entity) would enter
    // the pool once per orientation, survive the per-(predicate, neighbor,
    // direction) dedup as two rows, and burn two topK slots — keep them on
    // the outgoing side only
    val in = factsWithEmb.filter(col("object_uuid") === entityUuid &&
        col("subject_uuid") =!= entityUuid)
      .select(col("predicate"), col("subject").as("neighbor"),
        lit("incoming").as("direction"), col("embedding"),
        col("date_context"), col("fact_uuid"))
    out.unionByName(in)
      .withColumn("score", graft.functions.expr.DotProduct(q, col("embedding")))
      .orderBy(col("score").desc, col("fact_uuid")) // TakeOrdered, no sort-all
      .limit(topK)
      .groupBy(col("predicate"), col("neighbor"), col("direction"))
      .agg(max(col("score")).as("score"),
        max_by(col("date_context"), col("score")).as("date_context"))
      .orderBy(col("score").desc, col("neighbor"), col("predicate"))
  }

  /** get_chunks (mcp_server.py:308-361): BATCHED get_chunk — up to 8
    * (entity_one, edge_type, entity_two) name triplets resolved in ONE pass
    * (the reference loops per item; the Spark shape is an equi-join). Each
    * triplet explodes into its two orientations and BROADCASTS against the
    * fact table on (subject, object, predicate) keys — a BroadcastHashJoin
    * over one triples scan, never a nested-loop or a shuffle. Provenance
    * chunks fetch via the bounded-id isin pattern (predicate pushdown prunes
    * the chunk scan — fetchChunks' point-lookup shape). Output carries
    * rel_idx; a rel_idx absent from the result is the reference's
    * found:false (found_count = countDistinct(rel_idx)).
    */
  def chunksForRelationships(triples: DataFrame, chunks: DataFrame,
      relationships: Seq[(String, String, String)]): DataFrame = {
    val spark = triples.sparkSession
    import spark.implicits._
    val oriented = relationships.take(8).zipWithIndex.flatMap {
      case ((a, et, b), i) =>
        val (ak, bk) = (a.trim.toLowerCase(java.util.Locale.ROOT),
          b.trim.toLowerCase(java.util.Locale.ROOT))
        // same canonical-form tolerance as chunksBetween: predicates are
        // F1-normalized at write time, so normalize the request too
        val ek = graft.functions.Norm.normalizeRelType(et.trim)
        Seq((i, ak, ek, bk), (i, bk, ek, ak))
    }.toDF("rel_idx", "s_key", "edge_type", "o_key")
    val matched = triples
      .select(lower(col("subject")).as("s_key"), lower(col("object")).as("o_key"),
        col("predicate").as("edge_type"), col("fact_uuid"), col("fact"),
        col("chunk_uuid"))
      .join(broadcast(oriented), Seq("s_key", "edge_type", "o_key"))
      // a self-symmetric request (a == b) matches the same fact twice
      .dropDuplicates("rel_idx", "fact_uuid")
    val matchedT = graft.tables.Checkpoints.truncate(
      matched.select(col("rel_idx"), col("edge_type"), col("fact_uuid"),
        col("fact"), col("chunk_uuid")))
    val ids = matchedT.select(col("chunk_uuid")).distinct()
      .collect().map(_.getString(0)).toSeq
    matchedT.join(
        chunks.filter(col("chunk_uuid").isin(ids: _*))
          .select(col("chunk_uuid"), col("chunk_id"), col("text"), col("header_path")),
        Seq("chunk_uuid"), "left")
      .orderBy(col("rel_idx"), col("fact_uuid"))
  }

  /** _expand_query analogue (mcp_server.py:700-729): the reference asks an
    * LLM for ≤3 variations (synonyms, statement rephrase, key entities);
    * the deterministic analogue keeps the original plus the keyword form
    * (stop-words dropped) and the entity-span form — ≤4 distinct, original
    * FIRST (downstream dedup is first-variant-wins, as the reference's
    * seen_facts_global set is).
    */
  private[graft] def expandQuery(query: String): Seq[String] = {
    val kw = Retriever.extractKeywords(query).mkString(" ")
    val ents = Decomposer.entityHints(query).mkString(" ")
    (query +: Seq(kw, ents).filter(_.nonEmpty)).distinct.take(4)
  }

  /** search_relationships (mcp_server.py:732-846): semantic fact search with
    * auto query expansion and optional date-range filters. ONE fact-table
    * scan scores every fact against all ≤4 variant embeddings (posexplode
    * over a broadcast literal array — not a pass per variant); per-variant
    * candidates keep the reference's index fetch shape (top_k*2, score >
    * 0.3); a fact retrieved by several variants keeps its FIRST variant's
    * score (seen_facts_global); the bounded candidate set (≤ 8·topK rows)
    * fetches chunk header/date via pushed-down isin, rows with no date pass
    * the date filters (reference keeps undated rows), and the final
    * (score desc, date desc) top-k is taken with a fact_uuid tie-break.
    */
  def searchRelationshipsSemantic(factsWithEmb: DataFrame, chunks: DataFrame,
      query: String, topK: Int = 10,
      dateFrom: Option[String] = None, dateTo: Option[String] = None,
      scoreFloor: Double = 0.3): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val variants = expandQuery(query)
    val qvecs = array(variants.map(v => lit(graft.functions.Embed.embed(v))): _*)
    val perVariant = Window.partitionBy(col("variant"))
      .orderBy(col("score").desc, col("fact_uuid"))
    val firstVariant = Window.partitionBy(col("fact_uuid"))
      .orderBy(col("variant"), col("fact_uuid"))
    val cands = factsWithEmb
      .select(col("fact_uuid"), col("fact"), col("subject"),
        col("predicate").as("edge_type"), col("object"), col("chunk_uuid"),
        col("embedding"), posexplode(qvecs).as(Seq("variant", "qvec")))
      .withColumn("score",
        graft.functions.expr.DotProduct(col("qvec"), col("embedding")))
      .filter(col("score") > scoreFloor)
      .withColumn("vrank", row_number().over(perVariant))
      .filter(col("vrank") <= topK * 2)
      .withColumn("first", row_number().over(firstVariant))
      .filter(col("first") === 1)
      .select(col("fact_uuid"), col("fact"), col("subject"), col("edge_type"),
        col("object"), col("chunk_uuid"), round(col("score"), 3).as("score"))
    // bounded (≤ 8·topK rows): truncate so the fact scan runs once, then
    // point-fetch the chunks by pushed-down id list
    val candsT = graft.tables.Checkpoints.truncate(cands)
    val ids = candsT.select(col("chunk_uuid")).distinct()
      .collect().map(_.getString(0)).toSeq
    val meta = chunks.filter(col("chunk_uuid").isin(ids: _*))
      .select(col("chunk_uuid"), col("chunk_id"), col("header_path").as("header"),
        date_format(col("document_date"), "yyyy-MM-dd").as("document_date"))
    var out = candsT.join(meta, Seq("chunk_uuid"), "left")
    dateFrom.foreach(d =>
      out = out.filter(col("document_date").isNull || col("document_date") >= d))
    dateTo.foreach(d =>
      out = out.filter(col("document_date").isNull || col("document_date") <= d))
    out.select(col("fact_uuid"), col("fact"), col("score"), col("subject"),
        col("edge_type"), col("object"), col("chunk_id"), col("header"),
        col("document_date"))
      .orderBy(col("score").desc, col("document_date").desc_nulls_last,
        col("fact_uuid"))
      .limit(topK)
  }

  /** search_relationships: substring/predicate search over fact text. */
  def searchRelationships(triples: DataFrame, pattern: String, limitN: Int = 50): DataFrame =
    triples.filter(lower(col("fact")).contains(pattern.toLowerCase(java.util.Locale.ROOT)) ||
        col("predicate").contains(pattern.toUpperCase(java.util.Locale.ROOT)))
      .select(col("fact_uuid"), col("subject"), col("predicate"), col("object"), col("fact"))
      .orderBy(col("fact_uuid"))
      .limit(limitN)

  /** Topic-scoped retrieval (J9, v6/graph_store.py:433-487): facts whose
    * topics array carries the topic label, scored against the query embedding,
    * floor-filtered.
    */
  def topicScoped(factsWithEmb: DataFrame, topicLabel: String, query: String,
      floor: Double = 0.3): DataFrame = {
    val q = lit(graft.functions.Embed.embed(query))
    factsWithEmb.filter(array_contains(col("topics"), topicLabel))
      // pre-normalized embeddings: cosine = dot, via the codegen'd expression
      .withColumn("score", graft.functions.expr.DotProduct(q, col("embedding")))
      .filter(col("score") >= floor)
      .withColumn("source", lit("topic"))
      .orderBy(col("score").desc, col("fact_uuid"))
  }

  /** get_chunks / chunk-content fetch (J12): semi-join + project. */
  def fetchChunks(chunks: DataFrame, chunkUuids: Seq[String]): DataFrame =
    chunks.filter(col("chunk_uuid").isin(chunkUuids: _*))
      .select(col("chunk_uuid"), col("chunk_id"), col("conv_id"), col("text"),
        col("header_path"), col("document_date"))

  // ---- V7 chunk-centric retrieval (SURVEY.md §3.3; v7/graph_store.py:428-838) ----

  /** get_entity_chunks: distinct provenance chunks of all facts incident to
    * an entity, with the incident fact count per chunk.
    */
  def entityChunks(triples: DataFrame, chunks: DataFrame, entityUuid: String): DataFrame =
    triples.filter(col("subject_uuid") === entityUuid || col("object_uuid") === entityUuid)
      .groupBy(col("chunk_uuid"))
      .agg(count(lit(1)).as("n_facts"))
      .join(chunks.select(col("chunk_uuid"), col("chunk_id"), col("conv_id"),
        col("text"), col("header_path")), Seq("chunk_uuid"))
      .orderBy(col("n_facts").desc, col("chunk_uuid"))

  /** get_1hop_neighbors (v7): neighbor entities' chunks via the hub pattern. */
  def oneHopNeighborChunks(triples: DataFrame, chunks: DataFrame,
      entityUuid: String, maxNeighbors: Int = 10): DataFrame = {
    val neighbors = exploreNeighbors(triples, entityUuid)
      .limit(maxNeighbors)
      .select(col("neighbor_uuid"))
    triples.join(neighbors,
        triples("subject_uuid") === neighbors("neighbor_uuid") ||
          triples("object_uuid") === neighbors("neighbor_uuid"))
      .select(col("chunk_uuid"), col("neighbor_uuid"))
      .distinct()
      .join(chunks.select(col("chunk_uuid"), col("chunk_id"), col("text")), Seq("chunk_uuid"))
  }

  /** global_chunk_search (v7): score chunks directly against the query via
    * the deterministic embedding, top-k.
    */
  def globalChunkSearch(chunks: DataFrame, query: String, topK: Int = 10): DataFrame = {
    val embedUdf = udf((s: String) => graft.functions.Embed.embed(s))
    val q = lit(graft.functions.Embed.embed(query))
    chunks
      .withColumn("score",
        graft.functions.expr.CosineSimilarity(embedUdf(col("text")), q))
      .orderBy(col("score").desc, col("chunk_uuid"))
      .limit(topK)
      .select(col("chunk_uuid"), col("chunk_id"), col("conv_id"), col("text"), col("score"))
  }
}

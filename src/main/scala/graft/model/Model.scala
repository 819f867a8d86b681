package graft.model

import java.sql.Timestamp

/** Typed stage-boundary row shapes (SURVEY.md §7.1, FIXTURES.md).
  * Encoders are derived via `import spark.implicits._` at use sites.
  */

/** Input row per BASELINE.json `input_hint`. */
case class Turn(
    conv_id: String,
    turn_idx: Int,
    role: String,
    text: String,
    tool: String,
    ts: Timestamp)

/** Chunk — the reference's EpisodicNode analogue (FIXTURES.md §2). */
case class Chunk(
    chunk_id: String,
    chunk_uuid: String,
    conv_id: String,
    window_start: Int,
    window_end: Int,
    text: String,
    header_path: String,
    group_id: String,
    document_date: Timestamp)

/** Raw extracted triple before entity resolution
  * (reference ExtractedFact, src/schemas/extraction.py:12-66).
  */
case class RawTriple(
    chunk_uuid: String,
    conv_id: String,
    turn_idx: Int,
    group_id: String,
    fact: String,
    subject: String,
    subject_type: String,
    relationship: String,
    `object`: String,
    object_type: String,
    date_context: String,
    topics: Seq[String])

/** Mention of an entity surfaced during extraction (phase 2a analogue). */
case class Mention(
    name: String,
    entity_type: String,
    summary: String,
    chunk_uuid: String,
    conv_id: String,
    turn_idx: Int,
    group_id: String)

/** Canonical (deduplicated) entity — EntityNode analogue. */
/** `embedding` is the NAME-ONLY vector (reference `name_only_embedding`,
  * nodes.py:47 — direct name lookup: query→entity traversal, linker/dedup
  * blocking); `name_embedding` is the semantic vector over
  * `"{name}: {summary}"` (reference `name_embedding`, nodes.py:44 +
  * pipeline.py:952-965 — hint resolution / semantic entity matching).
  */
case class Entity(
    entity_uuid: String,
    name: String,
    canonical_name: String,
    entity_type: String,
    summary: String,
    aliases: Seq[String],
    source_chunks: Seq[String],
    embedding: Seq[Double],
    name_embedding: Seq[Double],
    group_id: String)

/** Reified fact — FactNode + hub-edge pair flattened (FIXTURES.md §3). */
case class Triple(
    fact_uuid: String,
    fact: String,
    subject_uuid: String,
    subject: String,
    subject_type: String,
    object_uuid: String,
    `object`: String,
    object_type: String,
    predicate: String,
    relationship_raw: String,
    date_context: String,
    topics: Seq[String],
    chunk_uuid: String,
    conv_id: String,
    group_id: String)

/** Per-partition lineage row (north rule). */
case class LineageRow(
    stage: String,
    partition_id: Int,
    input_rows: Long,
    output_rows: Long,
    checksum: Long,
    snapshot_id: Long,
    committed_at: Timestamp)

/** Topic ontology record (reference financial_topics.json shape). */
case class OntologyTopic(
    uri: String,
    label: String,
    definition: String,
    synonyms: Seq[String])

package graft.extract

import java.util.regex.Pattern

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{Chunk, Mention, RawTriple, Turn}

/** Deterministic OpenIE-style (subject, predicate, object) triple extractor.
  *
  * Replaces the reference's LLM chain-of-thought extractor
  * (/root/reference/src/agents/extractor_v2.py:237-271, "2-3 LLM calls per
  * chunk") with rule-based SVO patterns over capitalized entity spans, plus a
  * deterministic "critique" re-check implementing the extraction exclusion
  * rules (extractor_v2.py:101-116: numbers, dates, URLs, citation metadata are
  * not entities).
  *
  * Runs as `mapPartitions` over `Dataset[Chunk]` (narrow — no shuffle): one
  * compiled-pattern set per partition, an iterator in / iterator out, bounded
  * memory per row. This is the throughput-critical stage at 10^12 turns; it is
  * embarrassingly parallel and scales linearly with executors.
  */
object TripleExtractor {

  // A capitalized entity span: capitalized tokens separated by single spaces.
  private val ENT = "([A-Z][\\w.&'-]*(?: [A-Z][\\w.&'-]*)*)"

  /** (pattern, relationship text, subjectType, objectType, hasYear, hasTopic).
    * `anchor` is a literal substring that must appear for the regex to have
    * any chance — a contains() pre-check is ~10× cheaper than a regex scan,
    * and almost all lines at corpus scale are non-matching noise.
    */
  private case class Rule(
      regex: String,
      anchor: String,
      relationship: String,
      subjectType: String,
      objectType: String,
      hasYear: Boolean,
      hasTopic: Boolean) {
    @transient lazy val compiled: Pattern = Pattern.compile(regex)
  }

  // Non-anchored finders: a line may carry several fact sentences, and entity
  // tokens may themselves contain periods ("Inc."), so facts are located by
  // pattern search rather than naive sentence splitting. The rule set is
  // mutually exclusive by its literal verb phrases.
  private val rules: Seq[Rule] = Seq(
    Rule(s"$ENT acquired $ENT in (\\d{4})\\.", " acquired ", "acquired",
      "Organization", "Organization", hasYear = true, hasTopic = false),
    Rule(s"$ENT is the CEO of $ENT\\.", " is the CEO of ", "is the CEO of",
      "Person", "Organization", hasYear = false, hasTopic = false),
    Rule(s"$ENT partnered with $ENT regarding $ENT\\.", " regarding ", "partnered with",
      "Organization", "Organization", hasYear = false, hasTopic = true),
    Rule(s"$ENT partnered with $ENT\\.", " partnered with ", "partnered with",
      "Organization", "Organization", hasYear = false, hasTopic = false),
    Rule(s"$ENT is headquartered in $ENT\\.", " is headquartered in ", "is headquartered in",
      "Organization", "Location", hasYear = false, hasTopic = false),
    Rule(s"$ENT invested in $ENT in (\\d{4})\\.", " invested in ", "invested in",
      "Organization", "Organization", hasYear = true, hasTopic = false))

  // Exclusion re-check ("critique" analogue): entities must not be URLs, pure
  // numbers/amounts, or dates (extractor_v2.py:108-116).
  private val excluded = Pattern.compile(
    "^(https?://.*|www\\..*|[$€£]?[\\d,.]+%?|\\d{4}-\\d{2}-\\d{2})$",
    Pattern.CASE_INSENSITIVE)

  private[graft] def validEntity(name: String): Boolean =
    name != null && name.nonEmpty && !excluded.matcher(name).matches()

  /** Rule-match core shared by the chunk-table path and the fused
    * turn-stream path. No pattern element can match '\n' (entity spans use
    * spaces and word chars; verb phrases are literal), so matching runs over
    * the WHOLE body — no per-line split/substring allocation — gated by a
    * literal `contains(anchor)` per rule (~10× cheaper than a regex scan,
    * and almost all text at corpus scale matches no anchor). `chunkUuid` is
    * BY-NAME: the uuid5 digest — the hottest per-row fixed cost of the chunk
    * stage — is computed only when a rule actually matches.
    */
  private[extract] def extractBody(text: String, convId: String, turnIdx: Int,
      groupId: String, chunkUuid: () => String): Iterator[RawTriple] = {
    var uuid: String = null
    def u(): String = { if (uuid == null) uuid = chunkUuid(); uuid }
    rules.iterator.filter(r => text.contains(r.anchor)).flatMap { r =>
      val m = r.compiled.matcher(text)
      val out = Seq.newBuilder[RawTriple]
      while (m.find()) {
        val subject = m.group(1)
        val obj = m.group(2)
        val date = if (r.hasYear) "in " + m.group(3) else ""
        val topics = if (r.hasTopic) Seq(m.group(3)) else Seq.empty[String]
        if (validEntity(subject) && validEntity(obj))
          out += RawTriple(
            chunk_uuid = u(),
            conv_id = convId,
            turn_idx = turnIdx,
            group_id = groupId,
            fact = m.group(0),
            subject = subject,
            subject_type = r.subjectType,
            relationship = r.relationship,
            `object` = obj,
            object_type = r.objectType,
            date_context = date,
            topics = topics)
      }
      out.result()
    }
  }

  /** Extract raw triples from one chunk (pure; unit-testable). */
  private[extract] def extractChunk(c: Chunk): Iterator[RawTriple] =
    extractBody(c.text, c.conv_id, c.window_end, c.group_id, () => c.chunk_uuid)

  def extract(spark: SparkSession, chunks: Dataset[Chunk]): Dataset[RawTriple] = {
    import spark.implicits._
    chunks.mapPartitions(_.flatMap(extractChunk))
  }

  /** FUSED chunk→extract single pass over the raw turn stream (windowSize=1
    * semantics). The chunk TABLE needs numbering, header stacks, and document
    * dates — but the extraction metric needs none of them: a RawTriple
    * carries only (chunk_uuid, conv_id, turn_idx, group_id) context, and
    * chunk_uuid = uuid5(group, conv, "idx:N") is computable per turn without
    * any cross-turn state. So triple extraction over a standing transcript
    * store is ONE narrow mapPartitions: apply the chunker's emission gate
    * (trim, minChars, "---" — TurnChunker semantics, spec-asserted
    * row-identical to extract(chunk(turns))), then the rule core, computing
    * the uuid5 digest only for turns that matched a rule. No Chunk objects,
    * no header paths, no stats/reconcile pass, no layout requirement (works
    * on ANY partitioning — per-turn independent), no shuffle.
    *
    * This is the triple-extraction deployment shape at 10^12 turns; the
    * materialized chunk table (chunkSorted / windowed chunk) remains the
    * provenance path.
    *
    * Identity precondition (documented divergence): the chunk path prepends
    * role/tool-banner/header LINES to the chunk text
    * (Norm.prependHeaderIfMissing — the reference extracts entities from
    * section headers, extractor_v2.py:59). No extraction rule can match
    * across '\n', so the paths agree unless a banner line ITSELF is
    * rule-shaped text (e.g. a `tool` value spelling "X acquired Y in 2014.").
    * Transcript role/tool fields are metadata, not fact prose, so this holds
    * for real corpora; a corpus that violates it must use extract(chunk(..)).
    */
  def extractFused(spark: SparkSession, turns: Dataset[Turn], minChars: Int = 50,
      groupId: String = "default"): Dataset[RawTriple] = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // Explicit 3-column projection BELOW the object boundary: extraction
    // reads only (conv_id, turn_idx, text), but the opaque mapPartitions
    // would force the full Turn struct through the scan — the projection
    // lets the parquet scan prune the other columns and the decode build a
    // 3-field tuple instead of a 6-field Turn (guide §2.3 / §4.1: project
    // before the opaque operation). Emission-identical: only projected-away
    // metadata columns are dropped.
    turns.toDF()
      .select(col("conv_id"), col("turn_idx"), col("text"))
      .as[(String, Int, String)]
      .mapPartitions { it =>
        it.flatMap { case (convId, turnIdx, text) =>
          if (text == null) Iterator.empty
          else {
            val body = text.trim
            if (body.length >= minChars && !body.startsWith("---"))
              extractBody(body, convId, turnIdx, groupId,
                () => graft.functions.Ids.stableUuid(groupId, convId, s"idx:$turnIdx"))
            else Iterator.empty
          }
        }
      }
  }

  /** Phase-2a analogue: collect entity mentions from fact subjects/objects
    * (pipeline.py:1388-1418). Topic-typed mentions are excluded here and
    * routed to the topic path (pipeline.py:704-706). Narrow COLUMNAR explode
    * (was a Dataset flatMap): no per-row object decode/encode, so the whole
    * triples→mentions→pending-aggregation chain stays in Tungsten rows and
    * whole-stage codegen — the turn index rides on the RawTriple, so no
    * join back to chunks either way.
    */
  def mentions(spark: SparkSession, triples: Dataset[RawTriple]): Dataset[Mention] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    triples.toDF()
      .select(
        explode(array(
          struct($"subject".as("name"), $"subject_type".as("entity_type")),
          struct($"object".as("name"), $"object_type".as("entity_type")))).as("m"),
        $"chunk_uuid", $"conv_id", $"turn_idx", $"group_id")
      .filter(lower($"m.entity_type") =!= "topic")
      .select(
        $"m.name".as("name"),
        $"m.entity_type".as("entity_type"),
        concat($"m.name", lit(" is an entity observed in transcripts.")).as("summary"),
        $"chunk_uuid", $"conv_id", $"turn_idx", $"group_id")
      .as[Mention]
  }
}

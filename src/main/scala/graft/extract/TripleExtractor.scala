package graft.extract

import java.util.regex.Pattern

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.model.{Chunk, Mention, RawTriple}

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

  /** Extract raw triples from one chunk (pure; unit-testable). */
  private[extract] def extractChunk(c: Chunk): Iterator[RawTriple] = {
    c.text.split('\n').iterator.flatMap { line =>
      rules.iterator.filter(r => line.contains(r.anchor)).flatMap { r =>
        val m = r.compiled.matcher(line)
        val out = Seq.newBuilder[RawTriple]
        while (m.find()) {
          val subject = m.group(1)
          val obj = m.group(2)
          val date = if (r.hasYear) "in " + m.group(3) else ""
          val topics = if (r.hasTopic) Seq(m.group(3)) else Seq.empty[String]
          if (validEntity(subject) && validEntity(obj))
            out += RawTriple(
              chunk_uuid = c.chunk_uuid,
              conv_id = c.conv_id,
              turn_idx = c.window_end,
              group_id = c.group_id,
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
  }

  def extract(spark: SparkSession, chunks: Dataset[Chunk]): Dataset[RawTriple] = {
    import spark.implicits._
    chunks.mapPartitions(_.flatMap(extractChunk))
  }

  /** Phase-2a analogue: collect entity mentions from fact subjects/objects
    * (pipeline.py:1388-1418). Topic-typed mentions are excluded here and
    * routed to the topic path (pipeline.py:704-706). Narrow flatMap — the
    * turn index rides on the RawTriple, so no join back to chunks.
    */
  def mentions(spark: SparkSession, triples: Dataset[RawTriple]): Dataset[Mention] = {
    import spark.implicits._
    triples.flatMap { t =>
      def m(name: String, typ: String) =
        Mention(name, typ, s"$name is an entity observed in transcripts.",
          t.chunk_uuid, t.conv_id, t.turn_idx, t.group_id)
      val s = if (t.subject_type.toLowerCase(java.util.Locale.ROOT) != "topic")
        Iterator.single(m(t.subject, t.subject_type)) else Iterator.empty
      val o = if (t.object_type.toLowerCase(java.util.Locale.ROOT) != "topic")
        Iterator.single(m(t.`object`, t.object_type)) else Iterator.empty
      s ++ o
    }
  }
}

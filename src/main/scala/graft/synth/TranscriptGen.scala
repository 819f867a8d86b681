package graft.synth

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, SparkSession}

import graft.functions.Norm
import graft.model.{OntologyTopic, Turn}

/** Deterministic transcript synthesizer (FIXTURES.md §1).
  *
  * Generates the `input_hint` table (conv_id, turn_idx, role, text, tool, ts)
  * from a seeded template grammar that embeds known entities and relations, so
  * golden triples are derivable in closed form (goldenTriples below). The
  * per-turn content is a pure function of (seed, conv, turn) — generation is
  * embarrassingly parallel (spark.range → map) and independent of
  * partitioning, so the same bytes come out at local[8] and local[32].
  *
  * Includes, per FIXTURES.md: long-conversation skew (conv 0 is `skew`× longer),
  * alias variation across turns (full name / suffix-stripped), short turns
  * (<50 chars, filtered by the chunker per reference
  * markdown_chunker.py:60-63), and null/empty malformed rows.
  */
object TranscriptGen {

  case class Config(
      numConvs: Int = 20,
      turnsPerConv: Int = 40,
      skew: Int = 8, // conv 0 gets skew×turnsPerConv turns
      seed: Long = 42L,
      groupId: String = "default") {
    def conv0Turns: Int = skew * turnsPerConv
    def totalTurns: Long = conv0Turns.toLong + (numConvs - 1).toLong * turnsPerConv
  }

  /** Expected pipeline output for a fact sentence (golden fixture row). */
  case class GoldenTriple(
      conv_id: String,
      subject: String,
      predicate: String,
      `object`: String,
      date_context: String,
      topic: String)

  // ---- deterministic world ------------------------------------------------

  private val adjectives = Array("Quantum", "Apex", "Northern", "Global", "Stellar",
    "Vertex", "Crimson", "Silver", "Atlas", "Nova", "Orion", "Pinnacle", "Aurora",
    "Zenith", "Horizon", "Summit", "Cobalt", "Ember", "Falcon", "Granite")
  private val nouns = Array("Dynamics", "Systems", "Analytics", "Robotics", "Networks",
    "Capital", "Energy", "Logistics", "Biotech", "Semiconductors", "Holdings",
    "Industries", "Software", "Materials", "Ventures", "Labs", "Partners", "Consulting",
    "Media", "Foods")
  // no trailing periods: a name-final "." is indistinguishable from the
  // sentence terminator, which would make surface forms ambiguous
  private val suffixes = Array("Inc", "Corp", "Ltd", "LLC")
  private val firstNames = Array("James", "Mary", "Wei", "Aisha", "Carlos", "Elena",
    "Raj", "Yuki", "Omar", "Ingrid", "Tomas", "Sofia", "Liam", "Nora", "Ivan", "Priya",
    "Hana", "Diego", "Amara", "Felix")
  private val lastNames = Array("Chen", "Patel", "Garcia", "Smith", "Novak", "Tanaka",
    "Okafor", "Larsson", "Rossi", "Kim", "Mehta", "Silva", "Dubois", "Haddad",
    "Kowalski", "Iyer", "Nakamura", "Costa", "Ahmed", "Brown")
  private val cities = Array("Geneva", "Osaka", "Toronto", "Lagos", "Porto", "Helsinki",
    "Denver", "Austin", "Lyon", "Mumbai", "Seoul", "Oslo", "Perth", "Quito", "Dublin",
    "Boston", "Zurich", "Dakar", "Hanoi", "Krakow")

  /** Small deterministic topic ontology (FIXTURES.md §6; mirrors the shape of
    * reference src/config/topics/financial_topics.json).
    */
  val ontology: Seq[OntologyTopic] = Seq(
    OntologyTopic("t:inflation", "Inflation", "General price level increases",
      Seq("CPI", "Price Pressures", "Rising Prices")),
    OntologyTopic("t:cloud", "Cloud Computing", "On-demand computing services",
      Seq("Cloud Infrastructure", "Cloud Services")),
    OntologyTopic("t:supply", "Supply Chain", "Flow of goods and materials",
      Seq("Logistics Networks", "Supply Constraints")),
    OntologyTopic("t:labor", "Labor Market", "Employment and wage conditions",
      Seq("Employment", "Hiring", "Wage Growth")),
    OntologyTopic("t:rates", "Interest Rates", "Cost of borrowing money",
      Seq("Monetary Policy", "Rate Hikes")),
    OntologyTopic("t:ai", "Artificial Intelligence", "Machine intelligence systems",
      Seq("Machine Learning", "Generative Models")),
    OntologyTopic("t:energy", "Energy Markets", "Oil, gas, and power markets",
      Seq("Oil Prices", "Power Grid")),
    OntologyTopic("t:trade", "International Trade", "Cross-border commerce",
      Seq("Tariffs", "Exports")),
    OntologyTopic("t:housing", "Housing Market", "Residential real estate",
      Seq("Home Prices", "Mortgages")),
    OntologyTopic("t:semis", "Semiconductors", "Chip design and fabrication",
      Seq("Chips", "Foundries")))

  private val topicSynonyms: Array[String] =
    ontology.flatMap(t => t.label +: t.synonyms).toArray

  /** company id → (fullName, strippedAlias) */
  private[synth] def company(i: Int): (String, String) = {
    val adj = adjectives(i % adjectives.length)
    val noun = nouns((i / adjectives.length) % nouns.length)
    val suffix = suffixes(i % suffixes.length)
    (s"$adj $noun $suffix", s"$adj $noun")
  }
  private[synth] def person(i: Int): String =
    s"${firstNames(i % firstNames.length)} ${lastNames((i / firstNames.length) % lastNames.length)}"
  private[synth] def city(i: Int): String = cities(i % cities.length)

  private val numCompanies = adjectives.length * nouns.length // 400 distinct
  private val numPersons = firstNames.length * lastNames.length

  // ---- fact grammar --------------------------------------------------------

  /** One seeded fact spec: (template, subjIdx, objIdx, year, topicIdx). */
  private case class FactSpec(template: Int, subj: Int, obj: Int, year: Int, topic: Int)

  private def mix(a: Long, b: Long): Long = {
    var h = a * 0x9e3779b97f4a7c15L + b
    h ^= h >>> 32; h *= 0xff51afd7ed558ccdL; h ^= h >>> 32
    h
  }
  private def pos(h: Long, mod: Int): Int = (((h % mod) + mod) % mod).toInt

  private def factsForConv(cfg: Config, conv: Int): IndexedSeq[FactSpec] = {
    val nFacts = 6 + pos(mix(cfg.seed, conv * 7L + 1), 5) // 6..10 facts per conv
    (0 until nFacts).map { f =>
      val h = mix(cfg.seed + 13, conv.toLong * 100003 + f)
      val template = pos(h, 5)
      val subj = pos(mix(h, 2), numCompanies)
      val objRaw = pos(mix(h, 3), numCompanies)
      val obj = if (objRaw == subj) (objRaw + 1) % numCompanies else objRaw
      FactSpec(template, subj, obj, 2005 + pos(mix(h, 4), 20), pos(mix(h, 5), topicSynonyms.length))
    }
  }

  /** One rendered fact mention: entity ids + the alias forms actually used.
    * The golden canonical name for an entity is the longest alias form that
    * appears anywhere in the generated corpus — exactly the pipeline's
    * longest-summary canonical pick (entity_dedup.py:606-609 with summary =
    * name-derived text), computed independently of the pipeline.
    */
  case class Occurrence(
      conv_id: String,
      subj_id: String,
      subj_used: String,
      rel: String,
      obj_id: String,
      obj_used: String,
      date_context: String,
      topic: String)

  /** Renders a fact sentence; `aliasBits` picks full vs suffix-stripped alias
    * for the companies involved (drives the dedup stage).
    */
  private def renderFact(conv: String, spec: FactSpec, aliasBits: Long): (String, Occurrence) = {
    val (subjFull, subjShort) = company(spec.subj)
    val (objFull, objShort) = company(spec.obj)
    val s = if ((aliasBits & 1) == 1) subjShort else subjFull
    val o = if ((aliasBits & 2) == 2) objShort else objFull
    val subjId = s"C${spec.subj}"
    val objId = s"C${spec.obj}"
    spec.template match {
      case 0 =>
        (s"$s acquired $o in ${spec.year}.",
          Occurrence(conv, subjId, s, "acquired", objId, o, s"in ${spec.year}", ""))
      case 1 =>
        val pIdx = pos(mix(spec.subj.toLong, spec.obj.toLong), numPersons)
        val p = person(pIdx)
        (s"$p is the CEO of $s.",
          Occurrence(conv, s"P$pIdx", p, "is the CEO of", subjId, s, "", ""))
      case 2 =>
        val topic = topicSynonyms(spec.topic)
        (s"$s partnered with $o regarding $topic.",
          Occurrence(conv, subjId, s, "partnered with", objId, o, "", topic))
      case 3 =>
        val cIdx = pos(mix(spec.subj.toLong, 17L), cities.length)
        val c = city(cIdx)
        (s"$s is headquartered in $c.",
          Occurrence(conv, subjId, s, "is headquartered in", s"L$cIdx", c, "", ""))
      case _ =>
        (s"$s invested in $o in ${spec.year}.",
          Occurrence(conv, subjId, s, "invested in", objId, o, s"in ${spec.year}", ""))
    }
  }

  private val longNoise = Array(
    "the team reviewed the deployment logs and confirmed the rollout completed without incident overall.",
    "we should schedule a follow-up to walk through the remaining action items from the earlier review.",
    "per the shared notes, the metrics dashboard now reflects the corrected attribution window settings.",
    "after rerunning the backfill, the nightly reconciliation job finished cleanly with no row drift.")
  private val shortNoise = Array("ok, sounds good.", "let me check.", "thanks!", "on it.", "")
  private val fillers = Array(
    " see the shared notes for additional context and follow-ups.",
    " further details were circulated in the weekly summary thread.",
    " the update was confirmed by two independent sources on the call.")

  // ---- per-turn generation (pure function of (cfg, globalIndex)) ----------

  private[synth] def convAndTurn(cfg: Config, i: Long): (Int, Int) = {
    if (i < cfg.conv0Turns) (0, i.toInt)
    else {
      val j = i - cfg.conv0Turns
      ((1 + j / cfg.turnsPerConv).toInt, (j % cfg.turnsPerConv).toInt)
    }
  }

  private val baseEpochMs = 1704067200000L // 2024-01-01T00:00:00Z

  /** True iff turn t of conv c carries a fact sentence. 2 of every 3 turns. */
  private def isFactTurn(h: Long): Boolean = pos(h, 3) != 0

  /** The rendered fact occurrence for global turn i, if it is a fact turn. */
  private[synth] def occurrenceAt(cfg: Config, i: Long): Option[(String, Occurrence)] = {
    val (conv, t) = convAndTurn(cfg, i)
    val h = mix(cfg.seed + 101, conv.toLong * 1000003 + t)
    if (!isFactTurn(h)) None
    else {
      val facts = factsForConv(cfg, conv)
      val spec = facts(pos(mix(h, 7), facts.length))
      // early turns use full names so every entity has at least one long form
      val aliasBits = if (t < 3) 0L else mix(h, 11)
      Some(renderFact(f"conv$conv%05d", spec, aliasBits))
    }
  }

  private[synth] def genTurn(cfg: Config, i: Long): Turn = {
    val (conv, t) = convAndTurn(cfg, i)
    val convId = f"conv$conv%05d"
    val h = mix(cfg.seed + 101, conv.toLong * 1000003 + t)
    val role = t % 3 match { case 0 => "user"; case 1 => "assistant"; case _ => "tool" }
    val tool = if (role == "tool") (if (pos(h, 2) == 0) "search" else "calc") else ""
    val ts = new Timestamp(baseEpochMs + conv * 86400000L + t * 60000L)
    val text: String = occurrenceAt(cfg, i) match {
      case Some((sentence, _)) =>
        sentence + fillers(pos(mix(h, 13), fillers.length))
      case None =>
        if (pos(mix(h, 17), 2) == 0) longNoise(pos(mix(h, 19), longNoise.length))
        else shortNoise(pos(mix(h, 19), shortNoise.length)) // short/empty → filtered
    }
    Turn(convId, t, role, if (text.isEmpty) null else text, tool, ts)
  }

  /** The transcripts table. */
  def transcripts(spark: SparkSession, cfg: Config = Config()): Dataset[Turn] = {
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism, 8)
    spark.range(0L, cfg.totalTurns, 1L, parts).mapPartitions { it =>
      it.map(i => genTurn(cfg, i))
    }
  }

  /** All fact occurrences in the corpus (the generator's ground truth). */
  def occurrences(spark: SparkSession, cfg: Config = Config()): Dataset[Occurrence] = {
    import spark.implicits._
    val parts = math.max(spark.sparkContext.defaultParallelism, 8)
    spark.range(0L, cfg.totalTurns, 1L, parts)
      .mapPartitions(_.flatMap(i => occurrenceAt(cfg, i).map(_._2)))
  }

  /** Expected pipeline output, derived independently of the pipeline:
    * canonical entity name = the longest alias form appearing anywhere in the
    * corpus (Python-title-cased), predicate = normalized relationship —
    * distinct per (conv, s, p, o, date). Golden fixture for P/R (§5.2).
    */
  /** Expected canonical ENTITY table, derived independently of the pipeline
    * from the generator's ground-truth ids: per entity id, canonical name =
    * the longest alias form appearing anywhere in the corpus (the pipeline's
    * longest-summary pick, entity_dedup.py:606-609), aliases = every
    * title-cased form used, entity type from the id class (C = Organization,
    * P = Person, L = Location — the extractor's rule types). Array columns
    * are pre-joined to strings (driver-harness comparability).
    */
  def goldenEntities(spark: SparkSession, cfg: Config = Config()): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val occ = occurrences(spark, cfg)
    val names = occ.select($"subj_id".as("id"), $"subj_used".as("used"))
      .union(occ.select($"obj_id".as("id"), $"obj_used".as("used")))
      .distinct()
    val titleUdf = udf((s: String) => Norm.normalizeEntityName(s))
    names
      .withColumn("entity_type",
        when(substring($"id", 1, 1) === "P", "Person")
          .when(substring($"id", 1, 1) === "L", "Location")
          .otherwise("Organization"))
      .groupBy($"id", $"entity_type")
      .agg(
        max_by($"used", struct(length($"used"), $"used")).as("canonical"),
        array_sort(collect_set(titleUdf($"used"))).as("aliases"))
      .select(
        titleUdf($"canonical").as("canonical_name"),
        $"entity_type",
        array_join($"aliases", "|").as("aliases"),
        lit(cfg.groupId).as("group_id"))
  }

  def goldenTriples(spark: SparkSession, cfg: Config = Config()): Dataset[GoldenTriple] = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val occ = occurrences(spark, cfg)
    val names = occ.select($"subj_id".as("id"), $"subj_used".as("used"))
      .union(occ.select($"obj_id".as("id"), $"obj_used".as("used")))
      .distinct()
    // canonical = max by (name length, name): the pipeline's longest-summary
    // pick with summary = name + constant suffix, tie-broken by name.
    val canon = names.groupBy($"id")
      .agg(max_by($"used", struct(length($"used"), $"used")).as("canonical"))
    val titleUdf = udf((s: String) => Norm.normalizeEntityName(s))
    val relUdf = udf((s: String) => Norm.normalizeRelType(s))
    occ.join(canon.withColumnRenamed("id", "subj_id")
        .withColumnRenamed("canonical", "subj_canon"), Seq("subj_id"))
      .join(canon.withColumnRenamed("id", "obj_id")
        .withColumnRenamed("canonical", "obj_canon"), Seq("obj_id"))
      .select(
        $"conv_id",
        titleUdf($"subj_canon").as("subject"),
        relUdf($"rel").as("predicate"),
        titleUdf($"obj_canon").as("object"),
        $"date_context",
        $"topic")
      .distinct()
      .as[GoldenTriple]
  }
}

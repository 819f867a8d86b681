package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.assemble.TripleAssembler
import graft.canon.EntityDedup
import graft.chunk.TurnChunker
import graft.extract.TripleExtractor
import graft.link.{EntityLinker, TopicResolver}
import graft.model._
import graft.synth.TranscriptGen
import graft.tables.SnapshotLog

/** End-to-end knowledge-graph construction over a transcripts table
  * (SURVEY.md §3.1): chunk → extract → collect/dedup/canonicalize → link →
  * topic-resolve → assemble → commit partitioned tables with per-stage
  * snapshots and per-partition lineage.
  *
  * Stage boundaries mirror the reference's phase barriers (asyncio.gather
  * fan-ins at /root/reference/src/pipeline.py:1378,1548,1688): each stage is
  * one committed table; a relaunched run resumes from the last committed
  * snapshot (`SnapshotLog.computeIfAbsent`).
  */
object Ingest {

  /** Aux lookup blooms committed with every triples segment: the 1-hop
    * adjacency surface (explore_neighbors, get_chunks_by_edge, entity
    * provenance) is point lookups by subject/object uuid, which are NOT the
    * table's merge key — these let `SnapshotLog.readForAnyKeys` open only
    * the segments incident to the requested entity. Built in the same
    * single key-column read-back pass as the fact_uuid merge bloom.
    */
  val TripleLookupBlooms: Seq[Seq[String]] =
    Seq(Seq("subject_uuid"), Seq("object_uuid"))

  case class Result(
      chunks: DataFrame,
      rawTriples: DataFrame,
      entities: DataFrame,
      triples: DataFrame)

  case class Config(
      chunker: TurnChunker.Config = TurnChunker.Config(),
      dedup: EntityDedup.Config = EntityDedup.Config(),
      linker: EntityLinker.Config = EntityLinker.Config(),
      topics: TopicResolver.Config = TopicResolver.Config(),
      assembler: TripleAssembler.Config = TripleAssembler.Config(),
      ontology: Seq[OntologyTopic] = TranscriptGen.ontology,
      // persist fact vectors in the committed triples table (the reference
      // ingests fact embeddings into its vector store, pipeline.py:974-1005
      // + the fact_embeddings index) — retrieval then reads the committed
      // column instead of re-deriving per read. Default off: the embedder
      // is deterministic, so derive-at-read is value-identical and the
      // table stays 64 doubles/row slimmer.
      factEmbeddings: Boolean = false,
      groupId: String = "default")

  /** Run without the table layer (used by tests/bench). Only the raw-triple
    * stage is persisted: its four downstream consumers (mentions, topic
    * names ×2, assembly) would otherwise re-run the chunk-window shuffle and
    * regex extraction each. Chunks have a single consumer (extraction) — a
    * cache there would be a pure write-read overhead. In the committed `run`
    * path the snapshot tables play the persistence role.
    *
    * Raw-triple extraction routes through the FUSED single-pass extractor
    * whenever the chunker config satisfies its identity precondition
    * (windowSize == 1, no markdown header stacks — the defaults;
    * spec-asserted row-identical to extract(chunk(turns))): the chunk table
    * is NOT an input of the triple stream there, only of chunk-text
    * provenance, and `Result.chunks` stays lazily available either way — so
    * an action that materializes only `.triples` pays ONE corpus pass
    * instead of the chunker's stats + zip passes (guide §1.2: remove whole
    * passes before tuning inside them). Windowed/header configs keep the
    * chunk-table route.
    */
  def runInMemory(spark: SparkSession, turns: Dataset[Turn],
      cfg: Config = Config()): Result = {
    import org.apache.spark.storage.StorageLevel
    val chunks = TurnChunker.chunk(spark, turns, cfg.chunker)
    val fusable = cfg.chunker.windowSize == 1 && !cfg.chunker.markdownHeaders
    val raw = (if (fusable)
        TripleExtractor.extractFused(spark, turns, cfg.chunker.minChars, cfg.chunker.groupId)
      else TripleExtractor.extract(spark, chunks))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (entities, triples) = inMemoryDownstream(spark, raw, cfg)
    Result(chunks.toDF(), raw.toDF(), entities, triples)
  }

  /** In-memory triples-only run (see `runFused`): fused single-pass
    * extraction feeds the downstream stages directly — no Chunk objects, no
    * chunk-window/stats pass. windowSize=1 / markdownHeaders=false semantics
    * only (enforced).
    */
  def runInMemoryFused(spark: SparkSession, turns: Dataset[Turn],
      cfg: Config = Config()): Result = {
    import spark.implicits._
    import org.apache.spark.storage.StorageLevel
    require(cfg.chunker.windowSize == 1 && !cfg.chunker.markdownHeaders,
      "runInMemoryFused implements windowSize=1 / markdownHeaders=false semantics; " +
        "use runInMemory() for windowed or header-stack configs")
    val raw = TripleExtractor.extractFused(spark, turns,
        cfg.chunker.minChars, cfg.chunker.groupId)
      .persist(StorageLevel.MEMORY_AND_DISK)
    val (entities, triples) = inMemoryDownstream(spark, raw, cfg)
    Result(spark.emptyDataset[Chunk].toDF(), raw.toDF(), entities, triples)
  }

  private def inMemoryDownstream(spark: SparkSession, raw: Dataset[RawTriple],
      cfg: Config): (DataFrame, DataFrame) = {
    import spark.implicits._
    val mentions = TripleExtractor.mentions(spark, raw)
    val (entities0, remap0) = EntityDedup.dedup(spark, mentions, cfg.dedup)
    // one pass over raw (not a 3-way union = 3 cache scans): topics array ∪
    // topic-typed subjects ∪ topic-typed objects
    val topicNames = raw.select(explode(concat($"topics",
        when(lower($"subject_type") === "topic", array($"subject")).otherwise(array()),
        when(lower($"object_type") === "topic", array($"object")).otherwise(array())))
        .as("name"), $"group_id")
      .distinct()
    // entities/remap/topics are tiny (≈ distinct names); eagerly truncating
    // their lineage here (the in-memory analogue of the committed path's
    // stage tables) stops downstream broadcast subqueries from re-running the
    // whole chunk+extract subtree — measured as a repeated multi-second
    // broadcast build in the assembly phase. The three tables are mutually
    // independent, so they materialize in ONE job (truncateAll) instead of
    // three sequential driver rounds. Checkpoints prefers a reliable
    // checkpoint when a dir is configured (cluster failure model).
    val Seq(entities, remap, topics) = graft.tables.Checkpoints.truncateAll(
      entities0.toDF(), remap0,
      TopicResolver.resolve(spark, topicNames, cfg.ontology, cfg.topics))
    val triples = TripleAssembler.assemble(spark, raw, remap, topics, cfg.assembler)
    (entities, triples.toDF())
  }

  /** Full run with committed snapshots + lineage + resume.
    * Tables: chunks, raw_triples, entities, entity_remap, topics, triples —
    * all partitioned by group_id (tenant pruning, SURVEY.md §1.1) and the big
    * ones additionally bucketed by conv_id hash range at write time.
    */
  def run(spark: SparkSession, turns: Dataset[Turn], warehouseDir: String,
      cfg: Config = Config()): Result = {
    import spark.implicits._
    val log = new SnapshotLog(spark, warehouseDir)

    val chunksDf = log.computeIfAbsent("chunks", Seq("group_id"),
        bloomKeys = Seq("chunk_uuid")) {
      TurnChunker.chunk(spark, turns, cfg.chunker).toDF()
    }
    val chunks = chunksDf.as[Chunk]

    val rawDf = log.computeIfAbsent("raw_triples", Seq("group_id")) {
      TripleExtractor.extract(spark, chunks).toDF()
    }

    val (entitiesDf, triplesDf) = downstream(spark, log, rawDf, cfg)
    Result(chunksDf, rawDf, entitiesDf, triplesDf)
  }

  /** Triples-only committed run: the raw-triple table is computed by the
    * FUSED single-pass extractor straight off the turn stream
    * (`TripleExtractor.extractFused`) and the corpus-sized chunks table is
    * never materialized — at 10^12 turns that is ~1× corpus bytes of write
    * volume saved, and no chunk-window shuffle/stats pass at all. Provenance
    * still resolves per triple via the carried (conv_id, turn_idx,
    * chunk_uuid); deployments that need chunk TEXT provenance (J12 lookups,
    * v7 chunk-centric retrieval) use `run`. Fused semantics are
    * windowSize=1 without markdown header stacks (spec-asserted identical to
    * extract(chunk(turns)) there); other chunker configs must take `run`.
    */
  def runFused(spark: SparkSession, turns: Dataset[Turn], warehouseDir: String,
      cfg: Config = Config()): Result = {
    import spark.implicits._
    require(cfg.chunker.windowSize == 1 && !cfg.chunker.markdownHeaders,
      "runFused implements windowSize=1 / markdownHeaders=false semantics; " +
        "use run() for windowed or header-stack configs")
    val log = new SnapshotLog(spark, warehouseDir)
    val rawDf = log.computeIfAbsent("raw_triples", Seq("group_id")) {
      TripleExtractor.extractFused(spark, turns,
        cfg.chunker.minChars, cfg.chunker.groupId).toDF()
    }
    val (entitiesDf, triplesDf) = downstream(spark, log, rawDf, cfg)
    Result(spark.emptyDataset[Chunk].toDF(), rawDf, entitiesDf, triplesDf)
  }

  /** Stages downstream of the committed raw-triple table, shared by `run`
    * (chunk-table provenance path) and `runFused` (triples-only path):
    * mentions → dedup/canonicalize → topic resolve → assembly, each a
    * committed resume-aware snapshot.
    */
  private def downstream(spark: SparkSession, log: SnapshotLog, rawDf: DataFrame,
      cfg: Config): (DataFrame, DataFrame) = {
    import spark.implicits._
    val raw = rawDf.as[RawTriple]

    val mentionsDf = log.computeIfAbsent("mentions", Seq("group_id")) {
      TripleExtractor.mentions(spark, raw).toDF()
    }

    val (entitiesDf, remapDf) =
      (log.read("entities"), log.read("entity_remap")) match {
        case (Some(e), Some(r)) => (e, r)
        case _ =>
          val (e, r) = EntityDedup.dedup(spark, mentionsDf.as[Mention], cfg.dedup)
          // link against a pre-existing entity table if one was committed by a
          // previous corpus run (incremental ingest, J4)
          log.commit("entities", e.toDF(), Seq("group_id"),
            bloomKeys = Seq("entity_uuid"))
          log.commit("entity_remap", r)
          (log.read("entities").get, log.read("entity_remap").get)
      }

    val topicsDf = log.computeIfAbsent("topics") {
      val names = rawDf.select(explode(concat($"topics",
          when(lower($"subject_type") === "topic", array($"subject")).otherwise(array()),
          when(lower($"object_type") === "topic", array($"object")).otherwise(array())))
          .as("name"), $"group_id")
        .distinct()
      TopicResolver.resolve(spark, names, cfg.ontology, cfg.topics)
    }

    val triplesDf = log.computeIfAbsent("triples", Seq("group_id"),
        bloomKeys = Seq("fact_uuid"), auxBloomKeys = TripleLookupBlooms) {
      val t = TripleAssembler.assemble(spark, raw, remapDf, topicsDf, cfg.assembler).toDF()
      if (cfg.factEmbeddings) graft.query.Retriever.withFactEmbeddings(t) else t
    }

    (entitiesDf, triplesDf)
  }

  /** Incremental ingest of an additional corpus into an EXISTING warehouse
    * (J4 entity linking, reference entity_registry.py:134-218): the new
    * corpus is chunked/extracted/deduped on its own, then its canonical
    * entities are linked against the committed entity table — matches adopt
    * the existing uuid/name, new ones append (MERGE semantics). New triples
    * append idempotently on fact_uuid.
    *
    * `conv_id` is the store-wide conversation key (chunk/fact uuids derive
    * from it): the additional corpus must carry fresh conv ids for
    * genuinely new conversations — a re-submitted conv_id deduplicates by
    * uuid (idempotent re-ingest) rather than storing divergent content.
    */
  def runIncremental(spark: SparkSession, turns: Dataset[Turn], warehouseDir: String,
      cfg: Config = Config()): Result = {
    import spark.implicits._
    val log = new SnapshotLog(spark, warehouseDir)
    val existing = log.read("entities").getOrElse(
      throw new IllegalStateException("runIncremental needs a committed entities table"))

    val chunks = TurnChunker.chunk(spark, turns, cfg.chunker)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val raw = TripleExtractor.extract(spark, chunks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val mentions = TripleExtractor.mentions(spark, raw)
    val (newEntities, remap) = EntityDedup.dedup(spark, mentions, cfg.dedup)

    val linked = EntityLinker.link(spark, newEntities.toDF(), existing, cfg.linker)
    // remap through the link result: mention name → resolved (existing or new)
    val finalRemap = remap
      .join(linked.select($"entity_uuid".as("canonical_uuid"),
        $"resolved_uuid", $"resolved_name"), Seq("canonical_uuid"))
      .select($"entity_uuid", $"resolved_uuid".as("canonical_uuid"),
        $"resolved_name".as("canonical_name"), $"name")

    val topicNames = raw.toDF().select(explode($"topics").as("name"), $"group_id").distinct()
    val topics = TopicResolver.resolve(spark, topicNames, cfg.ontology, cfg.topics)
    val triples0 = TripleAssembler.assemble(spark, raw, finalRemap, topics, cfg.assembler).toDF()
    // segment schemas must agree across increments: follow the COMMITTED
    // table's layout (persisted vectors iff the base run persisted them),
    // regardless of this run's flag
    val triples =
      if (log.read("triples").exists(_.columns.contains("embedding")))
        graft.query.Retriever.withFactEmbeddings(triples0)
      else triples0

    val entityRows = foldLinkedEntities(spark, linked, existing.columns)
    log.mergeUpsert("entities", entityRows, Seq("entity_uuid"), Seq("group_id"))
    log.mergeAppend("triples", triples, Seq("fact_uuid"), Seq("group_id"),
      auxBloomKeys = TripleLookupBlooms)
    log.mergeAppend("chunks", chunks.toDF(), Seq("chunk_uuid"), Seq("group_id"))

    Result(chunks.toDF(), raw.toDF(), log.read("entities").get, log.read("triples").get)
  }

  /** Fold EntityLinker output into one upsert row per resolved uuid
    * (entity_registry.py:252-333 merge-on-match): matched rows REPLACE the
    * committed entity (same uuid/name/embedding, merged summary, appended
    * aliases); new rows append. Several new entities can link to ONE
    * existing uuid, so the fold is deterministic per uuid: the EXISTING
    * summary merges exactly ONCE, then each linked row's OWN summary in
    * sorted order — folding the per-row pre-merged `resolved_summary`s
    * would repeat the existing text once per linked row. Alias/chunk sets
    * union; scalar columns take the max_by(name, summary) row's values.
    */
  private[graft] def foldLinkedEntities(spark: SparkSession, linked: DataFrame,
      entityCols: Seq[String]): DataFrame = {
    import spark.implicits._
    val mergeAllUdf = udf((ex: String, ss: Seq[String]) =>
      ss.sorted.foldLeft(Option(ex).getOrElse(""))((acc, s) =>
        graft.functions.Norm.mergeSummaries(acc, s)))
    val entityRows0 = linked
      .withColumn("own_summary", $"summary")
      .withColumn("ex_summary", $"resolved_ex_summary")
      .withColumn("entity_uuid", $"resolved_uuid")
      .withColumn("canonical_name", $"resolved_name")
      .withColumn("name", $"resolved_name")
      .withColumn("summary", $"resolved_summary")
      .withColumn("aliases", $"resolved_aliases")
      .withColumn("embedding", $"resolved_embedding")
      .drop("resolved_uuid", "resolved_name", "resolved_ex_summary",
        "resolved_summary", "resolved_aliases", "resolved_embedding", "is_new")
      .select((entityCols.map(col) :+ $"own_summary" :+ $"ex_summary"): _*)
    val scalarCols = entityCols.filterNot(c =>
      Set("entity_uuid", "summary", "aliases", "source_chunks").contains(c))
    val folded = entityRows0.groupBy($"entity_uuid")
      .agg(
        max_by(struct(scalarCols.map(col): _*), struct($"name", $"summary")).as("c"),
        // all rows of a matched uuid carry the SAME committed ex summary
        // (max = that value; null for brand-new uuids)
        mergeAllUdf(max($"ex_summary"), collect_set($"own_summary")).as("summary"),
        array_distinct(flatten(collect_list($"aliases"))).as("aliases"),
        slice(array_distinct(flatten(collect_list($"source_chunks"))), 1, 20)
          .as("source_chunks"))
      .select(entityCols.map(c =>
        if (scalarCols.contains(c)) col(s"c.$c").as(c) else col(c)): _*)
    // the semantic vector tracks the MERGED (name, summary) pair — recompute
    // it after the fold (the name-only `embedding` is unchanged by a summary
    // merge and stays as committed). Guarded: linking against a legacy
    // warehouse committed before the dual-embedding column keeps its schema.
    if (entityCols.contains("name_embedding")) {
      val nameEmbUdf = udf((n: String, s: String) =>
        graft.functions.Embed.semantic(n, s))
      folded.withColumn("name_embedding", nameEmbUdf($"name", $"summary"))
    } else folded
  }
}

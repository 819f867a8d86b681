package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.pipeline.Ingest
import graft.query.{Decomposer, GraphLookup, Researcher, Retriever}
import graft.sources.JsonlSource
import graft.synth.TranscriptGen

class ResearcherSpec extends SparkSpec {
  import spark.implicits._

  private lazy val built = {
    val cfg = TranscriptGen.Config(numConvs = 6, turnsPerConv = 25, skew = 3)
    val r = Ingest.runInMemory(spark, TranscriptGen.transcripts(spark, cfg))
    (Retriever.withFactEmbeddings(r.triples).cache(), r.entities.cache(), r.chunks.cache())
  }

  test("hint resolution: exact alias wins; unknown hints resolve by similarity or drop") {
    val (_, entities, _) = built
    val name = entities.select($"canonical_name").first().getString(0)
    val res = Researcher.resolveHints(entities, Seq(name.toUpperCase, "Zzqx Qzk"))
    val byHint = res.collect().map(r => r.getString(2) -> r.getString(1)).toMap
    assert(byHint(name.toUpperCase) === name)
  }

  test("dual embeddings: pipeline entities carry name_embedding = embed(name: summary)") {
    import graft.functions.Embed
    val (_, entities, _) = built
    val rows = entities.select($"canonical_name", $"summary", $"embedding",
      $"name_embedding").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, s) = (r.getString(0), r.getString(1))
      val expectedSem = Embed.semantic(n, s).toSeq
      assert(r.getSeq[Double](3) === expectedSem,
        s"name_embedding must embed '{name}: {summary}' (pipeline.py:952-965) for $n")
      assert(r.getSeq[Double](2) === Embed.embed(n).toSeq,
        s"embedding must stay the name-only vector (nodes.py:47) for $n")
    }
  }

  test("hint resolution scores the SEMANTIC vector (entity_name_embeddings analogue)") {
    import graft.functions.Embed
    // an entity whose name-only vector is ~orthogonal to the hint but whose
    // "{name}: {summary}" vector IS the hint's vector: resolution must use
    // the semantic column (v6 graph_store.py:217) — against the name-only
    // column the hint would drop below the 0.3 floor and resolve nothing
    val name = "Alpha Co"
    val summary = "Alpha Co operates regional freight corridors spanning coastal " +
      "terminals, inland depots, customs brokerage desks, refrigerated warehousing, " +
      "rail interchange yards, barge moorings, and seasonal agricultural haulage " +
      "contracts across three adjacent provinces."
    val hint = s"$name: $summary"
    val entities = Seq(("eA", name, "Organization",
        Embed.embed(name).toSeq, Embed.embed(hint).toSeq,
        Seq(name), "default"))
      .toDF("entity_uuid", "canonical_name", "entity_type", "embedding",
        "name_embedding", "aliases", "group_id")
    val res = Researcher.resolveHints(entities, Seq(hint)).collect()
    assert(res.map(_.getString(0)).toSeq === Seq("eA"),
      s"semantic-vector hint must resolve: ${res.mkString(";")}")
    val nameOnlySim = Embed.cosine(Embed.embed(hint), Embed.embed(name))
    assert(nameOnlySim < 0.3,
      s"fixture assumption: name-only sim must sit under the floor ($nameOnlySim)")
  }

  test("research: dual-path evidence respects threshold, boost, and cap") {
    val (facts, entities, _) = built
    val someFact = facts.select($"fact", $"subject").first()
    val out = Researcher.research(facts, entities, someFact.getString(0),
      entityHints = Seq(someFact.getString(1)))
    val rows = out.collect()
    assert(rows.nonEmpty && rows.length <= 15)
    // the fact itself is top evidence (self-similarity 1.0 ≥ threshold)
    assert(rows.head.getAs[String]("fact") === someFact.getString(0))
    // scores sorted descending
    val scores = rows.map(_.getAs[Double]("final_score"))
    assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    // dual-path facts carry both sources and a boost above their vector score
    val multi = rows.filter(_.getAs[Seq[String]]("sources").length > 1)
    assert(multi.forall(_.getAs[Double]("final_score") > 0.65))
  }

  test("enumeration questions get the larger evidence cap (40 vs 15)") {
    val cfg = Researcher.Config(retriever = Retriever.Config(relevanceThreshold = 0.0,
      globalTopK = 100))
    val (facts, entities, _) = built
    val small = Researcher.research(facts, entities, "partnerships", cfg = cfg)
    val big = Researcher.research(facts, entities, "partnerships",
      enumeration = true, cfg = cfg)
    assert(small.count() <= 15 && big.count() <= 40)
    assert(big.count() >= small.count())
  }

  test("researchBatch: per-question parity with the single-question path") {
    val (facts, entities, _) = built
    val f0 = facts.select($"fact", $"subject").first()
    val topic = TranscriptGen.ontology.head.label
    // three deliberately different shapes: rich evidence with a resolvable
    // hint; topic-hinted enumeration; thin evidence with an UNRESOLVABLE hint
    // (drives the refinement path)
    val cases = Seq(
      (0L, f0.getString(0), Seq(f0.getString(1)), Seq.empty[String], false),
      (1L, "partnerships and acquisitions", Seq.empty[String], Seq(topic), true),
      (2L, "zzqx qzk unknowable thing", Seq("Zzqx Qzk"), Seq.empty[String], false))
    val questions = cases
      .toDF("query_id", "question", "entity_hints", "topic_hints", "enumeration")
    val batch = Researcher.researchBatch(facts, entities, questions).collect()
      .groupBy(_.getLong(0))
    cases.foreach { case (qid, q, eh, th, enum0) =>
      val single = Researcher.research(facts, entities, q, eh, th, enum0).collect()
        .map(r => (r.getString(0), math.round(r.getDouble(2) * 1e9),
          r.getSeq[String](3).toList)).toSet
      val got = batch.getOrElse(qid, Array.empty)
        .map(r => (r.getString(1), math.round(r.getDouble(3) * 1e9),
          r.getSeq[String](4).toList)).toSet
      assert(got === single, s"mismatch for query $qid ($q)")
    }
  }

  test("researchBatch: fact-table scans are bounded (multi-consumer intermediates truncated)") {
    val (facts, entities, _) = built
    val nFacts = facts.count()
    val scans = spark.sparkContext.longAccumulator("fact-scans")
    val tick = udf { (_: String) => scans.add(1L); true }.asNondeterministic()
    val ticked = facts.filter(tick($"fact_uuid"))
    val f0 = facts.select($"fact", $"subject").first()
    val questions = Seq(
      (0L, f0.getString(0), Seq(f0.getString(1)), Seq.empty[String], false),
      (1L, "partnerships and acquisitions", Seq.empty[String],
        Seq(TranscriptGen.ontology.head.label), true),
      (2L, "zzqx qzk unknowable thing", Seq("Zzqx Qzk"), Seq.empty[String], false))
      .toDF("query_id", "question", "entity_hints", "topic_hints", "enumeration")
    Researcher.researchBatch(ticked, entities, questions).collect()
    // every consumer that re-derived the scoped ∪ topic ∪ global union would
    // re-scan the fact table ~4× each; with `qs`/resolution/`scored`
    // truncated, the whole flow needs: 4 scans to build `scored` (scoped
    // subject+object, topic, global), ≤2 for anchors, 2 for expansion, 1 for
    // refinement — bounded regardless of question count
    assert(scans.value <= 12L * nFacts,
      s"fact table scanned ${scans.value / math.max(nFacts, 1)}× " +
        s"(${scans.value} row evals over $nFacts rows) — expected ≤12 scans")
  }

  test("decomposer: capitalized spans become entity hints, question words dropped (decomposer.py:97-126)") {
    assert(Decomposer.entityHints("What did Quantum Dynamics Inc acquire from Nova Robotics?") ===
      Seq("Quantum Dynamics Inc", "Nova Robotics"))
    // "CEO" is a capitalized non-stop word — the reference fallback keeps it too
    assert(Decomposer.entityHints("Who is the CEO of Apple?") === Seq("CEO", "Apple"))
    assert(Decomposer.entityHints("what happened to wages?") === Seq.empty)
    // leading question word inside a span is stripped, not the whole span
    assert(Decomposer.entityHints("Did Granite Foods expand?") === Seq("Granite Foods"))
  }

  test("decomposer: question-type keyword rules in reference order (decomposer.py:128-139)") {
    assert(Decomposer.questionType("Compare Apple versus Google") === Decomposer.Comparison)
    assert(Decomposer.questionType("Why did prices rise?") === Decomposer.Causal)
    assert(Decomposer.questionType("Which companies were acquired?") === Decomposer.Enumeration)
    assert(Decomposer.questionType("How did hiring change?") === Decomposer.Temporal)
    assert(Decomposer.questionType("Name the CEO") === Decomposer.Factual)
  }

  test("decomposer: topic hints from ontology label/synonym substring") {
    val d = Decomposer.decompose("How do rate hikes affect cloud infrastructure spend?",
      TranscriptGen.ontology)
    assert(d.topicHints.toSet === Set("Interest Rates", "Cloud Computing"))
  }

  test("researchQuestion: end-to-end from a bare question, NO pre-supplied hints") {
    val (facts, entities, _) = built
    // a corpus fact's own text as the question → evidence must clear 0.65
    val q = facts.orderBy($"fact_uuid").select($"fact").first().getString(0)
    val out = Researcher.researchQuestion(facts, entities, q, TranscriptGen.ontology)
    val rows = out.collect()
    assert(rows.nonEmpty)
    assert(rows.head.getAs[String]("fact") === q) // self-retrieval on top
  }

  test("refinement: unresolved hint recovers a fact the first pass missed (researcher.py:703-860)") {
    import graft.functions.Embed
    val facts = Retriever.withFactEmbeddings(Seq(
      ("f1", "Zeta Prime Holdings acquired Kappa Metals in 2020.", "eZ", "eK"),
      ("f2", "Granite Foods partnered with Vertex Capital.", "eG", "eV"))
      .toDF("fact_uuid", "fact", "subject_uuid", "object_uuid"))
    val entities = Seq(("eG", "Granite Foods", "Organization",
        Embed.embed("Granite Foods").toSeq, Seq("Granite Foods"), "default"))
      .toDF("entity_uuid", "canonical_name", "entity_type", "embedding", "aliases", "group_id")

    // the question is dissimilar to every fact → first pass finds nothing
    val q = "ownership restructuring outcomes"
    val bare = Researcher.research(facts, entities, q)
    assert(bare.count() === 0, "fixture assumption: first pass must come up empty")

    // hint "Zeta Prime Holdings" does NOT resolve (no matching entity) → the
    // refinement pass targets it with a global search and recovers f1
    val out = Researcher.research(facts, entities, q,
      entityHints = Seq("Zeta Prime Holdings")).collect()
    assert(out.map(_.getAs[String]("fact_uuid")).contains("f1"),
      s"refinement must recover the targeted fact (got ${out.mkString(";")})")
    val f1 = out.find(_.getAs[String]("fact_uuid") === "f1").get
    assert(f1.getAs[scala.collection.Seq[String]]("sources").toSeq === Seq("refinement"))
    // penalty applied: final = 0.8 × the hint→fact similarity
    val sim = Embed.cosine(Embed.embed("Zeta Prime Holdings"),
      Embed.embed("Zeta Prime Holdings acquired Kappa Metals in 2020."))
    assert(math.abs(f1.getAs[Double]("final_score") - 0.8 * sim) < 1e-12)
  }

  test("enumeration drilldown expands <=3 extra facts per top incident entity") {
    val (facts, entities, _) = built
    val q = facts.orderBy($"fact_uuid").select($"fact").first().getString(0)
    val evidence = Researcher.research(facts, entities, q)
    val extra = Researcher.enumerationDrilldown(facts, evidence, maxEntities = 5,
      factsPerEntity = 3)
    val rows = extra.collect()
    // only NEW facts, capped per entity
    val evSet = evidence.select($"fact_uuid").collect().map(_.getString(0)).toSet
    assert(rows.forall(r => !evSet.contains(r.getAs[String]("fact_uuid"))))
    val perEntity = rows.groupBy(_.getAs[String]("entity_uuid")).map(_._2.length)
    assert(perEntity.forall(_ <= 3))
    assert(rows.forall(_.getAs[String]("source") === "enumeration"))
  }

  test("v7 chunk-centric retrieval: entity chunks, neighbor chunks, global chunk search") {
    val (facts, _, chunks) = built
    val e = facts.select($"subject_uuid").first().getString(0)
    val ec = GraphLookup.entityChunks(facts, chunks, e).collect()
    assert(ec.nonEmpty && ec.forall(_.getAs[Long]("n_facts") > 0))
    val nb = GraphLookup.oneHopNeighborChunks(facts, chunks, e)
    assert(nb.count() > 0)
    val anyText = chunks.select($"text").first().getString(0)
    val top = GraphLookup.globalChunkSearch(chunks, anyText, topK = 3).collect()
    assert(top.head.getAs[String]("text") === anyText) // self-retrieval
  }

  test("JSONL source: PERMISSIVE skips malformed lines, limit applies (S3)") {
    val dir = Files.createTempDirectory("graft-jsonl")
    val f = dir.resolve("t.jsonl")
    val good = (0 until 5).map(i =>
      s"""{"conv_id":"c1","turn_idx":$i,"role":"user","text":"turn $i","tool":"","ts":"2024-01-01T00:0$i:00.000Z"}""")
    val bad = Seq("""{"conv_id": BROKEN""", """not json at all""")
    java.nio.file.Files.write(f, (good.take(3) ++ bad ++ good.drop(3)).mkString("\n").getBytes)
    val turns = JsonlSource.readTranscripts(spark, f.toString)
    assert(turns.count() === 5)
    assert(JsonlSource.corruptCount(spark, f.toString) === 2)
    assert(JsonlSource.readTranscripts(spark, f.toString, limit = Some(2)).count() === 2)
    // and the loaded turns run through the pipeline
    val turnsWithText = turns.map(t => t.copy(text =
      "Apex Systems Inc acquired Nova Robotics Ltd in 2019. filler to pass the minimum length."))
    val triples = Ingest.runInMemory(spark, turnsWithText).triples
    assert(triples.count() > 0)
  }

  test("JSONL sink: write → read round-trip is lossless (S3 write side)") {
    val dir = Files.createTempDirectory("graft-jsonl-sink").resolve("turns").toString
    val turns = graft.synth.TranscriptGen.transcripts(spark,
      graft.synth.TranscriptGen.Config(numConvs = 3, turnsPerConv = 12, skew = 2))
    JsonlSource.writeJsonl(turns.toDF(), dir)
    val back = JsonlSource.readTranscripts(spark, dir)
      .orderBy($"conv_id", $"turn_idx").collect()
    val orig = turns.orderBy($"conv_id", $"turn_idx").collect()
    assert(back.length === orig.length && back.nonEmpty)
    back.zip(orig).foreach { case (a, b) => assert(a === b) }
  }
}

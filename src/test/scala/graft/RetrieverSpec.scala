package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Ingest
import graft.query.Retriever
import graft.synth.TranscriptGen

class RetrieverSpec extends SparkSpec {
  import spark.implicits._

  private lazy val facts = {
    val turns = TranscriptGen.transcripts(spark,
      TranscriptGen.Config(numConvs = 6, turnsPerConv = 25, skew = 3))
    val triples = Ingest.runInMemory(spark, turns).triples
    Retriever.withFactEmbeddings(triples).cache()
  }

  test("keyword extraction drops stop words (researcher.py:72-102)") {
    assert(Retriever.extractKeywords("What happened to wages in Boston?") ===
      Seq("happened", "wages", "boston"))
    assert(Retriever.extractKeywords("the of and") === Seq.empty)
  }

  test("scoped retrieval returns only facts incident to the entity (J8)") {
    val e = facts.select($"subject_uuid").first().getString(0)
    val res = Retriever.scopedSearch(facts, e, "acquisitions and investments")
    val rows = res.select($"fact_uuid").collect().map(_.getString(0)).toSet
    val incident = facts.filter($"subject_uuid" === e || $"object_uuid" === e)
      .select($"fact_uuid").collect().map(_.getString(0)).toSet
    assert(rows.subsetOf(incident))
  }

  test("global search self-retrieves a fact's own text as top hit") {
    val f = facts.select($"fact").first().getString(0)
    val top = Retriever.globalSearch(facts, f).select($"fact").first().getString(0)
    assert(top === f)
  }

  test("cross-source boost adds 0.15 per extra source (A7)") {
    val rows = Seq(
      ("f1", 0.9, "global", "t1"), ("f1", 0.7, "scoped", "t1"),
      ("f2", 0.9, "global", "t2")).toDF("fact_uuid", "score", "source", "fact")
    val out = Retriever.thresholdAndBoost(rows).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("final_score")).toMap
    assert(math.abs(out("f1") - 1.05) < 1e-9)
    assert(math.abs(out("f2") - 0.9) < 1e-9)
  }

  test("threshold drops below-0.65 facts (P4)") {
    val rows = Seq(
      ("f1", 0.64, "global", "t"), ("f2", 0.66, "global", "t"))
      .toDF("fact_uuid", "score", "source", "fact")
    val out = Retriever.thresholdAndBoost(rows).collect().map(_.getString(0)).toSet
    assert(out === Set("f2"))
  }

  test("BM25 keyword scoring: rare term outranks common term where overlap-count ties (F-BM25)") {
    // keywords {boston, wages}: df(wages)=1 (rare), df(boston)=8 (common).
    // Overlap count ties f0..f8 at 1 and the uuid tie-break would put f0
    // (a boston doc) first; BM25 must rank the wages doc on top instead.
    val docs = (0 until 8).map(i =>
      (s"f$i", s"city council met in boston district $i about zoning")) :+
      ("f9", "report on wages and employment published this quarter")
    val facts = docs.toDF("fact_uuid", "fact")
    val out = Retriever.keywordSearch(facts, "What happened to wages in Boston?", topK = 5)
      .collect()
    assert(out.head.getString(0) === "f9", out.map(_.getString(0)).mkString(","))
    assert(out.map(_.getAs[Double]("score")).forall(_ > 0))
  }

  test("BM25 with a materialized term-df index scores identically to the inline path") {
    val docs = (0 until 8).map(i =>
      (s"f$i", s"city council met in boston district $i about zoning")) :+
      ("f9", "report on wages and employment published this quarter")
    val facts = docs.toDF("fact_uuid", "fact")
    val stats = Retriever.bm25Stats(facts)
    val q = "What happened to wages in Boston?"
    val inline = Retriever.keywordSearch(facts, q, topK = 5).collect()
      .map(r => (r.getString(0), r.getAs[Double]("score")))
    val indexed = Retriever.keywordSearch(facts, q, topK = 5, stats = Some(stats)).collect()
      .map(r => (r.getString(0), r.getAs[Double]("score")))
    assert(inline.toSeq === indexed.toSeq)
  }

  test("BM25 TF saturation: repeating a term gains sublinearly (k1 bound)") {
    val docs = Seq(
      ("a", "wages wages wages wages wages and other filler words here"),
      ("b", "wages and other filler words here now too")).toDF("fact_uuid", "fact")
    val out = Retriever.keywordSearch(docs, "wages", topK = 5).collect()
      .map(r => r.getString(0) -> r.getAs[Double]("score")).toMap
    assert(out("a") > out("b")) // more occurrences still rank higher
    assert(out("a") < out("b") * (1.2 + 1)) // but bounded by (k1+1)× saturation
  }

  test("RRF fusion: rank 1 in two strategies beats rank 1 in one (A8)") {
    val rows = Seq(
      ("a", 0.9, "vector"), ("b", 0.8, "vector"),
      ("a", 5.0, "keyword"), ("c", 4.0, "keyword"))
      .toDF("fact_uuid", "score", "source")
    val out = Retriever.rrfFuse(rows, topK = 10).collect()
    assert(out.head.getString(0) === "a")
    val aScore = out.head.getAs[Double]("rrf_score")
    assert(math.abs(aScore - 2.0 / 61.0) < 1e-12)
  }

  test("end-to-end search returns topK fused results with found_by provenance") {
    val out = Retriever.search(facts, "Quantum Dynamics acquisitions", Seq.empty, topK = 5)
    assert(out.count() <= 5 && out.count() > 0)
    assert(out.columns.toSeq === Seq("fact_uuid", "rrf_score", "found_by"))
  }

  test("index-served search: full probe reproduces brute-force search exactly; pruned probe subsets it") {
    val (cents, assigned) = graft.ops.Similarity.buildIvfIndex(facts,
      nCentroids = 6, kmeansIters = 1, idCol = "fact_uuid", vecCol = "embedding")
    val q = "Quantum Dynamics acquisitions"
    def rows(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), BigDecimal(r.getDouble(1)).setScale(9, BigDecimal.RoundingMode.HALF_UP))).toSeq
    val brute = rows(Retriever.search(facts, q, Seq.empty, topK = 5))
    val fullProbe = rows(Retriever.searchIndexed(facts, cents, assigned, q,
      Seq.empty, topK = 5, nprobe = 6))
    assert(fullProbe === brute)
    // pruned probe: every emitted (fact, score) matches the brute-force
    // scoring of that same fact exactly (approximation is in recall only)
    val bruteScores = Retriever.globalSearch(facts, q, Retriever.Config(globalTopK = Int.MaxValue))
      .select("fact_uuid", "score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    val pruned = Retriever.globalSearchIndexed(cents, assigned, q, nprobe = 2)
      .select("fact_uuid", "score").collect()
      .map(r => r.getString(0) -> r.getDouble(1))
    assert(pruned.nonEmpty)
    pruned.foreach { case (id, s) => assert(bruteScores(id) === s, id) }
  }

  test("1-hop expansion has fixed score 0.45 (v6/graph_store.py:549-602)") {
    val e = facts.select($"subject_uuid").first().getString(0)
    val out = Retriever.expandOneHop(facts, Seq(e), maxFacts = 10)
    assert(out.select($"score").distinct().collect().map(_.getDouble(0)).toSeq === Seq(0.45))
  }

  test("query→entity traversal resolves over the NAME-ONLY vector, keyword fallback") {
    import graft.functions.Embed
    val entities = Seq(
      ("e1", "Granite Foods", Embed.embed("Granite Foods").toSeq),
      ("e2", "Vertex Capital", Embed.embed("Vertex Capital").toSeq))
      .toDF("entity_uuid", "canonical_name", "embedding")
    // the query IS an entity name → vector path (cosine 1.0 > 0.5, top 5)
    assert(Retriever.resolveQueryEntities(entities, "Granite Foods") === Seq("e1"))
    // vector miss (orthogonal hash vectors) but a name keyword appears in
    // the query → full-text fallback (deterministic_retrieval.py:303-313)
    val viaKeyword = Retriever.resolveQueryEntities(entities,
      "latest disclosures involving vertex subsidiaries")
    assert(viaKeyword === Seq("e2"), s"keyword fallback must hit e2: $viaKeyword")
  }

  test("searchAuto derives graph anchors from the query (Strategy 3 end-to-end)") {
    val row = facts.select($"subject", $"subject_uuid", $"fact").first()
    val entities = Seq((row.getString(1), row.getString(0),
        graft.functions.Embed.embed(row.getString(0)).toSeq))
      .toDF("entity_uuid", "canonical_name", "embedding")
    // query = the anchor entity's name: the graph path must contribute
    // (found_by includes "graph") without the caller passing anchors
    val out = Retriever.searchAuto(facts, entities, row.getString(0), topK = 10).collect()
    assert(out.nonEmpty)
    assert(out.exists(_.getAs[scala.collection.Seq[String]]("found_by").contains("graph")),
      s"graph strategy must fire from auto-resolved anchors: ${out.mkString(";")}")
  }
}

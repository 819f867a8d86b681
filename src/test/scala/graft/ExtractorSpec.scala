package graft

import java.sql.Timestamp

import graft.chunk.TurnChunker
import graft.extract.TripleExtractor
import graft.model.{Chunk, Turn}

class ExtractorSpec extends SparkSpec {
  import spark.implicits._

  private def chunk(text: String, id: String = "c1"): Chunk =
    Chunk(s"${id}_chunk_0001", s"uuid-$id", id, 0, 0, text, "user", "default",
      new Timestamp(1704067200000L))

  private def extract(text: String) =
    TripleExtractor.extract(spark, Seq(chunk(text)).toDS()).collect().toSeq

  test("acquisition pattern with date context") {
    val ts = extract("Quantum Dynamics Inc. acquired Apex Systems in 2014. see notes.")
    assert(ts.size === 1)
    val t = ts.head
    assert(t.subject === "Quantum Dynamics Inc.")
    assert(t.`object` === "Apex Systems")
    assert(t.relationship === "acquired")
    assert(t.date_context === "in 2014")
    assert(t.topics.isEmpty)
  }

  test("CEO pattern types subject as Person") {
    val ts = extract("user\nMary Chen is the CEO of Stellar Networks Corp.")
    assert(ts.size === 1)
    assert(ts.head.subject === "Mary Chen")
    assert(ts.head.subject_type === "Person")
    assert(ts.head.object_type === "Organization")
  }

  test("partnership with topic attaches topic, HQ types object as Location") {
    val ts = extract(
      "Nova Energy Ltd. partnered with Atlas Media regarding Cloud Computing. " +
        "Vertex Capital is headquartered in Geneva.")
    assert(ts.size === 2)
    val p = ts.find(_.relationship == "partnered with").get
    assert(p.topics === Seq("Cloud Computing"))
    val h = ts.find(_.relationship == "is headquartered in").get
    assert(h.`object` === "Geneva")
    assert(h.object_type === "Location")
  }

  test("noise and lowercase sentences extract nothing") {
    assert(extract("the team reviewed the logs and found no issues.").isEmpty)
    assert(extract("ok, sounds good. let me check the docs.").isEmpty)
  }

  test("exclusion rules: URLs/amounts/dates are not entities (extractor_v2.py:108-116)") {
    assert(TripleExtractor.validEntity("Apple Inc."))
    assert(!TripleExtractor.validEntity("https://example.com"))
    assert(!TripleExtractor.validEntity("$7.5"))
    assert(!TripleExtractor.validEntity("2024-01-01"))
    assert(!TripleExtractor.validEntity("42"))
  }

  test("extractFused == extract(chunk(turns)): row-identical, on sorted AND arbitrary layouts") {
    import graft.synth.TranscriptGen
    val cfg = TranscriptGen.Config(numConvs = 8, turnsPerConv = 40, skew = 4)
    val sorted = TranscriptGen.transcripts(spark, cfg)
      .repartition(4, $"conv_id").sortWithinPartitions("conv_id", "turn_idx")
      .as[Turn]
    val viaChunks = TripleExtractor.extract(spark,
      TurnChunker.chunk(spark, sorted, TurnChunker.Config(sortedInput = true)))
      .collect().toSet
    assert(viaChunks.nonEmpty)
    assert(TripleExtractor.extractFused(spark, sorted).collect().toSet === viaChunks)
    // the fused path has NO layout requirement — per-turn independent
    val shuffled = TranscriptGen.transcripts(spark, cfg).repartition(7).as[Turn]
    assert(TripleExtractor.extractFused(spark, shuffled).collect().toSet === viaChunks)
  }

  test("control-whitespace gate parity: windowed == sorted == fused on \\n/\\t-padded turns") {
    // '\n---' separators and tab padding: Java String.trim (sorted/fused) and
    // the windowed SQL gate must agree char-for-char (all use chars <= 0x20)
    val fact = "Quantum Dynamics Inc. acquired Apex Systems in 2014. extra padding text here."
    val ts0 = new Timestamp(1704067200000L)
    val turns = Seq(
      Turn("cws", 0, "user", "\n--- separator line padded out to minChars length ---\n", null, ts0),
      Turn("cws", 1, "user", "\t\t" + fact + "\n", null, ts0),
      Turn("cws", 2, "user", "\n\n" + fact, null, ts0),
      Turn("cws", 3, "user", " \t \n ", null, ts0)).toDS()
    val sortedLayout = turns.repartition(1, $"conv_id").sortWithinPartitions("conv_id", "turn_idx").as[Turn]
    val windowed = TripleExtractor.extract(spark,
      TurnChunker.chunk(spark, turns)).collect().toSet
    val viaSorted = TripleExtractor.extract(spark,
      TurnChunker.chunk(spark, sortedLayout, TurnChunker.Config(sortedInput = true)))
      .collect().toSet
    val fused = TripleExtractor.extractFused(spark, turns).collect().toSet
    assert(windowed.map(_.turn_idx) === Set(1, 2), "turn 0 is a ---separator, turn 3 blank")
    assert(viaSorted === windowed)
    assert(fused === windowed)
  }

  test("mentions exclude topic-typed names and carry first-occurrence info") {
    val chunks = Seq(chunk("Nova Energy Ltd. partnered with Atlas Media regarding Inflation.")).toDS()
    val raw = TripleExtractor.extract(spark, chunks)
    val ms = TripleExtractor.mentions(spark, raw).collect()
    assert(ms.map(_.name).sorted.toSeq === Seq("Atlas Media", "Nova Energy Ltd."))
    assert(ms.forall(_.summary.endsWith("is an entity observed in transcripts.")))
  }
}

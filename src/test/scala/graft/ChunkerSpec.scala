package graft

import java.sql.Timestamp

import graft.chunk.TurnChunker
import graft.model.Turn
import graft.synth.TranscriptGen

class ChunkerSpec extends SparkSpec {
  import spark.implicits._

  private def turn(conv: String, idx: Int, text: String, role: String = "user",
      tool: String = ""): Turn =
    Turn(conv, idx, role, text, tool, new Timestamp(1704067200000L + idx * 60000L))

  private val longA = "this is a sufficiently long paragraph of conversation text to keep."
  private val longB = "another sufficiently long paragraph that also clears the threshold."

  test("drops short (<50 chars), null, and '---' bodies (markdown_chunker.py:60-67)") {
    val turns = Seq(
      turn("c1", 0, longA),
      turn("c1", 1, "too short"),
      turn("c1", 2, null),
      turn("c1", 3, "--- " + longB), // starts with --- → dropped
      turn("c1", 4, longB)).toDS()
    val chunks = TurnChunker.chunk(spark, turns).collect()
    assert(chunks.map(_.window_end).sorted.toSeq === Seq(0, 4))
  }

  test("chunk ids number EMITTED chunks %04d (markdown_chunker.py:70-79)") {
    val turns = Seq(
      turn("c1", 0, "short"),
      turn("c1", 1, longA),
      turn("c1", 2, longB)).toDS()
    val chunks = TurnChunker.chunk(spark, turns).collect().sortBy(_.window_end)
    assert(chunks.map(_.chunk_id).toSeq === Seq("c1_chunk_0001", "c1_chunk_0002"))
  }

  test("chunk uuid = uuid5(group, doc_uuid, idx:i) (pipeline.py:1272-1276)") {
    val turns = Seq(turn("c9", 7, longA)).toDS()
    val c = TurnChunker.chunk(spark, turns).collect().head
    val docUuid = graft.functions.Ids.stableUuid("default", "c9")
    assert(c.chunk_uuid === graft.functions.Ids.stableUuid("default", docUuid, "idx:7"))
  }

  test("role/tool header context is prepended when missing (pipeline.py:67-99)") {
    val turns = Seq(
      turn("c1", 0, longA, role = "assistant"),
      turn("c1", 1, longB, role = "tool", tool = "search")).toDS()
    val chunks = TurnChunker.chunk(spark, turns).collect().sortBy(_.window_end)
    assert(chunks(0).header_path === "assistant")
    assert(chunks(0).text === s"assistant\n$longA")
    assert(chunks(1).header_path === "tool > search")
    assert(chunks(1).text === s"tool\nsearch\n$longB")
  }

  test("sliding window of 3 concatenates trailing context") {
    val turns = (0 to 3).map(i => turn("c1", i, s"turn number $i " + longA)).toDS()
    val chunks = TurnChunker.chunk(spark, turns, TurnChunker.Config(windowSize = 3))
      .collect().sortBy(_.window_end)
    assert(chunks(3).window_start === 1)
    assert(chunks(3).text.contains("turn number 1") && chunks(3).text.contains("turn number 3"))
    assert(!chunks(3).text.contains("turn number 0"))
    assert(chunks(0).window_start === 0)
  }

  test("property: every long turn appears in exactly one window-1 chunk; ordering stable") {
    val cfg = TranscriptGen.Config(numConvs = 5, turnsPerConv = 30, skew = 3)
    val turns = TranscriptGen.transcripts(spark, cfg).cache()
    val longTurns = turns.filter(t => t.text != null && t.text.trim.length >= 50)
    val chunks = TurnChunker.chunk(spark, turns).cache()
    assert(chunks.count() === longTurns.count())
    // (conv, window_end) is unique and chunk numbering is dense per conv
    val perConv = chunks.groupByKey(_.conv_id).mapGroups { (c, it) =>
      val s = it.toSeq.sortBy(_.window_end)
      val dense = s.zipWithIndex.forall { case (ch, i) =>
        ch.chunk_id == f"${c}_chunk_${i + 1}%04d"
      }
      (c, dense)
    }.collect()
    assert(perConv.forall(_._2), "chunk numbering must be dense and ordered per conv")
  }
}

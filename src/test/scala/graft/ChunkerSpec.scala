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

  test("chunk uuid = uuid5(group, document_name, idx:i) (pipeline.py:1272-1276)") {
    // conv_id plays the document_name role; NO intermediate doc-uuid hash
    val turns = Seq(turn("c9", 7, longA)).toDS()
    val c = TurnChunker.chunk(spark, turns).collect().head
    assert(c.chunk_uuid === graft.functions.Ids.stableUuid("default", "c9", "idx:7"))
  }

  test("W2: tool banner inherits to later turns until replaced (markdown_chunker.py:41-49)") {
    val turns = Seq(
      turn("c1", 0, longA, role = "user"),
      turn("c1", 1, longB, role = "tool", tool = "search"),
      turn("c1", 2, "a further long paragraph continuing the same conversation thread.", role = "user"),
      turn("c1", 3, longA + " more", role = "tool", tool = "calc"),
      turn("c1", 4, longB + " more", role = "assistant")).toDS()
    val chunks = TurnChunker.chunk(spark, turns).collect().sortBy(_.window_end)
    assert(chunks(0).header_path === "user") // no banner seen yet
    assert(chunks(1).header_path === "tool > search")
    assert(chunks(2).header_path === "user > search") // inherited
    assert(chunks(3).header_path === "tool > calc") // replaced
    assert(chunks(4).header_path === "assistant > calc") // inherited again
  }

  test("markdown header stack: push/pop across levels (markdown_chunker.py:41-49)") {
    val cfg = TurnChunker.Config(markdownHeaders = true)
    val turns = Seq(
      turn("c1", 0, "# Title\n" + longA),
      turn("c1", 1, "## Methods\n" + longB),
      turn("c1", 2, "### Detail\n" + longA),
      turn("c1", 3, "## Results\n" + longB), // pops Methods AND Detail
      turn("c1", 4, longA), // no header → inherits
      turn("c1", 5, "# Part Two\n" + longB)).toDS() // pops everything
    val chunks = TurnChunker.chunk(spark, turns, cfg).collect().sortBy(_.window_end)
    assert(chunks(0).header_path === "user > Title")
    assert(chunks(1).header_path === "user > Title > Methods")
    assert(chunks(2).header_path === "user > Title > Methods > Detail")
    assert(chunks(3).header_path === "user > Title > Results")
    assert(chunks(4).header_path === "user > Title > Results")
    assert(chunks(5).header_path === "user > Part Two")
  }

  test("markdown header stack: multiple headers inside one turn, last-per-level wins") {
    val cfg = TurnChunker.Config(markdownHeaders = true)
    val turns = Seq(
      turn("c1", 0, "# A\n## B\n" + longA + "\n## C\n" + longB),
      turn("c1", 1, longA)).toDS()
    val chunks = TurnChunker.chunk(spark, turns, cfg).collect().sortBy(_.window_end)
    assert(chunks(0).header_path === "user > A > C")
    assert(chunks(1).header_path === "user > A > C")
  }

  test("markdown header stack works with windowSize > 1 (hslots feeds the w>1 stats)") {
    val cfg = TurnChunker.Config(windowSize = 2, markdownHeaders = true)
    val turns = Seq(
      turn("c1", 0, "# Title\n" + longA),
      turn("c1", 1, longB),
      turn("c1", 2, "## Sec\n" + longA)).toDS()
    val chunks = TurnChunker.chunk(spark, turns, cfg).collect().sortBy(_.window_end)
    assert(chunks.nonEmpty)
    assert(chunks.last.header_path === "user > Title > Sec")
  }

  test("markdown header stack inherits across salt boundaries; parity with unsalted") {
    val mk = (i: Int) => i match {
      case 0 => "# Root\n" + longA
      case 3 => "## Sec\n" + longB
      case 7 => "# Next\n" + longA
      case n => s"turn $n body long enough to clear the fifty character floor easily."
    }
    val turns = (0 until 12).map(i => turn("c1", i, mk(i))).toDS()
    val salted = TurnChunker.chunk(spark, turns,
      TurnChunker.Config(markdownHeaders = true, saltTurns = 3)).collect()
      .sortBy(c => (c.conv_id, c.window_end))
    val plain = TurnChunker.chunk(spark, turns,
      TurnChunker.Config(markdownHeaders = true)).collect()
      .sortBy(c => (c.conv_id, c.window_end))
    assert(salted.map(_.header_path).toSeq === plain.map(_.header_path).toSeq)
    assert(salted.map(_.text).toSeq === plain.map(_.text).toSeq)
    assert(plain(4).header_path === "user > Root > Sec") // mid-stream inherit
    assert(plain(8).header_path === "user > Next") // level-1 pop crosses salts
  }

  test("sortedInput fast path: full-row parity with the windowed path (convs span scan partitions)") {
    // every feature at once: tool banners, markdown headers, date strings,
    // short turns, '---' rules, blank turns — over 3 manual slices with
    // conversations spanning slice boundaries (split-of-a-sorted-file shape)
    val mk = (c: String, i: Int) => {
      val base = i match {
        case 0 => s"# Top $c\nconversation opener long enough to clear the fifty char floor."
        case 2 => "short"
        case 3 => "--- " + longA
        case 4 => null
        case 5 => s"## Sec $c\nmeeting scheduled on 2024-03-1$i " + longB
        case 9 => longA + " wrapping up on 2024-12-01."
        case n => s"turn $n of $c body long enough to clear the fifty character floor ok."
      }
      turn(c, i, base, role = if (i % 3 == 0) "user" else "assistant",
        tool = if (i % 4 == 1) s"tool$i" else "")
    }
    val rows = (for (c <- Seq("ca", "cb", "cc"); i <- 0 until 10) yield mk(c, i))
      // a null ts mid-conversation: min($"ts") ignores it on the windowed
      // path and the sorted scan must tolerate it identically
      .map(t => if (t.conv_id == "cb" && t.turn_idx == 6) t.copy(ts = null) else t)
    // 3 slices of 10 → cb spans slices 1-2, cc spans 2-3
    val ds = spark.createDataset(spark.sparkContext.parallelize(rows, 3))
    for (md <- Seq(false, true)) {
      val cfg = TurnChunker.Config(markdownHeaders = md)
      val sorted = TurnChunker.chunk(spark, ds, cfg.copy(sortedInput = true))
        .collect().sortBy(c => (c.conv_id, c.window_end)).toSeq
      val windowed = TurnChunker.chunk(spark, ds, cfg)
        .collect().sortBy(c => (c.conv_id, c.window_end)).toSeq
      assert(sorted === windowed, s"markdownHeaders=$md")
      assert(sorted.nonEmpty)
    }
  }

  test("sortedInput layout violations fail fast (descending idx; split conversation)") {
    val bad1 = spark.createDataset(spark.sparkContext.parallelize(
      Seq(turn("c1", 1, longA), turn("c1", 0, longB)), 1))
    val e1 = intercept[org.apache.spark.SparkException] {
      TurnChunker.chunk(spark, bad1, TurnChunker.Config(sortedInput = true)).collect()
    }
    assert(e1.getMessage.contains("layout violation") ||
      e1.getCause.getMessage.contains("layout violation"))
    val bad2 = spark.createDataset(spark.sparkContext.parallelize(
      Seq(turn("c1", 0, longA), turn("c2", 0, longB), turn("c1", 1, longA)), 1))
    val e2 = intercept[org.apache.spark.SparkException] {
      TurnChunker.chunk(spark, bad2, TurnChunker.Config(sortedInput = true)).collect()
    }
    assert(e2.getMessage.contains("layout violation") ||
      e2.getCause.getMessage.contains("layout violation"))
  }

  test("W2 inheritance crosses salt sub-window boundaries") {
    val turns = (Seq(turn("c1", 0, longA, role = "tool", tool = "search")) ++
      (1 to 12).map(i => turn("c1", i, s"turn $i $longA"))).toDS()
    val salted = TurnChunker.chunk(spark, turns, TurnChunker.Config(saltTurns = 4))
      .collect().sortBy(_.window_end)
    assert(salted.last.header_path === "user > search",
      "carry_tool must survive the (conv, salt) boundary")
  }

  test("W3+F7: document_date from head/tail chunk text, min(ts) fallback (pipeline.py:1342-1355)") {
    val dated = Seq(
      turn("c1", 0, "the quarterly report dated 2024-03 was circulated to the team for review."),
      turn("c1", 1, longA),
      turn("c2", 0, longB),
      turn("c2", 1, longA)).toDS()
    val byConv = TurnChunker.chunk(spark, dated).collect().groupBy(_.conv_id)
    val expected = new java.sql.Timestamp(java.time.LocalDate.of(2024, 3, 1)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    assert(byConv("c1").map(_.document_date).distinct.toSeq === Seq(expected))
    // no parseable date in c2 → min(ts) over the conversation
    assert(byConv("c2").map(_.document_date).distinct.toSeq ===
      Seq(new java.sql.Timestamp(1704067200000L)))
  }

  test("W3: a date only mid-conversation is NOT picked (chunks[:6]/chunks[-6:] scan)") {
    // 15 emitted chunks; the only date sits at emitted position 8 — outside
    // both the head-6 and the tail-6 → reference falls back (min ts here)
    val mid = (0 until 15).map { i =>
      val text =
        if (i == 7) "the memo dated 2023-05-04 was only mentioned here mid-thread, nowhere else."
        else s"turn number $i $longA"
      turn("c1", i, text)
    }.toDS()
    assert(TurnChunker.chunk(spark, mid).collect().map(_.document_date).distinct.toSeq ===
      Seq(new Timestamp(1704067200000L)))
    // the same date within the LAST 6 emitted chunks IS picked — also under
    // salting (cross-group head/tail reconciliation)
    val tail = (0 until 15).map { i =>
      val text =
        if (i == 12) "the memo dated 2023-05-04 was circulated near the end of the thread."
        else s"turn number $i $longA"
      turn("c1", i, text)
    }.toDS()
    val expected = new Timestamp(java.time.LocalDate.of(2023, 5, 4)
      .atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli)
    for (salt <- Seq(1000000, 4)) {
      val got = TurnChunker.chunk(spark, tail, TurnChunker.Config(saltTurns = salt))
        .collect().map(_.document_date).distinct.toSeq
      assert(got === Seq(expected), s"saltTurns=$salt")
    }
  }

  test("salted sub-windows produce byte-identical output to unsalted (skew path)") {
    // 90 turns incl. short/null gaps and tool turns; windowSize 3 exercises
    // the cross-boundary prev-tail prefix, saltTurns 7 forces many boundaries
    val turns = (0 until 90).map { i =>
      val text =
        if (i % 11 == 5) "short" // dropped by min-length
        else if (i % 17 == 9) null // dropped by null filter
        else s"turn number $i " + longA
      turn("c1", i, text, role = if (i % 3 == 0) "tool" else "user",
        tool = if (i % 3 == 0) s"t${i / 30}" else "")
    }.toDS()
    for (w <- Seq(1, 3)) {
      val cfgSalted = TurnChunker.Config(windowSize = w, saltTurns = 7)
      val cfgPlain = TurnChunker.Config(windowSize = w, saltTurns = 1000000)
      val a = TurnChunker.chunk(spark, turns, cfgSalted).collect().sortBy(_.window_end)
      val b = TurnChunker.chunk(spark, turns, cfgPlain).collect().sortBy(_.window_end)
      assert(a.length === b.length, s"windowSize=$w")
      a.zip(b).foreach { case (x, y) => assert(x === y, s"windowSize=$w") }
    }
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

  test("skew balance: a 100x-skewed conversation splits into bounded (conv, salt) groups") {
    // conv 0 is 100× the others (north-star pathological case). With salting,
    // no single window task owns the whole conversation: every (conv_id, salt)
    // group is bounded by saltTurns, and conv 0 spans many groups.
    val cfg = TranscriptGen.Config(numConvs = 4, turnsPerConv = 20, skew = 100)
    val turns = TranscriptGen.transcripts(spark, cfg)
    val saltTurns = 128
    val chunks = TurnChunker.chunk(spark, turns, TurnChunker.Config(saltTurns = saltTurns))
    val groups = chunks.groupByKey(c => (c.conv_id, c.window_end / saltTurns))
      .count().collect()
    assert(groups.map(_._2).max <= saltTurns,
      "no (conv, salt) group may exceed the salt bound")
    val conv0Groups = groups.count(_._1._1 == "conv00000")
    assert(conv0Groups >= cfg.conv0Turns / saltTurns,
      s"the hot conversation must fan out across groups (got $conv0Groups)")
    // and the output is still the correct dense numbering end-to-end
    val conv0 = chunks.filter(_.conv_id == "conv00000").collect().sortBy(_.window_end)
    assert(conv0.zipWithIndex.forall { case (c, i) =>
      c.chunk_id == f"conv00000_chunk_${i + 1}%04d" })
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

  test("preferSorted: balanced corpus takes the sorted path, a pathological conversation falls back") {
    // 50 conversations × 20 turns: max share = 2% ≤ 5% threshold
    val balanced = (for (c <- 0 until 50; i <- 0 until 20)
      yield turn(f"c$c%03d", i, longA)).toDS()
    val (useB, fracB) = TurnChunker.preferSorted(balanced)
    assert(useB && math.abs(fracB - 0.02) < 1e-9, s"($useB, $fracB)")

    // one conversation holding 40% of the corpus starves the layout-bound
    // sorted path (BASELINE.md extreme-skew A/B) → windowed
    val skewed = ((for (i <- 0 until 400) yield turn("giant", i, longA)) ++
      (for (c <- 0 until 30; i <- 0 until 20) yield turn(f"c$c%03d", i, longA))).toDS()
    val (useS, fracS) = TurnChunker.preferSorted(skewed)
    assert(!useS && math.abs(fracS - 0.4) < 1e-9, s"($useS, $fracS)")

    // the crossover threshold is caller-tunable
    assert(TurnChunker.preferSorted(skewed, threshold = 0.5)._1)
    // empty input: nothing to skew
    assert(TurnChunker.preferSorted(spark.emptyDataset[Turn])._1)
  }
}

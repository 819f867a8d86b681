package graft.chunk

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.{Ids, Norm}
import graft.model.{Chunk, Turn}

/** Sliding-window turn-chunker (SURVEY.md §2.1 S2, §2.5 W1-W3).
  *
  * Reference semantics (/root/reference/src/chunker/markdown_chunker.py:21-135
  * and /root/reference/src/pipeline.py:1244-1285):
  *  - paragraphs shorter than 50 chars and "---" rules are dropped (:60-67);
  *  - chunk ids number the *emitted* chunks: `{doc}_chunk_{n:04d}` (:70-79);
  *  - each chunk inherits the running header stack — headers seen on EARLIER
  *    lines keep applying until replaced (markdown_chunker.py:41-49). The
  *    transcript analogue: a turn's `tool` banner persists as the sticky
  *    sub-header under the per-turn `role` until the next tool turn replaces
  *    it; headers not already present in the body are prepended
  *    (pipeline.py:67-99);
  *  - chunk uuid = uuid5(group, document_name, "idx:{i}") over the original
  *    line index (pipeline.py:1272-1276) — conv_id plays the document_name
  *    role, with NO intermediate document-uuid hash;
  *  - document_date: the reference scans the first/last few chunks for a
  *    parseable date and falls back when none parses (pipeline.py:1342-1355,
  *    temporal_extractor.py:104-123). Here: first ISO-like date string
  *    (YYYY-MM-DD / YYYY-MM) found WITHIN the conversation's first-6 then
  *    last-6 emitted chunks (by emitted position, matching the reference's
  *    chunks[:6]/chunks[-6:] scan — a date appearing only mid-conversation is
  *    ignored), parsed leniently (Norm.parseDateLenient), falling back to
  *    min(ts) over the conversation.
  *
  * Spark shape — built for the north star's long-conversation skew: rows are
  * windowed over (conv_id, salt) where salt = turn_idx / saltTurns, so one
  * pathological 10^9-turn conversation becomes many bounded tasks instead of
  * one straggler. Everything per-conversation (chunk numbering offsets,
  * inherited tool banner, document date, min ts, cross-boundary text context
  * for windowSize > 1) is reconciled through a per-(conv_id, salt) GROUP
  * STATS table — ~totalTurns/saltTurns rows, i.e. 4-5 orders of magnitude
  * smaller than the turn stream. For the windowSize == 1 default the stats
  * come from ONE extra narrow scan + hash aggregate of the input (measured
  * cheaper than re-sorting the window shuffle a second time; BASELINE.md),
  * and the join back on (conv_id, salt) broadcasts when the stats table fits
  * (locally always) or sort-merges on the salted — hence balanced — key
  * otherwise. windowSize > 1 adds one more small-table round-trip because
  * chunk numbering then depends on cross-boundary bodies.
  *
  * Boundary-context bound (windowSize > 1 only): the trailing text window
  * reaches at most ONE sub-window back (the previous group's last
  * windowSize-1 kept turns). With saltTurns ≥ 64 × windowSize this is exact
  * unless a sub-window holds fewer than windowSize-1 non-empty turns.
  */
object TurnChunker {

  case class Config(
      windowSize: Int = 1, // turns per chunk (sliding, trailing)
      minChars: Int = 50,
      groupId: String = "default",
      saltTurns: Int = 65536, // sub-window length (long-conversation salting)
      markdownHeaders: Boolean = false, // full #-level header stack (S2/W2)
      sortedInput: Boolean = false) // storage-ordered fast path (no shuffle)

  /** Levels tracked by the markdown header stack (reference supports the full
    * `#`..`######` range, markdown_chunker.py:41-49).
    */
  private val HeaderLevels = 6

  /** Java String.trim character set (every char ≤ U+0020) for SQL-side trims:
    * keeps the windowed gate byte-consistent with the sorted/fused paths'
    * String.trim and the reference's Python str.strip on ASCII whitespace.
    */
  private val JavaWs: String = (0 to 0x20).map(_.toChar).mkString

  /** Per-turn header-stack summary: element k-1 describes the turn's effect
    * on stack level k — null (turn has no header of level ≤ k: level k is
    * untouched), "" (turn's last header of level ≤ k is SHALLOWER than k:
    * level k was popped), or the header text (turn's last header of level ≤ k
    * is exactly k: level k was pushed). Encoding per-turn effects this way
    * makes the cross-turn combine a per-level last-non-null — the same
    * associative shape as the sticky tool banner, so it rides the existing
    * running window + group-stats carry. Matches the reference's pop-then-push
    * (markdown_chunker.py:41-49): a level-k header invalidates all deeper
    * levels.
    */
  private def headerSlots(text: String): Seq[String] = {
    var events = List.empty[(Int, String)] // reverse order: latest first
    var i = 0
    val n = text.length
    while (i < n) {
      val eol0 = text.indexOf('\n', i)
      val eol = if (eol0 < 0) n else eol0
      if (i < n && text.charAt(i) == '#') {
        var lvl = 0
        while (i + lvl < eol && text.charAt(i + lvl) == '#') lvl += 1
        if (lvl <= HeaderLevels && i + lvl < eol && text.charAt(i + lvl) == ' ') {
          val h = text.substring(i + lvl + 1, eol).trim
          if (h.nonEmpty) events = (lvl, h) :: events
        }
      }
      i = eol + 1
    }
    if (events.isEmpty) null
    else (1 to HeaderLevels).map { k =>
      events.find(_._1 <= k) match {
        case Some((lvl, h)) => if (lvl == k) h else ""
        case None => null
      }
    }
  }

  private val headerSlotsUdf = udf { (text: String) => headerSlots(text) }

  private val chunkUuidUdf = udf { (groupId: String, convId: String, turnIdx: Int) =>
    Ids.stableUuid(groupId, convId, s"idx:$turnIdx")
  }
  private val prependUdf = udf { (text: String, headerPath: String) =>
    Norm.prependHeaderIfMissing(text, headerPath)
  }

  /** First parseable date among candidates that sit in the conversation's
    * first-6 or last-6 EMITTED positions — the reference scans chunks[:6]
    * then chunks[-6:] only (pipeline.py:1342-1355); a date that appears only
    * mid-conversation must NOT be picked (min(ts) fallback applies instead).
    * `head`/`tail` are the turn_idxs of those positions; candidates are
    * long-encoded as turn_idx << DateBits | yyyymmdd (dd = 0 for a bare
    * year-month, which parses as day 1 like Norm.parseDateLenient;
    * impossible dates, e.g. 2024-02-30, reject via LocalDate validation
    * exactly like the string path). Scan order: head positions ascending,
    * then tail positions ascending, first parsed wins.
    */
  private val pickDateUdf = udf { (encs: Seq[Long], head: Seq[Long], tail: Seq[Long]) =>
    if (encs == null) null
    else {
      val codeByTurn = encs.iterator.map(e => (e >> DateBits) -> (e & DateMask).toInt)
        .toMap
      val positions = Option(head).getOrElse(Nil).iterator ++
        Option(tail).getOrElse(Nil).iterator
      positions
        .flatMap(t => codeByTurn.get(t))
        .flatMap { code =>
          try Some(java.time.LocalDate.of(code / 10000, (code / 100) % 100,
            math.max(code % 100, 1)))
          catch { case _: Exception => None }
        }
        .nextOption()
        .map(d => new java.sql.Timestamp(
          d.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli))
        .orNull
    }
  }

  private val isoDate = "(\\d{4}-\\d{2}(?:-\\d{2})?)"

  /** Shift width of the combined per-emitted-row encoding
    * `turn_idx << DateBits | yyyymmdd` — yyyymmdd ≤ 99991231 < 2^27, and
    * turn_idx < 2^31 keeps the product within a long. Bit ops (not ×1e8 +
    * integer div) so decoding stays exact in Column arithmetic (SQL `/` is
    * double division, lossy above 2^53).
    */
  private val DateBits = 27
  private val DateMask = (1L << DateBits) - 1L

  def chunk(spark: SparkSession, turns: Dataset[Turn], cfg: Config = Config()): Dataset[Chunk] =
    if (cfg.sortedInput) chunkSorted(spark, turns, cfg)
    else chunkWindowed(spark, turns, cfg)

  /** Cost-based path choice for storage-ordered input (`--sorted auto`):
    * ONE column-pruned planning aggregation measures the largest single
    * conversation's share f of the corpus, and the shuffle-free sorted path
    * is taken only when that skew cannot starve it. The sorted path inherits
    * the storage layout's parallelism, so its wall time degrades roughly
    * linearly in f (measured on the BASELINE.md extreme-skew A/B: 3.9× at
    * f = 0.333 ⇒ slope k ≈ 8.7) while the salted windowed path is
    * skew-invariant at ~1.47× the sorted path's un-skewed cost (4.75 s vs
    * 3.23 s at 32 cores). Crossover: 1 + k·f = 1.47 ⇒ f* ≈ 0.054, rounded
    * down to the 0.05 default. The planning scan reads only `conv_id` — a
    * standing transcript store would serve this from table statistics
    * instead of a scan.
    *
    * Returns (useSorted, maxConversationFraction). Empty input prefers the
    * sorted path (nothing to skew).
    */
  def preferSorted(turns: Dataset[Turn], threshold: Double = 0.05): (Boolean, Double) = {
    val spark = turns.sparkSession
    import spark.implicits._
    val row = turns.groupBy($"conv_id").agg(count(lit(1)).as("n"))
      .agg(max($"n").as("mx"), sum($"n").as("tot")).first()
    if (row.isNullAt(1) || row.getLong(1) == 0L) (true, 0.0)
    else {
      val frac = row.getLong(0).toDouble / row.getLong(1).toDouble
      (frac <= threshold, frac)
    }
  }

  /** General path: arbitrary input order, salted window shuffle. */
  private def chunkWindowed(spark: SparkSession, turns: Dataset[Turn], cfg: Config): Dataset[Chunk] = {
    import spark.implicits._
    val w = cfg.windowSize
    require(cfg.saltTurns >= 1, "saltTurns must be positive")
    require(w >= 1, "windowSize must be positive")

    val bySalt = Window.partitionBy($"conv_id", $"salt").orderBy($"turn_idx")
    val runningBySalt = bySalt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trailing = bySalt.rowsBetween(-(w - 1).toLong, Window.currentRow)
    val bySaltDesc = Window.partitionBy($"conv_id", $"salt").orderBy($"turn_idx".desc)

    val toolOrNull = when($"tool".isNotNull && $"tool" =!= "", $"tool")

    // emit0 = would this turn's own trimmed text clear the filters (exact
    // emission for w == 1; date-candidate eligibility for all w). Trimmed
    // text is NOT projected here: UTF8String.trim is a cheap slice to
    // recompute, but a projected copy would serialize the text bytes TWICE
    // through the window shuffle. The date regex runs only on rows containing
    // a '-' at all (instr pre-gate) — regex per row was measurable at 32 cores.
    // trim uses JavaWs (chars ≤ U+0020), NOT SQL trim (spaces only): the
    // sorted fast path and the fused extractor gate with String.trim, and the
    // reference gates with Python str.strip (markdown_chunker.py:60-67) — a
    // plain trim() here would keep a '\n---' separator line the other paths
    // drop. Still a slice (UTF8String.trim(trimString)), no allocation.
    val soloBody = trim($"text", JavaWs)
    val kept0 = turns
      .filter($"text".isNotNull && length(trim($"text", JavaWs)) > 0)
      .withColumn("salt", floor($"turn_idx" / lit(cfg.saltTurns)).cast("int"))
      .withColumn("emit0",
        length(soloBody) >= cfg.minChars && !soloBody.startsWith("---"))
      .withColumn("date_str",
        when($"emit0" && instr($"text", "-") > 0, regexp_extract($"text", isoDate, 1))
          .otherwise(""))

    val hdrLevels = if (cfg.markdownHeaders) 1 to HeaderLevels else Range(0, 0)
    val kept1 =
      if (cfg.markdownHeaders) kept0.withColumn("hslots", headerSlotsUdf($"text"))
      else kept0
    // ts and date_str exist only to feed the stats aggregate (computed from
    // kept0/kept1 directly below) — dropping them before the big per-group
    // window keeps their bytes out of the main shuffle (w == 1 path; the
    // w > 1 path aggregates stats from the post-window rows and keeps them)
    var kept = (if (w == 1) kept1.drop("ts", "date_str") else kept1)
      // W2: last tool banner seen so far in this sub-window (own turn included)
      .withColumn("local_tool", last(toolOrNull, ignoreNulls = true).over(runningBySalt))
    // full #-level header stack (markdown_chunker.py:41-49): per level, the
    // running last per-turn slot — same associative combine as the banner
    hdrLevels.foreach { k =>
      kept = kept.withColumn(s"local_h$k",
        last(element_at($"hslots", k), ignoreNulls = true).over(runningBySalt))
    }
    // hslots stays on `kept` for now: the w > 1 stats aggregation still
    // needs it (lastHdrAggs); it is dropped at mainSide selection below
    if (w > 1) kept = kept
      .withColumn("ctx", collect_list(soloBody).over(trailing))
      .withColumn("kept_rn_desc", row_number().over(bySaltDesc))

    // ---- per-(conv, salt) group stats: the small reconciliation domain ----
    // For w == 1 stats aggregate the PRE-WINDOW projection (narrow partial
    // agg + a tiny shuffle): deriving them from the windowed rows would
    // re-run the big per-group sort a second time — measured 2× on 32-core
    // extraction. The collect_list keeps the agg an ObjectHashAggregate —
    // hash-based, NO sort (scalar string min/max "looks" cheaper but plans as
    // SortAggregate, which re-sorts the whole stats input: measured 3× the
    // map-stage CPU). Date candidates are LONG-encoded
    // (turn_idx * 1e8 + yyyymmdd) so the buffer stays primitive.
    val dateCode = substring($"date_str", 1, 4).cast("long") * 10000L +
      substring($"date_str", 6, 2).cast("long") * 100L +
      when(length($"date_str") >= 10, substring($"date_str", 9, 2).cast("long"))
        .otherwise(0L)
    val lastToolAgg = max(when(toolOrNull.isNotNull, struct($"turn_idx", $"tool")))
      .getField("tool").as("g_last_tool")
    // ONE combined list per group feeds everything positional: each EMITTED
    // row contributes `turn_idx << DateBits | yyyymmdd` (0 when no date), so
    // date candidates, the first/last-6 emitted positions (which gate date
    // candidates, reference chunks[:6]/chunks[-6:] — derivable per group by
    // pigeonhole: the conv's first 6 emitted rows are among each early
    // group's first 6), and the emitted count all come from a single
    // collect_list buffer — the r2 shape had one list + one sum; separate
    // lists per concern measurably inflated the stats map side
    // (ChunkStageProbe). Per-group length is bounded by saltTurns (the
    // salting bound is what makes list aggregation admissible here at all).
    // For w > 1 emission is approximated by emit0 (a body concatenating w
    // texts may still emit when its own text is short) — candidates carry
    // the same emit0 gate, so the approximation is self-consistent; exact
    // for the default w == 1.
    val combEnc = when($"emit0",
      shiftleft($"turn_idx".cast("long"), DateBits)
        .bitwiseOR(when($"date_str" =!= "", dateCode).otherwise(lit(0L))))
    // per-group last header slot per level (same max-struct shape as the
    // tool banner; "" pop sentinels are values and carry like any other)
    val lastHdrAggs = hdrLevels.map { k =>
      max(when(element_at($"hslots", k).isNotNull,
        struct($"turn_idx", element_at($"hslots", k).as("h"))))
        .getField("h").as(s"g_last_h$k")
    }
    val stats0 =
      if (w == 1)
        kept1.groupBy($"conv_id", $"salt")
          .agg(
            min($"ts").as("g_min_ts"),
            (Seq(min($"turn_idx").as("g_min_turn"), lastToolAgg,
              sort_array(collect_list(combEnc)).as("g_all")) ++ lastHdrAggs): _*)
      else
        kept.groupBy($"conv_id", $"salt")
          .agg(
            min($"ts").as("g_min_ts"),
            (Seq(
              min($"turn_idx").as("g_min_turn"),
              lastToolAgg,
              sort_array(collect_list(combEnc)).as("g_all"),
              // previous-group context for cross-boundary trailing windows:
              // this group's last (w-1) kept texts, turn order
              transform(
                sort_array(collect_list(
                  when($"kept_rn_desc" <= w - 1, struct($"turn_idx", soloBody.as("txt"))))),
                e => e.getField("txt")).as("g_tail")) ++ lastHdrAggs): _*)
    // bounded per-group projections of the combined list
    val emitPos = (e: org.apache.spark.sql.Column) => shiftright(e, DateBits)
    val stats = stats0
      .withColumn("g_cands_all",
        filter($"g_all", e => e.bitwiseAND(lit(DateMask)) =!= 0L))
      .withColumn("g_cands",
        concat(slice($"g_cands_all", 1, 6),
          when(size($"g_cands_all") > 6, slice($"g_cands_all", -6, 6))
            .otherwise(array())))
      .withColumn("g_emit_head", transform(slice($"g_all", 1, 6), emitPos))
      .withColumn("g_emit_tail", transform(
        when(size($"g_all") > 6, slice($"g_all", -6, 6)).otherwise($"g_all"), emitPos))
      .withColumn("g_emit_cnt", size($"g_all").cast("long"))

    val enrich = convEnrich(stats, hdrLevels, w)
    val enrichCols = Seq($"conv_id", $"salt", $"carry_tool", $"conv_doc_date") ++
      hdrLevels.map(k => col(s"carry_h$k")) ++
      (if (w == 1) Seq($"chunk_offset") else Seq($"prev_tail"))

    // ---- join stats back on (conv_id, salt) ----
    // w == 1: emission is decided pre-join, so filter FIRST (smaller join
    // input) — the enrich side is tiny and broadcasts, preserving the window
    // sort for the numbering window below.
    val mainSide0 = if (w == 1) kept.filter($"emit0") else kept
    val mainSide =
      if (cfg.markdownHeaders) mainSide0.drop("hslots") else mainSide0
    // breadcrumb = role > tool banner > valid stack levels ascending; a level
    // whose effective slot is the "" pop sentinel (or never seen) is absent —
    // nullif drops it and concat_ws skips nulls
    val hdrCrumbs = hdrLevels.map { k =>
      nullif(coalesce(col(s"local_h$k"), col(s"carry_h$k")), lit(""))
    }
    val joined = mainSide.join(enrich.select(enrichCols: _*), Seq("conv_id", "salt"))
      .withColumn("eff_tool", coalesce($"local_tool", $"carry_tool"))
      .withColumn("header_path",
        concat_ws(" > ", ($"role" +: $"eff_tool" +: hdrCrumbs): _*))

    val withBody =
      if (w == 1) joined.withColumn("body", soloBody)
      else {
        // prefix the previous group's tail when the local trailing window is
        // short of w texts (first w-1 kept rows of a non-first sub-window)
        val needed = greatest(lit(0), least(lit(w) - size($"ctx"), size($"prev_tail")))
        joined.withColumn("body",
          array_join(concat(slice($"prev_tail", size($"prev_tail") - needed + 1, lit(w - 1)),
            $"ctx"), "\n"))
      }

    val emitted = (if (w == 1) withBody
      else withBody.filter(length($"body") >= cfg.minChars && !$"body".startsWith("---")))
      .withColumn("loc_no", row_number().over(bySalt))

    // chunk numbering offset: for w == 1 it rode the enrich join; for w > 1
    // emission depends on cross-boundary bodies, so count emitted rows now
    // and make one more (conv_id, salt)-keyed small-table round-trip.
    val numbered =
      if (w == 1) emitted.withColumn("chunk_no", ($"chunk_offset" + $"loc_no").cast("int"))
      else {
        val beforeBySalt = Window.partitionBy($"conv_id").orderBy($"salt")
          .rowsBetween(Window.unboundedPreceding, -1)
        val counts = emitted.groupBy($"conv_id", $"salt").agg(count(lit(1)).as("g_emit_cnt"))
          .withColumn("chunk_offset",
            coalesce(sum($"g_emit_cnt").over(beforeBySalt), lit(0L)))
          .select($"conv_id", $"salt", $"chunk_offset")
        emitted.join(counts, Seq("conv_id", "salt"))
          .withColumn("chunk_no", ($"chunk_offset" + $"loc_no").cast("int"))
      }

    numbered.select(
      format_string("%s_chunk_%04d", $"conv_id", $"chunk_no").as("chunk_id"),
      chunkUuidUdf(lit(cfg.groupId), $"conv_id", $"turn_idx").as("chunk_uuid"),
      $"conv_id",
      greatest(lit(0), $"turn_idx" - lit(w - 1)).as("window_start"),
      $"turn_idx".as("window_end"),
      prependUdf($"body", $"header_path").as("text"),
      $"header_path",
      lit(cfg.groupId).as("group_id"),
      $"conv_doc_date".as("document_date")).as[Chunk]
  }

  /** Conversation-level reconciliation over the (conv_id, salt) stats table
    * (tiny — both paths): carried tool banner and header slots, document
    * date from the conversation's head-6/tail-6 emitted positions, and the
    * chunk-numbering offset. Groups are ordered by `g_min_turn` (the group's
    * first kept turn), NOT by salt id — the salt is just a co-location key,
    * so the sorted path's partition-id salts stay correct even when the
    * scan's split packing visits a file's splits out of order.
    */
  private def convEnrich(stats: DataFrame, hdrLevels: Range, w: Int): DataFrame = {
    import stats.sparkSession.implicits._
    val byConvSalt = Window.partitionBy($"conv_id").orderBy($"g_min_turn")
    val beforeThis = byConvSalt.rowsBetween(Window.unboundedPreceding, -1)
    val wholeConv = Window.partitionBy($"conv_id")
      .orderBy($"g_min_turn")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    var enrich = stats
      .withColumn("carry_tool", last($"g_last_tool", ignoreNulls = true).over(beforeThis))
    hdrLevels.foreach { k =>
      enrich = enrich.withColumn(s"carry_h$k",
        last(col(s"g_last_h$k"), ignoreNulls = true).over(beforeThis))
    }
    enrich = enrich
      .withColumn("conv_min_ts", min($"g_min_ts").over(wholeConv))
      .withColumn("all_cands",
        array_sort(flatten(collect_list($"g_cands").over(wholeConv))))
      // conversation-level head-6 / tail-6 emitted positions (turn_idxs)
      .withColumn("conv_head6",
        slice(array_sort(flatten(collect_list($"g_emit_head").over(wholeConv))), 1, 6))
      .withColumn("conv_tail6",
        array_sort(slice(
          sort_array(flatten(collect_list($"g_emit_tail").over(wholeConv)), asc = false),
          1, 6)))
      .withColumn("conv_doc_date",
        coalesce(pickDateUdf($"all_cands", $"conv_head6", $"conv_tail6"), $"conv_min_ts"))
    if (w == 1)
      enrich.withColumn("chunk_offset",
        coalesce(sum($"g_emit_cnt").over(beforeThis), lit(0L)))
    else
      enrich.withColumn("prev_tail",
        coalesce(lag($"g_tail", 1).over(byConvSalt), array()))
  }

  // ======================= storage-ordered fast path =======================

  /** Per-(scan-partition, conversation) stats row — the sorted path's
    * reconciliation unit (salt := scan partition id). All fields are the
    * BOUNDED summaries the window path derives from its `g_all` list; here
    * the ordered partition scan computes them directly.
    */
  private[chunk] case class PStat(
      conv_id: String, salt: Int, g_min_turn: Int,
      g_min_ts: java.sql.Timestamp, g_last_tool: String,
      g_cands: Seq[Long], g_emit_head: Seq[Long], g_emit_tail: Seq[Long],
      g_emit_cnt: Long, g_last_h: Seq[String])

  private val isoPattern = java.util.regex.Pattern.compile(isoDate)

  /** Running per-conversation state for one ordered partition scan — the
    * imperative twin of the window path's running aggregates.
    */
  private final class ConvScan(convId: String, salt: Int, md: Boolean) {
    var minTurn: Int = Int.MaxValue
    var minTs: java.sql.Timestamp = _
    var lastTool: String = _
    var emitCnt: Long = 0L
    val candHead = scala.collection.mutable.ArrayBuffer.empty[Long]
    val candTail = scala.collection.mutable.ArrayBuffer.empty[Long]
    val emitHead = scala.collection.mutable.ArrayBuffer.empty[Long]
    val emitTail = scala.collection.mutable.ArrayBuffer.empty[Long]
    val slots: Array[String] = if (md) new Array[String](HeaderLevels) else null

    private def push(head: scala.collection.mutable.ArrayBuffer[Long],
        tail: scala.collection.mutable.ArrayBuffer[Long], v: Long): Unit = {
      if (head.length < 6) head += v
      tail += v
      if (tail.length > 6) tail.remove(0)
    }

    /** Update with one kept (non-blank) turn; returns the trimmed body if the
      * turn emits a chunk, else null.
      */
    def update(t: Turn, minChars: Int): String = {
      if (t.turn_idx < minTurn) minTurn = t.turn_idx
      // null-tolerant like the windowed path's min($"ts") (nulls ignored)
      if (t.ts != null && (minTs == null || t.ts.compareTo(minTs) < 0)) minTs = t.ts
      if (t.tool != null && t.tool.nonEmpty) lastTool = t.tool
      if (md) {
        val hs = headerSlots(t.text)
        if (hs != null) {
          var k = 0
          while (k < HeaderLevels) {
            if (hs(k) != null) slots(k) = hs(k)
            k += 1
          }
        }
      }
      val body = t.text.trim
      val emits = body.length >= minChars && !body.startsWith("---")
      if (emits) {
        emitCnt += 1
        var code = 0L
        if (t.text.indexOf('-') >= 0) {
          val m = isoPattern.matcher(t.text)
          if (m.find()) {
            val d = m.group(1)
            code = d.substring(0, 4).toLong * 10000L + d.substring(5, 7).toLong * 100L +
              (if (d.length >= 10) d.substring(8, 10).toLong else 0L)
          }
        }
        val enc = (t.turn_idx.toLong << DateBits) | code
        push(emitHead, emitTail, t.turn_idx.toLong)
        if (code != 0L) push(candHead, candTail, enc)
        body
      } else null
    }

    def stat: PStat = PStat(convId, salt, minTurn, minTs, lastTool,
      (candHead ++ candTail.filterNot(candHead.contains)).toSeq.sorted,
      emitHead.toSeq, emitTail.toSeq, emitCnt,
      if (md) slots.toSeq else null)
  }

  /** Lazily iterate one partition's kept turns in storage order, tracking
    * per-conv state (the yielded ConvScan is the LIVE state, updated through
    * the yielded row — a consumer snapshots a conversation's final state
    * when the state object changes identity or the iterator ends).
    * Enforces the layout contract: within a partition each conversation's
    * rows are CONTIGUOUS with ascending turn_idx (true for splits of files
    * sorted by (conv_id, turn_idx); violated layouts fail fast — fall back
    * to the windowed path). `body` is null when the turn does not emit.
    */
  private def scanRows(it: Iterator[Turn], salt: Int, minChars: Int,
      md: Boolean): Iterator[(Turn, ConvScan, String)] = {
    val seen = scala.collection.mutable.HashSet.empty[String]
    var cur: ConvScan = null
    var curConv: String = null
    var prevIdx = Int.MinValue
    it.flatMap { t =>
      if (t.text == null || t.text.trim.isEmpty) Iterator.empty
      else {
        if (t.conv_id != curConv) {
          require(seen.add(t.conv_id),
            s"sortedInput layout violation: conversation ${t.conv_id} is not " +
              "contiguous within its scan partition — use the windowed path")
          cur = new ConvScan(t.conv_id, salt, md)
          curConv = t.conv_id
          prevIdx = Int.MinValue
        }
        require(t.turn_idx > prevIdx,
          s"sortedInput layout violation: turn_idx not ascending in ${t.conv_id} " +
            s"(${t.turn_idx} after $prevIdx) — use the windowed path")
        prevIdx = t.turn_idx
        Iterator.single((t, cur, cur.update(t, minChars)))
      }
    }
  }

  /** Storage-ordered fast path (windowSize == 1): when the input table is
    * sorted by (conv_id, turn_idx) within each scan partition — the layout a
    * standing 10^12-turn transcript store maintains (Iceberg-style
    * sorted-by-key files; each conversation within one file, or spanning
    * only that file's own splits) — chunking needs NO shuffle and NO sort of
    * the turn stream at all:
    *
    *   1. one ordered partition scan emits per-(partition, conv) BOUNDED
    *      stats (the same summaries the windowed path aggregates), with
    *      salt := scan partition id;
    *   2. the same tiny conv-keyed reconciliation (`convEnrich`) runs over
    *      them — numbering offsets, carried banners/headers, document dates;
    *   3. the enrich rows are routed back BY PARTITION ID (an identity
    *      partitioner over the tiny table — never a shuffle or broadcast of
    *      the turn stream, and unlike a broadcast it stays correct when the
    *      corpus has billions of conversations) and zipped against a second
    *      ordered scan that emits the final chunks.
    *
    * The two text scans replace the windowed path's scan + full shuffle +
    * per-group sort; on a shared-bus host the shuffle is the scaling
    * bottleneck (BASELINE.md), and at 100 TB it is the difference between
    * reading the corpus twice and WRITING it once more.
    *
    * SKEW EXPOSURE (measured, BASELINE.md round 4): this path inherits the
    * storage layout's parallelism — a single conversation holding fraction
    * f of the corpus sits in one unsplittable partition and bounds speedup
    * at ~1/f (one conv with 33% of a 3M-turn corpus: 3.2 s → 12.6 s at 32
    * cores, 3.9×). The salted WINDOWED path is skew-invariant on the same
    * corpus (4.7 s both ways) and produces row-identical output — when the
    * max-conversation share is pathological, route through `sortedInput =
    * false` (or pre-split giant conversations at the store layer).
    */
  private[chunk] def chunkSorted(spark: SparkSession, turns: Dataset[Turn],
      cfg: Config): Dataset[Chunk] = {
    import spark.implicits._
    require(cfg.windowSize == 1, "sortedInput fast path requires windowSize == 1")
    val minChars = cfg.minChars
    val md = cfg.markdownHeaders
    val groupId = cfg.groupId
    val hdrLevels = if (md) 1 to HeaderLevels else Range(0, 0)

    // pass 1: bounded per-(partition, conv) stats
    val statsDs: Dataset[PStat] = turns.mapPartitions { it =>
      val salt = org.apache.spark.TaskContext.getPartitionId()
      val out = scala.collection.mutable.ArrayBuffer.empty[PStat]
      var live: ConvScan = null
      scanRows(it, salt, minChars, md).foreach { case (_, st, _) =>
        if (st ne live) {
          if (live != null) out += live.stat
          live = st
        }
      }
      if (live != null) out += live.stat
      out.iterator
    }
    var stats = statsDs.toDF()
    hdrLevels.foreach { k =>
      stats = stats.withColumn(s"g_last_h$k", element_at($"g_last_h", k))
    }
    val enrich = convEnrich(stats.drop("g_last_h"), hdrLevels, w = 1)
      .select((Seq($"conv_id", $"salt", $"carry_tool", $"conv_doc_date",
        $"chunk_offset") ++ hdrLevels.map(k => col(s"carry_h$k"))): _*)

    // route enrich rows to their owning scan partition: an identity
    // partitioner over the TINY reconciliation table (rows ∝ conversations
    // touched per partition), zipped against the second ordered scan
    val numParts = turns.rdd.getNumPartitions
    val nHdr = hdrLevels.size
    val enrichRdd = enrich.rdd
      .map(r => (r.getInt(1), r))
      .partitionBy(new org.apache.spark.Partitioner {
        override def numPartitions: Int = numParts
        override def getPartition(key: Any): Int = key.asInstanceOf[Int]
      })
      .map(_._2)

    val chunkRdd = turns.rdd.zipPartitions(enrichRdd, preservesPartitioning = false) {
      (turnIt, eIt) =>
        val salt = org.apache.spark.TaskContext.getPartitionId()
        // (conv -> enrich row) for THIS partition only
        val byConv = eIt.map(r => r.getString(0) -> r).toMap
        scanRows(turnIt, salt, minChars, md).collect {
          case (t, st, body) if body != null =>
            val e = byConv.getOrElse(t.conv_id, throw new IllegalStateException(
              s"missing reconciliation row for ${t.conv_id} in partition $salt"))
            val carryTool = if (e.isNullAt(2)) null else e.getString(2)
            val docDate = e.getTimestamp(3)
            val offset = e.getLong(4)
            val effTool = if (st.lastTool != null) st.lastTool else carryTool
            val crumbs = (0 until nHdr).flatMap { i =>
              val local = st.slots(i)
              val eff = if (local != null) local
                else if (e.isNullAt(5 + i)) null
                else e.getString(5 + i)
              if (eff == null || eff.isEmpty) None else Some(eff)
            }
            val headerPath = ((Seq(t.role) ++ Option(effTool) ++ crumbs)
              .filter(_ != null)).mkString(" > ")
            val chunkNo = offset + st.emitCnt // emitCnt already counts this row
            Chunk(
              chunk_id = "%s_chunk_%04d".format(t.conv_id, chunkNo),
              chunk_uuid = Ids.stableUuid(groupId, t.conv_id, s"idx:${t.turn_idx}"),
              conv_id = t.conv_id,
              window_start = t.turn_idx,
              window_end = t.turn_idx,
              text = Norm.prependHeaderIfMissing(body, headerPath),
              header_path = headerPath,
              group_id = groupId,
              document_date = docDate)
        }
    }
    spark.createDataset(chunkRdd)
  }
}

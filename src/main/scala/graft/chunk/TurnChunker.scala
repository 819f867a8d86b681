package graft.chunk

import org.apache.spark.sql.{Dataset, SparkSession}
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
  *    (YYYY-MM-DD / YYYY-MM) found in the head-6 then tail-6 long turns of
  *    the conversation, parsed leniently (Norm.parseDateLenient), falling
  *    back to min(ts) over the conversation.
  *
  * Spark shape — built for the north star's long-conversation skew: rows are
  * windowed over (conv_id, salt) where salt = turn_idx / saltTurns, so one
  * pathological 10^9-turn conversation becomes many bounded tasks instead of
  * one straggler. Everything per-conversation (chunk numbering offsets,
  * inherited tool banner, document date, min ts, cross-boundary text context
  * for windowSize > 1) is reconciled through a per-(conv_id, salt) GROUP
  * STATS table — ~totalTurns/saltTurns rows, i.e. 4-5 orders of magnitude
  * smaller than the turn stream — joined back on (conv_id, salt) so the big
  * side's exchange is reused (no second big shuffle, no join on the skewed
  * bare conv_id). windowSize == 1 (the pipeline default) takes a single
  * join; windowSize > 1 adds one more small-table round-trip because chunk
  * numbering then depends on cross-boundary bodies.
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
      saltTurns: Int = 65536) // sub-window length (long-conversation salting)

  private val chunkUuidUdf = udf { (groupId: String, convId: String, turnIdx: Int) =>
    Ids.stableUuid(groupId, convId, s"idx:$turnIdx")
  }
  private val prependUdf = udf { (text: String, headerPath: String) =>
    Norm.prependHeaderIfMissing(text, headerPath)
  }

  /** First parseable date among the head-6 then tail-6 candidates (reference
    * scan order: chunks[:6] then chunks[-6:], first parsed wins).
    * Candidates arrive turn_idx-sorted.
    */
  private val pickDateUdf = udf { (strs: Seq[String]) =>
    if (strs == null) null
    else {
      val head = strs.take(6)
      val tail = if (strs.length > 6) strs.takeRight(6) else Nil
      (head.iterator ++ tail.iterator)
        .flatMap(s => Norm.parseDateLenient(s))
        .nextOption()
        .map(d => new java.sql.Timestamp(
          d.atStartOfDay(java.time.ZoneOffset.UTC).toInstant.toEpochMilli))
        .orNull
    }
  }

  private val isoDate = "(\\d{4}-\\d{2}(?:-\\d{2})?)"

  def chunk(spark: SparkSession, turns: Dataset[Turn], cfg: Config = Config()): Dataset[Chunk] = {
    import spark.implicits._
    val w = cfg.windowSize
    require(cfg.saltTurns >= 1, "saltTurns must be positive")
    require(w >= 1, "windowSize must be positive")

    val bySalt = Window.partitionBy($"conv_id", $"salt").orderBy($"turn_idx")
    val runningBySalt = bySalt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val trailing = bySalt.rowsBetween(-(w - 1).toLong, Window.currentRow)
    val bySaltDesc = Window.partitionBy($"conv_id", $"salt").orderBy($"turn_idx".desc)

    val toolOrNull = when($"tool".isNotNull && $"tool" =!= "", $"tool")
    // local emit proxy: would this turn's own trimmed text clear the filters?
    // Exact emission for w == 1; head/tail date-candidate eligibility for all w.
    val soloBody = trim($"text")
    val soloEmit = length(soloBody) >= cfg.minChars && !soloBody.startsWith("---")

    val kept0 = turns
      .filter($"text".isNotNull && length(trim($"text")) > 0)
      .withColumn("salt", floor($"turn_idx" / lit(cfg.saltTurns)).cast("int"))

    var kept = kept0
      // W2: last tool banner seen so far in this sub-window (own turn included)
      .withColumn("local_tool", last(toolOrNull, ignoreNulls = true).over(runningBySalt))
      .withColumn("date_str", regexp_extract($"text", isoDate, 1))
    if (w > 1) kept = kept
      .withColumn("ctx", collect_list(trim($"text")).over(trailing))
      .withColumn("kept_rn", row_number().over(bySalt))
      .withColumn("kept_rn_desc", row_number().over(bySaltDesc))

    // ---- per-(conv, salt) group stats: the small reconciliation domain ----
    val candStruct = when($"date_str" =!= "" && soloEmit, struct($"turn_idx", $"date_str"))
    val statAggs = Seq(
      min($"ts").as("g_min_ts"),
      // last tool banner of the whole sub-window (carried into later ones)
      max(when(toolOrNull.isNotNull, struct($"turn_idx", $"tool"))).getField("tool")
        .as("g_last_tool"),
      // head-6 + tail-6 date candidates of this sub-window (bounded arrays)
      sort_array(collect_list(candStruct)).as("g_cands")) ++
      (if (w == 1) Seq(sum(soloEmit.cast("long")).as("g_emit_cnt"))
       else Seq(
         // previous-group context for cross-boundary trailing windows:
         // this group's last (w-1) kept texts, turn order
         transform(
           sort_array(collect_list(
             when($"kept_rn_desc" <= w - 1, struct($"turn_idx", trim($"text").as("txt"))))),
           e => e.getField("txt")).as("g_tail")))
    val stats = kept.groupBy($"conv_id", $"salt").agg(statAggs.head, statAggs.tail: _*)
      .withColumn("g_cands",
        concat(slice($"g_cands", 1, 6),
          when(size($"g_cands") > 6, slice($"g_cands", -6, 6)).otherwise(array())))

    // conv-level reconciliation, computed on the stats table (tiny)
    val byConvSalt = Window.partitionBy($"conv_id").orderBy($"salt")
    val beforeThis = byConvSalt.rowsBetween(Window.unboundedPreceding, -1)
    val wholeConv = Window.partitionBy($"conv_id")
      .orderBy($"salt").rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    var enrich = stats
      .withColumn("carry_tool", last($"g_last_tool", ignoreNulls = true).over(beforeThis))
      .withColumn("conv_min_ts", min($"g_min_ts").over(wholeConv))
      .withColumn("all_cands",
        array_sort(flatten(collect_list($"g_cands").over(wholeConv))))
      .withColumn("conv_doc_date",
        coalesce(pickDateUdf(transform($"all_cands", c => c.getField("date_str"))),
          $"conv_min_ts"))
    enrich =
      if (w == 1)
        enrich.withColumn("chunk_offset",
          coalesce(sum($"g_emit_cnt").over(beforeThis), lit(0L)))
      else
        enrich.withColumn("prev_tail",
          coalesce(lag($"g_tail", 1).over(byConvSalt), array()))
    val enrichCols = Seq($"conv_id", $"salt", $"carry_tool", $"conv_doc_date") ++
      (if (w == 1) Seq($"chunk_offset") else Seq($"prev_tail"))

    // ---- join stats back on (conv_id, salt): reuses the window exchange ----
    val joined = kept.join(enrich.select(enrichCols: _*), Seq("conv_id", "salt"))
      .withColumn("eff_tool", coalesce($"local_tool", $"carry_tool"))
      .withColumn("header_path", concat_ws(" > ", $"role", $"eff_tool"))

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

    val emitted = withBody
      .filter(length($"body") >= cfg.minChars && !$"body".startsWith("---"))
      .withColumn("loc_no", row_number().over(bySalt))

    // chunk numbering offset: for w == 1 it rode the enrich join; for w > 1
    // emission depends on cross-boundary bodies, so count emitted rows now
    // and make one more (conv_id, salt)-keyed small-table round-trip.
    val numbered =
      if (w == 1) emitted.withColumn("chunk_no", ($"chunk_offset" + $"loc_no").cast("int"))
      else {
        val counts = emitted.groupBy($"conv_id", $"salt").agg(count(lit(1)).as("g_emit_cnt"))
          .withColumn("chunk_offset",
            coalesce(sum($"g_emit_cnt").over(beforeThis), lit(0L)))
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
}

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
  *  - each chunk inherits its header context; headers not already present in
  *    the body are prepended (pipeline.py:67-99);
  *  - chunk uuid = uuid5(group, doc_uuid, "idx:{i}") over the original line
  *    index (pipeline.py:1272-1276).
  *
  * Spark shape: ONE shuffle on conv_id; both windows (context collect and
  * post-filter numbering) share the same partitioning so Catalyst reuses the
  * exchange. At 10^12 turns the per-conversation sort is executor-local and
  * spills; no driver-side state.
  */
object TurnChunker {

  case class Config(
      windowSize: Int = 1, // turns per chunk (sliding, trailing)
      minChars: Int = 50,
      groupId: String = "default")

  // rows reach this projection conv-clustered (post window shuffle, sorted by
  // conv), so a single-entry per-thread memo removes one SHA-1 per row
  private val docUuidMemo = ThreadLocal.withInitial[Array[String]](() => Array(null, null))
  private val chunkUuidUdf = udf { (groupId: String, convId: String, turnIdx: Int) =>
    val memo = docUuidMemo.get()
    if (memo(0) != convId) {
      memo(0) = convId
      memo(1) = Ids.stableUuid(groupId, convId)
    }
    Ids.stableUuid(groupId, memo(1), s"idx:$turnIdx")
  }
  private val prependUdf = udf { (text: String, headerPath: String) =>
    Norm.prependHeaderIfMissing(text, headerPath)
  }

  def chunk(spark: SparkSession, turns: Dataset[Turn], cfg: Config = Config()): Dataset[Chunk] = {
    import spark.implicits._
    val byConv = Window.partitionBy($"conv_id").orderBy($"turn_idx")
    val trailing = byConv.rowsBetween(-(cfg.windowSize - 1).toLong, Window.currentRow)
    val wholeConv = Window.partitionBy($"conv_id")
      .orderBy($"turn_idx")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    val withBody = turns
      .filter($"text".isNotNull && length(trim($"text")) > 0)
      .withColumn("body",
        if (cfg.windowSize <= 1) trim($"text")
        else array_join(collect_list(trim($"text")).over(trailing), "\n"))
      .withColumn("window_start", greatest(lit(0), $"turn_idx" - lit(cfg.windowSize - 1)))
      .withColumn("document_date", min($"ts").over(wholeConv))

    val filtered = withBody
      .filter(length($"body") >= cfg.minChars && !$"body".startsWith("---"))
      .withColumn("header_path",
        when($"tool".isNotNull && $"tool" =!= "", concat_ws(" > ", $"role", $"tool"))
          .otherwise($"role"))

    filtered
      .withColumn("chunk_no", row_number().over(byConv))
      .select(
        format_string("%s_chunk_%04d", $"conv_id", $"chunk_no").as("chunk_id"),
        chunkUuidUdf(lit(cfg.groupId), $"conv_id", $"turn_idx").as("chunk_uuid"),
        $"conv_id",
        $"window_start",
        $"turn_idx".as("window_end"),
        prependUdf($"body", $"header_path").as("text"),
        $"header_path",
        lit(cfg.groupId).as("group_id"),
        $"document_date")
      .as[Chunk]
  }
}

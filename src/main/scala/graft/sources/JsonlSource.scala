package graft.sources

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.model.Turn

/** JSONL transcript source (SURVEY.md §2.1 S3): the reference chunk loader
  * parses JSONL line-by-line, tolerates malformed lines, and applies a
  * `--limit` (pipeline.py:1244-1285, markdown_chunker.py:163-178).
  *
  * Spark shape: schema-first `spark.read.json` in PERMISSIVE mode with a
  * corrupt-record column; malformed lines drop (the reference's bad-line
  * skip), `limit(n)` caps rows. Scales: line-split JSON is splittable, so a
  * 100 TB JSONL corpus reads in parallel.
  */
object JsonlSource {

  val turnSchema: StructType = StructType(Seq(
    StructField("conv_id", StringType),
    StructField("turn_idx", IntegerType),
    StructField("role", StringType),
    StructField("text", StringType),
    StructField("tool", StringType),
    StructField("ts", TimestampType),
    StructField("_corrupt", StringType)))

  def readTranscripts(spark: SparkSession, path: String,
      limit: Option[Int] = None): Dataset[Turn] =
    readTranscriptsObserved(spark, path, limit)._1

  /** Same read with the malformed-line count attached as an `observe` metric
    * (`corrupt_lines`): the count rides the FIRST action that scans the
    * source — no separate parse-and-cache pass over the corpus (at 10^12
    * turns a standalone count is an extra full read plus a corpus-sized
    * cache). Read `obs.getOrEmpty` after the pipeline ran; it stays empty if
    * a resume never re-scanned the input.
    */
  def readTranscriptsObserved(spark: SparkSession, path: String,
      limit: Option[Int] = None): (Dataset[Turn], org.apache.spark.sql.Observation) = {
    import spark.implicits._
    val obs = org.apache.spark.sql.Observation()
    val df = spark.read
      .schema(turnSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .observe(obs, sum(when(col("_corrupt").isNotNull, 1L).otherwise(0L))
        .as("corrupt_lines"))
      .filter(col("_corrupt").isNull && col("conv_id").isNotNull && col("turn_idx").isNotNull)
      .drop("_corrupt")
      .withColumn("tool", coalesce(col("tool"), lit("")))
    (limit.fold(df)(df.limit).as[Turn], obs)
  }

  /** JSONL sink (S3 write side, reference chunks_to_jsonl
    * markdown_chunker.py:163-178): one JSON object per line, splittable on
    * read-back by `readTranscripts`/`spark.read.json`. Timestamps serialize
    * ISO-8601, so a write→read round-trip is lossless for the Turn schema.
    */
  def writeJsonl(df: org.apache.spark.sql.DataFrame, path: String,
      mode: String = "overwrite"): Unit =
    df.write.mode(mode).json(path)

  /** Count of malformed lines (the reference logs skipped lines). Spark
    * disallows queries touching only the corrupt-record column on a raw
    * json scan; caching first is the documented workaround.
    */
  def corruptCount(spark: SparkSession, path: String): Long = {
    val df = spark.read.schema(turnSchema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(path)
      .cache()
    try df.filter(col("_corrupt").isNotNull).count()
    finally df.unpersist()
  }
}

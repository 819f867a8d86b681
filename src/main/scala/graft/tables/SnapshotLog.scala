package graft.tables

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-*style* table layer: partitioned Parquet + an atomic JSON snapshot
  * log (SURVEY.md §7.0/§2.1 S9). No Iceberg jar ships in /opt/spark/jars, so
  * this provides the north rule's observable behaviors directly:
  *
  *  - committed snapshots: data lands in `table/snapshot-N/`, then a manifest
  *    line is appended via atomic rename — readers only ever see committed
  *    snapshots;
  *  - checkpoint/resume: `latestSnapshot(stage)` lets a relaunched job skip
  *    every stage that already committed (reference checkpoint.py:116-157
  *    resume-from-last-phase semantics);
  *  - per-partition lineage: each commit writes one row per task partition
  *    (partition id, row count, xor-of-hash checksum) into `_lineage`.
  *
  * The driver never holds data rows — lineage aggregation happens in Spark.
  */
class SnapshotLog(spark: SparkSession, baseDir: String) {
  import spark.implicits._

  private def tableDir(name: String): Path = Paths.get(baseDir, name)
  private def manifest(name: String): Path = tableDir(name).resolve("_snapshots.json")

  /** Committed snapshot ids for a table, ascending. */
  def snapshots(name: String): Seq[Long] = {
    val m = manifest(name)
    if (!Files.exists(m)) Seq.empty
    else Files.readAllLines(m, UTF_8).asScala.toSeq
      .filter(_.nonEmpty)
      .map(line => """"snapshot_id":\s*(\d+)""".r.findFirstMatchIn(line).map(_.group(1).toLong))
      .collect { case Some(id) => id }
      .sorted
  }

  def latestSnapshot(name: String): Option[Long] = snapshots(name).lastOption

  def snapshotPath(name: String, id: Long): String =
    tableDir(name).resolve(s"snapshot-$id").toString

  /** Read the latest committed snapshot of a table. */
  def read(name: String): Option[DataFrame] =
    latestSnapshot(name).map(id => spark.read.parquet(snapshotPath(name, id)))

  /** Write a new snapshot: parquet first, manifest append last (atomic rename).
    * Returns the new snapshot id. Optionally partition by columns.
    */
  def commit(name: String, df: DataFrame, partitionBy: Seq[String] = Nil): Long = {
    val id = latestSnapshot(name).getOrElse(0L) + 1L
    val dataPath = snapshotPath(name, id)
    val writer = df.write.mode("overwrite")
    (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
      .parquet(dataPath)

    // per-partition lineage over the *written* files (committed bytes)
    val written = spark.read.parquet(dataPath)
    val lineage = written
      .withColumn("partition_id", spark_partition_id())
      .withColumn("row_hash", xxhash64(to_json(struct(written.columns.map(col): _*))))
      .groupBy($"partition_id")
      .agg(count(lit(1)).as("output_rows"),
        // xor-fold: order-independent, never overflows (ANSI-safe)
        coalesce(bit_xor($"row_hash"), lit(0L)).as("checksum"))
      .select(
        lit(name).as("stage"),
        $"partition_id".cast("int").as("partition_id"),
        lit(0L).as("input_rows"),
        $"output_rows",
        $"checksum",
        lit(id).as("snapshot_id"),
        lit(new Timestamp(System.currentTimeMillis())).as("committed_at"))
    val lineageDir = tableDir(name).resolve(s"snapshot-$id-lineage").toString
    lineage.write.mode("overwrite").parquet(lineageDir)

    // atomic manifest append: write tmp with full content, rename over
    Files.createDirectories(tableDir(name))
    val m = manifest(name)
    val existing =
      if (Files.exists(m)) Files.readAllLines(m, UTF_8).asScala.toSeq else Seq.empty
    val entry =
      s"""{"snapshot_id": $id, "table": "$name", "committed_at_ms": ${System.currentTimeMillis()}}"""
    val tmp = tableDir(name).resolve(s"_snapshots.json.tmp-$id")
    Files.write(tmp, (existing :+ entry).mkString("\n").getBytes(UTF_8))
    Files.move(tmp, m, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    id
  }

  /** All lineage rows for a table across snapshots. */
  def lineage(name: String): Option[DataFrame] = {
    val dirs = snapshots(name).map(id => tableDir(name).resolve(s"snapshot-$id-lineage").toString)
      .filter(p => Files.exists(Paths.get(p)))
    if (dirs.isEmpty) None else Some(spark.read.parquet(dirs: _*))
  }

  /** MERGE-style append (S6 semantics, reference pipeline.py:416-547
    * UNWIND-upsert + dedup-before-write :791-801): rows whose key already
    * exists in the latest snapshot are dropped (left_anti), the remainder is
    * appended as a new snapshot of existing ∪ new. Idempotent: re-running the
    * same append is a no-op on content. Returns the new snapshot id (or the
    * current one when nothing new arrived).
    */
  def mergeAppend(name: String, df: DataFrame, keys: Seq[String],
      partitionBy: Seq[String] = Nil): Long = {
    read(name) match {
      case None => commit(name, df.dropDuplicates(keys), partitionBy)
      case Some(existing) =>
        val fresh = df.dropDuplicates(keys)
          .join(existing.select(keys.map(col): _*), keys, "left_anti")
        if (fresh.isEmpty) latestSnapshot(name).get
        else commit(name, existing.unionByName(fresh), partitionBy)
    }
  }

  /** Read a stage if committed, else compute + commit it (resume semantics). */
  def computeIfAbsent(name: String, partitionBy: Seq[String] = Nil)(f: => DataFrame): DataFrame =
    read(name) match {
      case Some(df) => df
      case None =>
        commit(name, f, partitionBy)
        read(name).get
    }
}

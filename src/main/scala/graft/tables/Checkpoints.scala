package graft.tables

import org.apache.spark.sql.DataFrame

/** Lineage-truncation helper shared by every stage that eagerly materializes
  * a small intermediate (connected-components iterations, dedup's pending
  * table, in-memory ingest's entity/remap/topic tables).
  *
  * `localCheckpoint` truncates lineage to executor-local blocks: on a real
  * cluster, losing an executor makes the data unrecoverable (no lineage left
  * to recompute) — a documented Spark caveat. So when the session has a
  * RELIABLE checkpoint dir configured (`sparkContext.setCheckpointDir`), use
  * `df.checkpoint()` (survives executor loss); fall back to `localCheckpoint`
  * only in single-JVM local mode where executor loss is process death anyway.
  */
object Checkpoints {

  def truncate(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) {
      // persist BEFORE checkpoint: an unpersisted df.checkpoint() runs the
      // plan twice (once for the eager action, once when
      // ReliableRDDCheckpointData re-computes to write the files — the
      // documented Spark caveat), doubling every truncated stage's cost
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try df.checkpoint()
      finally df.unpersist()
    } else df.localCheckpoint()
}

package graft.canon

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Connected components as iterative DataFrame joins (SURVEY.md §2.3 J2).
  *
  * Replaces the reference's in-memory Union-Find
  * (/root/reference/src/util/entity_dedup.py:68-97,226-256) with distributed
  * min-label propagation: every vertex repeatedly adopts the smallest label
  * among itself and its neighbors until fixpoint. Converges in O(diameter)
  * rounds — alias/similarity graphs have tiny diameters (≤ 3-4), so this beats
  * the constant-factor overhead of large-star/small-star for our workload
  * while remaining fully distributed (no GraphFrames jar in /opt/spark/jars).
  *
  * Scale notes: each round is one shuffle on `id`; `localCheckpoint` every
  * round truncates lineage so plans don't grow across iterations; the driver
  * only sees a per-round changed-count (an aggregated Long), never data rows.
  */
object ConnectedComponents {

  /** @param edges DataFrame with string columns (src, dst); undirected.
    * @return DataFrame (id, component) where component = min id reachable.
    */
  def run(spark: SparkSession, edges: DataFrame, maxIter: Int = 25): DataFrame = {
    import spark.implicits._
    val sym = edges.select($"src", $"dst")
      .union(edges.select($"dst".as("src"), $"src".as("dst")))
      .filter($"src" =!= $"dst")
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    val vertices = sym.select($"src".as("id"))
      .union(edges.select($"src".as("id")))
      .union(edges.select($"dst".as("id")))
      .distinct()

    var labels = vertices.withColumn("component", $"id").localCheckpoint()
    var iter = 0
    var changed = 1L
    while (changed > 0 && iter < maxIter) {
      // 1. neighbor min: for each edge (src,dst), dst hears src's label
      val msgs = sym.join(labels, sym("src") === labels("id"))
        .select(sym("dst").as("id"), $"component")
      val merged = labels.select($"id", $"component").union(msgs)
        .groupBy($"id").agg(min($"component").as("component"))
      // 2. pointer jumping: adopt the label of my label (labels are always
      //    vertex ids, so the self-join is total) → O(log n) convergence on
      //    long chains instead of O(diameter)
      val jump = merged.select($"id".as("jid"), $"component".as("jcomp"))
      val next = merged.join(jump, merged("component") === jump("jid"), "left")
        .select($"id", least($"component", coalesce($"jcomp", $"component")).as("component"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("component", "old"), "id")
        .filter($"component" =!= $"old")
        .count()
      labels = next
      iter += 1
    }
    sym.unpersist()
    labels
  }
}

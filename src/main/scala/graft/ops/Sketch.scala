package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable frequency sketches as plain DataFrames — the streaming-scale
  * answer to "how often does each key occur" when the key space is too large
  * to count exactly per consumer.
  *
  * The count-min sketch here is a (depth × width) grid of counters held as
  * ordinary (sketch_row, bucket, cnt) rows: building it is ONE narrow
  * projection (depth buckets per item) plus ONE aggregation; merging two
  * sketches is a unionByName + re-aggregate (counters are additive); point
  * estimates are a broadcast-sized join. Nothing is driver-resident, so a
  * 10^12-item stream sketches in a single pass with `depth × width` output
  * rows regardless of cardinality.
  *
  * Guarantees (standard CM): estimate >= true count always (counters only
  * over-count on hash collisions); estimate <= true + ε·N with probability
  * 1 - δ for width = ⌈e/ε⌉, depth = ⌈ln 1/δ⌉.
  *
  * Buckets come from a 16-bit md5 slice ([[Sampling.hashBucket]]'s trick),
  * NOT a JVM-private hash: any engine — the driver's DuckDB oracle included
  * — recomputes the identical sketch, so the whole structure is
  * exact-oracle-checkable, and a sketch persisted by this engine can be
  * probed by any other system that reads the table.
  */
object Sketch {

  /** Counter column of `key` in sketch row `row`: md5("cms<row>:" + key)
    * sliced to 16 bits, mod width. Width must stay ≤ 65536 (the slice's
    * domain); rows beyond ~16 would reuse entropy anyway (ε·N floors first).
    */
  def cmsBucket(key: Column, row: Int, width: Int): Column =
    conv(substring(md5(concat(lit(s"cms$row:"), key.cast("string"))), 1, 4), 16, 10)
      .cast("int") % width

  /** Build a count-min sketch over `items(keyCol)`: (sketch_row, bucket,
    * cnt) with depth × width rows at most. One scan of the input (each item
    * explodes to its `depth` buckets), one partial-aggregated groupBy.
    */
  def countMin(items: DataFrame, keyCol: String,
      width: Int = 1024, depth: Int = 4): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && width <= 65536, s"width must be in [2,65536], got $width")
    items.select(posexplode(array(
        (0 until depth).map(i => cmsBucket(col(keyCol), i, width)): _*))
      .as(Seq("sketch_row", "bucket")))
      .groupBy(col("sketch_row"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge sketches built with the SAME (width, depth): counters add. */
  def cmsMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("sketch_row"), col("bucket"))
      .agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for every key in `keys(keyCol)`: min over the key's
    * depth counters (absent counter = 0). Returns (keyCol, cms_count).
    */
  def cmsEstimate(sketch: DataFrame, keys: DataFrame, keyCol: String,
      width: Int = 1024, depth: Int = 4): DataFrame =
    keys.select(col(keyCol), posexplode(array(
        (0 until depth).map(i => cmsBucket(col(keyCol), i, width)): _*))
      .as(Seq("sketch_row", "bucket")))
      .join(sketch, Seq("sketch_row", "bucket"), "left")
      .groupBy(col(keyCol))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_count"))
}

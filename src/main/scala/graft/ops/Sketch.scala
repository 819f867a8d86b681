package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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
    items.filter(col(keyCol).isNotNull) // null keys are uncountable, not a bucket
      .select(posexplode(array(
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

  /** HyperLogLog registers over `items(keyCol)`: (register, max_rho) with
    * at most 2^p rows. Like [[countMin]], the registers are held as plain
    * rows and derived purely from md5 HEX-STRING arithmetic (register = the
    * first p/4 hex chars; rho = 1 + leading zero BITS of the next 60, read
    * off the zero-run length and a 16-way nibble table), so any engine
    * recomputes the identical sketch and two sketches merge by max.
    *
    * Spark's own approx_count_distinct is the codegen'd default for a
    * one-shot answer; THIS form is for sketches that must be persisted,
    * merged across tables/engines, or audited by the oracle.
    *
    * @param p register-index bits; multiple of 4 (hex alignment), 4..12.
    */
  def hllRegisters(items: DataFrame, keyCol: String, p: Int = 8): DataFrame =
    hllRegistersBy(items, Nil, keyCol, p)

  /** Per-GROUP HLL registers: one register set per distinct `groupCols`
    * value — (groupCols..., register, max_rho). The layer grouped sketches
    * build on: per-source audit sketches, per-partition lineage
    * cardinalities, and HyperBall's per-vertex neighborhood balls
    * ([[graft.query.GraphAlgos.hyperBall]]). `groupCols = Nil` is the plain
    * whole-table sketch of [[hllRegisters]].
    */
  def hllRegistersBy(items: DataFrame, groupCols: Seq[String], keyCol: String,
      p: Int = 8): DataFrame = {
    require(p >= 4 && p <= 12 && p % 4 == 0, s"p must be 4, 8, or 12, got $p")
    val h = md5(col(keyCol).cast("string"))
    val reg = conv(substring(h, 1, p / 4), 16, 10).cast("int")
    val tail = substring(h, p / 4 + 1, 15) // 60 hash bits for the rho scan
    val stripped = regexp_replace(tail, "^0*", "")
    val zeros = length(tail) - length(stripped)
    val firstNz = substring(stripped, 1, 1)
    val extraBits = when(firstNz === "1", 3)
      .when(firstNz.isin("2", "3"), 2)
      .when(firstNz.isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    val rho = when(stripped === "", lit(61))
      .otherwise(zeros * 4 + extraBits + 1)
    items.filter(col(keyCol).isNotNull)
      .select(groupCols.map(col) ++ Seq(reg.as("register"), rho.as("rho")): _*)
      .groupBy((groupCols :+ "register").map(col): _*)
      .agg(max(col("rho")).as("max_rho"))
  }

  /** Merge HLL register sets built with the same p: registers take max. */
  def hllMerge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b)
      .groupBy(col("register")).agg(max(col("max_rho")).as("max_rho"))

  /** Distinct-count estimate from [[hllRegisters]] output: the standard
    * bias-corrected harmonic mean, with linear counting below 2.5m (the
    * published small-range correction). One tiny aggregation; registers
    * absent from the sketch count as zero-valued.
    */
  def hllEstimate(registers: DataFrame, p: Int = 8): Double = {
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val row = registers
      .agg(sum(pow(lit(2.0), -col("max_rho"))).as("s"),
        count(lit(1)).as("present"))
      .collect()(0)
    val present = row.getLong(1)
    val s = (if (row.isNullAt(0)) 0.0 else row.getDouble(0)) + (m - present)
    val raw = alpha * m * m / s
    val zeroRegs = m - present
    if (raw <= 2.5 * m && zeroRegs > 0) m * math.log(m.toDouble / zeroRegs)
    else raw
  }

  /** Per-GROUP distinct-count estimates from [[hllRegistersBy]] output:
    * (groupCols..., estimate) — the same bias-corrected harmonic mean +
    * linear-counting branch as [[hllEstimate]], as one aggregation (never a
    * per-group driver collect).
    */
  def hllEstimateBy(registers: DataFrame, groupCols: Seq[String],
      p: Int = 8): DataFrame = {
    require(groupCols.nonEmpty, "groupCols must be non-empty (use hllEstimate)")
    val m = 1 << p
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    val agg = registers.groupBy(groupCols.map(col): _*)
      .agg(sum(pow(lit(2.0), -col("max_rho"))).as("s_present"),
        count(lit(1)).as("present"))
    val mD = lit(m.toDouble)
    val zero = (mD - col("present")).cast("double")
    val sFull = col("s_present") + zero
    val raw = lit(alpha) * mD * mD / sFull
    agg.select(groupCols.map(col) :+
      when(raw <= lit(2.5 * m) && zero > 0, mD * log(mD / zero))
        .otherwise(raw).as("estimate"): _*)
  }

  /** QUANTILE sketch as a deterministic Bernoulli row sample: keep the rows
    * whose salted 16-bit md5 bucket of `keyCol` falls under `rate16` (out of
    * 65536 — [[Sampling.hashBucket]]'s domain), all columns intact. The
    * distribution member of the sketch family ([[countMin]] = frequency,
    * [[hllRegisters]] = cardinality): you cannot sort 100 TB for a
    * percentile, but ONE codegen'd scan predicate — no shuffle, no state —
    * yields a sample whose rank statistics bound the true ones.
    *
    * Same determinism contract as the split/mixture gates: the sample is a
    * pure function of the key bytes, so retries/layouts/engines reproduce it
    * row-identically (the DuckDB oracle recomputes the same gate), and
    * samples over DISJOINT row sets with the same (salt, rate16) merge by
    * plain union into exactly the sample of the union — O(delta)
    * refreshable like the other sketches.
    *
    * Accuracy (DKW): with s kept rows, every sample quantile's TRUE rank is
    * within ε·n of its nominal rank with probability 1 - 2e^(-2sε²) — e.g.
    * s = 2,500 keeps every quantile within ±3 rank-percentiles at ~10^-5
    * failure odds, independent of n. Size `rate16` for the s you want.
    */
  def quantileSample(items: DataFrame, keyCol: String, rate16: Int,
      salt: String = "graft-qtile"): DataFrame = {
    require(rate16 >= 1 && rate16 <= Sampling.Buckets,
      s"rate16 must be in [1, ${Sampling.Buckets}], got $rate16")
    items.filter(Sampling.hashBucket(col(keyCol), salt) < rate16)
  }

  /** Exact rank-statistic quantiles over a [[quantileSample]]: for each q in
    * `qs`, the (⌊q·(n-1)⌋+1)-th smallest `valueCol` per `by` group (n = the
    * group's sample size) — the deterministic "lower" empirical quantile,
    * identical in any engine (no interpolation, no floating aggregation).
    *
    * The per-group rank window runs each group on one task BY DESIGN: the
    * sample rate bounds group sizes to sketch scale, so this is a window
    * over the sketch, never over the corpus. Returns (by..., q, valueCol).
    */
  def sampleQuantiles(sample: DataFrame, valueCol: String, qs: Seq[Double],
      by: Seq[String] = Nil): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0.0 && q <= 1.0),
      s"quantiles must be fractions in [0,1], got $qs")
    val grp = Window.partitionBy(by.map(col): _*)
    sample
      .withColumn("__rn", row_number().over(grp.orderBy(col(valueCol))))
      .withColumn("__n", count(lit(1)).over(grp))
      .withColumn("q", explode(array(qs.map(lit): _*)))
      .filter(col("__rn") === floor(col("q") * (col("__n") - 1)) + 1)
      .select(by.map(col) ++ Seq(col("q"), col(valueCol)): _*)
  }
}

package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark's optimizer has no native plan for: as-of
  * joins (for each probe row, the closest build row at-or-before /
  * at-or-after its timestamp) and range/interval joins (points against
  * intervals), both built so they NEVER degrade into a per-key pair blowup.
  *
  * Why not just write the predicate? `l JOIN r ON l.k = r.k AND r.ts <= l.ts`
  * plans as an equi-join on `k` with the range as a post-join FILTER — every
  * probe row pairs with EVERY earlier build row of its key before the
  * window/aggregate picks one. A key with p probes and b builds materializes
  * O(p·b) rows; at 100 TB a hot key turns that into a shuffle-killing
  * quadratic. Without an equi key Spark falls back to
  * BroadcastNestedLoopJoin — a cartesian scan.
  *
  * [[asofJoin]] instead uses the union-scan formulation (the standard
  * columnar-engine technique, cf. DuckDB's ASOF JOIN and pandas
  * `merge_asof`): tag both sides, union them on an aligned schema, sort each
  * key's rows once by time, and carry the most recent build payload across
  * the scan with `last(..., ignoreNulls)` over an unbounded-preceding frame.
  * Cost is ONE shuffle + ONE sort over (probes + builds) — identical to a
  * sort-merge join's prep — and O(p + b) per key regardless of match
  * fan-out.
  *
  * [[rangeJoin]] buckets time: each interval explodes to the fixed-width
  * buckets it covers, each point maps to its single bucket, and a plain
  * equi-join on (keys..., bucket) meets every qualifying pair exactly once
  * (a point lives in exactly one bucket, so no post-join dedup). Replication
  * factor is len(interval)/bucketWidth + 1 — bounded and chosen by the
  * caller, vs. the unbounded blowup of the filter formulation.
  *
  * Scale notes (100 TB): both operators shuffle once on their keys. asofJoin
  * is linear per key but single-threaded WITHIN a key (it is a sort + running
  * carry); if one key holds a double-digit percent of all rows, split its
  * time axis into salted chunks and seed each chunk with the previous chunk's
  * closing state (the same boundary-carry trick TurnChunker uses for salted
  * conversation windows). rangeJoin's hot spot is a bucket that many
  * intervals cover — widen `bucketWidth` toward the typical interval length
  * to cap replication, or add a high-cardinality `by` key.
  *
  * Measured (BASELINE.md round-5 "As-of join A/B", local[16]): balanced 2M
  * rows / 20k keys — union-scan 0.58 s vs naive join+filter+window 5.93 s
  * (10×); one hot key holding 1M rows — union-scan takes the FULL 4M corpus
  * in 0.28 s while the naive plan needs 4.6 s for 1% of that input (100M
  * pairs) and extrapolates quadratically (~10^12 pairs) at full size.
  */
object Temporal {

  /** Direction of the as-of match relative to the probe timestamp. */
  sealed trait Direction
  /** Latest build row with `build.ts <= probe.ts` (the default, pandas'
    * `backward`). */
  case object Backward extends Direction
  /** Earliest build row with `build.ts >= probe.ts`. */
  case object Forward extends Direction
  /** Whichever of Backward/Forward is closer in absolute time; exact ties
    * prefer the Backward match (pandas' `nearest` semantics). */
  case object Nearest extends Direction

  private val SideCol = "__graft_asof_side"
  private val PayloadCol = "__graft_asof_payload"
  private val ProbeCol = "__graft_asof_probe"
  private val TsCol = "__graft_asof_ts"
  private val TieCol = "__graft_asof_tie"

  /** As-of join: for every row of `probe`, attach the single `build` row of
    * the same `by` keys whose `buildOn` timestamp is closest to `probeOn`
    * in the given direction (left-outer: unmatched probe rows keep nulls).
    *
    * Ties inside `build` (several rows at the exact matched timestamp) are
    * broken deterministically by MAX of `tieBreak` when given — required for
    * reproducible output under task retries; without it Spark's scan order
    * decides. Matched-side columns keep their `build` names, so callers
    * disambiguate by renaming before the call (enforced: overlapping names
    * are rejected).
    *
    * @param tolerance  max |probe.ts - build.ts| in seconds; farther matches
    *                   become nulls (the row itself stays, left-outer).
    */
  def asofJoin(
      probe: DataFrame,
      build: DataFrame,
      probeOn: String,
      buildOn: String,
      by: Seq[String],
      direction: Direction = Backward,
      tolerance: Option[Long] = None,
      tieBreak: Option[String] = None): DataFrame = {

    val overlap = build.columns.toSet.intersect(probe.columns.toSet) -- by
    require(overlap.isEmpty,
      s"rename overlapping build columns before the join: ${overlap.mkString(", ")}")
    require(!by.contains(probeOn) && !by.contains(buildOn),
      "the as-of timestamp cannot also be a by key")

    val buildCols = build.columns.filterNot(by.contains)
    val tie = tieBreak.map(col).getOrElse(lit(0))

    // Align both sides on (by..., ts, side, tie, probe-struct, build-struct).
    val probeSide = probe.select(
      by.map(col) ++ Seq(
        toSeconds(probe, probeOn).as(TsCol),
        lit(0).as(SideCol),
        lit(0L).cast("double").as(TieCol),
        struct(probe.columns.map(col): _*).as(ProbeCol),
        lit(null).cast(structType(build, buildCols)).as(PayloadCol)): _*)
    val buildSide = build.select(
      by.map(col) ++ Seq(
        toSeconds(build, buildOn).as(TsCol),
        lit(1).as(SideCol),
        tie.cast("double").as(TieCol),
        lit(null).cast(structType(probe, probe.columns)).as(ProbeCol),
        struct(buildCols.map(col): _*).as(PayloadCol)): _*)

    // Backward: scan time ascending; at equal ts the build row must be
    // visible to the probe row (inclusive match) => build sorts first
    // (side desc). Among equal-ts build rows, tie ASC puts the max-tie row
    // last, and last(ignoreNulls) picks it. Forward mirrors the scan. Both
    // carries share ONE window partitioning, so Nearest costs the same
    // single shuffle (one Exchange, two Sorts) as a directional join —
    // never a second scan of either input or a probe-side self-join (the
    // obvious back⋈fwd formulation multiplies duplicate probe rows and
    // drops null-keyed ones).
    def carry(dir: Direction): Column = {
      val ordering = dir match {
        case Backward => Seq(col(TsCol).asc, col(SideCol).desc, col(TieCol).asc)
        case _ => Seq(col(TsCol).desc, col(SideCol).desc, col(TieCol).asc)
      }
      last(col(PayloadCol), ignoreNulls = true).over(
        Window.partitionBy(by.map(col): _*).orderBy(ordering: _*)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    }
    def distOf(p: Column): Column =
      abs(col(TsCol) - secondsOf(p.getField(buildOn), build.schema(buildOn).dataType))
    // null beyond the tolerance bound (the probe row itself stays)
    def tolGate(p: Column): Column = tolerance match {
      case Some(t) => when(distOf(p) <= t, p)
      case None => p
    }
    val unioned = probeSide.unionByName(buildSide)
    val carried = direction match {
      case Nearest =>
        val back = tolGate(carry(Backward))
        val fwd = tolGate(carry(Forward))
        // closer side wins; exact ties and an absent forward keep backward
        unioned.withColumn(PayloadCol,
          when(back.isNull, fwd)
            .when(fwd.isNull, back)
            .when(distOf(fwd) < distOf(back), fwd)
            .otherwise(back))
          .filter(col(SideCol) === 0)
      case dir =>
        unioned.withColumn(PayloadCol, tolGate(carry(dir)))
          .filter(col(SideCol) === 0)
    }
    carried.select(
      probe.columns.map(c => col(s"$ProbeCol.$c").as(c)) ++
        buildCols.map(c => col(s"$PayloadCol.$c").as(c)): _*)
  }

  /** Interval join: every (point, interval) pair of the same `by` keys with
    * `start <= point <= end` (inclusive), met exactly once via fixed-width
    * time buckets — never a cartesian or nested-loop plan. Inner semantics.
    *
    * @param bucketSecs bucket width in seconds; each interval replicates to
    *                   ceil(len/bucketSecs)+1 buckets, so pick it near the
    *                   typical interval length.
    */
  def rangeJoin(
      points: DataFrame,
      pointOn: String,
      intervals: DataFrame,
      startOn: String,
      endOn: String,
      by: Seq[String] = Nil,
      bucketSecs: Long = 3600L): DataFrame = {
    require(bucketSecs > 0, "bucketSecs must be positive")
    val overlap = intervals.columns.toSet.intersect(points.columns.toSet) -- by
    require(overlap.isEmpty,
      s"rename overlapping interval columns before the join: ${overlap.mkString(", ")}")

    // Prefix-rename the interval side so the equi-join works even when both
    // inputs share lineage (e.g. two filters of the same table) — qualified
    // self-join references are ambiguity-prone; unique names never are.
    val pfx = "__graft_iv_"
    val bkt = "__graft_range_bucket"
    val pts = points.withColumn(bkt, floor(toSeconds(points, pointOn) / bucketSecs))
    val renamed = intervals.columns.foldLeft(intervals)(
      (d, c) => d.withColumnRenamed(c, pfx + c))
    val ivs = renamed.withColumn(pfx + bkt, explode(sequence(
      floor(toSeconds(renamed, pfx + startOn) / bucketSecs),
      floor(toSeconds(renamed, pfx + endOn) / bucketSecs))))
    val cond = (by.map(k => (k, pfx + k)) :+ (bkt -> (pfx + bkt)))
      .map { case (l, r) => col(l) === col(r) }.reduce(_ && _)
    pts.join(ivs, cond, "inner")
      .filter(secondsOf(col(pointOn), points.schema(pointOn).dataType).between(
        secondsOf(col(pfx + startOn), intervals.schema(startOn).dataType),
        secondsOf(col(pfx + endOn), intervals.schema(endOn).dataType)))
      .select(points.columns.map(col) ++
        intervals.columns.filterNot(by.contains).map(c => col(pfx + c).as(c)): _*)
  }

  /** Band join: pairs within ±`widthSecs` of each other — a range join where
    * each right row becomes the interval [ts-width, ts+width].
    */
  def bandJoin(
      left: DataFrame,
      leftOn: String,
      right: DataFrame,
      rightOn: String,
      widthSecs: Long,
      by: Seq[String] = Nil): DataFrame = {
    val startC = "__graft_band_start"
    val endC = "__graft_band_end"
    val secs = toSeconds(right, rightOn)
    val ivs = right.withColumn(startC, secs - widthSecs).withColumn(endC, secs + widthSecs)
    rangeJoin(left, leftOn, ivs, startC, endC, by, bucketSecs = math.max(1L, widthSecs))
      .drop(startC, endC)
  }

  /** Numeric seconds for a timestamp-or-numeric column (a DOUBLE cast of
    * TimestampType is epoch seconds with the micros preserved as fraction).
    * TIMESTAMP_NTZ (what parquet scans produce for naive timestamps) has no
    * direct double cast — route it through TIMESTAMP first; the session-TZ
    * shift that conversion applies cancels in every use here (differences,
    * ordering, bucketing), so results are timezone-invariant.
    */
  private def toSeconds(df: DataFrame, c: String): Column =
    secondsOf(df(c), df.schema(c).dataType)

  private def secondsOf(c: Column, dt: org.apache.spark.sql.types.DataType): Column =
    dt match {
      case org.apache.spark.sql.types.TimestampNTZType => c.cast("timestamp").cast("double")
      case _ => c.cast("double")
    }

  private def structType(df: DataFrame, cols: Seq[String]) =
    org.apache.spark.sql.types.StructType(cols.map(c => df.schema(c)))
}

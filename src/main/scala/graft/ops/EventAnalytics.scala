package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-sequence analytics over an (user, ts, event_type) stream — the two
  * classic product-analytics operators (ClickHouse's windowFunnel /
  * retention family), expressed as per-step aggregation+join rounds so the
  * shapes stay hash-partitioned on the user key at any scale (never a
  * per-user sort of the whole stream, never a collect).
  */
object EventAnalytics {

  /** Ordered funnel, anchored at each user's EARLIEST step-1 event: step i
    * matches its earliest event STRICTLY after step i−1's match and within
    * `windowExpr` (e.g. "INTERVAL 72 HOURS") of the anchor. Returns one row
    * per user who reached step 1: (userCol, t1..tk, steps_completed).
    *
    * Semantics note (pinned for determinism + replayability): anchoring at
    * the earliest step-1 event means a chain completable only from a LATER
    * step-1 occurrence does not count — unlike ClickHouse's windowFunnel,
    * which scans all anchors. The greedy-from-earliest rule is one
    * deterministic aggregation per step; all-anchor matching would need a
    * per-user sequence scan. Each step costs one filtered aggregation and
    * one hash join on the user key — k small and fixed.
    */
  def funnel(events: DataFrame, steps: Seq[String], windowExpr: String,
      userCol: String = "user_id", tsCol: String = "ts",
      typeCol: String = "event_type"): DataFrame = {
    require(steps.size >= 2, s"a funnel needs >= 2 steps, got ${steps.size}")
    val slim = events.select(col(userCol), col(tsCol), col(typeCol))
    val win = expr(windowExpr)
    var cur = slim.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    for (i <- 2 to steps.size) {
      val prev = s"t${i - 1}"
      // left join so partial funnels survive; the when() gates matching —
      // a user with step events only OUTSIDE the window keeps t_i = null
      // (a filter here would drop their row and lose the partial depth)
      val matched = cur
        .join(slim.filter(col(typeCol) === steps(i - 1)), Seq(userCol), "left")
        .groupBy((col(userCol) +: (1 until i).map(j => col(s"t$j"))): _*)
        .agg(min(when(col(tsCol) > col(prev) && col(tsCol) <= col("t1") + win,
          col(tsCol))).as(s"t$i"))
      cur = matched
    }
    cur.withColumn("steps_completed",
      (1 to steps.size).map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
        .reduce(_ + _))
  }

  /** Weekly cohort retention: users grouped by the ISO week of their first
    * event; for each (cohort_week, week_offset), how many of the cohort's
    * users were active that week. All-integer output — exact across
    * engines. Two aggregations + one join, all keyed on the user.
    */
  def cohortRetention(events: DataFrame, userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    val firsts = events.groupBy(col(userCol))
      .agg(date_trunc("week", min(col(tsCol))).as("cohort_week"))
    val active = events
      .select(col(userCol), date_trunc("week", col(tsCol)).as("active_week"))
      .distinct()
    firsts.join(active, Seq(userCol))
      .groupBy(col("cohort_week"),
        (datediff(col("active_week"), col("cohort_week")) / 7)
          .cast("int").as("week_offset"))
      .agg(count(lit(1)).as("active_users"))
  }
}

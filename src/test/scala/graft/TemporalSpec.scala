package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.ops.Temporal

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  // quotes: (user, ts, price) — the build side; trades: (trade_id, user, ts)
  private def quotes = Seq(
    ("u1", 10L, 1.0), ("u1", 20L, 2.0), ("u1", 20L, 2.5), ("u1", 40L, 4.0),
    ("u2", 15L, 9.0))
    .toDF("user", "qts", "price")
    .withColumn("qid", monotonically_increasing_id()) // not used as tie

  private def trades = Seq(
    (1L, "u1", 5L),   // before any quote -> null
    (2L, "u1", 20L),  // exact tie with TWO quotes at 20 -> max-tie (2.5)
    (3L, "u1", 25L),  // between 20 and 40 -> backward 20, forward 40
    (4L, "u2", 100L), // far after u2's only quote
    (5L, "u3", 50L))  // user with no quotes -> null
    .toDF("trade_id", "user", "tts")

  private def q = quotes.select($"user", $"qts", $"price",
    row_number().over(org.apache.spark.sql.expressions.Window
      .partitionBy($"user").orderBy($"qts", $"price")).cast("long").as("qtie"))

  test("asofJoin backward: latest quote at-or-before, inclusive, max-tie on equal ts") {
    val out = Temporal.asofJoin(trades, q, "tts", "qts", by = Seq("user"),
        tieBreak = Some("qtie"))
      .select($"trade_id", $"qts", $"price").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(out === Seq(
      (1L, None, None),
      (2L, Some(20L), Some(2.5)),  // inclusive + deterministic tie: max qtie
      (3L, Some(20L), Some(2.5)),
      (4L, Some(15L), Some(9.0)),
      (5L, None, None)))
  }

  test("asofJoin forward: earliest quote at-or-after") {
    val out = Temporal.asofJoin(trades, q, "tts", "qts", by = Seq("user"),
        direction = Temporal.Forward, tieBreak = Some("qtie"))
      .select($"trade_id", $"qts", $"price").as[(Long, Option[Long], Option[Double])]
      .collect().sortBy(_._1)
    assert(out === Seq(
      (1L, Some(10L), Some(1.0)),
      (2L, Some(20L), Some(2.5)),
      (3L, Some(40L), Some(4.0)),
      (4L, None, None),
      (5L, None, None)))
  }

  test("asofJoin nearest: closer side wins, exact tie prefers backward") {
    val tr = Seq((1L, "u1", 12L), (2L, "u1", 30L), (3L, "u1", 3L))
      .toDF("trade_id", "user", "tts")
    val out = Temporal.asofJoin(tr, q, "tts", "qts", by = Seq("user"),
        direction = Temporal.Nearest, tieBreak = Some("qtie"))
      .select($"trade_id", $"qts").as[(Long, Option[Long])]
      .collect().sortBy(_._1)
    assert(out === Seq(
      (1L, Some(10L)), // |12-10|=2 < |20-12|=8
      (2L, Some(20L)), // |30-20|=10 == |40-30|=10 -> backward
      (3L, Some(10L)))) // only forward exists
  }

  test("asofJoin nearest: duplicate probe rows yield one row each, single shuffle, no join") {
    val tr = Seq((1L, "u1", 12L), (1L, "u1", 12L), (2L, "u1", 30L))
      .toDF("trade_id", "user", "tts")
    val df = Temporal.asofJoin(tr, q, "tts", "qts", by = Seq("user"),
      direction = Temporal.Nearest, tieBreak = Some("qtie"))
    val out = df.select($"trade_id", $"qts").as[(Long, Option[Long])].collect()
    // a back⋈fwd formulation would multiply the duplicated probe row (2×2=4)
    assert(out.length === 3)
    assert(out.sorted === Seq((1L, Some(10L)), (1L, Some(10L)), (2L, Some(20L))))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), plan)
    // same shuffle count as a directional join on the same inputs (the
    // fixture's own qtie window contributes one exchange to both plans)
    val backPlan = Temporal.asofJoin(tr, q, "tts", "qts", by = Seq("user"),
      tieBreak = Some("qtie")).queryExecution.executedPlan.toString
    assert("hashpartitioning".r.findAllIn(plan).size ===
      "hashpartitioning".r.findAllIn(backPlan).size, plan)
  }

  test("asofJoin nearest respects the tolerance on both sides") {
    val tr = Seq((1L, "u1", 3L), (2L, "u1", 12L)).toDF("trade_id", "user", "tts")
    val out = Temporal.asofJoin(tr, q, "tts", "qts", by = Seq("user"),
        direction = Temporal.Nearest, tolerance = Some(5L), tieBreak = Some("qtie"))
      .select($"trade_id", $"qts").as[(Long, Option[Long])]
      .collect().sortBy(_._1)
    // trade 1: no backward; forward at 10 is 7s away > 5 -> null.
    // trade 2: backward 10 (2s) within 5; forward 20 (8s) gated out -> 10.
    assert(out === Seq((1L, None), (2L, Some(10L))))
  }

  test("asofJoin tolerance nulls matches farther than the bound") {
    val out = Temporal.asofJoin(trades, q, "tts", "qts", by = Seq("user"),
        tolerance = Some(10L), tieBreak = Some("qtie"))
      .select($"trade_id", $"qts").as[(Long, Option[Long])]
      .collect().sortBy(_._1)
    // trade 4 (u2 at 100, quote at 15) is 85s away -> nulled; rows survive
    assert(out === Seq(
      (1L, None), (2L, Some(20L)), (3L, Some(20L)), (4L, None), (5L, None)))
  }

  test("asofJoin rejects overlapping non-key column names") {
    val bad = trades.withColumnRenamed("tts", "qts")
    intercept[IllegalArgumentException] {
      Temporal.asofJoin(bad, q, "qts", "qts", by = Seq("user"))
    }
  }

  test("asofJoin on real timestamps matches the integer-seconds formulation") {
    val tsTrades = trades.withColumn("tts", col("tts").cast("timestamp"))
    val tsQuotes = q.withColumn("qts", col("qts").cast("timestamp"))
    val out = Temporal.asofJoin(tsTrades, tsQuotes, "tts", "qts",
        by = Seq("user"), tieBreak = Some("qtie"))
      .select($"trade_id", $"qts", $"price")
      .as[(Long, Option[Timestamp], Option[Double])].collect().sortBy(_._1)
    assert(out.map { case (id, ts, p) => (id, ts.map(_.getTime / 1000), p) } === Seq(
      (1L, None, None), (2L, Some(20L), Some(2.5)), (3L, Some(20L), Some(2.5)),
      (4L, Some(15L), Some(9.0)), (5L, None, None)))
  }

  test("rangeJoin matches the naive range predicate exactly (inclusive ends)") {
    val points = (0L until 200L).map(i => (i, (i * 7) % 143)).toDF("pid", "pt")
    val ivs = Seq((1L, 0L, 10L), (2L, 10L, 12L), (3L, 50L, 140L), (4L, 141L, 141L))
      .toDF("iv_id", "lo", "hi")
    val got = Temporal.rangeJoin(points, "pt", ivs, "lo", "hi", bucketSecs = 16L)
      .select($"pid", $"iv_id").as[(Long, Long)].collect().toSet
    val want = points.as[(Long, Long)].collect().flatMap { case (pid, pt) =>
      Seq((1L, 0L, 10L), (2L, 10L, 12L), (3L, 50L, 140L), (4L, 141L, 141L))
        .collect { case (iv, lo, hi) if pt >= lo && pt <= hi => (pid, iv) }
    }.toSet
    assert(got === want && want.nonEmpty)
    // bucket width must not change the result (each pair met exactly once)
    val other = Temporal.rangeJoin(points, "pt", ivs, "lo", "hi", bucketSecs = 3L)
      .select($"pid", $"iv_id").as[(Long, Long)].collect()
    assert(other.toSet === want && other.length === want.size, "no duplicate pairs")
  }

  test("rangeJoin with by-keys joins within the key only") {
    val points = Seq(("a", 5L, 1L), ("b", 5L, 2L)).toDF("k", "pt", "pid")
    val ivs = Seq(("a", 0L, 10L, 7L)).toDF("k", "lo", "hi", "iv_id")
    val got = Temporal.rangeJoin(points, "pt", ivs, "lo", "hi",
        by = Seq("k"), bucketSecs = 4L)
      .select($"pid", $"iv_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 7L)))
  }

  test("bandJoin finds all pairs within the width, from shared-lineage inputs") {
    val ev = Seq((1L, 10L), (2L, 18L), (3L, 40L)).toDF("id", "ts")
    val left = ev.select($"id".as("l_id"), $"ts".as("l_ts"))
    val right = ev.select($"id".as("r_id"), $"ts".as("r_ts"))
    val got = Temporal.bandJoin(left, "l_ts", right, "r_ts", widthSecs = 8L)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 1L), (1L, 2L), (2L, 1L), (2L, 2L), (3L, 3L)))
  }

  test("plans: no cartesian/nested-loop; asof = one exchange, range = equi-join") {
    val asof = Temporal.asofJoin(trades, q, "tts", "qts", by = Seq("user"),
      tieBreak = Some("qtie"))
    val asofPlan = asof.queryExecution.executedPlan.toString
    assert(!asofPlan.contains("CartesianProduct") &&
      !asofPlan.contains("BroadcastNestedLoop"), asofPlan)
    // union-scan formulation: the only wide op is the window's partitioning
    assert("hashpartitioning".r.findAllIn(asofPlan).size >= 1 &&
      !asofPlan.contains("SortMergeJoin"), asofPlan)

    val points = (0L until 50L).map(i => (i, i % 40)).toDF("pid", "pt")
    val ivs = Seq((1L, 0L, 10L)).toDF("iv_id", "lo", "hi")
    val rj = Temporal.rangeJoin(points, "pt", ivs, "lo", "hi", bucketSecs = 8L)
    val rjPlan = rj.queryExecution.executedPlan.toString
    assert(!rjPlan.contains("CartesianProduct") &&
      !rjPlan.contains("BroadcastNestedLoop"), rjPlan)
    assert(rjPlan.contains("Join"), rjPlan) // bucket equi-join (SMJ/SHJ/BHJ)
  }

  test("funnel: depth per user, window + order enforced, partials survive, anchor pinned") {
    import graft.ops.EventAnalytics
    def t(h: Long) = new Timestamp(h * 3600 * 1000)
    val events = Seq(
      (1L, t(0), "signup"), (1L, t(1), "view"), (1L, t(2), "purchase"), // full
      (2L, t(0), "signup"), (2L, t(100), "view"),        // view out of window
      (3L, t(0), "view"), (3L, t(1), "purchase"),        // never step 1
      (4L, t(0), "signup"), (4L, t(1), "purchase"), (4L, t(2), "view"), // order: purchase@1 < t2 -> depth 2
      (5L, t(0), "signup"), (5L, t(0), "view"),          // same-ts: strictly-after fails
      (6L, t(0), "signup"), (6L, t(50), "signup"), (6L, t(60), "view")  // anchored at EARLIEST signup
    ).toDF("user_id", "ts", "event_type")
    val f = EventAnalytics.funnel(events, Seq("signup", "view", "purchase"),
        "INTERVAL 72 HOURS")
      .select($"user_id", $"t1", $"t2", $"t3", $"steps_completed")
      .as[(Long, Timestamp, Option[Timestamp], Option[Timestamp], Int)]
      .collect().map(r => r._1 -> r).toMap
    assert(!f.contains(3L), "no step-1 event -> no funnel row")
    assert(f(1L) === ((1L, t(0), Some(t(1)), Some(t(2)), 3)))
    assert(f(2L) === ((2L, t(0), None, None, 1)))
    assert(f(4L)._5 === 2 && f(4L)._3 === Some(t(2)) && f(4L)._4 === None)
    assert(f(5L)._5 === 1, "step 2 must be STRICTLY after step 1")
    // pinned semantics: the 60h view is outside 72h of the 0h anchor? No —
    // inside. Re-check with a 20h window: anchored at 0h, view@60h misses
    // even though the 50h signup would have caught it
    val f20 = EventAnalytics.funnel(events.filter($"user_id" === 6L),
        Seq("signup", "view"), "INTERVAL 20 HOURS")
      .select($"steps_completed").as[Int].collect()
    assert(f20.toSeq === Seq(1))
  }

  test("cohortRetention: first-week cohorts, distinct weekly actives, integer offsets") {
    import graft.ops.EventAnalytics
    def d(day: Int, h: Int = 0) = // Jan 2024: Mon Jan 1 starts ISO week 1
      Timestamp.valueOf(f"2024-01-$day%02d $h%02d:00:00")
    val events = Seq(
      (1L, d(1)), (1L, d(2)), (1L, d(9)),   // cohort wk0; active wk0 + wk1
      (2L, d(3)), (2L, d(16)),              // cohort wk0; active wk0 + wk2
      (3L, d(8))                            // cohort wk1; active wk1 only
    ).toDF("user_id", "ts")
    val r = EventAnalytics.cohortRetention(events)
      .as[(Timestamp, Int, Long)].collect()
      .map(x => (x._1.toString.take(10), x._2) -> x._3).toMap
    assert(r === Map(
      ("2024-01-01", 0) -> 2L, ("2024-01-01", 1) -> 1L, ("2024-01-01", 2) -> 1L,
      ("2024-01-08", 0) -> 1L))
  }
}

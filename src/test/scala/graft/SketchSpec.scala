package graft

import org.apache.spark.sql.functions._

import graft.ops.Sketch

class SketchSpec extends SparkSpec {
  import spark.implicits._

  // zipf-ish stream: key k appears 100/k times, k = 1..20
  private def stream = (1 to 20).flatMap(k => Seq.fill(100 / k)(k.toLong))
    .toDF("key")
  private def truth = (1 to 20).map(k => k.toLong -> (100 / k).toLong).toMap

  test("estimates never undercount, and are exact when width is generous") {
    val keys = stream.select($"key").distinct()
    // narrow sketch: collisions certain → over-counts allowed, never under
    val narrow = Sketch.cmsEstimate(
      Sketch.countMin(stream, "key", width = 8, depth = 3),
      keys, "key", width = 8, depth = 3)
      .as[(Long, Long)].collect().toMap
    truth.foreach { case (k, t) =>
      assert(narrow(k) >= t, s"key $k undercounted: ${narrow(k)} < $t") }
    // generous sketch: 20 keys in 4×4096 counters → all estimates exact
    val wide = Sketch.cmsEstimate(
      Sketch.countMin(stream, "key", width = 4096, depth = 4),
      keys, "key", width = 4096, depth = 4)
      .as[(Long, Long)].collect().toMap
    assert(wide === truth)
  }

  test("sketches merge additively: sketch(a ∪ b) == merge(sketch(a), sketch(b))") {
    val a = stream.filter($"key" <= 10)
    val b = stream.filter($"key" > 10)
    val whole = Sketch.countMin(stream, "key", width = 64, depth = 3)
      .as[(Int, Int, Long)].collect().toSet
    val merged = Sketch.cmsMerge(
      Sketch.countMin(a, "key", width = 64, depth = 3),
      Sketch.countMin(b, "key", width = 64, depth = 3))
      .as[(Int, Int, Long)].collect().toSet
    assert(merged === whole)
  }

  test("absent keys estimate at most the collision noise, never negative") {
    val sk = Sketch.countMin(stream, "key", width = 4096, depth = 4)
    val ghost = Seq(999L).toDF("key")
    val est = Sketch.cmsEstimate(sk, ghost, "key", width = 4096, depth = 4)
      .as[(Long, Long)].collect().head._2
    assert(est >= 0L && est <= 5L, s"ghost estimate $est")
  }

  test("sketch size is bounded by depth × width regardless of input size") {
    val sk = Sketch.countMin(stream, "key", width = 8, depth = 3)
    assert(sk.count() <= 24)
  }

  test("HLL estimate lands within 3 standard errors at several cardinalities") {
    // std error = 1.04/sqrt(m); m=256 → 6.5%, 3σ ≈ 19.5%
    for (n <- Seq(300L, 3000L, 30000L)) {
      val keys = spark.range(n).select(($"id" * 31 + 7).as("key"))
      val est = Sketch.hllEstimate(Sketch.hllRegisters(keys, "key", p = 8), p = 8)
      assert(math.abs(est - n) / n < 0.195, s"n=$n est=$est")
    }
  }

  test("incremental sketch over readSince deltas equals a full rebuild") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sketch-inc").toString
    val log = new graft.tables.SnapshotLog(spark, dir)
    val base = spark.range(3000).toDF("key")
    log.commit("t", base, bloomKeys = Seq("key"))
    val snap1 = log.latestSnapshot("t").get
    val cms1 = Sketch.countMin(log.read("t").get, "key", width = 64, depth = 3)
    val hll1 = Sketch.hllRegisters(log.read("t").get, "key")
    // append: mergeAppend's anti-join lands only the 2000 NEW keys
    // (3000..4999); bucket collisions across old/new keys still force the
    // counter-ADD path in cmsMerge (64 buckets, 5000 keys)
    val delta = spark.range(2000, 5000).toDF("key")
    log.mergeAppend("t", delta, keys = Seq("key"))
    val since = log.readSince("t", snap1).get
    assert(since.count() === 2000)
    val incCms = Sketch.cmsMerge(cms1,
      Sketch.countMin(since, "key", width = 64, depth = 3))
      .as[(Int, Int, Long)].collect().toSet
    val fullCms = Sketch.countMin(log.read("t").get, "key", width = 64, depth = 3)
      .as[(Int, Int, Long)].collect().toSet
    assert(incCms === fullCms)
    val incHll = Sketch.hllMerge(hll1, Sketch.hllRegisters(since, "key"))
      .as[(Int, Int)].collect().toSet
    val fullHll = Sketch.hllRegisters(log.read("t").get, "key")
      .as[(Int, Int)].collect().toSet
    assert(incHll === fullHll)
    // a compaction breaks delta reconstruction → readSince declines
    val snap2 = log.latestSnapshot("t").get
    log.commit("t", log.read("t").get)
    assert(log.readSince("t", snap2).isEmpty)
    // up-to-date is also a decline (nothing to fold)
    assert(log.readSince("t", log.latestSnapshot("t").get).isEmpty)
  }

  test("HLL ignores duplicates and merges by register max") {
    val once = spark.range(1000).toDF("key")
    val thrice = once.union(once).union(once)
    val a = Sketch.hllRegisters(once, "key").as[(Int, Int)].collect().toSet
    val b = Sketch.hllRegisters(thrice, "key").as[(Int, Int)].collect().toSet
    assert(a === b, "duplicate keys must not move any register")
    val lo = spark.range(500).toDF("key")
    val hi = spark.range(500, 1000).toDF("key")
    val merged = Sketch.hllMerge(
      Sketch.hllRegisters(lo, "key"), Sketch.hllRegisters(hi, "key"))
      .as[(Int, Int)].collect().toSet
    assert(merged === a, "merge(halves) must equal the whole sketch")
  }
}

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

  test("quantile sample: layout-invariant, disjoint halves merge by union") {
    val docs = spark.range(2000).toDF("key")
      .withColumn("v", (col("key") * 7919) % 1000)
    val s1 = Sketch.quantileSample(docs, "key", rate16 = 8192)
      .as[(Long, Long)].collect().toSet
    val s2 = Sketch.quantileSample(docs.repartition(7), "key", rate16 = 8192)
      .as[(Long, Long)].collect().toSet
    assert(s1 === s2 && s1.nonEmpty)
    // roughly the nominal 1/8 rate (hash uniformity, not a seed accident)
    assert(s1.size > 150 && s1.size < 350, s"sample size ${s1.size}")
    val merged = Sketch.quantileSample(docs.filter(col("key") < 1000), "key", 8192)
      .unionByName(Sketch.quantileSample(docs.filter(col("key") >= 1000), "key", 8192))
      .as[(Long, Long)].collect().toSet
    assert(merged === s1, "sample of disjoint halves must union to the whole")
  }

  test("sampleQuantiles at full rate are exact rank statistics") {
    val docs = spark.range(101).toDF("key").withColumn("v", col("key"))
    val qs = Sketch.sampleQuantiles(
        Sketch.quantileSample(docs, "key", rate16 = 65536),
        "v", Seq(0.0, 0.5, 1.0))
      .select(col("q"), col("v")).as[(Double, Long)].collect().sortBy(_._1)
    // n=101: ranks 1, ⌊.5·100⌋+1 = 51, 101 → values 0, 50, 100
    assert(qs === Seq((0.0, 0L), (0.5, 50L), (1.0, 100L)))
  }

  test("grouped quantiles rank within each stratum; sampled median near truth") {
    val docs = spark.range(20).toDF("key")
      .withColumn("g", when(col("key") < 10, "a").otherwise("b"))
      .withColumn("v", when(col("key") < 10, col("key")).otherwise(col("key") * 10))
    val out = Sketch.sampleQuantiles(
        Sketch.quantileSample(docs, "key", rate16 = 65536),
        "v", Seq(0.5), by = Seq("g"))
      .select(col("g"), col("v")).as[(String, Long)].collect().toSet
    // a: values 0..9 → rank ⌊.5·9⌋+1 = 5 → 4; b: 100..190 step 10 → 140
    assert(out === Set(("a", 4L), ("b", 140L)))
    // DKW sanity at 1/8 rate over 20k uniform values: the sampled median's
    // value error is its rank error; ε = .05 fails with odds ~2e-13
    val big = spark.range(20000).toDF("key").withColumn("v", col("key"))
    val med = Sketch.sampleQuantiles(
        Sketch.quantileSample(big, "key", rate16 = 8192), "v", Seq(0.5))
      .select(col("v")).as[Long].collect().head
    assert(math.abs(med - 10000L) < 1000, s"sampled median $med")
  }
}

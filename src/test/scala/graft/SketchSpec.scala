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
}

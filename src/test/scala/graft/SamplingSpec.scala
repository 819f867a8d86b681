package graft

import org.apache.spark.sql.functions._

import graft.ops.Sampling

class SamplingSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (0L until 2000L).map(i => (i, s"src${i % 7}"))
    .toDF("doc_id", "source")

  test("datasetSplit is deterministic and partitioning-independent") {
    val a = docs.repartition(1)
      .select($"doc_id", Sampling.datasetSplit($"doc_id").as("split"))
    val b = docs.repartition(16, $"source") // different layout, same keys
      .select($"doc_id", Sampling.datasetSplit($"doc_id").as("split"))
    assert(a.except(b).isEmpty && b.except(a).isEmpty)
    // and stable across two evaluations of the same plan
    assert(a.except(a).isEmpty)
  }

  test("datasetSplit fractions land near the requested percentages") {
    val counts = docs
      .select(Sampling.datasetSplit($"doc_id", trainPct = 80, validPct = 10).as("split"))
      .groupBy("split").count().as[(String, Long)].collect().toMap
    assert(counts.keySet === Set("train", "valid", "test"))
    val n = counts.values.sum.toDouble
    // 2000 draws of a 16-bit uniform hash: ±3% absolute is > 5 sigma
    assert(math.abs(counts("train") / n - 0.80) < 0.03, counts)
    assert(math.abs(counts("valid") / n - 0.10) < 0.03, counts)
    assert(math.abs(counts("test") / n - 0.10) < 0.03, counts)
  }

  test("split salt decorrelates from the mixture gate salt") {
    // a doc assigned to test must NOT be systematically dropped (or kept) by
    // an independently-salted downsample: joint frequencies factorize.
    // 20k keys → the smallest stratum (valid, 10%) has ~2k draws, so its
    // kept-rate std is ~0.011 and the 0.06 tolerance is a >5-sigma bound
    val wide = (0L until 20000L).map(i => (i, s"src${i % 7}"))
      .toDF("doc_id", "source")
    val joint = wide.select(
        Sampling.datasetSplit($"doc_id").as("split"),
        Sampling.stratifiedKeep($"doc_id", $"source", Map.empty, 0.5).as("kept"))
      .groupBy("split", "kept").count().as[(String, Boolean, Long)].collect()
    val keptRate = joint.filter(_._2).map(_._3).sum.toDouble /
      joint.map(_._3).sum
    for (s <- Seq("train", "valid", "test")) {
      val rows = joint.filter(_._1 == s)
      val rate = rows.filter(_._2).map(_._3).sum.toDouble / rows.map(_._3).sum
      assert(math.abs(rate - keptRate) < 0.06, s"$s kept-rate $rate vs $keptRate")
    }
  }

  test("stratifiedKeep applies per-stratum rates with a default") {
    val rates = Map("src0" -> 1.0, "src1" -> 0.0, "src2" -> 0.25)
    val kept = docs
      .filter(Sampling.stratifiedKeep($"doc_id", $"source", rates, defaultRate = 0.5))
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val bySource = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("src0") === bySource("src0"))           // rate 1.0 keeps all
    assert(!kept.contains("src1"))                      // rate 0.0 drops all
    assert(math.abs(kept("src2").toDouble / bySource("src2") - 0.25) < 0.1)
    assert(math.abs(kept("src3").toDouble / bySource("src3") - 0.5) < 0.12)
  }

  test("hash bucket matches the oracle's hex-parse formulation") {
    // the DuckDB oracle parses the same 4 hex chars with ('0x'||h)::INT;
    // recompute via an independent Scala path and compare exactly
    val got = docs.limit(50)
      .select($"doc_id", Sampling.hashBucket($"doc_id", "graft-split").as("b"))
      .as[(Long, Int)].collect()
    got.foreach { case (id, b) =>
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(s"graft-split$id".getBytes("UTF-8"))
        .take(2).map(x => f"$x%02x").mkString
      assert(b === Integer.parseInt(hex, 16), s"doc $id")
    }
  }

  test("invalid fractions are rejected") {
    intercept[IllegalArgumentException] {
      Sampling.datasetSplit($"doc_id", trainPct = 90, validPct = 20)
    }
    intercept[IllegalArgumentException] {
      Sampling.stratifiedKeep($"doc_id", $"source", Map("a" -> 1.5), 0.1)
    }
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.forAll
import org.scalacheck.Test.{check, Parameters, Passed, Proved}

import graft.functions.{Ids, Norm, XxHash64Ref}

/** Property-based cross-validation of the pure portable primitives every
  * distributed operator leans on — the functions whose SILENT divergence
  * from their reference semantics (CPython uuid5/.title(), xxHash64, the
  * window cumsum) would corrupt results without failing any example-based
  * spec. Pure-function properties run hundreds of random cases for free;
  * the Spark-side properties batch ONE randomized dataset per assertion so
  * the suite stays fast.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private val params = Parameters.default.withMinSuccessfulTests(200)
  private def assertHolds(p: Prop, name: String): Unit = {
    val r = check(params, p)
    assert(r.status == Passed || r.status == Proved, s"$name: ${r.status}")
  }

  test("uuid5: RFC-4122 v5 form, deterministic, name-injective over samples") {
    val gen = Gen.asciiPrintableStr
    assertHolds(forAll(gen) { s =>
      val u = Ids.uuid5(Ids.NamespaceDns, s)
      u.version == 5 && u.variant == 2 && u == Ids.uuid5(Ids.NamespaceDns, s)
    }, "uuid5 form")
    // distinct names -> distinct uuids (SHA-1 collision would be news)
    assertHolds(forAll(gen, gen) { (a, b) =>
      (a == b) == (Ids.uuid5(Ids.NamespaceDns, a) == Ids.uuid5(Ids.NamespaceDns, b))
    }, "uuid5 injectivity")
  }

  test("pyTitle: idempotent, length-preserving, case-insensitive fixpoint") {
    val gen = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 2 -> Gen.oneOf(' ', '\'', '-', '_', '.')))
      .map(_.mkString)
    assertHolds(forAll(gen) { s =>
      val t = Norm.pyTitle(s)
      t.length == s.length && Norm.pyTitle(t) == t &&
        t.equalsIgnoreCase(s)
    }, "pyTitle")
  }

  test("XxHash64Ref matches Spark's codegen xxhash64 on random byte strings") {
    // the portable reference fold (used for engine-replayable rolling
    // hashes) must agree with Catalyst's implementation bit-for-bit —
    // one Spark job over the whole generated batch
    val cases = Gen.listOfN(300, Gen.asciiPrintableStr)
      .sample.get.distinct
    val fromSpark = cases.toDF("s")
      .select($"s", xxhash64($"s").as("h"))
      .as[(String, Long)].collect().toMap
    cases.foreach { s =>
      val ref = XxHash64Ref.hash(s.getBytes("UTF-8"), 42L)
      assert(ref === fromSpark(s), s"xxhash64 divergence on ${s.take(40)}")
    }
  }

  test("PrefixScan.inclusiveRunningSum ≡ per-stratum window cumsum on random skewed data") {
    val rnd = new scala.util.Random(20260819L)
    // skewed strata (incl. nulls), random lengths, shuffled ids
    val rows = (0L until 2000L).map { i =>
      val stratum = rnd.nextInt(10) match {
        case 0 | 1 | 2 | 3 | 4 => Some("big")
        case 5 | 6 => Some("mid")
        case 7 => None
        case n => Some(s"s$n")
      }
      (stratum, i, rnd.nextInt(500).toLong)
    }
    val df = rnd.shuffle(rows).toDF("source", "doc_id", "n")
    // through the public consumer (tokenBudgetCap's cum_tokens IS the scan)
    val got = graft.ops.Sampling
      .tokenBudgetCap(df, Long.MaxValue, "source", "doc_id", "n", numBuckets = 7)
      .select($"doc_id", $"cum_tokens").as[(Long, Long)].collect().toMap
    val expected = rows.groupBy(_._1).values.flatMap { g =>
      g.sortBy(_._2).scanLeft((0L, 0L)) { case ((_, acc), (_, id, n)) =>
        (id, acc + n)
      }.drop(1)
    }.toMap
    assert(got === expected)
  }

  test("quotaSample membership is layout- and duplicate-free on random pools") {
    val rnd = new scala.util.Random(7L)
    val pool = (0L until 500L).map(i => (i, s"src${rnd.nextInt(4)}"))
    val a = graft.ops.Sampling.quotaSample(
        pool.toDF("doc_id", "source"), k = 7, "source", "doc_id")
      .select($"doc_id").as[Long].collect()
    assert(a.length === a.distinct.length)
    val b = graft.ops.Sampling.quotaSample(
        rnd.shuffle(pool).toDF("doc_id", "source").repartition(13),
        k = 7, "source", "doc_id")
      .select($"doc_id").as[Long].collect()
    assert(a.toSet === b.toSet)
  }
}

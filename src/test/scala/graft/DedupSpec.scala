package graft

import graft.canon.{ConnectedComponents, EntityDedup}
import graft.model.Mention

class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("connected components: transitivity over chained edges") {
    val edges = Seq(("a", "b"), ("b", "c"), ("x", "y")).toDF("src", "dst")
    val cc = ConnectedComponents.run(spark, edges).collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(cc("a") === "a" && cc("b") === "a" && cc("c") === "a")
    assert(cc("x") === "x" && cc("y") === "x")
  }

  test("connected components: idempotent on a long chain") {
    val chain = (0 until 30).map(i => (f"n$i%02d", f"n${i + 1}%02d")).toDF("src", "dst")
    val cc = ConnectedComponents.run(spark, chain).collect()
    assert(cc.map(_.getString(1)).distinct.toSeq === Seq("n00"))
  }

  test("alias keys: suffix strip + curated table (entity_dedup merge rules)") {
    assert(EntityDedup.stripSuffix("Quantum Dynamics Inc.") === "quantum dynamics")
    assert(EntityDedup.stripSuffix("Quantum Dynamics") === "quantum dynamics")
    assert(EntityDedup.aliasKey("AAPL") === "apple inc.")
    assert(EntityDedup.aliasKey("Apple Inc.") === "apple inc.")
    assert(EntityDedup.aliasKey("The Fed") === "federal reserve")
    assert(EntityDedup.aliasKey("AWS") === "amazon web services")
    // DO-NOT-MERGE pairs stay apart
    assert(EntityDedup.aliasKey("Goldman Sachs") !== EntityDedup.aliasKey("Morgan Stanley"))
    assert(EntityDedup.aliasKey("iPhone") !== EntityDedup.aliasKey("Apple"))
  }

  private def mention(name: String, typ: String = "Organization", conv: String = "c1",
      idx: Int = 0): Mention =
    Mention(name, typ, s"$name is an entity observed in transcripts.",
      s"chunk-$conv-$idx", conv, idx, "default")

  test("dedup merges alias forms, canonical = longest summary (entity_dedup.py:606-609)") {
    val ms = Seq(
      mention("Quantum Dynamics Inc.", idx = 0),
      mention("Quantum Dynamics", idx = 3),
      mention("quantum dynamics inc.", idx = 5), // case variant normalizes away
      mention("Granite Foods LLC", idx = 1),
      mention("AAPL", idx = 2),
      mention("Apple Inc.", idx = 4)).toDS()
    val (entities, remap) = EntityDedup.dedup(spark, ms)
    val es = entities.collect()
    assert(es.map(_.canonical_name).sorted.toSeq ===
      Seq("Apple Inc.", "Granite Foods Llc", "Quantum Dynamics Inc."))
    val qd = es.find(_.canonical_name == "Quantum Dynamics Inc.").get
    assert(qd.aliases.toSet === Set("Quantum Dynamics Inc.", "Quantum Dynamics"))
    val r = remap.collect().map(x => x.getString(3) -> x.getString(2)).toMap
    assert(r("Quantum Dynamics") === "Quantum Dynamics Inc.")
    assert(r("Aapl") === "Apple Inc.")
  }

  test("guardrail: Person never merges with Organization (entity_registry.py:50-62)") {
    val ms = Seq(
      mention("Tim Cook", typ = "Person"),
      mention("Tim Cook Inc.", typ = "Organization")).toDS()
    val (entities, _) = EntityDedup.dedup(spark, ms)
    assert(entities.count() === 2)
  }

  test("dedup idempotency: canonicalizing canonical entities is a no-op") {
    val ms = Seq(
      mention("Quantum Dynamics Inc."),
      mention("Quantum Dynamics"),
      mention("Granite Foods LLC")).toDS()
    val (e1, _) = EntityDedup.dedup(spark, ms)
    val again = e1.collect().toSeq.map(e =>
      mention(e.canonical_name, e.entity_type)).toDS()
    val (e2, _) = EntityDedup.dedup(spark, again)
    assert(e2.collect().map(_.canonical_name).sorted.toSeq ===
      e1.collect().map(_.canonical_name).sorted.toSeq)
  }
}

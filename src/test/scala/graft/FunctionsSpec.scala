package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.{Embed, Ids, Norm}

/** Byte-level parity with the reference's pure functions (SURVEY.md §5.2-1).
  * Expected values computed with CPython (uuid5 / str.title / the
  * _normalize_rel_type algorithm from /root/reference/src/pipeline.py:364-371).
  */
class FunctionsSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("uuid5 matches Python uuid5(NAMESPACE_DNS, ...)") {
    assert(Ids.uuid5(Ids.NamespaceDns, "hello world").toString ===
      "823a2f73-a936-56c3-b8b4-03641bd74f35")
  }

  test("stableUuid joins non-empty parts with | (pipeline.py:61-64)") {
    assert(Ids.stableUuid("default", "conv00001") === "55a4fb60-89da-5ed8-be48-33938799a55a")
    assert(Ids.stableUuid("a", "b", "c") === "e2e3720f-b05b-56c0-a717-78a858d8bac1")
    // falsy parts dropped: ("", "x") == ("x",)
    assert(Ids.stableUuid("", "x") === "05b16a01-46c6-56dd-bd6e-c6dfb4a1427a")
    assert(Ids.stableUuid(null, "x") === Ids.stableUuid("x"))
  }

  test("normalizeRelType matches reference cases (test_pipeline.py parity)") {
    assert(Norm.normalizeRelType("acquired") === "ACQUIRED")
    assert(Norm.normalizeRelType("is the CEO of") === "IS_THE_CEO_OF")
    assert(Norm.normalizeRelType("partnered with (recently)") === "PARTNERED_WITH_RECENTLY")
    assert(Norm.normalizeRelType("  ") === "RELATED_TO")
    assert(Norm.normalizeRelType("---") === "RELATED_TO")
    assert(Norm.normalizeRelType("") === "RELATED_TO")
    assert(Norm.normalizeRelType("a b c d e f g h i j") === "A_B_C_D_E_F_G_H")
    assert(Norm.normalizeRelType("Is Headquartered In") === "IS_HEADQUARTERED_IN")
    assert(Norm.normalizeRelType("co-founded & led") === "CO_FOUNDED_LED")
  }

  test("pyTitle matches Python str.title() including apostrophes/digits") {
    assert(Norm.pyTitle("they're here") === "They'Re Here")
    assert(Norm.pyTitle("QDI") === "Qdi")
    assert(Norm.pyTitle("apple inc.") === "Apple Inc.")
    assert(Norm.pyTitle("o'brien-smith") === "O'Brien-Smith")
    assert(Norm.pyTitle("3m company") === "3M Company")
    assert(Norm.pyTitle("AT&T Corp.") === "At&T Corp.")
    assert(Norm.normalizeEntityName("  apple INC.  ") === "Apple Inc.")
  }

  test("prependHeaderIfMissing (pipeline.py:67-99)") {
    assert(Norm.prependHeaderIfMissing("some body text", "New York > body") ===
      "New York\nsome body text")
    // header already contained (case-insensitive) → unchanged
    assert(Norm.prependHeaderIfMissing("Economic activity in new york grew", "New York") ===
      "Economic activity in new york grew")
    // generic headers skipped
    assert(Norm.prependHeaderIfMissing("hello world of text", "Body > Section") ===
      "hello world of text")
    assert(Norm.prependHeaderIfMissing("t", "") === "t")
    assert(Norm.prependHeaderIfMissing("t", " > ") === "t")
  }

  test("embedding is deterministic, unit-norm, and alias-similar") {
    val a = Embed.embed("Quantum Dynamics Inc.")
    val b = Embed.embed("Quantum Dynamics Inc.")
    assert(a.toSeq === b.toSeq)
    val norm = math.sqrt(a.map(x => x * x).sum)
    assert(math.abs(norm - 1.0) < 1e-9)
    // alias pair similar, unrelated pair dissimilar
    val short = Embed.embed("Quantum Dynamics")
    val other = Embed.embed("Granite Foods LLC")
    assert(Embed.cosine(a, short) > Embed.cosine(a, other))
    assert(Embed.cosine(a, a) > 0.999999)
    assert(Embed.cosine(Embed.embed(""), a) === 0.0)
  }

  test("cosine matches reference fixture vectors (test_entity_dedup.py:30-37)") {
    val appleInc = Array(1.0, 0.0, 0.0, 0.0)
    val apple = Array(0.95, 0.05, 0.0, 0.0)
    val google = Array(0.0, 1.0, 0.0, 0.0)
    assert(Embed.cosine(appleInc, apple) > 0.99)
    assert(Embed.cosine(appleInc, google) === 0.0)
  }

  test("property: rel-type normalization idempotent, uuid5 stable") {
    check(Prop.forAll(Gen.asciiPrintableStr) { s =>
      val once = Norm.normalizeRelType(s)
      Norm.normalizeRelType(once) == once && Ids.stableUuid(s) == Ids.stableUuid(s)
    })
  }
}

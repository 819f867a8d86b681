package graft

import java.nio.file.{Files, Paths}

import graft.sources.OntologyLoader

/** The reference-compatibility contract of the topic-ontology loader: a user
  * switching from the reference points `--ontology` at their existing
  * `financial_topics.json` and gets the same 232-topic dimension table the
  * topic librarian read.
  */
class OntologyLoaderSpec extends SparkSpec {

  test("loads the reference's own financial_topics.json verbatim (232 topics)") {
    val ref = "/root/reference/src/config/topics/financial_topics.json"
    assume(Files.exists(Paths.get(ref)), "reference checkout not present")
    val topics = OntologyLoader.load(spark, ref)
    assert(topics.size === 232)
    val inflation = topics.find(_.label == "Inflation").get
    assert(inflation.uri === "https://kg.zommalabs.com/topic/Inflation")
    assert(inflation.synonyms.contains("CPI"))
    assert(topics.forall(_.label.nonEmpty))
    // resolvable end-to-end: an exact synonym resolves through TopicResolver
    import spark.implicits._
    val resolved = graft.link.TopicResolver.resolve(spark,
      Seq(("CPI", "default")).toDF("name", "group_id"), topics).collect()
    assert(resolved.nonEmpty, "CPI must resolve against the loaded ontology")
    assert(resolved.exists(_.getAs[String]("canonical_label") === "Inflation"),
      s"CPI should resolve to Inflation: ${resolved.mkString(";")}")
  }

  test("tolerates optional fields and drops label-less rows; empty file fails fast") {
    val dir = Files.createTempDirectory("graft-ont")
    val f = dir.resolve("topics.json")
    Files.write(f,
      """[
        |  {"label": "Shipping", "synonyms": ["Freight"]},
        |  {"uri": "u:1", "definition": "no label, dropped"},
        |  {"uri": "u:2", "label": "Ports", "definition": "harbors", "synonyms": []}
        |]""".stripMargin.getBytes("UTF-8"))
    val topics = OntologyLoader.load(spark, f.toString)
    assert(topics.map(_.label).sorted === Seq("Ports", "Shipping"))
    assert(topics.find(_.label == "Shipping").get.uri === "")
    assert(topics.find(_.label == "Shipping").get.synonyms === Seq("Freight"))

    val empty = dir.resolve("empty.json")
    Files.write(empty, "[]".getBytes("UTF-8"))
    intercept[IllegalArgumentException](OntologyLoader.load(spark, empty.toString))
  }
}

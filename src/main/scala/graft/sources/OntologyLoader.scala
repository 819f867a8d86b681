package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.OntologyTopic

/** Loader for the reference's curated topic-ontology format — a JSON array
  * of `{uri, label, definition, synonyms[]}` objects (reference
  * `src/config/topics/financial_topics.json`, read by
  * `src/agents/topic_librarian.py`). A user switching from the reference
  * brings this file as-is; the resolved `Seq[OntologyTopic]` feeds
  * `Ingest.Config.ontology` / `TopicResolver.resolve` as the broadcast
  * dimension table.
  *
  * The file is a top-level ARRAY (not JSON-lines), so the read is
  * `multiLine` with an explicit schema: schema inference on a malformed
  * file would otherwise yield `_corrupt_record` and fail downstream with
  * an opaque error — instead, rows missing the required `label` are
  * dropped with a count, and `synonyms`/`definition`/`uri` default to
  * empty (the reference treats them as optional metadata around the
  * label). Ontologies are a few hundred rows — collected to the driver by
  * design, matching how TopicResolver broadcasts them.
  */
object OntologyLoader {

  def load(spark: SparkSession, path: String): Seq[OntologyTopic] = {
    import spark.implicits._
    val schema = org.apache.spark.sql.Encoders.product[OntologyTopic].schema
    val raw = spark.read.option("multiLine", "true").schema(schema).json(path)
    val topics = raw
      .filter(col("label").isNotNull && trim(col("label")) =!= "")
      .select(
        coalesce(col("uri"), lit("")).as("uri"),
        col("label"),
        coalesce(col("definition"), lit("")).as("definition"),
        coalesce(col("synonyms"), array()).as("synonyms"))
      .as[OntologyTopic]
      .collect().toSeq
    if (topics.isEmpty)
      throw new IllegalArgumentException(
        s"no usable topics in ontology file $path (expected a JSON array of " +
          "{uri, label, definition, synonyms[]} objects)")
    topics
  }
}

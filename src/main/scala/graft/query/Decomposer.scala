package graft.query

import java.util.Locale

import graft.model.OntologyTopic

/** Deterministic question decomposition — rebuilds the reference's LLM-free
  * fallback decomposer (/root/reference/src/querying_system/shared/
  * decomposer.py:97-165) so the v6 research flow can be driven from a bare
  * question with no pre-supplied hints:
  *
  *  - entity hints: capitalized words (len > 2, question stop-words removed,
  *    trailing `?.,!` stripped). Consecutive capitalized words join into one
  *    span ("Quantum Dynamics" is one hint, not two) — the span notion the
  *    extractor already uses, and what the reference's LLM path emits;
  *  - question type from keyword rules, tested in the reference's order:
  *    comparison → causal → enumeration → temporal → factual;
  *  - topic hints: ontology labels whose label/synonym occurs in the question
  *    (case-insensitive substring) — the deterministic stand-in for the LLM
  *    path's topic_hints (the reference fallback emits none).
  */
object Decomposer {

  sealed abstract class QuestionType(val name: String)
  case object Comparison extends QuestionType("comparison")
  case object Causal extends QuestionType("causal")
  case object Enumeration extends QuestionType("enumeration")
  case object Temporal extends QuestionType("temporal")
  case object Factual extends QuestionType("factual")

  case class Decomposition(
      entityHints: Seq[String],
      topicHints: Seq[String],
      questionType: QuestionType)

  /** Question-word stop list (decomposer.py:109-126). */
  private val stopWords = Set(
    "What", "Who", "When", "Where", "How", "Which", "The", "Compare", "Why",
    "Did", "Does", "Do", "Is", "Are", "Was", "Were", "Tell", "List", "Describe")

  private def stripPunct(w: String): String = w.replaceAll("[?.,!]+$", "")

  /** Capitalized-word entity hints, consecutive words merged into spans. */
  private[graft] def entityHints(question: String): Seq[String] = {
    val words = question.split("\\s+").toSeq.map(stripPunct)
    val isCap = (w: String) => w.nonEmpty && Character.isUpperCase(w.charAt(0))
    val spans = Seq.newBuilder[Seq[String]]
    var cur = Vector.empty[String]
    def flush(): Unit = { if (cur.nonEmpty) spans += cur; cur = Vector.empty }
    words.foreach { w => if (isCap(w)) cur :+= w else flush() }
    flush()
    spans.result()
      .map(_.dropWhile(stopWords.contains).mkString(" ")) // drop leading question words
      .filter(s => s.length > 2 && !stopWords.contains(s))
      .distinct
  }

  /** Keyword question-type rules (decomposer.py:128-139), reference order. */
  private[graft] def questionType(question: String): QuestionType = {
    val q = question.toLowerCase(Locale.ROOT)
    def any(ws: String*) = ws.exists(q.contains)
    if (any("compare", "versus", " vs ", "differ", "difference")) Comparison
    else if (any("why", "cause", "because", "led to", "affect", "effect", "result")) Causal
    else if (any("which", "list", "what are", "how many")) Enumeration
    else if (any("change", "trend", "over time", "since", "from", "to ")) Temporal
    else Factual
  }

  def decompose(question: String, ontology: Seq[OntologyTopic] = Nil): Decomposition = {
    val q = question.toLowerCase(Locale.ROOT)
    val topics = ontology
      .filter(t => (t.label +: t.synonyms)
        .exists(s => q.contains(s.toLowerCase(Locale.ROOT))))
      .map(_.label)
    Decomposition(entityHints(question), topics, questionType(question))
  }
}

package graft.functions

import java.util.Locale

/** Deterministic text-normalization functions with reference-exact semantics.
  *
  * These are the pure functions whose outputs are part of triple identity, so
  * they must match the reference byte-for-byte (SURVEY.md §2.7 F1-F4, §7.4).
  * All case mapping uses Locale.ROOT: Python str.upper/lower are
  * locale-independent, while JVM-default-locale toUpperCase would map i/I
  * differently under e.g. a Turkish locale and silently change identities.
  */
object Norm {

  /** `_normalize_rel_type` (reference /root/reference/src/pipeline.py:364-371):
    * upper-case, first 8 whitespace-split words joined by "_", non-[alnum_] → "_",
    * collapse "__", strip leading/trailing "_", empty → "RELATED_TO".
    */
  def normalizeRelType(description: String): String = {
    if (description == null) return "RELATED_TO"
    // Python str.split() splits on runs of whitespace and drops empties.
    val words = description.toUpperCase(Locale.ROOT).split("\\s+")
      .iterator.filter(_.nonEmpty).take(8).toArray
    var normalized = words.mkString("_")
    val sb = new StringBuilder(normalized.length)
    normalized.foreach { c =>
      // Python c.isalnum() — unicode letter-or-digit; Java equivalent below.
      sb += (if (Character.isLetterOrDigit(c) || c == '_') c else '_')
    }
    normalized = sb.toString
    while (normalized.contains("__")) normalized = normalized.replace("__", "_")
    val stripped = normalized.dropWhile(_ == '_').reverse.dropWhile(_ == '_').reverse
    if (stripped.isEmpty) "RELATED_TO" else stripped
  }

  /** Python-`str.title()`-compatible casing (reference entity_dedup.py:187 uses
    * `name.strip().title()`). Python title-cases the first *cased* character of
    * each run of cased characters and lower-cases the rest; non-cased characters
    * (digits, punctuation, spaces) are word boundaries.
    * Note this differs from Spark `initcap` on apostrophes: "they're" → "They'Re".
    */
  def pyTitle(s: String): String = {
    if (s == null) return null
    val sb = new StringBuilder(s.length)
    var prevCased = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val t = Character.getType(c)
      val cased = t == Character.UPPERCASE_LETTER || t == Character.LOWERCASE_LETTER ||
        t == Character.TITLECASE_LETTER
      if (cased && !prevCased) sb += Character.toTitleCase(c)
      else if (cased) sb += Character.toLowerCase(c)
      else sb += c
      prevCased = cased
      i += 1
    }
    sb.toString
  }

  /** Entity registration normalization: `name.strip().title()`
    * (reference entity_dedup.py:186-187).
    */
  def normalizeEntityName(name: String): String =
    if (name == null) null else pyTitle(name.trim)

  /** `_prepend_header_if_missing` (reference pipeline.py:67-99): split
    * header_path on ">", trim levels, drop generic headers and headers already
    * contained (case-insensitive substring) in the text, prepend the rest
    * newline-joined.
    */
  private val genericHeaders = Set("body", "text", "content", "main", "section")

  def prependHeaderIfMissing(text: String, headerPath: String): String = {
    if (headerPath == null || headerPath.isEmpty) return text
    val headers = headerPath.split(">").iterator.map(_.trim).filter(_.nonEmpty).toArray
    if (headers.isEmpty) return text
    val textLower = text.toLowerCase(Locale.ROOT)
    val missing = headers.filter { h =>
      val hl = h.toLowerCase(Locale.ROOT)
      !textLower.contains(hl) && !genericHeaders.contains(hl)
    }
    if (missing.isEmpty) text
    else missing.mkString("\n") + "\n" + text
  }

  /** Summary merge (F10, reference pipeline.py:374-390 / entity_registry.py:
    * 330-333): empty sides pass through; containment short-circuits (the
    * reference skips the LLM call); otherwise the deterministic analogue of
    * the LLM merge is newline concatenation (the reference's own exception
    * fallback, pipeline.py:389-390).
    */
  def mergeSummaries(old: String, nw: String): String = {
    val o = if (old == null) "" else old
    val n = if (nw == null) "" else nw
    if (o.trim.isEmpty) n
    else if (n.trim.isEmpty) o
    else if (o.contains(n)) o
    else if (n.contains(o)) n
    else o + "\n" + n
  }

  /** Lenient date parse (F7, reference pipeline.py:1266-1271 +
    * temporal_extractor.py:110-123): ISO date/datetime prefix → LocalDate;
    * year-month → day 1; bare year → Jan 1; anything invalid → None.
    */
  def parseDateLenient(s: String): Option[java.time.LocalDate] = {
    if (s == null) return None
    val t = s.trim
    def tryParse(f: => java.time.LocalDate): Option[java.time.LocalDate] =
      try Some(f) catch { case _: Exception => None }
    if (t.length >= 10 && t.charAt(4) == '-' && t.charAt(7) == '-')
      tryParse(java.time.LocalDate.parse(t.take(10)))
    else if (t.matches("\\d{4}-\\d{2}"))
      tryParse(java.time.LocalDate.parse(t + "-01"))
    else if (t.matches("\\d{4}"))
      tryParse(java.time.LocalDate.of(t.toInt, 1, 1))
    else None
  }
}

package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII detection and redaction for training corpora: find/mask email
  * addresses and phone numbers before text enters a training mix.
  *
  * Pure `regexp_count` / `regexp_replace` expressions — whole-stage codegen,
  * fused into the scan, no UDFs — so the pass is scan-bound at 100 TB.
  * The patterns deliberately stay within the common subset of Java regex and
  * RE2 (no backrefs, no lookaround) so the exact same pattern is usable by
  * other engines in the pipeline (and by the DuckDB oracle in the driver's
  * correctness gate).
  */
object Pii {

  /** Email addresses (`#`/`.`/`_`/`%`/`+`/`-` allowed in the local part). */
  val EmailRe = "[A-Za-z0-9#._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Dash-grouped phone numbers in the 2-3-3-4 digit layout. */
  val PhoneRe = "[0-9]{2}-[0-9]{3}-[0-9]{3}-[0-9]{4}"

  def countEmails(textCol: Column): Column = regexp_count(textCol, lit(EmailRe))

  def countPhones(textCol: Column): Column = regexp_count(textCol, lit(PhoneRe))

  /** Mask every email with `[EMAIL]` and every phone with `[PHONE]`. */
  def redact(textCol: Column): Column =
    regexp_replace(regexp_replace(textCol, EmailRe, "[EMAIL]"),
      PhoneRe, "[PHONE]")
}

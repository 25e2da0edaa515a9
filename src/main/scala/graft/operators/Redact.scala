package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** PII scrubbing for training corpora (extension — SURVEY §7.2.8):
  * regex redaction of emails and URLs, plus per-doc match counts for
  * the curation report. Narrow per-row compute over codegen'd
  * `regexp_replace` / `regexp_extract_all` builtins; patterns are kept
  * to the RE2-compatible subset so the DuckDB oracle runs the SAME
  * regexes.
  */
object Redact {

  /** RE2-safe patterns (no backrefs / lookarounds). */
  val EmailRe = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  // [^\s], not [^ ]: a URL at end of a line must stop at the newline,
  // not swallow it and everything up to the next space.
  val UrlRe = "https?://[^\\s]+"

  def countEmails(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailRe), lit(0))).cast("long")

  def countUrls(text: Column): Column =
    size(regexp_extract_all(text, lit(UrlRe), lit(0))).cast("long")

  /** Scrub emails first, then URLs (an email inside a URL query string
    * is redacted as an email — order is part of the contract).
    */
  def scrub(text: Column): Column =
    regexp_replace(regexp_replace(text, EmailRe, "<EMAIL>"), UrlRe, "<URL>")

  /** Card-shaped digit runs: 13–22 chars of digits with optional
    * space/dash separators, digit-bounded. Shape alone over-matches
    * (order ids, phone strings) — [[countCardNumbers]] confirms with
    * the Luhn check digit, the discriminator real PII scanners use.
    */
  val CardShapeRe = "[0-9][0-9 -]{11,20}[0-9]"

  /** Luhn checksum of a digit string (rightmost digit is position 1;
    * even positions double, 9-subtract) — codegen'd HOFs end to end,
    * no UDF.
    */
  private def luhnSum(ds: Column): Column = {
    val chars = split(reverse(ds), "")
    aggregate(
      transform(sequence(lit(1), length(ds)), i => {
        val d = element_at(chars, i).cast("int")
        val dbl = d * lit(2)
        when(i % 2 === 0, when(dbl > 9, dbl - 9).otherwise(dbl)).otherwise(d)
      }),
      lit(0), (acc, x) => acc + x)
  }

  /** Count of Luhn-VALID card numbers (13–19 digits after separator
    * strip) — shape candidates that fail the checksum don't count.
    */
  def countCardNumbers(text: Column): Column =
    size(filter(
      transform(regexp_extract_all(text, lit(CardShapeRe), lit(0)),
        c => regexp_replace(c, "[^0-9]", "")),
      ds => length(ds) >= 13 && length(ds) <= 19 &&
        luhnSum(ds) % 10 === 0)).cast("long")
}

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
}

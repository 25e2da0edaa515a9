package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.expressions.NfcNormalize

/** Text normalization for corpus cleaning (extension — SURVEY §7.2.8):
  * the canonicalization pass a pipeline runs before hashing, dedup, or
  * tokenization — without it, byte-distinct but visually identical
  * documents (composed vs decomposed accents, stray whitespace, case)
  * defeat every exact-match operator downstream.
  *
  * All pure narrow per-row compute. NFC is a native codegen expression
  * ([[graft.expressions.NfcNormalize]] wrapping `java.text.Normalizer`);
  * whitespace/case use codegen'd builtins. DuckDB's `nfc_normalize`
  * implements the same Unicode normalization, so the oracle is exact.
  */
object Normalize {

  /** Unicode NFC: decomposed sequences (e + combining acute) compose to
    * their canonical form (é). Byte-identical across engines — NFC is
    * deterministic per Unicode version for assigned codepoints.
    */
  def nfc(text: Column): Column = NfcNormalize.nfc_normalize(text)

  /** Collapse runs of whitespace to single spaces and trim. */
  def collapseWhitespace(text: Column): Column =
    trim(regexp_replace(text, "\\s+", " "))

  /** The full cleaning chain: NFC, whitespace collapse, lowercase. */
  def clean(text: Column): Column = lower(collapseWhitespace(nfc(text)))
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Encoding-anomaly detection (extension; SURVEY §2.10) — the
  * mojibake / lossy-decode screen a crawled corpus runs before text
  * quality scoring. Three narrow per-row signals, all codegen'd
  * regex counts with DuckDB oracle twins (patterns in the shared
  * Java-regex ∩ RE2 subset):
  *
  *   - U+FFFD replacement characters: a decoder already gave up once
  *     upstream (the byte stream was NOT the charset it was read as);
  *   - classic double-encoded UTF-8 artifacts ("Ã©" for é, "â€™" for
  *     ’, …): UTF-8 bytes decoded as Latin-1/cp1252 and re-encoded —
  *     the most common real-corpus corruption, invisible to a
  *     validity check because the result IS valid UTF-8;
  *   - C0 control characters (minus tab/newline/CR): binary spill or
  *     terminal escapes embedded in "text".
  *
  * Heuristic by design: the artifact list is a pinned high-precision
  * subset (each sequence is vanishingly rare in clean text), not a
  * full cp1252 confusion table — precision over recall, because the
  * flag gates docs into a quarantine rather than deleting them.
  */
object Encoding {

  /** U+FFFD REPLACEMENT CHARACTER. */
  val ReplacementRe = "�"

  /** High-precision double-encoding artifacts: é è ü ñ ç ’ “ – … the
    * cp1252 way. Literal alternation — identical bytes on both
    * engines.
    */
  val MojibakeRe = "Ã©|Ã¨|Ã¼|Ã±|Ã§|â€™|â€œ|â€“|â€¦"

  /** C0 controls except tab (09), LF (0A), CR (0D). */
  val CtrlRe = "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]"

  def countReplacement(text: Column): Column =
    size(regexp_extract_all(text, lit(ReplacementRe), lit(0))).cast("long")

  def countMojibake(text: Column): Column =
    size(regexp_extract_all(text, lit(MojibakeRe), lit(0))).cast("long")

  def countControl(text: Column): Column =
    size(regexp_extract_all(text, lit(CtrlRe), lit(0))).cast("long")

  /** DuckDB twins — keep in lockstep with the Column versions. */
  def countSql(expr: String, re: String): String =
    s"len(regexp_extract_all($expr, '$re'))"
}

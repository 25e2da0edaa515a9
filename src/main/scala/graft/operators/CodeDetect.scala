package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Code-vs-prose detection (extension; SURVEY §2.10) — the routing
  * classifier a mixed crawl runs before language-specific pipelines
  * (code goes to a code tokenizer/dedup config, prose to the text
  * path). Heuristic, integer-exact, and fully codegen'd: three
  * independent per-row densities in parts-per-million, averaged into
  * one score.
  *
  *   - symbol density: chars from the C-family operator/punctuation
  *     set over total chars — prose sits near 0, code near 5–15%;
  *   - indent density: lines opening with 4 spaces or a tab over total
  *     lines — block structure survives even minified prose quoting;
  *   - keyword density: tokens from a pinned cross-language keyword
  *     list over total tokens (native hash-set membership, the
  *     [[graft.expressions.StopwordHits]] path).
  *
  * ppm by exact integer division (`div`), so the DuckDB oracle twin
  * is bit-identical; no doubles anywhere. The fixed threshold is a
  * routing default, not a trained boundary — calibration per corpus
  * belongs to the caller (same stance as TextStats.quality).
  */
object CodeDetect {

  /** C-family operator/bracket/punctuation chars. */
  val SymbolRe = "[{}();=<>\\[\\]]"

  /** A line opening with a 4-space or tab indent (block structure). */
  val IndentRe = "(?m)^(    |\\t)"

  /** Cross-language keyword subset — each rare in prose, common in at
    * least one major language family.
    */
  val Keywords: Seq[String] = Seq(
    "def", "class", "return", "import", "function", "var", "let",
    "const", "if", "else", "for", "while", "int", "void", "public",
    "static", "print", "println")

  def symbolCount(text: Column): Column =
    size(regexp_extract_all(text, lit(SymbolRe), lit(0))).cast(LongType)

  def lineCount(text: Column): Column =
    size(split(text, "\n", -1)).cast(LongType)

  def indentCount(text: Column): Column =
    size(regexp_extract_all(text, lit(IndentRe), lit(0))).cast(LongType)

  def keywordCount(text: Column): Column =
    graft.expressions.StopwordHits.stopword_hits(text, Keywords).cast(LongType)

  /** Raw counts struct; the caller derives ppm densities with exact
    * integer `div` over the named fields (Column-level `/` is double
    * division — the codebase-wide exactness rule).
    */
  def codeCounts(text: Column): Column =
    struct(
      length(text).cast(LongType).as("n_chars"),
      lineCount(text).as("n_lines"),
      TextStats.wsTokenCount(text).cast(LongType).as("n_tokens"),
      symbolCount(text).as("n_symbols"),
      indentCount(text).as("n_indented"),
      keywordCount(text).as("n_keywords"))

  /** SQL fragment over the six count columns: per-signal ppm densities
    * and their mean — identical text on both engines modulo the div
    * spelling (`div` vs `//`).
    */
  def scoreSql(divOp: String): String = Seq(
    s"CASE WHEN n_chars > 0 THEN (1000000 * n_symbols) $divOp n_chars ELSE 0 END AS symbol_ppm",
    s"CASE WHEN n_lines > 0 THEN (1000000 * n_indented) $divOp n_lines ELSE 0 END AS indent_ppm",
    s"CASE WHEN n_tokens > 0 THEN (1000000 * n_keywords) $divOp n_tokens ELSE 0 END AS keyword_ppm"
  ).mkString(",\n")
}

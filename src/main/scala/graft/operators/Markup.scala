package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML/markup stripping for crawled corpora (extension; SURVEY §2.10)
  * — the text-extraction step between a raw crawl and every quality /
  * dedup operator downstream. Narrow per-row compute over codegen'd
  * `regexp_replace` builtins; patterns stay in the RE2-compatible
  * subset (non-greedy + `(?s)` inline flag, no lookarounds) so the
  * DuckDB oracle runs the SAME regexes.
  *
  * Not a full HTML5 parser (no entity table beyond the core five, no
  * attribute-aware semantics) — the deliberate trafilatura-lite
  * trade-off: regex stripping is single-pass, codegen-friendly, and
  * wrong only on adversarial markup, which the quality gates downstream
  * reject anyway.
  */
object Markup {

  /** `(?s)` so a script body spanning newlines still matches; non-greedy
    * so two script blocks don't merge into one span.
    */
  val ScriptRe = "(?s)<script[^>]*>.*?</script>"
  val StyleRe = "(?s)<style[^>]*>.*?</style>"
  /** Any remaining tag, including comments' `<!--` openers. */
  val TagRe = "<[^>]+>"

  /** Number of tags in the raw text (observability: how markup-heavy a
    * source is — feeds per-source curation decisions).
    */
  def countTags(text: Column): Column =
    size(regexp_extract_all(text, lit(TagRe), lit(0))).cast("long")

  /** Decode the five core entities. `&amp;` decodes LAST so
    * `&amp;lt;` yields the literal `&lt;`, not `<` (double-decode is
    * the classic stripping bug — order is part of the contract).
    */
  def decodeEntities(text: Column): Column = {
    val steps = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
    steps.foldLeft(text) { case (c, (from, to)) => replace(c, lit(from), lit(to)) }
  }

  /** script/style blocks (content AND tags) → tags → entities →
    * whitespace collapse + trim. Each step is one codegen'd pass.
    */
  def stripHtml(text: Column): Column = {
    val noScript = regexp_replace(text, ScriptRe, " ")
    val noStyle = regexp_replace(noScript, StyleRe, " ")
    val noTags = regexp_replace(noStyle, TagRe, " ")
    trim(regexp_replace(decodeEntities(noTags), "\\s+", " "))
  }

  /** DuckDB oracle twin of [[stripHtml]] over a column expression —
    * keep in lockstep ('g' flag: DuckDB replaces only the first match
    * by default).
    */
  def stripHtmlSql(expr: String): String = {
    val noScript = s"regexp_replace($expr, '$ScriptRe', ' ', 'g')"
    val noStyle = s"regexp_replace($noScript, '$StyleRe', ' ', 'g')"
    val noTags = s"regexp_replace($noStyle, '$TagRe', ' ', 'g')"
    val entities = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "''", "&nbsp;" -> " ", "&amp;" -> "&")
    val decoded = entities.foldLeft(noTags) { case (e, (from, to)) =>
      s"replace($e, '$from', '$to')"
    }
    s"trim(regexp_replace($decoded, '\\s+', ' ', 'g'))"
  }
}

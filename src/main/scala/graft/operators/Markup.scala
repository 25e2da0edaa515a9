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

  // ---- Markdown (the other big crawl format: READMEs, forums, docs
  // sites, chat exports). Same trafilatura-lite contract as the HTML
  // path: single-pass regex strips, RE2-compatible so the DuckDB oracle
  // runs the SAME patterns, wrong only on adversarial nesting.

  /** `(?s)` fenced code blocks span lines; non-greedy so two fences
    * don't merge. Runs FIRST so fence contents never feed the link /
    * emphasis strips.
    */
  val FenceRe = "(?s)```.*?```"
  val InlineCodeRe = "`[^`]+`"
  /** Images before links (the image syntax contains the link syntax). */
  val ImageRe = "!\\[([^\\]]*)\\]\\([^)]*\\)"
  val LinkRe = "\\[([^\\]]*)\\]\\([^)]*\\)"
  val HeadingRe = "(?m)^#{1,6}[ \\t]*"
  val QuoteRe = "(?m)^[ \\t]*>[ \\t]?"
  /** Thematic break: a line of 3+ dashes/stars/underscores (spaced ok). */
  val HruleRe = "(?m)^[ \\t]*([-*_][ \\t]*){3,}$"
  val EmphasisRe = "[*_]{1,3}"

  /** Links (incl. images) in the raw text — how markup-heavy a
    * markdown source is, the countTags twin.
    */
  def countLinks(text: Column): Column =
    size(regexp_extract_all(text, lit(LinkRe), lit(0))).cast("long")

  def countFences(text: Column): Column =
    size(regexp_extract_all(text, lit(FenceRe), lit(0))).cast("long")

  /** fences → inline code → images (keep alt) → links (keep text) →
    * headings → quotes → hrules → emphasis markers → whitespace
    * collapse. Order is part of the contract (images strictly before
    * links; fences before everything so code never leaks tokens).
    */
  def stripMarkdown(text: Column): Column = {
    val noFence = regexp_replace(text, FenceRe, " ")
    val noCode = regexp_replace(noFence, InlineCodeRe, " ")
    val noImg = regexp_replace(noCode, ImageRe, "$1")
    val noLink = regexp_replace(noImg, LinkRe, "$1")
    val noHead = regexp_replace(noLink, HeadingRe, "")
    val noQuote = regexp_replace(noHead, QuoteRe, "")
    val noRule = regexp_replace(noQuote, HruleRe, " ")
    val noEmph = regexp_replace(noRule, EmphasisRe, "")
    trim(regexp_replace(noEmph, "\\s+", " "))
  }

  /** DuckDB twin of [[stripMarkdown]] — identical patterns; RE2 spells
    * the group backreference `\1` where Java spells `$1`.
    */
  def stripMarkdownSql(expr: String): String = {
    def g(e: String, re: String, repl: String) =
      s"regexp_replace($e, '$re', '$repl', 'g')"
    val noFence = g(expr, FenceRe, " ")
    val noCode = g(noFence, InlineCodeRe, " ")
    val noImg = g(noCode, ImageRe, "\\1")
    val noLink = g(noImg, LinkRe, "\\1")
    val noHead = g(noLink, HeadingRe, "")
    val noQuote = g(noHead, QuoteRe, "")
    val noRule = g(noQuote, HruleRe, " ")
    val noEmph = g(noRule, EmphasisRe, "")
    s"trim(regexp_replace($noEmph, '\\s+', ' ', 'g'))"
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

package graft

import org.apache.spark.sql.functions._

import graft.operators.Markup

/** Markup stripping goldens: tag removal, script-block semantics
  * (non-greedy, newline-spanning), entity decode order, whitespace
  * collapse — pinned on literal inputs so regressions are obvious.
  */
class MarkupSpec extends SparkSpec {
  import spark.implicits._

  private def strip(s: String): String =
    Seq(s).toDF("t").select(Markup.stripHtml(col("t"))).as[String].head()

  private def tags(s: String): Long =
    Seq(s).toDF("t").select(Markup.countTags(col("t"))).as[Long].head()

  test("tags removed, text joined with collapsed whitespace") {
    assert(strip("<p>Hello <b>world</b></p>") === "Hello world")
    assert(strip("<div  class='x'>a</div> \n <span>b</span>") === "a b")
  }

  test("script blocks drop content too, non-greedily, across newlines") {
    assert(strip("a <script>var x = 1;</script> b") === "a b")
    // non-greedy: the text between two script blocks survives
    assert(strip("<script>a</script>keep<script>b</script>") === "keep")
    // (?s): a script body spanning lines still matches
    assert(strip("x<script>\nline1\nline2\n</script>y") === "x y")
    assert(strip("s<style>p { color: red }</style>e") === "s e")
  }

  test("entity decode: core five, &amp; LAST so &amp;lt; does not double-decode") {
    assert(strip("a &amp; b") === "a & b")
    assert(strip("&lt;tag&gt;") === "<tag>")
    assert(strip("&quot;q&quot; &#39;s&#39;") === "\"q\" 's'")
    assert(strip("&amp;lt;") === "&lt;")
    assert(strip("a&nbsp;b") === "a b")
  }

  test("countTags counts raw tags including unclosed-pair halves") {
    assert(tags("<p>x</p>") === 2L)
    assert(tags("no markup here") === 0L)
    assert(tags("<br/><hr/>") === 2L)
  }

  test("non-markup text passes through modulo whitespace normalization") {
    assert(strip("  plain   text\twith\nspace  ") === "plain text with space")
    assert(strip("math: 3 < 5 stays when not a tag shape") ===
      "math: 3 < 5 stays when not a tag shape")
  }

  private def stripMd(s: String): String =
    Seq(s).toDF("t").select(Markup.stripMarkdown(col("t"))).as[String].head()

  test("markdown: links and images keep anchor/alt text") {
    assert(stripMd("see [the docs](http://x.y/z) now") === "see the docs now")
    assert(stripMd("logo ![alt text](img.png) end") === "logo alt text end")
    assert(stripMd("[a](u1) mid [b](u2)") === "a mid b")
  }

  test("markdown: fenced blocks drop content, inline code drops, non-greedy") {
    assert(stripMd("a\n```\ncode here\n```\nb") === "a b")
    assert(stripMd("```one```keep```two```") === "keep")
    assert(stripMd("use `x = 1` then") === "use then")
  }

  test("markdown: headings, quotes, hrules, emphasis markers strip") {
    assert(stripMd("# Title\nbody") === "Title body")
    assert(stripMd("### deep heading") === "deep heading")
    assert(stripMd("> quoted line\nplain") === "quoted line plain")
    assert(stripMd("a\n---\nb") === "a b")
    assert(stripMd("*strong* and _em_ text") === "strong and em text")
  }

  test("markdown: countLinks / countFences") {
    val df = Seq("[a](u) ![b](v) and ```f``` ```g```").toDF("t")
    assert(df.select(Markup.countLinks(col("t"))).as[Long].head() === 2L)
    assert(df.select(Markup.countFences(col("t"))).as[Long].head() === 2L)
  }

  test("markdown strip leaves no residual link/fence constructs") {
    val gnarly = Seq(
      "# H\n[a](u) ![b](v)\n```\n[inside](fence)\n```\n*x* > y",
      "adjacent [a](u1)[b](u2) links and ``` lone fence",
      "![](empty-alt) [](empty-text) `tick` ``` ```",
      "plain text stays plain")
    gnarly.foreach { s =>
      val out = Seq(s).toDF("t")
        .select(Markup.stripMarkdown(col("t")).as("c"))
        .select(Markup.countLinks(col("c")), Markup.countFences(col("c")))
        .as[(Long, Long)].head()
      assert(out === ((0L, 0L)), s"residual markdown in strip of: $s")
    }
  }
}

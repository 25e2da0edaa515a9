package graft

import org.apache.spark.sql.functions._

import graft.operators.{GopherFilter, LineOps, Similarity, TfIdf}

/** Hand-computed goldens for the round-6 curation operators: C4 line
  * rules, CCNet boilerplate stripping, Gopher quality gates, TF-IDF
  * retrieval, and SemDeDup keeper assignment.
  */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  test("c4Filter: terminal punctuation, min words, bullet drop, doc gate") {
    val raw = Seq(
      "one two three four five six.",   // kept
      "short line.",                    // < 5 words
      "no terminal punct six seven eight", // no [.!?"]
      "- bullet item one two three four.", // bullet
      "does it really work like this?", // kept
      "quoted lines also count one two\"" // kept
    ).mkString("\n")
    val r = Seq((1L, raw)).toDF("id", "raw")
      .select(LineOps.c4Filter($"raw").as("r")).select("r.*").head
    assert(r.getAs[Long]("n_lines") === 6L)
    assert(r.getAs[Long]("n_kept") === 3L)
    assert(r.getAs[Long]("doc_kept") === 1L)
    assert(r.getAs[String]("clean_text") ===
      "one two three four five six.\ndoes it really work like this?\nquoted lines also count one two\"")
  }

  test("c4Filter: below the 3-line gate the document is dropped whole") {
    val r = Seq((1L, "one two three four five six.\nshort."))
      .toDF("id", "raw")
      .select(LineOps.c4Filter($"raw").as("r")).select("r.*").head
    assert(r.getAs[Long]("n_kept") === 1L)
    assert(r.getAs[Long]("doc_kept") === 0L)
    assert(r.getAs[String]("clean_text") === "")
  }

  test("boilerplateStrip: lines in >= minDocs distinct docs vanish everywhere") {
    val footer = "copyright acme corp"
    val df = Seq(
      (1L, s"unique one\n$footer\nunique two"),
      (2L, s"$footer\nunique three"),
      (3L, s"unique four\n$footer"),
      // same line twice in ONE doc -> distinct-doc count stays 1, kept
      (4L, "repeated line\nrepeated line")
    ).toDF("id", "raw")
    val out = LineOps.boilerplateStrip(df, "id", "raw", minDocs = 3)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("n_lines"),
      r.getAs[Long]("n_boiler"), r.getAs[String]("clean_text"))).toSeq === Seq(
      (1L, 3L, 1L, "unique one\nunique two"),
      (2L, 2L, 1L, "unique three"),
      (3L, 2L, 1L, "unique four"),
      (4L, 2L, 0L, "repeated line\nrepeated line")))
  }

  test("gopher flags: integer cross-multiplied gates") {
    // 6 words, sum_len = 3+3+3+2+3+4 = 18 -> mean in [3,10]; all alpha;
    // stopword hits: the, and, of, the -> 4
    val df = Seq((1L, "the fox and of the wolf")).toDF("id", "text")
    val g = df.select(GopherFilter.flags($"text", minWords = 5).as("g"))
      .select("g.*").head
    assert(g.getAs[Long]("n_words") === 6L)
    assert(g.getAs[Long]("sum_word_len") === 18L)
    assert(g.getAs[Long]("n_alpha_words") === 6L)
    assert(g.getAs[Long]("stop_hits") === 4L)
    assert(g.getAs[Long]("flag_word_count") === 1L)
    assert(g.getAs[Long]("flag_mean_len") === 1L)
    assert(g.getAs[Long]("flag_alpha") === 1L)
    assert(g.getAs[Long]("flag_stop") === 1L)
    assert(g.getAs[Long]("pass") === 1L)
  }

  test("gopher flags: numeric-soup doc fails the alpha gate only") {
    // 5 words: the, 1, 2, 3, 4 -> alpha 1/5 < 0.8; mean len 7/5 < 3
    val df = Seq((1L, "the 1 2 3 4 and the of")).toDF("id", "text")
    val g = df.select(GopherFilter.flags($"text", minWords = 5).as("g"))
      .select("g.*").head
    assert(g.getAs[Long]("flag_alpha") === 0L)
    assert(g.getAs[Long]("flag_mean_len") === 0L)
    assert(g.getAs[Long]("pass") === 0L)
  }

  test("countCardNumbers: Luhn accepts valid cards in any separator style, rejects shape-only") {
    import spark.implicits._
    val cases = Seq(
      (1L, "pay 4111 1111 1111 1111 now", 1L),        // classic Visa test number
      (2L, "pay 4111-1111-1111-1111 now", 1L),        // dash separators
      (3L, "id 4111111111111111 raw", 1L),            // no separators
      (4L, "num 1234 5678 9012 3456 x", 0L),          // card-shaped, fails Luhn
      (5L, "378282246310005 amex style", 1L),         // 15-digit Amex test number
      (6L, "short 4111 1111 111", 0L),                // too few digits
      (7L, "two: 4111 1111 1111 1111 and 378282246310005", 2L),
      (8L, "plain text, no numbers at all", 0L))
      .toDF("id", "text", "want")
    val got = cases
      .select($"id", $"want",
        graft.operators.Redact.countCardNumbers($"text").as("got"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    for ((id, want, g) <- got) assert(g === want, s"case $id: want $want got $g")
  }

  test("tfidf topkSimilar: identical docs rank first with cosine 1") {
    val df = Seq(
      (100L, "alpha beta gamma delta"),
      (1L, "alpha beta gamma delta"),     // clone of the query
      (2L, "alpha beta gamma epsilon"),
      (3L, "zeta eta theta iota")         // no shared rare terms
    ).toDF("doc_id", "text")
    val out = TfIdf.topkSimilar(df, "doc_id", "text",
        isQuery = _ === 100L, k = 3)
      .orderBy("rank").collect()
    assert(out.head.getAs[Long]("neighbor_id") === 1L)
    assert(out.head.getAs[Double]("cosine") === 1.0)
    assert(out(1).getAs[Long]("neighbor_id") === 2L)
    assert(out(1).getAs[Double]("cosine") < 1.0)
    // doc 3 shares no terms -> never scored
    assert(!out.map(_.getAs[Long]("neighbor_id")).contains(3L))
  }

  test("tfidf topkSimilar: maxDfPpm prunes boilerplate terms from scoring AND norms") {
    // 'the' is in all 4 docs (df = 100%); rare terms tie docs 1/2 to
    // the query. With the cap at 900000 ppm, 'the' is dropped from the
    // whole geometry: doc 2 (query's rare terms + boilerplate) becomes
    // cosine 1.0, and doc 3 (ONLY boilerplate shared) drops out
    // entirely instead of scoring a spurious boilerplate similarity.
    val df = Seq(
      (100L, "the alpha beta"),
      (2L, "the the alpha beta"),  // extra 'the' must not matter once pruned
      (3L, "the zeta eta"),
      (4L, "alpha beta the")
    ).toDF("doc_id", "text")
    val pruned = TfIdf.topkSimilar(df, "doc_id", "text",
        isQuery = _ === 100L, k = 3, maxDfPpm = 900000L)
      .orderBy("rank").collect()
    assert(pruned.map(_.getAs[Long]("neighbor_id")).toSeq === Seq(2L, 4L))
    assert(pruned.forall(_.getAs[Double]("cosine") === 1.0))
    // unpruned: doc 3 scores through 'the' alone
    val full = TfIdf.topkSimilar(df, "doc_id", "text",
        isQuery = _ === 100L, k = 3)
      .collect().map(_.getAs[Long]("neighbor_id"))
    assert(full.contains(3L))
  }

  test("semDedup: epsilon-groups collapse to min-id keeper, singletons keep themselves") {
    // cluster 0: v1 ~ v2 (identical direction), v3 orthogonal;
    // cluster 1: v4 alone
    val df = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(2.0f, 0.0f), 0),
      (3L, Array(0.0f, 1.0f), 0),
      (4L, Array(1.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.semDedup(df, "vec_id", "embedding", "label",
        threshold = 0.9)
      .orderBy("vec_id").collect()
      .map(r => (r.getAs[Long]("vec_id"), r.getAs[Long]("keeper_id"),
        r.getAs[Long]("is_dup"))).toSeq
    assert(out === Seq((1L, 1L, 0L), (2L, 1L, 1L), (3L, 3L, 0L), (4L, 4L, 0L)))
  }

  test("dedupLines: first occurrence survives in order; singles and all-same docs") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "a\nb\na\nc\nb"), // dups at 3rd and 5th line
      (2L, "x"),             // single line untouched
      (3L, "y\ny\ny")        // self-stutter collapses to one line
    ).toDF("doc_id", "raw")
    val out = df.select(col("doc_id"),
        graft.operators.LineOps.dedupLines(col("raw")).as("r"))
      .select(col("doc_id"), col("r.n_lines"), col("r.n_removed"), col("r.clean_text"))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === Seq(
      (1L, 5L, 2L, "a\nb\nc"),
      (2L, 1L, 0L, "x"),
      (3L, 3L, 2L, "y")))
  }

  test("blocklist: token-aligned phrase hits with positions; mixed lengths; punctuation-robust") {
    import graft.operators.Blocklist
    val docs = Seq(
      (1L, "Bad-Phrase here and bad phrase again, plus lone bad"), // 2x "bad phrase" + 1x "bad"... careful: "bad" token appears 3x
      (2L, "nothing to see"),
      (3L, "bad")                                                  // whole doc == 1-token phrase
    ).toDF("doc_id", "text")
    val m = Blocklist.matches(docs, "doc_id", "text", Seq("bad phrase", "see"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sorted
    // doc1 tokens: bad phrase here and bad phrase again plus lone bad
    //   "bad phrase" at positions 1 and 5; doc2 "see" at 3
    assert(m.toSeq === Seq((1L, 1L, "bad phrase"), (1L, 5L, "bad phrase"), (2L, 3L, "see")))
  }

  test("blocklist summary: zero-hit docs kept, verdict at threshold, whole-doc degenerate match") {
    import graft.operators.Blocklist
    val docs = Seq(
      (1L, "spam spam spam eggs"),
      (2L, "clean text only"),
      (3L, "spam")
    ).toDF("doc_id", "text")
    val out = Blocklist.summary(docs, "doc_id", "text", Seq("spam", "spam eggs"), blockAt = 3L)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc1: "spam" x3 + "spam eggs" x1 = 4 hits, 2 phrases, blocked
    // doc3: single-token doc, whole-doc shingle == "spam"
    assert(out.toSeq === Seq((1L, 4L, 2L, 1L), (2L, 0L, 0L, 0L), (3L, 1L, 1L, 0L)))
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.{Fts, GopherFilter, LineOps, TfIdf}

/** Graded curation-pipeline queries: C4 line rules, CCNet boilerplate
  * stripping, Gopher quality gates, and sparse TF-IDF retrieval
  * (SURVEY §7.2.8).
  *
  * The synthetic corpus is a flat token stream, so the line-level
  * queries first plant line structure — 10-token lines, a planted
  * terminal '.' on two of every three lines, a planted '- ' bullet
  * prefix on one in seven (keyed on doc_id + line index) — plus shared
  * header/footer boilerplate for the cross-document strip. The
  * planting runs identically on BOTH engines (same pattern as the
  * planted-duplicate corpora in [[DedupQueries]]), which makes the
  * line rules' outputs non-trivial and still hash-exact.
  */
object CurationQueries {

  // ---- planted line-structured corpus ------------------------------

  /** (doc_id, source, raw): text re-chunked into newline-delimited
    * 10-token lines with deterministic punctuation/bullet planting.
    */
  private def plantedLines(spark: SparkSession, dir: String): DataFrame =
    DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("source"),
        Fts.tokens(Seq(col("text"))).as("t"))
      .select(col("doc_id"), col("source"),
        array_join(transform(
          sequence(lit(0), expr("greatest(size(t) - 1, 0) div 10")),
          i => concat(
            when((col("doc_id") + i) % 7 === 0, lit("- ")).otherwise(lit("")),
            concat_ws(" ", slice(col("t"), i * 10 + 1, lit(10))),
            when((col("doc_id") + i) % 3 =!= 0, lit(".")).otherwise(lit("")))),
          "\n").as("raw"))

  /** DuckDB twin of [[plantedLines]] — CTEs `tok` and `planted`. */
  private val plantedLinesCtes: String = {
    val t = DuckSql.tokens("text")
    s"""tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source, $t AS t
       |  FROM documents),
       |planted AS (SELECT doc_id, source, array_to_string(
       |    list_transform(range(0, greatest(len(t) - 1, 0) // 10 + 1), i ->
       |      (CASE WHEN (doc_id + i) % 7 = 0 THEN '- ' ELSE '' END) ||
       |      array_to_string(t[i*10 + 1 : i*10 + 10], ' ') ||
       |      (CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END)),
       |    chr(10)) AS raw
       |  FROM tok)""".stripMargin
  }

  /** DuckDB fragment: the C4 keep rule, twin of [[LineOps.keepLine]]. */
  private def duckKeepLine(l: String): String =
    s"""regexp_matches($l, '[.!?"]$$')
       | AND len(list_filter(string_split_regex($l, '\\s+'), w -> w <> '')) >= 5
       | AND NOT starts_with($l, '- ')""".stripMargin.replace("\n", "")

  // ---- C4 line filter ----------------------------------------------

  def c4LineFilter(spark: SparkSession, dir: String): DataFrame =
    plantedLines(spark, dir)
      .select(col("doc_id"), LineOps.c4Filter(col("raw")).as("r"))
      .select(col("doc_id"), col("r.n_lines").as("n_lines"),
        col("r.n_kept").as("n_kept"), col("r.doc_kept").as("doc_kept"),
        col("r.clean_text").as("clean_text"))
      .orderBy("doc_id")

  val c4LineFilterOracle: String =
    s"""WITH $plantedLinesCtes,
       |kept AS (SELECT doc_id,
       |    len(string_split(raw, chr(10))) AS n_lines,
       |    list_filter(string_split(raw, chr(10)), l -> ${duckKeepLine("l")}) AS ks
       |  FROM planted)
       |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
       |  CAST(len(ks) AS BIGINT) AS n_kept,
       |  CAST(CASE WHEN len(ks) >= 3 THEN 1 ELSE 0 END AS BIGINT) AS doc_kept,
       |  CASE WHEN len(ks) >= 3 THEN array_to_string(ks, chr(10)) ELSE '' END AS clean_text
       |FROM kept ORDER BY doc_id""".stripMargin

  // ---- CCNet boilerplate strip -------------------------------------

  /** The planted corpus plus shared boilerplate: a constant newsletter
    * header on every 4th doc, a per-source copyright footer on all.
    */
  private def plantedBoiler(spark: SparkSession, dir: String): DataFrame =
    plantedLines(spark, dir)
      .select(col("doc_id"), concat(
        when(col("doc_id") % 4 === 0,
          lit("subscribe to our newsletter today please.\n")).otherwise(lit("")),
        col("raw"),
        lit("\ncopyright "), col("source"),
        lit(" all rights reserved.")).as("raw2"))

  // NB: embedded in a stripMargin'd outer string, so no line here may
  // start with `|` after its own margin strip (it would be stripped a
  // second time, turning `||` concat into a bitwise `|`)
  private val plantedBoilerCte: String =
    """planted2 AS (SELECT doc_id,
      |    (CASE WHEN doc_id % 4 = 0
      |      THEN 'subscribe to our newsletter today please.' || chr(10) ELSE '' END) ||
      |    raw || chr(10) || 'copyright ' || source || ' all rights reserved.' AS raw2
      |  FROM planted)""".stripMargin

  def boilerplateStrip(spark: SparkSession, dir: String): DataFrame =
    LineOps.boilerplateStrip(plantedBoiler(spark, dir), "doc_id", "raw2",
        minDocs = 3)
      .orderBy("doc_id")

  val boilerplateStripOracle: String =
    s"""WITH $plantedLinesCtes,
       |$plantedBoilerCte,
       |lx AS (SELECT doc_id, i AS line_no, ls[i] AS line
       |  FROM (SELECT doc_id, string_split(raw2, chr(10)) AS ls FROM planted2)
       |  CROSS JOIN LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS i) t),
       |hx AS (SELECT doc_id, line_no, line, ${DuckSql.hash60("line")} AS h FROM lx),
       |hf AS (SELECT h, count(DISTINCT doc_id) AS n_docs FROM hx GROUP BY h)
       |SELECT hx.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_lines,
       |  CAST(sum(CASE WHEN n_docs >= 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler,
       |  coalesce(string_agg(CASE WHEN n_docs < 3 THEN line END,
       |    chr(10) ORDER BY line_no), '') AS clean_text
       |FROM hx JOIN hf USING (h)
       |GROUP BY hx.doc_id ORDER BY doc_id""".stripMargin

  // ---- intra-doc duplicate-line removal ----------------------------

  /** Within-doc dup-line removal ([[LineOps.dedupLines]]): the planted
    * line corpus with a guaranteed self-repeat — every 3rd doc gets its
    * own first line appended — so removal counts are non-trivial and
    * order preservation is observable in `clean_text`.
    */
  def dedupLinesDoc(spark: SparkSession, dir: String): DataFrame =
    plantedLines(spark, dir)
      .select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("raw"), lit("\n"), split(col("raw"), "\n")(0)))
          .otherwise(col("raw")).as("raw"))
      .select(col("doc_id"), LineOps.dedupLines(col("raw")).as("r"))
      .select(col("doc_id"), col("r.n_lines").as("n_lines"),
        col("r.n_removed").as("n_removed"),
        col("r.clean_text").as("clean_text"))
      .orderBy("doc_id")

  val dedupLinesDocOracle: String =
    s"""WITH $plantedLinesCtes,
       |p2 AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0
       |    THEN raw || chr(10) || string_split(raw, chr(10))[1]
       |    ELSE raw END AS raw FROM planted),
       |ls AS (SELECT doc_id, string_split(raw, chr(10)) AS ls FROM p2),
       |k AS (SELECT doc_id, len(ls) AS n_lines,
       |    list_filter(ls, (l, i) -> NOT list_contains(ls[1:i-1], l)) AS kept
       |  FROM ls)
       |SELECT doc_id, CAST(n_lines AS BIGINT) AS n_lines,
       |  CAST(n_lines - len(kept) AS BIGINT) AS n_removed,
       |  array_to_string(kept, chr(10)) AS clean_text
       |FROM k ORDER BY doc_id""".stripMargin

  // ---- Gopher quality gates ----------------------------------------

  def gopherQuality(spark: SparkSession, dir: String): DataFrame =
    DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        GopherFilter.flags(col("text")).as("g"))
      .select(col("doc_id"), col("g.n_words").as("n_words"),
        col("g.sum_word_len").as("sum_word_len"),
        col("g.n_alpha_words").as("n_alpha_words"),
        col("g.stop_hits").as("stop_hits"),
        col("g.flag_word_count").as("flag_word_count"),
        col("g.flag_mean_len").as("flag_mean_len"),
        col("g.flag_alpha").as("flag_alpha"),
        col("g.flag_stop").as("flag_stop"),
        col("g.pass").as("pass"))
      .orderBy("doc_id")

  /** Per-document keyword extraction: top-5 terms by integer-scaled
    * TF-IDF weight `tf · (N·1000 div df)` (ties by term) — the
    * document-tagging complement of [[TfIdf]] doc-to-doc retrieval.
    * One tf aggregation, one df aggregation, a 1-row corpus-N scalar,
    * and a per-doc rank window.
    */
  def keywords(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    val tf = d.select(col("doc_id"), explode(Fts.tokens(Seq(col("text")))).as("term"))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val total = d.agg(count(lit(1)).as("n_docs"))
    val w = Window.partitionBy("doc_id").orderBy(col("w").desc, col("term"))
    tf.join(dfreq, Seq("term")).crossJoin(broadcast(total))
      .select(col("doc_id"), col("term"),
        (col("tf") * expr("n_docs * 1000 div df")).as("w"))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= 5)
      .select(col("doc_id"), col("rank"), col("term"), col("w").cast(LongType).as("w"))
      .orderBy("doc_id", "rank")
  }

  val keywordsOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH tf AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, term, count(*) AS tf
       |  FROM (SELECT doc_id, unnest($t) AS term FROM documents)
       |  GROUP BY doc_id, term),
       |dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
       |tot AS (SELECT count(*) AS n_docs FROM documents),
       |w AS (SELECT doc_id, term,
       |    CAST(tf * (n_docs * 1000 // df) AS BIGINT) AS w
       |  FROM tf JOIN dfreq USING (term) CROSS JOIN tot),
       |r AS (SELECT doc_id, term, w,
       |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY w DESC, term) AS BIGINT) AS rank
       |  FROM w)
       |SELECT doc_id, rank, term, w FROM r WHERE rank <= 5
       |ORDER BY doc_id, rank""".stripMargin
  }

  /** Composed curation scorecard: every per-row gate family evaluated
    * in ONE scan pass, folded into a failure bitmask — the keep/drop
    * verdict WITH the reason, which is what a production curation run
    * must emit (dropping without attribution makes corpus debugging
    * impossible). bit0 = Gopher gates, bit1 = dup-2gram > 20%,
    * bit2 = dup-3gram > 15% (repetition thresholds cross-multiplied,
    * never divided). Zero shuffles; scan-speed codegen.
    */
  def curationVerdict(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    d.withColumn("g", GopherFilter.flags(col("text")))
      .withColumn("sh2", TextDedup.shingles(col("text"), 2))
      .withColumn("sh3", TextDedup.shingles(col("text"), 3))
      .withColumn("t2", size(col("sh2")).cast(LongType))
      .withColumn("d2", size(array_distinct(col("sh2"))).cast(LongType))
      .withColumn("t3", size(col("sh3")).cast(LongType))
      .withColumn("d3", size(array_distinct(col("sh3"))).cast(LongType))
      .withColumn("bit_gopher", (col("g.pass") === 0).cast(LongType))
      .withColumn("bit_dup2", ((col("t2") - col("d2")) * 5 > col("t2")).cast(LongType))
      .withColumn("bit_dup3", ((col("t3") - col("d3")) * 20 > col("t3") * 3).cast(LongType))
      .select(col("doc_id"), col("g.n_words").as("n_words"),
        (col("bit_gopher") + col("bit_dup2") * 2 + col("bit_dup3") * 4)
          .cast(LongType).as("fail_mask"),
        (col("bit_gopher") + col("bit_dup2") + col("bit_dup3") === 0)
          .cast(LongType).as("keep"))
      .orderBy("doc_id")
  }

  val curationVerdictOracle: String = {
    val t = DuckSql.tokens("text")
    val hits = DuckSql.hitCount("tk", GopherFilter.requiredStopwords)
    val sh2 = DuckSql.shinglesFromTokens("tk", 2)
    val sh3 = DuckSql.shinglesFromTokens("tk", 3)
    s"""WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $t AS tk FROM documents),
       |c AS (SELECT doc_id,
       |    CAST(len(tk) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS BIGINT) AS sum_word_len,
       |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha_words,
       |    CAST($hits AS BIGINT) AS stop_hits,
       |    CAST(len($sh2) AS BIGINT) AS t2,
       |    CAST(len(list_distinct($sh2)) AS BIGINT) AS d2,
       |    CAST(len($sh3) AS BIGINT) AS t3,
       |    CAST(len(list_distinct($sh3)) AS BIGINT) AS d3
       |  FROM base),
       |f AS (SELECT doc_id, n_words,
       |    CASE WHEN n_words >= 50 AND n_words <= 100000
       |      AND n_words > 0 AND sum_word_len >= n_words * 3 AND sum_word_len <= n_words * 10
       |      AND n_alpha_words * 5 >= n_words * 4
       |      AND stop_hits >= 2 THEN 0 ELSE 1 END AS bit_gopher,
       |    CASE WHEN (t2 - d2) * 5 > t2 THEN 1 ELSE 0 END AS bit_dup2,
       |    CASE WHEN (t3 - d3) * 20 > t3 * 3 THEN 1 ELSE 0 END AS bit_dup3
       |  FROM c)
       |SELECT doc_id, n_words,
       |  CAST(bit_gopher + bit_dup2 * 2 + bit_dup3 * 4 AS BIGINT) AS fail_mask,
       |  CAST(CASE WHEN bit_gopher + bit_dup2 + bit_dup3 = 0 THEN 1 ELSE 0 END AS BIGINT) AS keep
       |FROM f ORDER BY doc_id""".stripMargin
  }

  val gopherQualityOracle: String = {
    val t = DuckSql.tokens("text")
    val hits = DuckSql.hitCount("tk", GopherFilter.requiredStopwords)
    s"""WITH c AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CAST(len(tk) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS BIGINT) AS sum_word_len,
       |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha_words,
       |    CAST($hits AS BIGINT) AS stop_hits
       |  FROM (SELECT doc_id, $t AS tk FROM documents)),
       |f AS (SELECT *,
       |    CASE WHEN n_words >= 50 AND n_words <= 100000 THEN 1 ELSE 0 END AS fw,
       |    CASE WHEN n_words > 0 AND sum_word_len >= n_words * 3
       |      AND sum_word_len <= n_words * 10 THEN 1 ELSE 0 END AS fm,
       |    CASE WHEN n_words > 0 AND n_alpha_words * 5 >= n_words * 4 THEN 1 ELSE 0 END AS fa,
       |    CASE WHEN stop_hits >= 2 THEN 1 ELSE 0 END AS fs
       |  FROM c)
       |SELECT doc_id, n_words, sum_word_len, n_alpha_words, stop_hits,
       |  CAST(fw AS BIGINT) AS flag_word_count,
       |  CAST(fm AS BIGINT) AS flag_mean_len,
       |  CAST(fa AS BIGINT) AS flag_alpha,
       |  CAST(fs AS BIGINT) AS flag_stop,
       |  CAST(fw * fm * fa * fs AS BIGINT) AS pass
       |FROM f ORDER BY doc_id""".stripMargin
  }

  // ---- sparse TF-IDF retrieval -------------------------------------

  /** Top-5 lexically-similar corpus docs for every 100th document. */
  /** Retrieval contract: the query set is FIXED (`% 100 == 0` capped
    * below 2000 → at most 20 queries at ANY scale factor), so cost is
    * Θ(corpus) — the sf1 validation caught the previous spelling
    * (query set growing WITH the corpus) going quadratic: 47x wall for
    * 10x data. A growing query set is an all-pairs workload, not
    * retrieval; all-pairs belongs to the PPJoin/LSH family.
    */
  def tfidfTopk(spark: SparkSession, dir: String): DataFrame =
    TfIdf.topkSimilar(DedupQueries.docs(spark, dir), "doc_id", "text",
        isQuery = id => id % 100 === 0 && id < 2000, k = 5)
      .orderBy("q_id", "rank")

  val tfidfTopkOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS id, unnest($t) AS term
       |  FROM documents),
       |tf AS (SELECT id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM tok GROUP BY id, term),
       |dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
       |w AS (SELECT id, tf.term,
       |    tf * (((SELECT count(*) FROM documents) * 1000) // df) AS w
       |  FROM tf JOIN dfreq USING (term)),
       |norms AS (SELECT id, sum(CAST(w AS HUGEINT) * w) AS n2 FROM w GROUP BY id),
       |scored AS (SELECT qw.id AS q_id, cw.id AS c_id,
       |    sum(CAST(qw.w AS HUGEINT) * cw.w) AS num
       |  FROM w qw JOIN w cw USING (term)
       |  WHERE qw.id % 100 = 0 AND qw.id < 2000 AND cw.id <> qw.id
       |  GROUP BY 1, 2),
       |cos AS (SELECT q_id, c_id,
       |    round(CAST(num AS DOUBLE) /
       |      (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(cn.n2 AS DOUBLE))), 6) AS cosine
       |  FROM scored JOIN norms qn ON qn.id = q_id JOIN norms cn ON cn.id = c_id),
       |ranked AS (SELECT q_id, c_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id
       |      ORDER BY cosine DESC, c_id) AS BIGINT) AS rank
       |  FROM cos)
       |SELECT q_id, rank, c_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** Per-source curation funnel: the [[curationVerdict]] gate bits
    * rolled up by source — docs in, docs kept, and per-gate failure
    * counts. The report a pipeline operator reads to decide which
    * upstream dump is rotting. Same one-scan bit computation, one
    * grouped aggregation on the (tiny) source key.
    */
  def curationBySource(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.TextDedup
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("source"), col("text"))
    d.withColumn("g", GopherFilter.flags(col("text")))
      .withColumn("sh2", TextDedup.shingles(col("text"), 2))
      .withColumn("sh3", TextDedup.shingles(col("text"), 3))
      .withColumn("t2", size(col("sh2")).cast(LongType))
      .withColumn("d2", size(array_distinct(col("sh2"))).cast(LongType))
      .withColumn("t3", size(col("sh3")).cast(LongType))
      .withColumn("d3", size(array_distinct(col("sh3"))).cast(LongType))
      .withColumn("bit_gopher", (col("g.pass") === 0).cast(LongType))
      .withColumn("bit_dup2", ((col("t2") - col("d2")) * 5 > col("t2")).cast(LongType))
      .withColumn("bit_dup3", ((col("t3") - col("d3")) * 20 > col("t3") * 3).cast(LongType))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum((col("bit_gopher") + col("bit_dup2") + col("bit_dup3") === 0)
          .cast(LongType)).cast(LongType).as("n_keep"),
        sum(col("bit_gopher")).cast(LongType).as("n_fail_gopher"),
        sum(col("bit_dup2")).cast(LongType).as("n_fail_dup2"),
        sum(col("bit_dup3")).cast(LongType).as("n_fail_dup3"))
      .orderBy("source")
  }

  val curationBySourceOracle: String = {
    val t = DuckSql.tokens("text")
    val hits = DuckSql.hitCount("tk", GopherFilter.requiredStopwords)
    val sh2 = DuckSql.shinglesFromTokens("tk", 2)
    val sh3 = DuckSql.shinglesFromTokens("tk", 3)
    s"""WITH base AS (SELECT source, $t AS tk FROM documents),
       |c AS (SELECT source,
       |    CAST(len(tk) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform(tk, x -> length(x))), 0) AS BIGINT) AS sum_word_len,
       |    CAST(len(list_filter(tk, x -> regexp_matches(x, '[a-z]'))) AS BIGINT) AS n_alpha_words,
       |    CAST($hits AS BIGINT) AS stop_hits,
       |    CAST(len($sh2) AS BIGINT) AS t2,
       |    CAST(len(list_distinct($sh2)) AS BIGINT) AS d2,
       |    CAST(len($sh3) AS BIGINT) AS t3,
       |    CAST(len(list_distinct($sh3)) AS BIGINT) AS d3
       |  FROM base),
       |f AS (SELECT source,
       |    CASE WHEN n_words >= 50 AND n_words <= 100000
       |      AND n_words > 0 AND sum_word_len >= n_words * 3 AND sum_word_len <= n_words * 10
       |      AND n_alpha_words * 5 >= n_words * 4
       |      AND stop_hits >= 2 THEN 0 ELSE 1 END AS bit_gopher,
       |    CASE WHEN (t2 - d2) * 5 > t2 THEN 1 ELSE 0 END AS bit_dup2,
       |    CASE WHEN (t3 - d3) * 20 > t3 * 3 THEN 1 ELSE 0 END AS bit_dup3
       |  FROM c)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN bit_gopher + bit_dup2 + bit_dup3 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       |  CAST(sum(bit_gopher) AS BIGINT) AS n_fail_gopher,
       |  CAST(sum(bit_dup2) AS BIGINT) AS n_fail_dup2,
       |  CAST(sum(bit_dup3) AS BIGINT) AS n_fail_dup3
       |FROM f GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- HTML/markup stripping ---------------------------------------

  /** Markup stripping ([[graft.operators.Markup]]): every 4th doc is
    * wrapped in planted HTML (tags, a script block, `&amp;`/`&lt;`
    * entities — the synthetic corpus has none), then the stripper
    * recovers clean text and counts the tags it removed. Planting is
    * part of the query on both engines, same pattern as the planted
    * dedup corpora. Narrow per-row regex compute, zero shuffles
    * besides the output sort.
    */
  def htmlStrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Markup
    val planted = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        when(col("doc_id") % 4 === 0,
          concat(lit("<html><body><h1>Doc "), col("doc_id"),
            lit("</h1><p>"), col("text"),
            lit(" &amp; more &lt;tags&gt;</p><script>var x = 1;</script></body></html>")))
          .otherwise(col("text")).as("raw"))
    planted.select(col("doc_id"),
        Markup.countTags(col("raw")).as("n_tags"),
        (Markup.countTags(col("raw")) > 0).as("had_markup"),
        Markup.stripHtml(col("raw")).as("clean_text"))
      .orderBy("doc_id")
  }

  val htmlStripOracle: String = {
    val strip = graft.operators.Markup.stripHtmlSql("raw")
    val tags = s"len(regexp_extract_all(raw, '${graft.operators.Markup.TagRe}'))"
    s"""WITH planted AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CASE WHEN doc_id % 4 = 0
       |      THEN '<html><body><h1>Doc ' || CAST(doc_id AS VARCHAR) || '</h1><p>' ||
       |        text || ' &amp; more &lt;tags&gt;</p><script>var x = 1;</script></body></html>'
       |      ELSE text END AS raw
       |  FROM documents)
       |SELECT doc_id, CAST($tags AS BIGINT) AS n_tags,
       |  $tags > 0 AS had_markup,
       |  $strip AS clean_text
       |FROM planted ORDER BY doc_id""".stripMargin
  }

  // ---- Markdown stripping ------------------------------------------

  /** Markdown stripping ([[graft.operators.Markup.stripMarkdown]]):
    * every 3rd doc is wrapped in planted markdown (heading, link,
    * image, blockquote, inline code, a fenced block, emphasis, an
    * hrule), then the stripper recovers plain text, keeping link/image
    * anchor text and dropping fence contents. Counts of links and
    * fences removed ride along. Same planted-structure pattern as
    * [[htmlStrip]]; narrow per-row regex compute.
    */
  def markdownStrip(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Markup
    val md = concat(
      lit("# Doc "), col("doc_id"),
      lit("\n\nIntro [site "), col("doc_id"),
      lit("](http://example.com/x) and ![logo](logo.png) here.\n\n> quoted wisdom\n\nuse `x = 1` then\n\n```\nfenced code "), col("doc_id"),
      lit("\n```\n\n*strong* _em_\n\n---\n\n"), col("text"))
    val planted = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        when(col("doc_id") % 3 === 0, md).otherwise(col("text")).as("raw"))
    planted.select(col("doc_id"),
        Markup.countLinks(col("raw")).as("n_links"),
        Markup.countFences(col("raw")).as("n_fences"),
        Markup.stripMarkdown(col("raw")).as("clean_text"))
      .orderBy("doc_id")
  }

  val markdownStripOracle: String = {
    val strip = graft.operators.Markup.stripMarkdownSql("raw")
    val links = s"len(regexp_extract_all(raw, '${graft.operators.Markup.LinkRe}'))"
    val fences = s"len(regexp_extract_all(raw, '${graft.operators.Markup.FenceRe}'))"
    val nl = "chr(10)"
    val md = s"'# Doc ' || CAST(doc_id AS VARCHAR) || $nl || $nl || " +
      s"'Intro [site ' || CAST(doc_id AS VARCHAR) || " +
      s"'](http://example.com/x) and ![logo](logo.png) here.' || $nl || $nl || " +
      s"'> quoted wisdom' || $nl || $nl || 'use `x = 1` then' || $nl || $nl || " +
      s"'${"```"}' || $nl || 'fenced code ' || CAST(doc_id AS VARCHAR) || $nl || '${"```"}' || $nl || $nl || " +
      s"'*strong* _em_' || $nl || $nl || '---' || $nl || $nl || text"
    s"""WITH planted AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CASE WHEN doc_id % 3 = 0 THEN $md ELSE text END AS raw
       |  FROM documents)
       |SELECT doc_id, CAST($links AS BIGINT) AS n_links,
       |  CAST($fences AS BIGINT) AS n_fences,
       |  $strip AS clean_text
       |FROM planted ORDER BY doc_id""".stripMargin
  }

  // ---- encoding anomalies (mojibake / lossy decode / control bytes) -

  /** Encoding-anomaly screen ([[graft.operators.Encoding]]): three
    * independent corruption classes planted on residue-class-disjoint
    * doc slices (cp1252 double-encode artifacts on `%5=1`, U+FFFD
    * replacement chars on `%7=2`, a BEL control byte on `%11=3` — some
    * docs draw several), then counted back exactly. The quarantine
    * flag is any-signal. Narrow per-row regex counts, zero shuffles
    * besides the output sort.
    */
  def mojibake(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Encoding
    val planted = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 5 === 1, lit(" cafÃ© said â€™")).otherwise(lit("")),
          when(col("doc_id") % 7 === 2, lit(" �x�")).otherwise(lit("")),
          when(col("doc_id") % 11 === 3, lit("\u0007")).otherwise(lit(""))).as("raw"))
    planted.select(col("doc_id"),
        Encoding.countReplacement(col("raw")).as("n_replacement"),
        Encoding.countMojibake(col("raw")).as("n_mojibake"),
        Encoding.countControl(col("raw")).as("n_ctrl"),
        (Encoding.countReplacement(col("raw")) + Encoding.countMojibake(col("raw")) +
          Encoding.countControl(col("raw")) > 0).as("is_suspect"))
      .orderBy("doc_id")
  }

  val mojibakeOracle: String = {
    import graft.operators.Encoding
    val rep = Encoding.countSql("raw", Encoding.ReplacementRe)
    val moj = Encoding.countSql("raw", Encoding.MojibakeRe)
    val ctl = Encoding.countSql("raw", Encoding.CtrlRe)
    s"""WITH planted AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    text ||
       |    CASE WHEN doc_id % 5 = 1 THEN ' cafÃ© said â€™' ELSE '' END ||
       |    CASE WHEN doc_id % 7 = 2 THEN ' �x�' ELSE '' END ||
       |    CASE WHEN doc_id % 11 = 3 THEN chr(7) ELSE '' END AS raw
       |  FROM documents)
       |SELECT doc_id, CAST($rep AS BIGINT) AS n_replacement,
       |  CAST($moj AS BIGINT) AS n_mojibake,
       |  CAST($ctl AS BIGINT) AS n_ctrl,
       |  $rep + $moj + $ctl > 0 AS is_suspect
       |FROM planted ORDER BY doc_id""".stripMargin
  }

  // ---- code-vs-prose routing ---------------------------------------

  /** Code-vs-prose routing ([[graft.operators.CodeDetect]]): every 6th
    * doc gets a planted polyglot snippet (indented python-ish lines, a
    * C-style while, a JS let) appended, then the three ppm densities
    * and their mean decide the route. Prose keyword noise ("if"/"for"
    * as English words) stays well under the 40000 ppm routing
    * threshold; planted docs land far above it. Integer-exact ppm on
    * both engines.
    */
  def codeProse(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.CodeDetect
    val snippet = concat(
      lit("\ndef compute_"), col("doc_id"),
      lit("(x):\n    return x + "), col("doc_id"),
      lit(";\nwhile (i < 10) { print(i); i = i + 1; }\n    let y = [x];"))
    val planted = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 6 === 0, snippet).otherwise(lit(""))).as("raw"))
    planted
      .select(col("doc_id"), CodeDetect.codeCounts(col("raw")).as("c"))
      .select(col("doc_id") +: Seq("n_chars", "n_lines", "n_tokens",
        "n_symbols", "n_indented", "n_keywords").map(f => col(s"c.$f").as(f)): _*)
      .selectExpr(Seq("doc_id") ++ CodeDetect.scoreSql("div").split(",\n"): _*)
      .withColumn("code_score_ppm",
        expr("(symbol_ppm + indent_ppm + keyword_ppm) div 3").cast(LongType))
      .withColumn("is_code", col("code_score_ppm") >= 40000)
      .select(col("doc_id"), col("symbol_ppm").cast(LongType),
        col("indent_ppm").cast(LongType), col("keyword_ppm").cast(LongType),
        col("code_score_ppm"), col("is_code"))
      .orderBy("doc_id")
  }

  val codeProseOracle: String = {
    import graft.operators.CodeDetect
    val nl = "chr(10)"
    val snippet = s"$nl || 'def compute_' || CAST(doc_id AS VARCHAR) || '(x):' || $nl || " +
      s"'    return x + ' || CAST(doc_id AS VARCHAR) || ';' || $nl || " +
      s"'while (i < 10) { print(i); i = i + 1; }' || $nl || '    let y = [x];'"
    val ws = """len(list_filter(string_split_regex(raw, '\s+'), x -> x <> ''))"""
    val kw = DuckSql.hitCount(DuckSql.tokens("raw"), CodeDetect.Keywords)
    s"""WITH planted AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    text || CASE WHEN doc_id % 6 = 0 THEN $snippet ELSE '' END AS raw
       |  FROM documents),
       |c AS (SELECT doc_id,
       |    CAST(length(raw) AS BIGINT) AS n_chars,
       |    CAST(len(string_split(raw, $nl)) AS BIGINT) AS n_lines,
       |    CAST($ws AS BIGINT) AS n_tokens,
       |    CAST(len(regexp_extract_all(raw, '${CodeDetect.SymbolRe}')) AS BIGINT) AS n_symbols,
       |    CAST(len(regexp_extract_all(raw, '${CodeDetect.IndentRe}')) AS BIGINT) AS n_indented,
       |    CAST($kw AS BIGINT) AS n_keywords
       |  FROM planted),
       |p AS (SELECT doc_id,
       |${CodeDetect.scoreSql("//")}
       |  FROM c)
       |SELECT doc_id, CAST(symbol_ppm AS BIGINT) AS symbol_ppm,
       |  CAST(indent_ppm AS BIGINT) AS indent_ppm,
       |  CAST(keyword_ppm AS BIGINT) AS keyword_ppm,
       |  CAST((symbol_ppm + indent_ppm + keyword_ppm) // 3 AS BIGINT) AS code_score_ppm,
       |  (symbol_ppm + indent_ppm + keyword_ppm) // 3 >= 40000 AS is_code
       |FROM p ORDER BY doc_id""".stripMargin
  }

  // ---- passage-level ranked retrieval (RAG shape) ------------------

  /** Passage retrieval: strided 64/48 chunks ([[graft.operators.Chunk]])
    * scored with the tf·idf ranker ([[Fts.rankedMatch]]) AT CHUNK
    * GRANULARITY — the retrieval unit RAG actually serves, where
    * idf is computed over passages so a term common across one huge
    * doc's chunks is correctly discounted. chunk_id packs
    * (doc, chunk_no) into one rowid (×100000 — bound documented at the
    * packing site); top-20 with full deterministic tie order.
    */
  def passageRank(spark: SparkSession, dir: String): DataFrame = {
    val chunks = graft.operators.Chunk
      .chunkDocs(DedupQueries.docs(spark, dir), "doc_id", "text", 64, 48)
      // 100k chunks/doc bound = 4.8M tokens/doc at stride 48; packing
      // keeps rankedMatch's single-rowid contract
      .withColumn("chunk_id",
        (col("doc_id") * 100000L + col("chunk_no")).cast(LongType))
    Fts.rankedMatch(chunks, Seq("chunk_text"), "spark window hash",
        rowidCol = "chunk_id")
      .select(expr("chunk_id div 100000").cast(LongType).as("doc_id"),
        (col("chunk_id") % 100000L).cast(LongType).as("chunk_no"),
        col("score"), col("terms_hit"))
      .orderBy(col("score").desc, col("doc_id"), col("chunk_no"))
      .limit(20)
  }

  val passageRankOracle: String = {
    val t = DuckSql.tokens("text")
    val ct = DuckSql.tokens("chunk_text")
    s"""WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $t AS t FROM documents),
       |k AS (SELECT doc_id, t,
       |    CASE WHEN len(t) > 64 THEN CAST(ceil((len(t) - 64) / 48.0) AS BIGINT)
       |         ELSE 0 END AS kmax
       |  FROM tok),
       |e AS (SELECT doc_id, t, unnest(range(0, kmax + 1)) AS i FROM k),
       |ch AS (SELECT doc_id * 100000 + i AS chunk_id,
       |    array_to_string(t[i*48 + 1 : i*48 + 64], ' ') AS chunk_text
       |  FROM e),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM ch),
       |tf AS (SELECT chunk_id, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT chunk_id, unnest($ct) AS term FROM ch)
       |  WHERE term IN ('spark', 'window', 'hash')
       |  GROUP BY chunk_id, term),
       |idf AS (SELECT term,
       |    CAST(((SELECT n FROM n) * 1000000) // count(DISTINCT chunk_id) AS BIGINT) AS idf_scaled
       |  FROM tf GROUP BY term),
       |sc AS (SELECT tf.chunk_id, CAST(sum(tf * idf_scaled) AS BIGINT) AS score,
       |    CAST(count(DISTINCT tf.term) AS BIGINT) AS terms_hit
       |  FROM tf JOIN idf USING (term) GROUP BY tf.chunk_id)
       |SELECT CAST(chunk_id // 100000 AS BIGINT) AS doc_id,
       |  CAST(chunk_id % 100000 AS BIGINT) AS chunk_no, score, terms_hit
       |FROM sc ORDER BY score DESC, doc_id, chunk_no LIMIT 20""".stripMargin
  }

  // ---- conversation-format validation (SFT data QA) ----------------

  /** Chat-transcript structural QA — the validation an SFT pipeline
    * runs on conversation data before training: starts with a user
    * turn, ends with an assistant turn, roles strictly alternate. The
    * flat corpus is formed into role-tagged transcripts (two tokens of
    * content per turn); planted violations — a doubled user turn on
    * `%7=1`, a dropped final assistant turn on `%5=2` (first rule wins
    * on overlap) — are then caught by the checks. All array HOFs, no
    * UDFs; one row per doc, zero shuffles besides the output sort.
    */
  def chatValidate(spark: SparkSession, dir: String): DataFrame = {
    val u = lit("user")
    val a = lit("assistant")
    val planted = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        Fts.tokens(Seq(col("text"))).as("t"))
      .withColumn("roles",
        when(col("doc_id") % 7 === 1, array(u, u, a, a))
          .when(col("doc_id") % 5 === 2, array(u, a, u))
          .otherwise(array(u, a, u, a)))
    planted
      .withColumn("transcript", array_join(
        zip_with(col("roles"),
          sequence(lit(0), size(col("roles")) - 1),
          (r, i) => concat(r, lit(": "),
            concat_ws(" ", slice(col("t"), i * 2 + 1, lit(2))))), "\n"))
      .withColumn("n_turns", size(col("roles")).cast(LongType))
      .withColumn("starts_user", element_at(col("roles"), 1) === "user")
      .withColumn("ends_assistant", element_at(col("roles"), -1) === "assistant")
      .withColumn("n_alt_violations",
        size(filter(sequence(lit(1), size(col("roles")) - 1),
          i => element_at(col("roles"), i) === element_at(col("roles"), i + 1)))
          .cast(LongType))
      .withColumn("is_valid",
        col("starts_user") && col("ends_assistant") && col("n_alt_violations") === 0)
      .select("doc_id", "n_turns", "starts_user", "ends_assistant",
        "n_alt_violations", "is_valid", "transcript")
      .orderBy("doc_id")
  }

  val chatValidateOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $t AS t,
       |    CASE WHEN doc_id % 7 = 1 THEN ['user', 'user', 'assistant', 'assistant']
       |         WHEN doc_id % 5 = 2 THEN ['user', 'assistant', 'user']
       |         ELSE ['user', 'assistant', 'user', 'assistant'] END AS roles
       |  FROM documents),
       |v AS (SELECT doc_id, roles,
       |    array_to_string(list_transform(range(1, len(roles) + 1),
       |      i -> roles[i] || ': ' || array_to_string(t[(i-1)*2 + 1 : (i-1)*2 + 2], ' ')),
       |      chr(10)) AS transcript,
       |    CAST(len(roles) AS BIGINT) AS n_turns,
       |    roles[1] = 'user' AS starts_user,
       |    roles[len(roles)] = 'assistant' AS ends_assistant,
       |    CAST(len(list_filter(range(1, len(roles)),
       |      i -> roles[i] = roles[i + 1])) AS BIGINT) AS n_alt_violations
       |  FROM d)
       |SELECT doc_id, n_turns, starts_user, ends_assistant, n_alt_violations,
       |  starts_user AND ends_assistant AND n_alt_violations = 0 AS is_valid,
       |  transcript
       |FROM v ORDER BY doc_id""".stripMargin
  }

  // ---- turn-level SFT dedup ----------------------------------------

  /** Turn-level duplicate detection over chat transcripts — the SFT
    * quality issue DOC-level dedup misses: a templated assistant reply
    * ("As an AI...") repeated across thousands of otherwise-distinct
    * conversations overfits the model to the template. Transcripts are
    * the same planted derivation as `x_chat_validate`; the report is
    * (role, content) turns appearing in many distinct conversations.
    * One turn-keyed shuffle, map-side combined.
    */
  def turnDedup(spark: SparkSession, dir: String): DataFrame = {
    val planted = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        Fts.tokens(Seq(col("text"))).as("t"))
      .withColumn("roles",
        when(col("doc_id") % 7 === 1, array(lit("user"), lit("user"), lit("assistant"), lit("assistant")))
          .when(col("doc_id") % 5 === 2, array(lit("user"), lit("assistant"), lit("user")))
          .otherwise(array(lit("user"), lit("assistant"), lit("user"), lit("assistant"))))
    planted
      .select(col("doc_id"), explode(zip_with(col("roles"),
        sequence(lit(0), size(col("roles")) - 1),
        (r, i) => struct(r.as("role"),
          concat_ws(" ", slice(col("t"), i * 2 + 1, lit(2))).as("content")))).as("turn"))
      .select(col("doc_id"), col("turn.role").as("role"), col("turn.content").as("content"))
      .groupBy(col("role"), col("content"))
      .agg(countDistinct(col("doc_id")).cast(LongType).as("n_convs"),
        count(lit(1)).cast(LongType).as("n_occurrences"))
      .filter(col("n_convs") >= 20)
      .orderBy(col("n_convs").desc, col("role"), col("content"))
      .limit(50)
  }

  val turnDedupOracle: String = {
    val t = graft.queries.DuckSql.tokens("text")
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $t AS t,
       |    CASE WHEN doc_id % 7 = 1 THEN ['user', 'user', 'assistant', 'assistant']
       |         WHEN doc_id % 5 = 2 THEN ['user', 'assistant', 'user']
       |         ELSE ['user', 'assistant', 'user', 'assistant'] END AS roles
       |  FROM documents),
       |turns AS (SELECT doc_id, roles[i] AS role,
       |    array_to_string(t[(i-1)*2 + 1 : (i-1)*2 + 2], ' ') AS content
       |  FROM d CROSS JOIN LATERAL (SELECT unnest(range(1, len(roles) + 1)) AS i) r)
       |SELECT role, content,
       |  CAST(count(DISTINCT doc_id) AS BIGINT) AS n_convs,
       |  CAST(count(*) AS BIGINT) AS n_occurrences
       |FROM turns GROUP BY role, content
       |HAVING count(DISTINCT doc_id) >= 20
       |ORDER BY n_convs DESC, role, content LIMIT 50""".stripMargin
  }

  // ---- end-to-end curation pipeline --------------------------------

  /** The composed curation pipeline as ONE graded dataflow —
    * quality gate → exact dedup (keep lowest id) → content-hash split →
    * sequential packing — summarized per (split, pack). Every stage is
    * an already-graded operator; this query grades their COMPOSITION
    * (the thing a user actually runs), with the oracle chaining the
    * same steps as CTEs. Stage shuffles: one dedup hash, then the
    * pack cumsum via [[graft.operators.Shuffle.groupedRunningSum]]
    * (range-decomposed — a per-split window would serialize ~all of
    * `train` onto one task at 100 TB) — nothing global.
    */
  def pipelineE2e(spark: SparkSession, dir: String): DataFrame = {
    val corpus = DedupQueries.corpusExact(spark, dir)
    val gated = corpus.filter(
      graft.operators.TextStats.quality(col("text")).getField("quality_score") >= 0.4)
    val kept = gated
      .groupBy(col("text"))
      .agg(min(col("doc_id")).cast(LongType).as("doc_id"))
    val split = kept.select(col("doc_id"),
        graft.operators.Sampling.hashBucket(col("text"), 1000).as("bucket"),
        graft.operators.TextStats.bpeishTokenCount(col("text")).as("n_tokens"))
      .withColumn("split", graft.operators.Sampling.splitLabel(col("bucket"), 90, 5))
      .localCheckpoint(true) // feeds the pack cumsum after its own shuffle
    graft.operators.Shuffle.groupedRunningSum(
        split, Seq("split"), Seq("doc_id"), col("n_tokens"), "cum",
        // split is ALREADY an eager checkpoint — a second
        // materialization inside the cumsum would just copy it
        materializeInput = false)
      .withColumn("pack_no", expr("(cum - n_tokens) div 2048").cast(LongType))
      .groupBy(col("split"), col("pack_no"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("n_tokens")).cast(LongType).as("n_tokens"))
      .orderBy("split", "pack_no")
  }

  val pipelineE2eOracle: String = {
    val h = graft.functions.PortableHash.duckdbHash60("text")
    s"""WITH corpus AS (${DedupQueries.corpusExactSql}),
       |gated AS (SELECT * FROM corpus
       |  WHERE (${graft.queries.DuckSql.qualityScore("text")}) >= 0.4),
       |kept AS (SELECT text, CAST(min(doc_id) AS BIGINT) AS doc_id
       |  FROM gated GROUP BY text),
       |sp AS (SELECT doc_id,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tokens,
       |    CASE WHEN ($h) % 1000 < 900 THEN 'train'
       |         WHEN ($h) % 1000 < 950 THEN 'validation'
       |         ELSE 'test' END AS split
       |  FROM kept),
       |c AS (SELECT split, doc_id, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY split ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM sp)
       |SELECT split, CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_no,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens
       |FROM c GROUP BY split, pack_no ORDER BY split, pack_no""".stripMargin
  }

  // ---- k-anonymity risk report -------------------------------------

  /** k-anonymity screening over quasi-identifiers — the data-governance
    * check PII scrubbing alone misses: a document whose
    * (lang, source, size-bucket) combination is shared by fewer than k
    * corpus members is re-identifiable even with direct identifiers
    * redacted (Sweeney, IJUFKS 2002). One map-side-combined groupBy;
    * reports every under-k combination with its member count.
    */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    graft.Tables.loadSpread(spark, dir, "documents")
      .select(col("lang"), col("source"),
        expr("CAST(n_chars AS BIGINT) div 100").as("len_bucket"))
      .groupBy(col("lang"), col("source"), col("len_bucket"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"))
      .filter(col("n_docs") < 5)
      .orderBy("lang", "source", "len_bucket")

  val kAnonymityOracle: String =
    """SELECT lang, source, CAST(n_chars // 100 AS BIGINT) AS len_bucket,
      |  CAST(count(*) AS BIGINT) AS n_docs
      |FROM documents
      |GROUP BY lang, source, len_bucket
      |HAVING count(*) < 5
      |ORDER BY lang, source, len_bucket""".stripMargin

  // ---- multi-phrase blocklist screening ----------------------------

  /** Blocklist screening ([[graft.operators.Blocklist]]): token-aligned
    * occurrences of any of 4 phrases (mixed 1- and 2-token lengths) per
    * document, with a block verdict at >= 3 hits. One positional
    * shingle pass per distinct phrase length + a broadcast hash join —
    * blocklist size never touches the corpus plan.
    */
  def blocklist(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Blocklist.summary(
        graft.Tables.loadSpread(spark, dir, "documents"), "doc_id", "text",
        Seq("spark", "table hash", "customer join", "slow key"), blockAt = 3L)
      .orderBy("doc_id")

  val blocklistOracle: String = {
    val toks = graft.queries.DuckSql.tokens("text")
    val sh2 = graft.queries.DuckSql.shinglesFromTokens("toks", 2)
    s"""WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $toks AS toks
       |  FROM documents),
       |m AS (
       |  SELECT doc_id, s AS phrase FROM
       |    (SELECT doc_id, unnest(toks) AS s FROM base) t1
       |  WHERE s = 'spark'
       |  UNION ALL
       |  SELECT doc_id, s FROM
       |    (SELECT doc_id, unnest($sh2) AS s FROM base) t2
       |  WHERE s IN ('table hash', 'customer join', 'slow key')),
       |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_hits,
       |    CAST(count(DISTINCT phrase) AS BIGINT) AS n_phrases
       |  FROM m GROUP BY doc_id)
       |SELECT b.doc_id, coalesce(n_hits, 0) AS n_hits,
       |  coalesce(n_phrases, 0) AS n_phrases,
       |  CAST(coalesce(n_hits, 0) >= 3 AS BIGINT) AS blocked
       |FROM base b LEFT JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  // ---- SFT loss-mask spans -----------------------------------------

  /** Loss-mask span table for SFT packing — per conversation turn, the
    * token span `[tok_start, tok_end)` it occupies in the rendered
    * transcript and whether the span is trainable (assistant turns
    * only): the table a trainer zips against the packed token stream
    * to zero user-turn losses. Transcripts are the same planted
    * derivation as `x_chat_validate` (2 content tokens per turn + a
    * 2-token `role:` header); offsets are per-doc HOF prefix sums —
    * zero shuffles besides the output sort, so the op is pure per-row
    * compute at corpus scale.
    */
  def sftLossMask(spark: SparkSession, dir: String): DataFrame = {
    val planted = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        Fts.tokens(Seq(col("text"))).as("t"))
      .withColumn("roles",
        when(col("doc_id") % 7 === 1,
          array(lit("user"), lit("user"), lit("assistant"), lit("assistant")))
          .when(col("doc_id") % 5 === 2,
            array(lit("user"), lit("assistant"), lit("user")))
          .otherwise(array(lit("user"), lit("assistant"), lit("user"), lit("assistant"))))
    planted
      // per-turn token count: 2-token header + whatever of the 2
      // content tokens the doc still has at that offset
      .withColumn("counts",
        transform(sequence(lit(1), size(col("roles"))),
          i => (lit(2) + size(slice(col("t"), (i - lit(1)) * 2 + 1, lit(2)))).cast(LongType)))
      // prefix sums stay inside the row (n_turns <= 4): starts(i) = sum counts(1..i-1)
      .withColumn("starts",
        transform(sequence(lit(1), size(col("roles"))),
          i => aggregate(slice(col("counts"), lit(1), i - lit(1)), lit(0L), (a, x) => a + x)))
      .withColumn("turn",
        explode(transform(sequence(lit(1), size(col("roles"))),
          i => struct(
            i.cast(LongType).as("turn_no"),
            element_at(col("roles"), i).as("role"),
            element_at(col("starts"), i).as("tok_start"),
            (element_at(col("starts"), i) + element_at(col("counts"), i)).as("tok_end"),
            (element_at(col("roles"), i) === "assistant").as("trainable")))))
      .select(col("doc_id"), col("turn.turn_no").as("turn_no"),
        col("turn.role").as("role"), col("turn.tok_start").as("tok_start"),
        col("turn.tok_end").as("tok_end"), col("turn.trainable").as("trainable"))
      .orderBy("doc_id", "turn_no")
  }

  val sftLossMaskOracle: String = {
    val t = graft.queries.DuckSql.tokens("text")
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $t AS t,
       |    CASE WHEN doc_id % 7 = 1 THEN ['user', 'user', 'assistant', 'assistant']
       |         WHEN doc_id % 5 = 2 THEN ['user', 'assistant', 'user']
       |         ELSE ['user', 'assistant', 'user', 'assistant'] END AS roles
       |  FROM documents),
       |c AS (SELECT doc_id, roles,
       |    list_transform(range(1, len(roles) + 1),
       |      i -> 2 + len(t[(i-1)*2 + 1 : (i-1)*2 + 2])) AS counts
       |  FROM d),
       |e AS (SELECT doc_id, r.i AS turn_no, roles[r.i] AS role,
       |    CAST(coalesce(list_sum(counts[1 : r.i - 1]), 0) AS BIGINT) AS tok_start,
       |    CAST(coalesce(list_sum(counts[1 : r.i]), 0) AS BIGINT) AS tok_end,
       |    roles[r.i] = 'assistant' AS trainable
       |  FROM c CROSS JOIN LATERAL (SELECT unnest(range(1, len(roles) + 1)) AS i) r)
       |SELECT doc_id, CAST(turn_no AS BIGINT) AS turn_no, role, tok_start,
       |  tok_end, trainable
       |FROM e ORDER BY doc_id, turn_no""".stripMargin
  }

  // ---- composed SFT data build -------------------------------------

  /** The SFT data build graded as ONE dataflow (the [[pipelineE2e]]
    * pattern applied to conversation data): structural QA gate
    * ([[chatValidate]] rules — starts user, ends assistant, strict
    * alternation) → per-turn token accounting with assistant-only
    * trainability ([[sftLossMask]] spans) → content-hash-bucketed
    * sequence packing ([[DedupQueries.packAssign]] shape) → per-pack
    * conversation/token/trainable-token totals. Everything up to the
    * pack window is per-row HOF compute; the one window partitions by
    * the hash bucket — the same two-shuffle budget as the batch text
    * pipeline, at any corpus size.
    */
  def sftPipeline(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val conv = sftConv(spark, dir)
      // the pack window re-sorts within buckets; materialize the gated
      // per-conv compute once so the HOF pipeline doesn't re-run for
      // the window's sort pass (packAssign's lesson)
      .localCheckpoint(true)
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    conv
      .withColumn("cum", sum(col("n_tokens")).over(w).cast(LongType))
      .withColumn("pack_no", expr("(cum - n_tokens) div 2048").cast(LongType))
      .groupBy(col("bucket"), col("pack_no"))
      .agg(count(lit(1)).cast(LongType).as("n_convs"),
        sum(col("n_tokens")).cast(LongType).as("n_tokens"),
        sum(col("n_trainable")).cast(LongType).as("n_trainable"))
      .orderBy("bucket", "pack_no")
  }

  /** [[sftPipeline]]'s per-conversation stage BEFORE the
    * lineage-truncating checkpoint — exposed so the plan lint
    * (PlanSpec) can verify the gate + token-accounting compute really
    * is HOF-narrow (no UDF, no window, no extra shuffle), which the
    * checkpointed plan hides. Production entry is [[sftPipeline]].
    */
  private[graft] def sftConv(spark: SparkSession, dir: String): DataFrame = {
    val planted = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"),
        Fts.tokens(Seq(col("text"))).as("t"))
      .withColumn("roles",
        when(col("doc_id") % 7 === 1,
          array(lit("user"), lit("user"), lit("assistant"), lit("assistant")))
          .when(col("doc_id") % 5 === 2,
            array(lit("user"), lit("assistant"), lit("user")))
          .otherwise(array(lit("user"), lit("assistant"), lit("user"), lit("assistant"))))
    planted
      .withColumn("counts",
        transform(sequence(lit(1), size(col("roles"))),
          i => (lit(2) + size(slice(col("t"), (i - lit(1)) * 2 + 1, lit(2)))).cast(LongType)))
      .filter(element_at(col("roles"), 1) === "user" &&
        element_at(col("roles"), -1) === "assistant" &&
        size(filter(sequence(lit(1), size(col("roles")) - 1),
          i => element_at(col("roles"), i) === element_at(col("roles"), i + 1))) === 0)
      .withColumn("n_tokens", aggregate(col("counts"), lit(0L), (a, x) => a + x))
      .withColumn("n_trainable",
        aggregate(transform(sequence(lit(1), size(col("roles"))),
          i => when(element_at(col("roles"), i) === "assistant",
            element_at(col("counts"), i)).otherwise(lit(0L))),
          lit(0L), (a, x) => a + x))
      .withColumn("bucket",
        graft.operators.Sampling.hashBucket(col("text"), 100))
      .select("doc_id", "bucket", "n_tokens", "n_trainable")
  }

  val sftPipelineOracle: String = {
    val t = graft.queries.DuckSql.tokens("text")
    val h = graft.functions.PortableHash.duckdbHash60("text")
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text, $t AS t,
       |    CASE WHEN doc_id % 7 = 1 THEN ['user', 'user', 'assistant', 'assistant']
       |         WHEN doc_id % 5 = 2 THEN ['user', 'assistant', 'user']
       |         ELSE ['user', 'assistant', 'user', 'assistant'] END AS roles
       |  FROM documents),
       |c AS (SELECT doc_id, text, roles,
       |    list_transform(range(1, len(roles) + 1),
       |      i -> 2 + len(t[(i-1)*2 + 1 : (i-1)*2 + 2])) AS counts
       |  FROM d),
       |k AS (SELECT doc_id,
       |    CAST(list_sum(counts) AS BIGINT) AS n_tokens,
       |    CAST(list_sum(list_transform(range(1, len(roles) + 1),
       |      i -> CASE WHEN roles[i] = 'assistant' THEN counts[i] ELSE 0 END))
       |      AS BIGINT) AS n_trainable,
       |    CAST(($h) % 100 AS BIGINT) AS bucket
       |  FROM c
       |  WHERE roles[1] = 'user' AND roles[len(roles)] = 'assistant'
       |    AND len(list_filter(range(1, len(roles)),
       |      i -> roles[i] = roles[i + 1])) = 0),
       |p AS (SELECT bucket, doc_id, n_tokens, n_trainable,
       |    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM k)
       |SELECT bucket, CAST((cum - n_tokens) // 2048 AS BIGINT) AS pack_no,
       |  CAST(count(*) AS BIGINT) AS n_convs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST(sum(n_trainable) AS BIGINT) AS n_trainable
       |FROM p GROUP BY bucket, pack_no ORDER BY bucket, pack_no""".stripMargin
  }

  // ---- preference-pair construction (DPO data) ---------------------

  /** Preference-pair assembly — the DPO/RLHF data step that turns a
    * scored pool into (chosen, rejected) rows: within each
    * (source, content-hash bucket) group, the highest-quality document
    * is paired against the lowest (quality ties broken by doc_id, so
    * the draw is deterministic under re-sharding); groups whose best
    * and worst coincide, or whose scores tie exactly, yield no pair.
    * Two rank windows over the same grouped scan — the group key
    * partitions both, so no single-partition window exists at scale.
    */
  def preferencePairs(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val scored = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("source"),
        graft.operators.Sampling.hashBucket(col("text"), 10).as("bucket"),
        graft.operators.TextStats.quality(col("text"))
          .getField("quality_score").as("q"))
    val wTop = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("q").desc, col("doc_id"))
    val wBot = Window.partitionBy(col("source"), col("bucket"))
      .orderBy(col("q").asc, col("doc_id"))
    val ranked = scored
      .withColumn("rk_top", row_number().over(wTop))
      .withColumn("rk_bot", row_number().over(wBot))
    val chosen = ranked.filter(col("rk_top") === 1)
      .select(col("source"), col("bucket"),
        col("doc_id").as("chosen_id"), col("q").as("chosen_q"))
    val rejected = ranked.filter(col("rk_bot") === 1)
      .select(col("source"), col("bucket"),
        col("doc_id").as("rejected_id"), col("q").as("rejected_q"))
    chosen.join(rejected, Seq("source", "bucket"))
      .filter(col("chosen_id") =!= col("rejected_id") &&
        col("chosen_q") > col("rejected_q"))
      .select(col("source"), col("bucket"), col("chosen_id"), col("rejected_id"),
        round(col("chosen_q") - col("rejected_q"), 6).as("margin"))
      .orderBy("source", "bucket")
  }

  val preferencePairsOracle: String = {
    val h = graft.functions.PortableHash.duckdbHash60("text")
    val q = graft.queries.DuckSql.qualityScore("text")
    s"""WITH scored AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       |    CAST(($h) % 10 AS BIGINT) AS bucket, ($q) AS q
       |  FROM documents),
       |ranked AS (SELECT *,
       |    row_number() OVER (PARTITION BY source, bucket ORDER BY q DESC, doc_id) AS rk_top,
       |    row_number() OVER (PARTITION BY source, bucket ORDER BY q ASC, doc_id) AS rk_bot
       |  FROM scored),
       |c AS (SELECT source, bucket, doc_id AS chosen_id, q AS chosen_q
       |  FROM ranked WHERE rk_top = 1),
       |r AS (SELECT source, bucket, doc_id AS rejected_id, q AS rejected_q
       |  FROM ranked WHERE rk_bot = 1)
       |SELECT c.source, c.bucket, chosen_id, rejected_id,
       |  round(chosen_q - rejected_q, 6) AS margin
       |FROM c JOIN r ON r.source = c.source AND r.bucket = c.bucket
       |WHERE chosen_id <> rejected_id AND chosen_q > rejected_q
       |ORDER BY c.source, c.bucket""".stripMargin
  }
}

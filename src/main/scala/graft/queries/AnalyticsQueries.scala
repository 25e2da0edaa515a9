package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.PortableHash
import graft.operators.{Bpe, Fts, Kmv, TextDedup}

/** Round-6 graded extension queries: deterministic distinct sketches,
  * candidate-pair verification, script detection, collocation mining,
  * pivoted corpus reports, and exact correlation moments
  * (SURVEY §2.10). All arithmetic is integer-exact (scaled-ppm integer
  * division sequences replicated verbatim in the oracle), so every
  * query hash-matches DuckDB.
  */
object AnalyticsQueries {

  // ---- KMV distinct sketch ----------------------------------------

  /** Per-language distinct-token count, exact AND sketched in one
    * result: the KMV bottom-64 sketch ([[graft.operators.Kmv]]) beside
    * the exact `count(distinct)` it estimates. Deterministic portable
    * hashing makes the sketch itself oracle-checkable — the property
    * HLL cannot offer.
    */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame = {
    val terms = DedupQueries.docs(spark, dir)
      .select(col("lang"), explode(Fts.tokens(Seq(col("text")))).as("term"))
    val sketch = Kmv.distinctSketch(terms, "lang", "term", k = 64)
    val exact = terms.groupBy("lang")
      .agg(count_distinct(col("term")).cast(LongType).as("exact_distinct"))
    sketch.join(exact, "lang")
      .select(col("lang"), col("k_seen"), col("kth_min"),
        col("est_distinct"), col("exact_distinct"))
      .orderBy("lang")
  }

  val kmvDistinctOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH terms AS (SELECT lang, unnest($t) AS term FROM documents),
       |${Kmv.distinctSketchSql("terms", "lang", "term", k = 64)},
       |ex AS (SELECT lang, CAST(count(DISTINCT term) AS BIGINT) AS exact_distinct
       |  FROM terms GROUP BY lang)
       |SELECT lang, k_seen, kth_min, est_distinct, exact_distinct
       |FROM kmv JOIN ex USING (lang) ORDER BY lang""".stripMargin
  }

  // ---- edit-distance verification of LSH candidates ----------------

  /** The candidate→verify pattern real dedup pipelines run after LSH:
    * every minhash near-dup pair is re-scored with exact Levenshtein
    * distance on a 160-char prefix (the bounded-cost verification —
    * full-document O(n·m) DP is the classic scale trap). Output keeps
    * the integer distance and a ppm prefix-similarity.
    *
    * Scale: the pair set is already LSH-bounded; the two text joins are
    * id-keyed; levenshtein cost is capped at 160² per pair.
    */
  def editVerify(spark: SparkSession, dir: String): DataFrame = {
    val corpus = DedupQueries.corpusNear(spark, dir)
    val pairs = TextDedup.minhashPairs(corpus, "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.5)
    val prefixes = corpus.select(col("doc_id"),
      substring(col("text"), 1, 160).as("p"))
    pairs
      .join(prefixes.select(col("doc_id").as("id_a"), col("p").as("p_a")), Seq("id_a"))
      .join(prefixes.select(col("doc_id").as("id_b"), col("p").as("p_b")), Seq("id_b"))
      .withColumn("lev", levenshtein(col("p_a"), col("p_b")).cast(LongType))
      .withColumn("max_len", greatest(length(col("p_a")), length(col("p_b"))).cast(LongType))
      .select(col("id_a"), col("id_b"), col("lev"),
        expr("(max_len - lev) * 1000000 div greatest(max_len, 1)")
          .cast(LongType).as("prefix_sim_ppm"))
      .orderBy("id_a", "id_b")
  }

  val editVerifyOracle: String =
    s"""${DedupQueries.minhashPairsCtes},
       |pref AS (SELECT doc_id, substr(text, 1, 160) AS p FROM corpus),
       |verified AS (SELECT id_a, id_b,
       |    CAST(levenshtein(pa.p, pb.p) AS BIGINT) AS lev,
       |    CAST(greatest(length(pa.p), length(pb.p)) AS BIGINT) AS max_len
       |  FROM scored JOIN pref pa ON pa.doc_id = scored.id_a
       |  JOIN pref pb ON pb.doc_id = scored.id_b
       |  WHERE jaccard >= 0.5)
       |SELECT id_a, id_b, lev,
       |  CAST((max_len - lev) * 1000000 // greatest(max_len, 1) AS BIGINT) AS prefix_sim_ppm
       |FROM verified ORDER BY id_a, id_b""".stripMargin

  // ---- dedup recall audit ------------------------------------------

  /** Pipeline self-evaluation: of the planted near-dup pairs
    * (id, id+1000000), how many does the MinHash+LSH pipeline recover
    * at threshold 0.5? Emits (n_planted, n_recovered, recall_ppm) — the
    * recall metrology a production dedup run reports alongside its
    * pair output (an unmeasured recall knob is how silent under-dedup
    * ships). 1-row scalar aggregates cross-joined; the heavy lifting is
    * the same LSH pipeline the pairs query runs.
    */
  def dedupRecall(spark: SparkSession, dir: String): DataFrame = {
    val pairs = TextDedup.minhashPairs(DedupQueries.corpusNear(spark, dir),
      "doc_id", "text", numPerms = 16, r = 2, jaccardThreshold = 0.5)
    val planted = DedupQueries.docs(spark, dir)
      .filter(col("doc_id") % 10 === 0)
      .agg(count(lit(1)).cast(LongType).as("n_planted"))
    val recovered = pairs
      .filter(col("id_b") === col("id_a") + 1000000L)
      .agg(count(lit(1)).cast(LongType).as("n_recovered"))
    planted.crossJoin(recovered)
      .select(col("n_planted"), col("n_recovered"),
        expr("n_recovered * 1000000 div n_planted")
          .cast(LongType).as("recall_ppm"))
  }

  val dedupRecallOracle: String =
    s"""${DedupQueries.minhashPairsCtes},
       |planted AS (SELECT CAST(count(*) AS BIGINT) AS n_planted
       |  FROM documents WHERE doc_id % 10 = 0),
       |rec AS (SELECT CAST(count(*) AS BIGINT) AS n_recovered
       |  FROM scored WHERE jaccard >= 0.5 AND id_b = id_a + 1000000)
       |SELECT n_planted, n_recovered,
       |  CAST(n_recovered * 1000000 // n_planted AS BIGINT) AS recall_ppm
       |FROM planted CROSS JOIN rec""".stripMargin

  // ---- Unicode script detection ------------------------------------

  /** Script-mix detection over a multilingually-planted corpus (every
    * doc gets a deterministic Cyrillic / CJK / Latin suffix): per-doc
    * char counts by Unicode block and a dominant-script label — the
    * script-ID gate multilingual curation runs before language ID.
    * Counts via `length - length(regexp_replace(class, ''))`, the
    * codegen'd zero-shuffle spelling; char classes are RE2-safe so the
    * oracle runs literally the same regexes.
    */
  def scriptMix(spark: SparkSession, dir: String): DataFrame = {
    val planted = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        concat(col("text"),
          when(col("doc_id") % 3 === 0, lit(" Привет мир"))
            .when(col("doc_id") % 3 === 1, lit(" 你好世界"))
            .otherwise(lit(" saluton mondo"))).as("raw"))
    def cnt(cls: String) =
      (length(col("raw")) - length(regexp_replace(col("raw"), cls, ""))).cast(LongType)
    planted
      .withColumn("n_chars", length(col("raw")).cast(LongType))
      .withColumn("n_latin", cnt("[A-Za-z]"))
      .withColumn("n_cyrillic", cnt("[\\x{0400}-\\x{04FF}]"))
      .withColumn("n_cjk", cnt("[\\x{4E00}-\\x{9FFF}]"))
      .withColumn("n_digit", cnt("[0-9]"))
      .withColumn("dominant",
        when(col("n_latin") >= col("n_cyrillic") && col("n_latin") >= col("n_cjk"), lit("latin"))
          .when(col("n_cyrillic") >= col("n_cjk"), lit("cyrillic"))
          .otherwise(lit("cjk")))
      .select(col("doc_id"), col("n_chars"), col("n_latin"), col("n_cyrillic"),
        col("n_cjk"), col("n_digit"), col("dominant"),
        expr("(n_latin + n_cyrillic + n_cjk + n_digit) * 1000000 div greatest(n_chars, 1)")
          .cast(LongType).as("lettered_ppm"))
      .orderBy("doc_id")
  }

  val scriptMixOracle: String =
    """WITH p AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    text || CASE WHEN doc_id % 3 = 0 THEN ' Привет мир'
      |                 WHEN doc_id % 3 = 1 THEN ' 你好世界'
      |                 ELSE ' saluton mondo' END AS raw
      |  FROM documents),
      |c AS (SELECT doc_id,
      |    CAST(length(raw) AS BIGINT) AS n_chars,
      |    CAST(length(raw) - length(regexp_replace(raw, '[A-Za-z]', '', 'g')) AS BIGINT) AS n_latin,
      |    CAST(length(raw) - length(regexp_replace(raw, '[\x{0400}-\x{04FF}]', '', 'g')) AS BIGINT) AS n_cyrillic,
      |    CAST(length(raw) - length(regexp_replace(raw, '[\x{4E00}-\x{9FFF}]', '', 'g')) AS BIGINT) AS n_cjk,
      |    CAST(length(raw) - length(regexp_replace(raw, '[0-9]', '', 'g')) AS BIGINT) AS n_digit
      |  FROM p)
      |SELECT doc_id, n_chars, n_latin, n_cyrillic, n_cjk, n_digit,
      |  CASE WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk THEN 'latin'
      |       WHEN n_cyrillic >= n_cjk THEN 'cyrillic'
      |       ELSE 'cjk' END AS dominant,
      |  CAST((n_latin + n_cyrillic + n_cjk + n_digit) * 1000000 // greatest(n_chars, 1) AS BIGINT) AS lettered_ppm
      |FROM c ORDER BY doc_id""".stripMargin

  // ---- PMI collocations --------------------------------------------

  /** Collocation mining: top-30 adjacent-token bigrams by pointwise
    * lift `p(ab) / (p(a)·p(b))`, computed entirely in scaled-integer
    * arithmetic — the division SEQUENCE is the contract (replicated
    * verbatim in the oracle), each step bounded within BIGINT:
    * `s1 = T² div (c1·c2)`, `s2 = pair·10⁶ div TB`,
    * `lift_e6 = s1·s2 div 10⁶`.
    *
    * Scale: bigram and unigram counts are map-side-combined shuffles;
    * the count joins are term-keyed; the global top-30 sorts only the
    * `pair >= 5` survivors.
    */
  def collocations(spark: SparkSession, dir: String): DataFrame = {
    // the tokenized corpus feeds three consumers (unigram counts,
    // bigram explode, bigram-total) and the unigram table three more
    // (two PMI joins + the token total) — materialize each once
    val toks = DedupQueries.docs(spark, dir)
      .select(Fts.tokens(Seq(col("text"))).as("t"))
      .filter(size(col("t")) >= 2)
      .localCheckpoint(true)
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val bi = toks
      .select(explode(transform(sequence(lit(1), size(col("t")) - 1),
        i => concat_ws(" ",
          element_at(col("t"), i), element_at(col("t"), i + 1)))).as("bigram"))
      .groupBy("bigram").agg(count(lit(1)).as("pair_cnt"))
      .filter(col("pair_cnt") >= 5)
    val totals = uni.agg(sum(col("c")).as("tot_tokens")).crossJoin(
      toks.select((size(col("t")) - 1).as("nb")).agg(sum(col("nb")).as("tot_bigrams")))
    bi
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .withColumn("w2", split(col("bigram"), " ").getItem(1))
      .join(uni.select(col("w").as("w1"), col("c").as("c1")), Seq("w1"))
      .join(uni.select(col("w").as("w2"), col("c").as("c2")), Seq("w2"))
      .crossJoin(broadcast(totals))
      .select(col("bigram"), col("pair_cnt").cast(LongType).as("pair_cnt"),
        col("c1").cast(LongType).as("c1"), col("c2").cast(LongType).as("c2"),
        expr("""(tot_tokens * tot_tokens div (c1 * c2))
               | * (pair_cnt * 1000000 div tot_bigrams) div 1000000""".stripMargin)
          .cast(LongType).as("lift_e6"))
      .orderBy(col("lift_e6").desc, col("bigram"))
      .limit(30)
  }

  val collocationsOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH toks AS (SELECT $t AS t FROM documents WHERE len($t) >= 2),
       |uni AS (SELECT unnest(t) AS w FROM toks),
       |uc AS (SELECT w, count(*) AS c FROM uni GROUP BY w),
       |bi AS (SELECT array_to_string(t[i:i+1], ' ') AS bigram
       |  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(t))) AS i) r),
       |bc AS (SELECT bigram, count(*) AS pair_cnt FROM bi GROUP BY bigram
       |  HAVING count(*) >= 5),
       |tot AS (SELECT (SELECT sum(c) FROM uc) AS tot_tokens,
       |        (SELECT sum(len(t) - 1) FROM toks) AS tot_bigrams)
       |SELECT bigram, CAST(pair_cnt AS BIGINT) AS pair_cnt,
       |  CAST(u1.c AS BIGINT) AS c1, CAST(u2.c AS BIGINT) AS c2,
       |  CAST((tot_tokens * tot_tokens // (u1.c * u2.c))
       |    * (pair_cnt * 1000000 // tot_bigrams) // 1000000 AS BIGINT) AS lift_e6
       |FROM bc
       |JOIN uc u1 ON u1.w = string_split(bigram, ' ')[1]
       |JOIN uc u2 ON u2.w = string_split(bigram, ' ')[2]
       |CROSS JOIN tot
       |ORDER BY lift_e6 DESC, bigram LIMIT 30""".stripMargin
  }

  // ---- BPE merge training ------------------------------------------

  private def wordCounts(spark: SparkSession, dir: String): DataFrame =
    DedupQueries.docs(spark, dir)
      .select(explode(Fts.tokens(Seq(col("text")))).as("word"))
      .groupBy("word").agg(count(lit(1)).cast(LongType).as("cnt"))

  private val BpeRounds = 8

  private val bpeWordsCte: String =
    s"""toks AS (SELECT unnest(${DuckSql.tokens("text")}) AS word FROM documents),
       |words AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt FROM toks GROUP BY word)""".stripMargin

  /** Distributed BPE merge training ([[graft.operators.Bpe]]): the
    * 8-round learned merge table over the corpus word-frequency table.
    * The oracle REPLAYS training round-for-round in SQL — iterative
    * trainer output, hash-exact across engines.
    */
  def bpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val (merges, _) = Bpe.train(wordCounts(spark, dir), BpeRounds)
    Bpe.mergesDf(spark, merges).orderBy("merge_round")
  }

  val bpeMergesOracle: String =
    s"""WITH $bpeWordsCte,
       |${Bpe.trainSqlCtes(BpeRounds)}
       |${Bpe.mergesSql(BpeRounds)}
       |ORDER BY merge_round""".stripMargin

  /** The trained tokenizer applied: per-word symbol segmentation after
    * the 8 merges, for the 40 most frequent words (ties by word) — the
    * vocabulary file a downstream tokenizer would ship.
    */
  def bpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    val (_, state) = Bpe.train(wordCounts(spark, dir), BpeRounds)
    state.select(col("word"), col("cnt"),
        size(col("syms")).cast(LongType).as("n_syms"),
        concat_ws("|", col("syms")).as("bpe"))
      .orderBy(col("cnt").desc, col("word")).limit(40)
  }

  val bpeTokenizeOracle: String =
    s"""WITH $bpeWordsCte,
       |${Bpe.trainSqlCtes(BpeRounds)}
       |SELECT word, cnt, CAST(len(syms) AS BIGINT) AS n_syms,
       |  array_to_string(syms, '|') AS bpe
       |FROM r$BpeRounds ORDER BY cnt DESC, word LIMIT 40""".stripMargin

  /** Corpus-level tokenizer yield: the trained BPE applied at the
    * VOCABULARY level and weighted back by word frequency — corpus
    * subword count, char count, and subwords-per-100-chars, without
    * ever folding per corpus token (the scale pattern: segment distinct
    * words, join/weight back). 1-row summary.
    */
  def bpeCompression(spark: SparkSession, dir: String): DataFrame = {
    val (_, state) = Bpe.train(wordCounts(spark, dir), BpeRounds)
    state.agg(
        sum(col("cnt")).cast(LongType).as("n_words"),
        sum(col("cnt") * length(col("word"))).cast(LongType).as("n_chars"),
        sum(col("cnt") * size(col("syms"))).cast(LongType).as("n_subwords"))
      .select(col("n_words"), col("n_chars"), col("n_subwords"),
        expr("n_subwords * 100000000 div n_chars")
          .cast(LongType).as("subwords_per_100_chars_e6"))
  }

  val bpeCompressionOracle: String =
    s"""WITH $bpeWordsCte,
       |${Bpe.trainSqlCtes(BpeRounds)}
       |SELECT CAST(sum(cnt) AS BIGINT) AS n_words,
       |  CAST(sum(cnt * length(word)) AS BIGINT) AS n_chars,
       |  CAST(sum(cnt * len(syms)) AS BIGINT) AS n_subwords,
       |  CAST(sum(cnt * len(syms)) * 100000000 // sum(cnt * length(word)) AS BIGINT)
       |    AS subwords_per_100_chars_e6
       |FROM r$BpeRounds""".stripMargin

  // ---- pivoted corpus report ---------------------------------------

  /** Source × language pivot: doc counts per source fanned out into one
    * column per language (Spark's relational pivot operator with an
    * explicit value list — the no-extra-scan form; an unlisted-values
    * pivot runs a distinct job first). Languages are a closed set in
    * this corpus; unseen (source, lang) cells are 0, not NULL.
    */
  def pivotSources(spark: SparkSession, dir: String): DataFrame = {
    val langs = Seq("de", "en", "es", "fr", "zh")
    val base = DedupQueries.docs(spark, dir).select(col("source"), col("lang"))
    val p = base.groupBy("source").pivot("lang", langs).agg(count(lit(1)))
    val filled = langs.foldLeft(p)((df, l) =>
      df.withColumn(s"n_$l", coalesce(col(l), lit(0L)).cast(LongType)).drop(l))
    filled
      .withColumn("n_total",
        langs.map(l => col(s"n_$l")).reduce(_ + _).cast(LongType))
      .orderBy("source")
  }

  val pivotSourcesOracle: String =
    """SELECT source,
      |  CAST(count(*) FILTER (WHERE lang = 'de') AS BIGINT) AS n_de,
      |  CAST(count(*) FILTER (WHERE lang = 'en') AS BIGINT) AS n_en,
      |  CAST(count(*) FILTER (WHERE lang = 'es') AS BIGINT) AS n_es,
      |  CAST(count(*) FILTER (WHERE lang = 'fr') AS BIGINT) AS n_fr,
      |  CAST(count(*) FILTER (WHERE lang = 'zh') AS BIGINT) AS n_zh,
      |  CAST(count(*) AS BIGINT) AS n_total
      |FROM documents GROUP BY source ORDER BY source""".stripMargin

  // ---- MAD robust outliers -----------------------------------------

  /** Robust outlier detection on token counts: per-language lower
    * median and MAD (median absolute deviation), both as exact
    * RANK-based statistics (value at 1-based rank `(n+1) div 2` under a
    * total order — never an engine-specific interpolating `median()`),
    * then the standard `|x − med| > 3 · 1.4826 · MAD` gate in scaled
    * integers (`dev · 10⁴ > 44478 · MAD`). Output: the flagged docs.
    *
    * Scale: two [[graft.operators.Shuffle.groupedRank]] range-decomposed
    * rank passes (a per-language rank window would serialize each
    * language onto one task at 100 TB) + two broadcast-sized per-group
    * stat tables joined back.
    */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"),
        graft.operators.TextStats.wsTokenCount(col("text")).as("x"))
    val n = d.groupBy("lang").agg(count(lit(1)).as("n"))
    val med = graft.operators.Shuffle.groupedRank(
        d, Seq("lang"), Seq("x", "doc_id"), "r")
      .join(n, "lang")
      .filter(col("r") === expr("(n + 1) div 2"))
      .select(col("lang"), col("x").as("med"))
    val withDev = d.join(broadcast(med), "lang")
      .withColumn("dev", abs(col("x") - col("med")))
    val mad = graft.operators.Shuffle.groupedRank(
        withDev, Seq("lang"), Seq("dev", "doc_id"), "r")
      .join(n, "lang")
      .filter(col("r") === expr("(n + 1) div 2"))
      .select(col("lang"), col("dev").as("mad"))
    withDev.join(broadcast(mad), "lang")
      .filter(col("dev") * 10000 > col("mad") * 44478)
      .select(col("doc_id"), col("lang"), col("x"), col("med"),
        col("mad"), col("dev"))
      .orderBy("doc_id")
  }

  val madOutliersOracle: String = {
    val ws = "CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT)"
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, $ws AS x
       |  FROM documents),
       |n AS (SELECT lang, count(*) AS n FROM d GROUP BY lang),
       |med AS (SELECT lang, x AS med FROM (
       |    SELECT lang, x, row_number() OVER (PARTITION BY lang ORDER BY x, doc_id) AS r
       |    FROM d) JOIN n USING (lang) WHERE r = (n + 1) // 2),
       |dev AS (SELECT d.doc_id, d.lang, d.x, med.med, abs(d.x - med.med) AS dev
       |  FROM d JOIN med USING (lang)),
       |mad AS (SELECT lang, dev AS mad FROM (
       |    SELECT lang, doc_id, dev, row_number() OVER (PARTITION BY lang ORDER BY dev, doc_id) AS r
       |    FROM dev) JOIN n USING (lang) WHERE r = (n + 1) // 2)
       |SELECT doc_id, dev.lang, x, med, mad, dev
       |FROM dev JOIN mad USING (lang)
       |WHERE dev * 10000 > mad * 44478
       |ORDER BY doc_id""".stripMargin
  }

  // ---- bucketed length histogram -----------------------------------

  /** Per-language token-length histogram on fixed-width buckets
    * (width 25): doc counts and bucket bounds — the distribution report
    * a curation dashboard plots. One map-side-combined aggregation.
    */
  def lengthHistogram(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("lang"),
        graft.operators.TextStats.wsTokenCount(col("text")).as("ws"))
    d.withColumn("bucket", expr("ws div 25"))
      .groupBy("lang", "bucket")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        min(col("ws")).as("min_ws"), max(col("ws")).as("max_ws"))
      .select(col("lang"), col("bucket").cast(LongType).as("bucket"),
        col("n_docs"), col("min_ws"), col("max_ws"))
      .orderBy("lang", "bucket")
  }

  val lengthHistogramOracle: String = {
    val ws = "CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT)"
    s"""WITH d AS (SELECT lang, $ws AS ws FROM documents)
       |SELECT lang, CAST(ws // 25 AS BIGINT) AS bucket,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(min(ws) AS BIGINT) AS min_ws, CAST(max(ws) AS BIGINT) AS max_ws
       |FROM d GROUP BY 1, 2 ORDER BY lang, bucket""".stripMargin
  }

  // ---- per-domain cap ----------------------------------------------

  /** Per-source document cap (RefinedWeb-style domain balancing): keep
    * at most 15 docs per source, chosen by deterministic seeded-hash
    * rank (reproducible across runs and cluster sizes — never `LIMIT`
    * inside a group, which is partition-order-dependent). The per-source
    * top-15 is the EXACT two-phase bounded-heap rank
    * ([[graft.operators.Scale.topKPerGroup]] on the negated hash — a
    * per-source rank window would serialize each source onto one task
    * at 100 TB); the shuffle carries ≤ partitions × sources × 15 rows.
    */
  def domainCap(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("source"),
        // negate: topKPerGroup ranks orderCol DESCENDING; -hash desc
        // == hash asc, ties broken by doc_id asc — the same total
        // order as the oracle's ORDER BY hash, doc_id
        (-PortableHash.hash60Seeded(lit(5), col("text"))).as("neg_h"))
    graft.operators.Scale.topKPerGroup(d, "source", "neg_h", "doc_id", 15)
      .select(col("doc_id"), col("source"),
        col("rank").cast(LongType).as("keep_rank"))
      .orderBy("doc_id")
  }

  val domainCapOracle: String = {
    val h = DuckSql.hash60Seeded("5", "text")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       |  CAST(keep_rank AS BIGINT) AS keep_rank
       |FROM (SELECT doc_id, source,
       |    row_number() OVER (PARTITION BY source ORDER BY $h, doc_id) AS keep_rank
       |  FROM documents)
       |WHERE keep_rank <= 15 ORDER BY doc_id""".stripMargin
  }

  // ---- reciprocal rank fusion --------------------------------------

  /** Multi-list retrieval fusion: three per-term ranked lists (term
    * frequency desc) fused with Reciprocal Rank Fusion
    * `Σ 1/(60 + rank)` in exact ppm integers (Cormack, Clarke &
    * Buettcher, SIGIR 2009 — public). The per-list rank windows are
    * PARTITIONED BY term; the fuse is one doc-keyed aggregation.
    */
  def rankFusion(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Seq("spark", "vector", "hash")
    val tf = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        explode(Fts.tokens(Seq(col("text")))).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val w = Window.partitionBy("term").orderBy(col("tf").desc, col("doc_id"))
    tf.withColumn("r", row_number().over(w))
      .groupBy("doc_id")
      .agg(sum(expr("1000000 div (60 + r)")).cast(LongType).as("rrf_ppm"),
        count(lit(1)).cast(LongType).as("n_lists"))
      .orderBy(col("rrf_ppm").desc, col("doc_id"))
      .limit(20)
  }

  val rankFusionOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest($t) AS term
       |  FROM documents),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM tok
       |  WHERE term IN ('spark', 'vector', 'hash') GROUP BY doc_id, term),
       |ranked AS (SELECT doc_id, term,
       |    row_number() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS r
       |  FROM tf)
       |SELECT doc_id,
       |  CAST(sum(1000000 // (60 + r)) AS BIGINT) AS rrf_ppm,
       |  CAST(count(*) AS BIGINT) AS n_lists
       |FROM ranked GROUP BY doc_id
       |ORDER BY rrf_ppm DESC, doc_id LIMIT 20""".stripMargin
  }

  // ---- winsorized means --------------------------------------------

  /** Winsorized token-count means per language: clip at the rank-exact
    * p5/p95 (ranks `max(1, n·5 div 100)` and `min(n, (n·95+99) div
    * 100)` — a fixed integer formula, not an interpolating percentile),
    * then the exact ppm mean of the clipped values. The robust mean a
    * curation report quotes when a few giant docs would dominate. The
    * rank is [[graft.operators.Shuffle.groupedRank]]'s range-decomposed
    * rank — never a per-language single-task window.
    */
  def winsorMeans(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"),
        graft.operators.TextStats.wsTokenCount(col("text")).as("x"))
    val n = d.groupBy("lang").agg(count(lit(1)).as("n"))
    val ranked = graft.operators.Shuffle.groupedRank(
      d, Seq("lang"), Seq("x", "doc_id"), "r").join(n, "lang")
    val lo = ranked.filter(col("r") === expr("greatest(1L, n * 5 div 100)"))
      .select(col("lang"), col("x").as("x_lo"))
    val hi = ranked.filter(col("r") === expr("least(n, (n * 95 + 99) div 100)"))
      .select(col("lang"), col("x").as("x_hi"))
    d.join(broadcast(lo), "lang").join(broadcast(hi), "lang")
      .withColumn("cx", greatest(col("x_lo"), least(col("x_hi"), col("x"))))
      .groupBy("lang")
      .agg(count(lit(1)).cast(LongType).as("n"),
        min(col("x_lo")).as("x_lo"), min(col("x_hi")).as("x_hi"),
        sum(col("x")).as("sum_raw"), sum(col("cx")).as("sum_clipped"))
      .select(col("lang"), col("n"), col("x_lo"), col("x_hi"),
        expr("sum_raw * 1000000 div n").cast(LongType).as("raw_mean_ppm"),
        expr("sum_clipped * 1000000 div n").cast(LongType).as("winsor_mean_ppm"))
      .orderBy("lang")
  }

  val winsorMeansOracle: String = {
    val ws = "CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT)"
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, $ws AS x
       |  FROM documents),
       |n AS (SELECT lang, count(*) AS n FROM d GROUP BY lang),
       |ranked AS (SELECT d.*, n.n,
       |    row_number() OVER (PARTITION BY d.lang ORDER BY x, doc_id) AS r
       |  FROM d JOIN n USING (lang)),
       |lo AS (SELECT lang, x AS x_lo FROM ranked WHERE r = greatest(1, n * 5 // 100)),
       |hi AS (SELECT lang, x AS x_hi FROM ranked WHERE r = least(n, (n * 95 + 99) // 100)),
       |c AS (SELECT d.lang, d.x, greatest(x_lo, least(x_hi, d.x)) AS cx, x_lo, x_hi
       |  FROM d JOIN lo USING (lang) JOIN hi USING (lang))
       |SELECT lang, CAST(count(*) AS BIGINT) AS n,
       |  CAST(min(x_lo) AS BIGINT) AS x_lo, CAST(min(x_hi) AS BIGINT) AS x_hi,
       |  CAST(sum(x) * 1000000 // count(*) AS BIGINT) AS raw_mean_ppm,
       |  CAST(sum(cx) * 1000000 // count(*) AS BIGINT) AS winsor_mean_ppm
       |FROM c GROUP BY lang ORDER BY lang""".stripMargin
  }

  // ---- exact CDF ---------------------------------------------------

  /** Exact empirical CDF of token counts per language: one row per
    * distinct value with the running doc count and cumulative ppm —
    * computed as a running-sum window over the GROUPED value counts
    * (vocabulary-sized input), not over raw docs.
    */
  def tokenCdf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = DedupQueries.docs(spark, dir)
      .select(col("lang"),
        graft.operators.TextStats.wsTokenCount(col("text")).as("x"))
    val grouped = d.groupBy("lang", "x").agg(count(lit(1)).as("cnt"))
    val n = d.groupBy("lang").agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("lang").orderBy(col("x"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grouped.withColumn("cum", sum(col("cnt")).over(w))
      .join(n, "lang")
      .select(col("lang"), col("x").cast(LongType).as("x"),
        col("cnt").cast(LongType).as("n_docs"),
        col("cum").cast(LongType).as("cum_docs"),
        expr("cum * 1000000 div n").cast(LongType).as("cum_ppm"))
      .orderBy("lang", "x")
  }

  val tokenCdfOracle: String = {
    val ws = "CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT)"
    s"""WITH d AS (SELECT lang, $ws AS x FROM documents),
       |g AS (SELECT lang, x, count(*) AS cnt FROM d GROUP BY lang, x),
       |n AS (SELECT lang, count(*) AS n FROM d GROUP BY lang),
       |c AS (SELECT lang, x, cnt,
       |    sum(cnt) OVER (PARTITION BY lang ORDER BY x
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM g)
       |SELECT c.lang, CAST(x AS BIGINT) AS x, CAST(cnt AS BIGINT) AS n_docs,
       |  CAST(cum AS BIGINT) AS cum_docs,
       |  CAST(cum * 1000000 // n AS BIGINT) AS cum_ppm
       |FROM c JOIN n USING (lang) ORDER BY lang, x""".stripMargin
  }

  // ---- exact correlation moments -----------------------------------

  /** Per-language Pearson correlation between document char length and
    * whitespace token count, from EXACT integer moments (n, Σx, Σy,
    * Σx², Σy², Σxy — one map-side-combined aggregation). The final
    * coefficient is scaled-integer: numerator and the two variance
    * terms stay in BIGINT; square roots go through
    * `floor(sqrt(double))` — IEEE-identical on exact-integer inputs in
    * both engines; the division sequence is replicated verbatim.
    */
  def corrStats(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("lang"), col("n_chars").cast(LongType).as("x"),
        graft.operators.TextStats.wsTokenCount(col("text")).cast(LongType).as("y"))
    d.groupBy("lang")
      .agg(count(lit(1)).cast(LongType).as("n"),
        sum(col("x")).as("sum_x"), sum(col("y")).as("sum_y"),
        sum(col("x") * col("x")).as("sum_x2"),
        sum(col("y") * col("y")).as("sum_y2"),
        sum(col("x") * col("y")).as("sum_xy"))
      .withColumn("cov_n", expr("n * sum_xy - sum_x * sum_y"))
      .withColumn("d1", expr("CAST(floor(sqrt(CAST(n * sum_x2 - sum_x * sum_x AS DOUBLE))) AS BIGINT)"))
      .withColumn("d2", expr("CAST(floor(sqrt(CAST(n * sum_y2 - sum_y * sum_y AS DOUBLE))) AS BIGINT)"))
      .select(col("lang"), col("n"), col("sum_x"), col("sum_y"),
        col("sum_x2"), col("sum_y2"), col("sum_xy"),
        // chained ×1000 divisions keep floor error ~1/d, and the clamp
        // absorbs the isqrt floor's ±1 pushing |r| epsilon past 1
        expr("""greatest(-1000000L, least(1000000L,
               |  (cov_n * 1000 div greatest(d1, 1)) * 1000 div greatest(d2, 1)))""".stripMargin)
          .cast(LongType).as("corr_e6"))
      .orderBy("lang")
  }

  val corrStatsOracle: String = {
    s"""WITH d AS (SELECT lang, CAST(n_chars AS BIGINT) AS x,
       |    CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT) AS y
       |  FROM documents),
       |m AS (SELECT lang, CAST(count(*) AS BIGINT) AS n,
       |    CAST(sum(x) AS BIGINT) AS sum_x, CAST(sum(y) AS BIGINT) AS sum_y,
       |    CAST(sum(x * x) AS BIGINT) AS sum_x2, CAST(sum(y * y) AS BIGINT) AS sum_y2,
       |    CAST(sum(x * y) AS BIGINT) AS sum_xy
       |  FROM d GROUP BY lang)
       |SELECT lang, n, sum_x, sum_y, sum_x2, sum_y2, sum_xy,
       |  CAST(greatest(-1000000, least(1000000,
       |    ((n * sum_xy - sum_x * sum_y) * 1000
       |      // greatest(CAST(floor(sqrt(CAST(n * sum_x2 - sum_x * sum_x AS DOUBLE))) AS BIGINT), 1)) * 1000
       |      // greatest(CAST(floor(sqrt(CAST(n * sum_y2 - sum_y * sum_y AS DOUBLE))) AS BIGINT), 1)))
       |    AS BIGINT) AS corr_e6
       |FROM m ORDER BY lang""".stripMargin
  }

  // ---- 1-D earth mover's distance between source length profiles ---

  /** Exact 1-D earth mover's (Wasserstein-1) distance between two
    * sources' token-length distributions, over a DENSE clamped bin
    * axis: the drift metric a mixing pipeline watches when a source's
    * length profile shifts between snapshots (EMD sees "how far mass
    * moved", where a per-bin chi-square only sees "how much"). For
    * sorted 1-D histograms EMD is exactly Σ_bins |cum(p) − cum(q)| —
    * integer-exact in ppm of each source's mass; per-bin rows expose
    * the cumulative transport profile and `emd_contrib_ppm` sums to
    * the distance.
    *
    * The axis is the CLAMPED bin id `least(n_tokens div 8, 255)` — 256
    * bins by construction, so the dense zero-filled axis, the global
    * cumulative window, and the totals scalar are all bounded at plan
    * time (the `limit(256)` never truncates; it makes the bound
    * visible to Catalyst, the [[graft.operators.Shuffle]] offsets
    * idiom). One corpus pass (a map-side-combined conditional count);
    * everything after is 256-row arithmetic.
    */
  def histEmd(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = DedupQueries.docs(spark, dir)
      .filter(col("source").isin("src0", "src1"))
      .select(col("source"),
        graft.operators.TextStats.wsTokenCount(col("text"))
          .cast(LongType).as("x"))
      .withColumn("bin", expr("least(x div 8, 255)"))
    val cnts = d.groupBy(col("bin")).agg(
      sum(when(col("source") === "src0", lit(1L)).otherwise(lit(0L)))
        .cast(LongType).as("cnt_a"),
      sum(when(col("source") === "src1", lit(1L)).otherwise(lit(0L)))
        .cast(LongType).as("cnt_b"))
    val axis = spark.range(0L, 256L).select(col("id").as("bin"))
    val dense = axis.join(cnts, Seq("bin"), "left")
      .select(col("bin"), coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"))
      .limit(256)
    val tot = dense.agg(sum(col("cnt_a")).cast(LongType).as("na"),
      sum(col("cnt_b")).cast(LongType).as("nb"))
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dense.crossJoin(broadcast(tot))
      .withColumn("p_ppm", expr("(1000000 * cnt_a) div greatest(na, 1)"))
      .withColumn("q_ppm", expr("(1000000 * cnt_b) div greatest(nb, 1)"))
      .withColumn("cum_diff_ppm",
        sum(col("p_ppm") - col("q_ppm")).over(w).cast(LongType))
      .select(col("bin"), col("cnt_a"), col("cnt_b"),
        col("p_ppm").cast(LongType), col("q_ppm").cast(LongType),
        col("cum_diff_ppm"),
        abs(col("cum_diff_ppm")).as("emd_contrib_ppm"))
      .orderBy("bin")
  }

  val histEmdOracle: String = {
    val ws = "CAST(len(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS BIGINT)"
    s"""WITH d AS (SELECT source, least($ws // 8, 255) AS bin FROM documents
       |  WHERE source IN ('src0', 'src1')),
       |c AS (SELECT bin,
       |    CAST(sum(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
       |    CAST(sum(CASE WHEN source = 'src1' THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
       |  FROM d GROUP BY bin),
       |axis AS (SELECT unnest(range(0, 256)) AS bin),
       |f AS (SELECT axis.bin, coalesce(cnt_a, 0) AS cnt_a,
       |    coalesce(cnt_b, 0) AS cnt_b
       |  FROM axis LEFT JOIN c USING (bin)),
       |t AS (SELECT CAST(sum(cnt_a) AS BIGINT) AS na,
       |    CAST(sum(cnt_b) AS BIGINT) AS nb FROM f),
       |p AS (SELECT f.*, (1000000 * cnt_a) // greatest(na, 1) AS p_ppm,
       |    (1000000 * cnt_b) // greatest(nb, 1) AS q_ppm
       |  FROM f CROSS JOIN t),
       |w AS (SELECT *, CAST(sum(p_ppm - q_ppm) OVER (ORDER BY bin
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_diff_ppm
       |  FROM p)
       |SELECT CAST(bin AS BIGINT) AS bin, cnt_a, cnt_b,
       |  CAST(p_ppm AS BIGINT) AS p_ppm, CAST(q_ppm AS BIGINT) AS q_ppm,
       |  cum_diff_ppm, abs(cum_diff_ppm) AS emd_contrib_ppm
       |FROM w ORDER BY bin""".stripMargin
  }
}

package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.PortableHash
import graft.operators.{Bloom, Fts, Sampling, Shuffle, TextDedup, TextStats}

/** Round-6 graded extension queries: cross-document n-gram analysis,
  * corpus-statistics scoring, heavy hitters, Bloom-prefiltered
  * membership, and deterministic corpus shuffling (SURVEY §7.2.8).
  *
  * All integer outputs are exact (ppm ratios via integer division), so
  * every query hash-matches its DuckDB oracle.
  */
object CorpusQueries {

  /** Cross-document repeated n-grams — the exact-substring-dedup signal
    * (Lee et al. "Deduplicating Training Data Makes Language Models
    * Better" family): per document, how many of its distinct 8-token
    * shingles also occur in at least one other document. Runs over the
    * near-dup-planted corpus so sharing is non-trivial.
    *
    * Scale: one shuffle keyed by the 60-bit shingle hash (map-side
    * combined count), a same-key join back (exchange reuse), one
    * doc-keyed aggregation. Never materializes cross-doc pairs.
    */
  def sharedNgrams(spark: SparkSession, dir: String): DataFrame = {
    val c = DedupQueries.corpusNear(spark, dir)
    // native single-pass distinct-shingle-hash expression — the HOF
    // spelling (array_distinct ∘ transform ∘ hash60) is CodegenFallback
    // and ~4x slower on this, the bench's heaviest text query
    val hs = c.select(col("doc_id"),
      explode(TextDedup.shingleHashes(col("text"), w = 8)).as("h"))
    val df = hs.groupBy("h").agg(count(lit(1)).as("n_docs"))
    hs.join(df, "h")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("n_docs") > 1, 1L).otherwise(0L)).as("n_shared"))
      .select(col("doc_id"),
        col("n_shingles").cast(LongType).as("n_shingles"),
        col("n_shared").cast(LongType).as("n_shared"),
        // `div` = exact integer division (DuckDB `//`): no double rounding
        expr("n_shared * 1000000 div n_shingles").cast(LongType).as("shared_ppm"))
      .orderBy("doc_id")
  }

  val sharedNgramsOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"), 8)
    s"""WITH corpus AS (${DedupQueries.corpusNearSql}),
       |s AS (SELECT doc_id,
       |    unnest(list_distinct(list_transform($sh, x -> ${DuckSql.hash60("x")}))) AS h
       |  FROM corpus),
       |df AS (SELECT h, count(*) AS n_docs FROM s GROUP BY h)
       |SELECT s.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
       |  CAST(sum(CASE WHEN df.n_docs > 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS shared_ppm
       |FROM s JOIN df USING (h)
       |GROUP BY s.doc_id ORDER BY doc_id""".stripMargin
  }

  /** Corpus-frequency familiarity score — the unigram-LM quality signal:
    * each token contributes its corpus frequency in ppm (integer-scaled
    * so both engines agree bit-for-bit); a document's familiarity is the
    * mean contribution. Low scores flag gibberish / rare-vocabulary
    * documents, high scores flag boilerplate.
    *
    * Scale: term counts are one map-side-combined shuffle; the corpus
    * total is a 1-row aggregate cross-joined in (same pattern as the
    * Fts idf build — no driver round-trip, no second scan of the fact
    * table); the token→frequency join is keyed on the term.
    */
  def freqScore(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    val tok = d.select(col("doc_id"),
      explode(Fts.tokens(Seq(col("text")))).as("term"))
    val tf = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
    val total = tf.agg(sum(col("cnt")).as("total"))
    val freq = tf.crossJoin(broadcast(total))
      .select(col("term"),
        expr("cnt * 1000000 div total").cast(LongType).as("freq_ppm"))
    tok.join(freq, "term")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tokens"), sum(col("freq_ppm")).as("s"))
      .select(col("doc_id"),
        col("n_tokens").cast(LongType).as("n_tokens"),
        expr("s div n_tokens").cast(LongType).as("familiarity_ppm"))
      .orderBy("doc_id")
  }

  val freqScoreOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, unnest($t) AS term
       |  FROM documents),
       |tf AS (SELECT term, count(*) AS cnt FROM tok GROUP BY term),
       |freq AS (SELECT term,
       |    CAST(cnt * 1000000 // (SELECT sum(cnt) FROM tf) AS BIGINT) AS freq_ppm
       |  FROM tf)
       |SELECT tok.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_tokens,
       |  CAST(sum(freq_ppm) // count(*) AS BIGINT) AS familiarity_ppm
       |FROM tok JOIN freq USING (term)
       |GROUP BY tok.doc_id ORDER BY doc_id""".stripMargin
  }

  /** Heavy hitters: top-10 terms per language by document frequency
    * (ties broken by term). The per-group top-k is the EXACT two-phase
    * bounded-heap rank ([[graft.operators.Scale.topKPerGroup]]) — a
    * language's vocabulary grows with corpus size, so ranking the full
    * (lang, term) table in one per-language window would serialize a
    * corpus-sized vocabulary onto one task at 100 TB; the two-phase
    * shuffle carries at most partitions × langs × 10 rows.
    */
  def topTerms(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
    val terms = d.select(col("lang"),
      explode(array_distinct(Fts.tokens(Seq(col("text"))))).as("term"))
    val df = terms.groupBy("lang", "term").agg(count(lit(1)).as("df"))
    graft.operators.Scale.topKPerGroup(df, "lang", "df", "term", 10)
      .select(col("lang"), col("rank"), col("term"), col("df").cast(LongType).as("df"))
      .orderBy("lang", "rank")
  }

  val topTermsOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH terms AS (SELECT lang, unnest(list_distinct($t)) AS term FROM documents),
       |g AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS df
       |  FROM terms GROUP BY lang, term),
       |r AS (SELECT lang, term, df,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY df DESC, term) AS BIGINT) AS rank
       |  FROM g)
       |SELECT lang, rank, term, df FROM r WHERE rank <= 10
       |ORDER BY lang, rank""".stripMargin
  }

  /** Bloom-prefiltered benchmark membership over the clone-planted
    * corpus: rows whose content hash appears in the benchmark set
    * (docs with id % 7 = 0). The Bloom filter prunes non-members
    * without a shuffle; an exact semi-join confirms, so the output has
    * no false positives and hash-matches the plain semi-join oracle
    * ([[Bloom]] for why this beats a raw broadcast set at 100 TB).
    */
  def bloomMembership(spark: SparkSession, dir: String): DataFrame = {
    val corpus = DedupQueries.corpusExact(spark, dir)
      .withColumn("h", PortableHash.hash60(col("text")))
    val bench = DedupQueries.docs(spark, dir)
      .filter(col("doc_id") % 7 === 0)
      .select(PortableHash.hash60(col("text")).as("bench_h"))
    Bloom.membership(corpus, "h", bench, "bench_h",
        expectedItems = 10000L, fpp = 0.01)
      .select(col("doc_id"), col("h"))
      .orderBy("doc_id")
  }

  val bloomMembershipOracle: String =
    s"""WITH corpus AS (${DedupQueries.corpusExactSql}),
       |hashed AS (SELECT doc_id, ${DuckSql.hash60("text")} AS h FROM corpus),
       |bench AS (SELECT DISTINCT ${DuckSql.hash60("text")} AS h
       |  FROM documents WHERE doc_id % 7 = 0)
       |SELECT doc_id, h FROM hashed
       |WHERE h IN (SELECT h FROM bench)
       |ORDER BY doc_id""".stripMargin

  /** Deterministic global corpus shuffle: every document gets a seeded,
    * reproducible 1-based epoch position ([[Shuffle.globalOrderIndex]]
    * for why this is NOT `row_number() OVER (ORDER BY hash)` — that
    * window is single-partition at scale).
    */
  def corpusShuffle(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"))
    Shuffle.globalOrderIndex(d, keyCol = "doc_id", seed = 7L,
        tieBreak = "doc_id")
      .select(col("doc_id"), col("shuffle_pos"))
      .orderBy("doc_id")
  }

  /** Block-level exact dedup + reconstruction over the clone-planted
    * corpus: every 25-token block that repeats anywhere keeps only its
    * first occurrence; documents are stitched back from survivors
    * ([[graft.operators.ParaDedup]]). Clones (and within-corpus
    * boilerplate) collapse to empty clean_text.
    */
  def paraDedup(spark: SparkSession, dir: String): DataFrame =
    graft.operators.ParaDedup
      .dedupBlocks(DedupQueries.corpusExact(spark, dir), "doc_id", "text",
        blockTokens = 25)
      .orderBy("doc_id")

  val paraDedupOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH corpus AS (${DedupQueries.corpusExactSql}),
       |tok AS (SELECT doc_id, $t AS t FROM corpus),
       |k AS (SELECT doc_id, t,
       |    CASE WHEN len(t) > 25 THEN CAST(ceil((len(t) - 25) / 25.0) AS BIGINT)
       |         ELSE 0 END AS kmax
       |  FROM tok),
       |b AS (SELECT doc_id, i AS chunk_no,
       |    array_to_string(t[i*25 + 1 : i*25 + 25], ' ') AS btext,
       |    doc_id * 1048576 + i AS pos_key
       |  FROM (SELECT doc_id, t, unnest(range(0, kmax + 1)) AS i FROM k)),
       |hashed AS (SELECT *, ${DuckSql.hash60("btext")} AS h FROM b),
       |keep AS (SELECT h, min(pos_key) AS keeper_key FROM hashed GROUP BY h)
       |SELECT hashed.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_blocks,
       |  CAST(sum(CASE WHEN pos_key = keeper_key THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  coalesce(string_agg(CASE WHEN pos_key = keeper_key THEN btext END,
       |    ' ' ORDER BY chunk_no), '') AS clean_text
       |FROM hashed JOIN keep USING (h)
       |GROUP BY hashed.doc_id ORDER BY doc_id""".stripMargin
  }

  val corpusShuffleOracle: String = {
    val h = DuckSql.hash60Seeded("7", "CAST(doc_id AS VARCHAR)")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(row_number() OVER (ORDER BY $h, doc_id) AS BIGINT) AS shuffle_pos
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Source-mixture resampling to explicit target weights
    * w(srcK) = K%4 + 1 at a 1/4 corpus budget
    * ([[graft.operators.Sampling.mixtureSample]]).
    */
  def mixtureSample(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        col("source"), col("text"))
    graft.operators.Sampling
      .mixtureSample(d, "source", "text",
        src => substring(src, 4, 10).cast(LongType) % 4 + 1,
        budgetNum = 1, budgetDen = 4)
      .select(col("doc_id"), col("source"), col("keep_buckets"))
      .orderBy("doc_id")
  }

  val mixtureSampleOracle: String =
    s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_s,
       |    CAST(CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS BIGINT) AS w_s
       |  FROM documents GROUP BY source),
       |tot AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot,
       |    CAST(sum(w_s) AS BIGINT) AS z FROM c),
       |r AS (SELECT source,
       |    least(10000, (10000 * 1 * n_tot * w_s) // (4 * z * n_s)) AS keep_buckets
       |  FROM c CROSS JOIN tot)
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.source, r.keep_buckets
       |FROM documents d JOIN r USING (source)
       |WHERE (${DuckSql.hash60("text")}) % 10000 < keep_buckets
       |ORDER BY doc_id""".stripMargin

  /** Batch per-source token-budget admission — the graded batch twin
    * of [[graft.streaming.StreamQuota]] (which is doc-count-keyed and
    * spec-verified): documents are admitted in doc_id order until the
    * source's 1000-token budget is crossed; the first doc that crosses
    * is still admitted (its tokens were partly in budget — the
    * convention that makes the budget a floor, matching how a trainer
    * truncates the final sequence rather than dropping it). Admission
    * is inherently sequential per source, but the cumsum must NOT be a
    * per-source window (one multi-TB task per source at 100 TB) — it is
    * [[Shuffle.groupedRunningSum]]'s range-decomposed prefix sum:
    * bounded per-partition sorts plus a broadcast per-(partition,
    * source) offset table.
    */
  def sourceQuota(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("source"),
        graft.operators.TextStats.bpeishTokenCount(col("text")).as("nt"))
    Shuffle.groupedRunningSum(d, Seq("source"), Seq("doc_id"), col("nt"), "cum")
      .withColumn("admitted", col("cum") - col("nt") < 1000)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("admitted").cast(LongType)).cast(LongType).as("n_admitted"),
        sum(when(col("admitted"), col("nt")).otherwise(lit(0L)))
          .cast(LongType).as("tokens_admitted"))
      .orderBy("source")
  }

  val sourceQuotaOracle: String =
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS nt
       |  FROM documents),
       |c AS (SELECT doc_id, source, nt,
       |    CAST(sum(nt) OVER (PARTITION BY source ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM d)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(CASE WHEN cum - nt < 1000 THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted,
       |  CAST(sum(CASE WHEN cum - nt < 1000 THEN nt ELSE 0 END) AS BIGINT) AS tokens_admitted
       |FROM c GROUP BY source ORDER BY source""".stripMargin

  /** Vocabulary coverage curve: per-language OOV rate at nested vocab
    * sizes 50/100/200/400 — [[oovRate]]'s single point widened to the
    * curve a tokenizer-sizing decision actually reads (how much
    * coverage each doubling buys). ONE corpus explode builds the
    * materialized (lang, term, n) count table; the four thresholds are
    * a 4-row literal cross join against the rank window — the curve
    * costs the same one shuffle as the single point.
    */
  def vocabCoverage(spark: SparkSession, dir: String): DataFrame = {
    val tf = DedupQueries.docs(spark, dir)
      .select(col("lang"),
        explode(TextDedup.shingles(col("text"), 3)).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    // the rank only matters up to the largest ladder size, so the full
    // (corpus-growing) vocabulary is never window-ranked per language:
    // the two-phase bounded-heap top-k prunes map-side to <=
    // partitions x langs x 400 rows before the (tiny) exact window
    val ranked = graft.operators.Scale.topKPerGroup(tf, "lang", "n", "term", 400)
      .withColumnRenamed("rank", "rk")
    val totals = tf.groupBy("lang").agg(sum(col("n")).cast(LongType).as("total"))
    // the size ladder rides along as an exploded literal — narrow, not a
    // theta join (the crossJoin+filter spelling plans as a
    // BroadcastNestedLoopJoin, which PlanGuard rightly rejects)
    ranked
      .withColumn("vocab_size",
        explode(array(lit(50), lit(100), lit(200), lit(400))))
      .filter(col("rk") <= col("vocab_size"))
      .groupBy(col("lang"), col("vocab_size"))
      .agg(sum(col("n")).cast(LongType).as("covered"))
      .join(broadcast(totals), Seq("lang"))
      .withColumn("oov_ppm",
        expr("(1000000 * (total - covered)) div total").cast(LongType))
      .select(col("lang"), col("vocab_size").cast(LongType).as("vocab_size"),
        col("covered"), col("total"), col("oov_ppm"))
      .orderBy("lang", "vocab_size")
  }

  val vocabCoverageOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"), 3)
    s"""WITH sh AS (SELECT lang, unnest($sh) AS term FROM documents),
       |tf AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS n
       |  FROM sh GROUP BY lang, term),
       |ranked AS (SELECT lang, term, n,
       |    row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rk
       |  FROM tf),
       |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS total FROM tf GROUP BY lang),
       |sz AS (SELECT unnest([50, 100, 200, 400]) AS vocab_size),
       |cov AS (SELECT lang, vocab_size, CAST(sum(n) AS BIGINT) AS covered
       |  FROM ranked CROSS JOIN sz WHERE rk <= vocab_size
       |  GROUP BY lang, vocab_size)
       |SELECT cov.lang, CAST(vocab_size AS BIGINT) AS vocab_size, covered, total,
       |  CAST((1000000 * (total - covered)) // total AS BIGINT) AS oov_ppm
       |FROM cov JOIN tot ON tot.lang = cov.lang
       |ORDER BY cov.lang, vocab_size""".stripMargin
  }

  /** Per-source length inequality (exact Gini, ppm) — the
    * corpus-balance diagnostic next to [[shardSkew]] and batch padding
    * waste: a source whose token mass concentrates in a few huge
    * documents packs, shards, and batches differently from one with
    * even lengths, and the Gini coefficient is the standard single
    * number for that. Uses the rank formula
    * `G = (2·Σ rᵢxᵢ − (n+1)·Σxᵢ) / (n·Σxᵢ)` with ascending per-source
    * ranks. Ranks come from [[Shuffle.rangeOrderIndex]] over
    * (source, n_chars, doc_id) — a range shuffle with bounded
    * per-partition windows, NOT a per-source single-partition window
    * (a 100 TB source would serialize onto one task) — rebased
    * per-source via a |sources|-row broadcast of min ranks. The
    * rank-weighted sum accumulates in DECIMAL(38,0): Σ rᵢxᵢ ≤ n²·xmax
    * overflows BIGINT near 1e9 docs/source, and DuckDB's HUGEINT sum
    * matches decimal exactly.
    */
  def lengthGini(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("source"),
        col("n_chars").cast(LongType).as("x"))
    val ranked = Shuffle.rangeOrderIndex(d, Seq("source", "x", "doc_id"),
      posCol = "gpos")
    val offsets = ranked.groupBy("source").agg(min(col("gpos")).as("src_off"))
    ranked.join(broadcast(offsets), "source")
      .withColumn("rk", col("gpos") - col("src_off") + 1)
      .groupBy("source")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("x")).cast(LongType).as("total_chars"),
        sum((col("rk") * col("x")).cast(DecimalType(38, 0))).as("wsum"))
      .withColumn("gini_ppm", expr(
        "CAST((1000000 * (2 * wsum - (n_docs + 1) * total_chars)) div (n_docs * total_chars) AS BIGINT)"))
      .select(col("source"), col("n_docs"), col("total_chars"), col("gini_ppm"))
      .orderBy("source")
  }

  val lengthGiniOracle: String =
    """WITH r AS (SELECT source, CAST(n_chars AS BIGINT) AS x,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY n_chars, doc_id) AS BIGINT) AS rk
      |  FROM documents),
      |a AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(x) AS BIGINT) AS total_chars,
      |    sum(rk * x) AS wsum
      |  FROM r GROUP BY source)
      |SELECT source, n_docs, total_chars,
      |  CAST((1000000 * (2 * wsum - (n_docs + 1) * total_chars))
      |    // (n_docs * total_chars) AS BIGINT) AS gini_ppm
      |FROM a ORDER BY source""".stripMargin

  /** Weighted-interleave stream schedule: serialize the multi-source
    * mixture into ONE deterministic training order using weighted fair
    * queuing — doc r of a weight-w source runs at virtual time
    * `r · (1e6 div w)`, so a weight-4 source appears 4× as often as a
    * weight-1 source, evenly spread rather than in bursts (the
    * interleave a data loader needs when it streams one shard sequence
    * but must honor mixture weights). Weights are the
    * [[mixtureSample]] convention (`srcK → K%4+1`). The per-source rank
    * window partitions by source; the global order is
    * [[Shuffle.globalRankBy]]'s bucket-decomposed rank over the integer
    * virtual time — no single-partition window anywhere.
    */
  def interleavePlan(spark: SparkSession, dir: String): DataFrame =
    Sampling.wfqInterleave(
        DedupQueries.docs(spark, dir)
          .select(col("doc_id").cast(LongType).as("doc_id"), col("source")),
        "source", "doc_id",
        src => substring(src, 4, 10).cast(LongType) % 4 + 1)
      .select(col("doc_id"), col("source"), col("src_rank"), col("vtime"),
        col("stream_pos"))
      .orderBy("stream_pos")

  val interleavePlanOracle: String =
    """WITH r AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
      |    CAST(CAST(substr(source, 4) AS BIGINT) % 4 + 1 AS BIGINT) AS w,
      |    CAST(row_number() OVER (PARTITION BY source ORDER BY doc_id) AS BIGINT) AS src_rank
      |  FROM documents),
      |v AS (SELECT doc_id, source, src_rank,
      |    CAST(src_rank * (1000000 // w) AS BIGINT) AS vtime FROM r)
      |SELECT doc_id, source, src_rank, vtime,
      |  CAST(row_number() OVER (ORDER BY vtime, doc_id) AS BIGINT) AS stream_pos
      |FROM v ORDER BY stream_pos""".stripMargin

  /** Epoch shard manifest: the deterministic global shuffle composed
    * into fixed-size training shards — shard k holds positions
    * [k*100+1, (k+1)*100], so shard contents are reproducible across
    * runs and cluster sizes. Aggregation is keyed on the shard id.
    */
  def epochShards(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"))
    Shuffle.globalOrderIndex(d, keyCol = "doc_id", seed = 7L, tieBreak = "doc_id")
      .withColumn("shard", expr("(shuffle_pos - 1) div 100"))
      .groupBy("shard")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        min(col("shuffle_pos")).as("min_pos"), max(col("shuffle_pos")).as("max_pos"),
        min(col("doc_id")).as("min_doc_id"))
      .select(col("shard").cast(LongType).as("shard"), col("n_docs"),
        col("min_pos"), col("max_pos"), col("min_doc_id"))
      .orderBy("shard")
  }

  /** Rendezvous (highest-random-weight) sharding, Thaler & Ravishankar
    * 1998 — the STABLE shard assignment a growing corpus store needs:
    * `shard(doc) = argmax_s hash(s:doc)`, so when the shard count grows
    * k→k+1 only the documents whose new-shard hash wins move (≈1/(k+1)
    * of the corpus), and they ALL move TO the new shard — never
    * between old shards. Modulo sharding (`hash % k`) reshuffles
    * (k−1)/k of every shard on the same change. Output per doc: the
    * k=4 and k=5 assignments and the `moved` flag; the spec pins the
    * only-to-new-shard invariant.
    *
    * Integer-exact argmax without structs: `max(h·8 + s) % 8` — h is a
    * 60-bit hash so the pack tops out at 8·(2^60−1)+7 = 2^63−1,
    * exactly the BIGINT ceiling; ties (h collision across seeds) break
    * to the larger shard id identically on both engines. Narrow
    * per-row compute, k codegen hashes per doc, no shuffle at any
    * corpus size.
    */
  def rendezvousShards(spark: SparkSession, dir: String): DataFrame = {
    def hrw(doc: org.apache.spark.sql.Column, k: Int): org.apache.spark.sql.Column = {
      // the packed argmax reserves 3 bits for the shard id — k > 8 would
      // silently alias shard ids instead of failing
      require(k <= 8, s"hrw: packed argmax supports at most 8 shards, got $k")
      greatest((0 until k).map(s =>
        graft.functions.PortableHash.hash60Seeded(lit(s), doc) * 8 + s): _*) % 8
    }
    DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"))
      .withColumn("shard_old", hrw(col("doc_id"), 4).cast(LongType))
      .withColumn("shard_new", hrw(col("doc_id"), 5).cast(LongType))
      .withColumn("moved",
        (col("shard_old") =!= col("shard_new")).cast(LongType))
      .orderBy("doc_id")
  }

  val rendezvousShardsOracle: String = {
    def hrwSql(k: Int): String = (0 until k)
      .map(s => s"(${DuckSql.hash60Seeded(s.toString, "doc_id")}) * 8 + $s")
      .mkString("greatest(", ", ", ") % 8")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(${hrwSql(4)} AS BIGINT) AS shard_old,
       |  CAST(${hrwSql(5)} AS BIGINT) AS shard_new,
       |  CAST(${hrwSql(4)} <> ${hrwSql(5)} AS BIGINT) AS moved
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Text normalization chain over a messy-planted corpus: every doc
    * gets a decomposed-accent suffix (e + U+0301), a tab, and doubled
    * spaces appended; [[graft.operators.Normalize.clean]] must compose
    * to NFC, collapse whitespace, and lowercase — byte-identical to
    * DuckDB's `nfc_normalize` + regexp chain. The canonicalization pass
    * that makes downstream exact dedup mean anything.
    */
  def normalizeText(spark: SparkSession, dir: String): DataFrame = {
    val planted = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        concat(col("text"), lit("  Caf"), lit("é"),
          lit("\tWAS  here ")).as("raw"))
    planted.select(col("doc_id"),
        graft.operators.Normalize.clean(col("raw")).as("clean_text"))
      .withColumn("n_clean", length(col("clean_text")).cast(LongType))
      .orderBy("doc_id")
  }

  val normalizeTextOracle: String =
    """WITH p AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    text || '  Caf' || 'e' || chr(769) || chr(9) || 'WAS  here ' AS raw
      |  FROM documents)
      |SELECT doc_id,
      |  lower(trim(regexp_replace(nfc_normalize(raw), '\s+', ' ', 'g'))) AS clean_text,
      |  CAST(length(lower(trim(regexp_replace(nfc_normalize(raw), '\s+', ' ', 'g')))) AS BIGINT) AS n_clean
      |FROM p ORDER BY doc_id""".stripMargin

  /** Profile-based n-gram language ID, self-trained and self-scored:
    * per-language character-trigram profiles (top 20 by count, ties by
    * trigram) are built from the labeled corpus, every document is
    * re-classified by profile-hit argmax, and the output is the
    * confusion matrix — the n-gram heuristic language-ID shape, plus a
    * classifier-evaluation aggregation, in one plan.
    *
    * Scale: trigram explode is narrow; profile build is ONE
    * (lang, trigram)-keyed aggregation + a per-lang top-k window
    * (bounded strata); scoring joins the exploded corpus to the tiny
    * broadcast profile table and aggregates per (doc, candidate);
    * argmax is a per-doc window. All counts exact integers.
    */
  def langIdNgram(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"),
        lower(col("text")).as("lt"))
    val tri = d.select(col("doc_id"), col("lang"),
      explode(graft.operators.TextStats.charTrigrams(col("lt"))).as("tg"))
    // profiles train on a DETERMINISTIC 10% hash sample (the at-scale
    // pattern: sample-train, full-apply — pass 1 reads a tenth of the
    // corpus; the same predicate in the oracle keeps parity exact)
    val sampled = d.filter(graft.operators.Sampling.hashBucket(col("lt"), 10) === 0)
      .select(col("lang"),
        explode(graft.operators.TextStats.charTrigrams(col("lt"))).as("tg"))
    val byLangTg = sampled.groupBy(col("lang"), col("tg"))
      .agg(count(lit(1)).as("c"))
    val topW = Window.partitionBy(col("lang"))
      .orderBy(col("c").desc, col("tg"))
    val profiles = byLangTg
      .withColumn("r", row_number().over(topW)).filter(col("r") <= 20)
      .select(col("lang").as("cand_lang"), col("tg"))
    val scores = tri.join(broadcast(profiles), Seq("tg"))
      .groupBy(col("doc_id"), col("lang"), col("cand_lang"))
      .agg(count(lit(1)).as("hits"))
    val argmax = Window.partitionBy(col("doc_id"))
      .orderBy(col("hits").desc, col("cand_lang"))
    scores.withColumn("rk", row_number().over(argmax)).filter(col("rk") === 1)
      .groupBy(col("lang").as("true_lang"), col("cand_lang").as("pred_lang"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"))
      .orderBy("true_lang", "pred_lang")
  }

  val langIdNgramOracle: String =
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, lower(text) AS lt
       |  FROM documents),
       |tri AS (SELECT doc_id, lang, substr(lt, i, 3) AS tg
       |  FROM d CROSS JOIN LATERAL (SELECT unnest(range(1, greatest(length(lt) - 2, 0) + 1)) AS i) t),
       |striN AS (SELECT lang, substr(lt, i, 3) AS tg
       |  FROM d CROSS JOIN LATERAL (SELECT unnest(range(1, greatest(length(lt) - 2, 0) + 1)) AS i) t
       |  WHERE (${DuckSql.hash60("lt")}) % 10 = 0),
       |bylang AS (SELECT lang, tg, count(*) AS c FROM striN GROUP BY lang, tg),
       |prof AS (SELECT lang AS cand_lang, tg FROM (
       |    SELECT lang, tg, row_number() OVER (PARTITION BY lang ORDER BY c DESC, tg) AS r
       |    FROM bylang) WHERE r <= 20),
       |scores AS (SELECT tri.doc_id, tri.lang, prof.cand_lang, count(*) AS hits
       |  FROM tri JOIN prof USING (tg)
       |  GROUP BY tri.doc_id, tri.lang, prof.cand_lang),
       |best AS (SELECT doc_id, lang, cand_lang,
       |    row_number() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang) AS rk
       |  FROM scores)
       |SELECT lang AS true_lang, cand_lang AS pred_lang,
       |  CAST(count(*) AS BIGINT) AS n_docs
       |FROM best WHERE rk = 1
       |GROUP BY 1, 2 ORDER BY true_lang, pred_lang""".stripMargin

  /** Approximate per-language length percentiles — the mergeable-sketch
    * scale path beside the exact `x_length_quantiles`. A deterministic
    * KMV bottom-k-by-hash sample ([[graft.operators.Kmv.bottomKByHash]],
    * k=256 docs per language) replaces `approx_percentile`, whose
    * engine-specific summary can only be graded rows-only; the hash
    * sample is bit-replayable in SQL, so the estimates hash-match the
    * DuckDB oracle. Quantiles are nearest-rank over the sorted sample
    * (`rank = ceil(q·m)` in exact integers); under-filled groups
    * (n_docs <= k) report exact percentiles by construction.
    */
  def approxLengthQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val k = 256
    val d = DedupQueries.docs(spark, dir)
      .select(col("lang"), col("doc_id").cast(LongType).as("doc_id"),
        graft.operators.TextStats.wsTokenCount(col("text")).as("ws"),
        graft.operators.Kmv.hash30(col("doc_id")).as("h"))
    // the (tiny, <= k rows per language) sample feeds both the size
    // lookup and the quantile ranking — materialize once so the
    // two-stage rank pipeline doesn't evaluate per consumer
    val sample = graft.operators.Kmv.bottomKByHash(d, "lang", "h", "doc_id", k)
      .localCheckpoint(true)
    val sizes = sample.groupBy("lang").agg(max(col("sample_rk")).as("m"))
    val w = Window.partitionBy("lang").orderBy(col("ws"), col("doc_id"))
    val ranked = sample.withColumn("qr", row_number().over(w))
    val nDocs = d.groupBy("lang").agg(count(lit(1)).cast(LongType).as("n_docs"))
    ranked.join(broadcast(sizes), "lang")
      .groupBy("lang")
      .agg(
        max(when(col("qr") === expr("(m * 50 + 99) div 100"), col("ws")))
          .cast(LongType).as("p50_tokens"),
        max(when(col("qr") === expr("(m * 90 + 99) div 100"), col("ws")))
          .cast(LongType).as("p90_tokens"),
        max(when(col("qr") === expr("(m * 99 + 99) div 100"), col("ws")))
          .cast(LongType).as("p99_tokens"))
      .join(broadcast(nDocs), "lang")
      .select(col("lang"), col("n_docs"), col("p50_tokens"),
        col("p90_tokens"), col("p99_tokens"))
      .orderBy("lang")
  }

  val approxLengthQuantilesOracle: String = {
    val ws = """CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)"""
    val h = DuckSql.hash60("CAST(doc_id AS VARCHAR)")
    s"""WITH d AS (SELECT lang, CAST(doc_id AS BIGINT) AS doc_id, $ws AS ws,
       |    ($h) // ${graft.operators.Kmv.HashDomain} AS h
       |  FROM documents),
       |r AS (SELECT lang, doc_id, ws,
       |    row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS rk
       |  FROM d),
       |s AS (SELECT lang, doc_id, ws FROM r WHERE rk <= 256),
       |q AS (SELECT lang, ws,
       |    row_number() OVER (PARTITION BY lang ORDER BY ws, doc_id) AS qr,
       |    count(*) OVER (PARTITION BY lang) AS m
       |  FROM s),
       |n AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs FROM d GROUP BY lang)
       |SELECT q.lang, n_docs,
       |  CAST(max(CASE WHEN qr = (m * 50 + 99) // 100 THEN ws END) AS BIGINT) AS p50_tokens,
       |  CAST(max(CASE WHEN qr = (m * 90 + 99) // 100 THEN ws END) AS BIGINT) AS p90_tokens,
       |  CAST(max(CASE WHEN qr = (m * 99 + 99) // 100 THEN ws END) AS BIGINT) AS p99_tokens
       |FROM q JOIN n USING (lang) GROUP BY q.lang, n_docs ORDER BY lang""".stripMargin
  }

  /** Heavy-hitter terms per language via per-group Count-Min sketches:
    * a term is reported when its CMS estimate holds at least 1/32 of
    * the language's token mass (`est·32 >= total`). CMS never
    * undercounts, so every TRUE phi-heavy hitter is reported (the
    * classic CMS heavy-hitters reduction); the estimates are
    * deterministic portable-hash arithmetic, so unlike the
    * Misra-Gries sketch (merge-order-dependent survivors, kept as
    * [[graft.operators.HeavyHitters]] with its own spec) this query is
    * graded HASH-EXACT against the DuckDB oracle. `true_count` rides
    * along to expose the overcount.
    */
  def heavyHittersSketch(spark: SparkSession, dir: String): DataFrame = {
    val k = 32
    // vocabulary table feeds THREE consumers (sketch build, totals,
    // probes) — materialize once so the token explode runs once
    val counts = DedupQueries.docs(spark, dir)
      .select(col("lang"), explode(Fts.tokens(Seq(col("text")))).as("term"))
      .groupBy(col("lang"), col("term"))
      .agg(count(lit(1)).cast(LongType).as("n"))
      .localCheckpoint(true)
    val sk = graft.operators.CountMin.sketch(counts, "term", "n",
      groupCols = Seq("lang"))
    val totals = counts.groupBy("lang").agg(sum(col("n")).cast(LongType).as("total_n"))
    val probes = counts.select(col("lang"), col("term"), col("n").as("true_count"))
    graft.operators.CountMin.estimate(sk, probes, "term", groupCols = Seq("lang"))
      .join(broadcast(totals), "lang")
      .filter(col("cms_estimate") * k >= col("total_n"))
      .select(col("lang"), col("term"), col("true_count"),
        col("cms_estimate").cast(LongType).as("est_count"))
      .orderBy("lang", "term")
  }

  val heavyHittersSketchOracle: String = {
    val t = DuckSql.tokens("text")
    val bucket = graft.operators.CountMin.bucketSql("j.j", "term", 512)
    s"""WITH tk AS (SELECT lang, unnest($t) AS term FROM documents),
       |counts AS (SELECT lang, term, CAST(count(*) AS BIGINT) AS n
       |  FROM tk GROUP BY lang, term),
       |cells AS (SELECT lang, term, n, j.j AS rw, $bucket AS bucket
       |  FROM counts CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j),
       |sketch AS (SELECT lang, rw, bucket, CAST(sum(n) AS BIGINT) AS cell_count
       |  FROM cells GROUP BY lang, rw, bucket),
       |est AS (SELECT c.lang, c.term, c.n AS true_count,
       |    min(s.cell_count) AS cms_estimate
       |  FROM cells c JOIN sketch s
       |    ON s.lang = c.lang AND s.rw = c.rw AND s.bucket = c.bucket
       |  GROUP BY c.lang, c.term, c.n),
       |tot AS (SELECT lang, CAST(sum(n) AS BIGINT) AS total_n
       |  FROM counts GROUP BY lang)
       |SELECT e.lang, e.term, true_count,
       |  CAST(cms_estimate AS BIGINT) AS est_count
       |FROM est e JOIN tot USING (lang)
       |WHERE cms_estimate * 32 >= total_n
       |ORDER BY lang, term""".stripMargin
  }

  /** Token-mass median length per language: the document length L such
    * that docs of at most L tokens hold at least HALF the language's
    * total tokens — the budget-centric median (a plain doc-count median
    * says where the documents are; this says where the TOKENS are,
    * which is what a training budget consumes). Per-language cumsum
    * via [[Shuffle.groupedRunningSum]] (range-decomposed — never a
    * per-language single-task window) + a broadcast per-language
    * total; `2·cum >= tot` in exact integers.
    */
  def tokenMassMedian(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"),
        graft.operators.TextStats.wsTokenCount(col("text")).as("ws"))
    val cum = Shuffle.groupedRunningSum(
      d, Seq("lang"), Seq("ws", "doc_id"), col("ws"), "cum")
    val tot = d.groupBy("lang").agg(sum(col("ws")).cast(LongType).as("total_tokens"))
    cum.join(broadcast(tot), "lang")
      .filter(col("cum") * 2 >= col("total_tokens"))
      .groupBy(col("lang"))
      .agg(min(col("ws")).cast(LongType).as("token_mass_median_len"),
        min(col("total_tokens")).cast(LongType).as("total_tokens"))
      .orderBy("lang")
  }

  val tokenMassMedianOracle: String = {
    val ws = """CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)"""
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, $ws AS ws
       |  FROM documents),
       |c AS (SELECT lang, ws,
       |    CAST(sum(ws) OVER (PARTITION BY lang ORDER BY ws, doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
       |  FROM d),
       |t AS (SELECT lang, CAST(sum(ws) AS BIGINT) AS total_tokens FROM d GROUP BY lang)
       |SELECT c.lang AS lang, CAST(min(ws) AS BIGINT) AS token_mass_median_len,
       |  CAST(min(total_tokens) AS BIGINT) AS total_tokens
       |FROM c JOIN t ON t.lang = c.lang
       |WHERE cum * 2 >= total_tokens
       |GROUP BY c.lang ORDER BY c.lang""".stripMargin
  }

  /** Z-order data layout ([[graft.operators.ZOrder]]): quantize two
    * dimensions (language hash-bucket, token-length bucket), interleave
    * to a Morton key, globally rank by it with the bounded
    * bucket-decomposed rank ([[Shuffle.globalRankBy]] — never a
    * single-partition window), and chunk the order into 100-doc shards.
    * Files written in shard order carry tight min/max footer stats on
    * BOTH dimensions — the data-skipping layout step of a curated
    * corpus writer.
    */
  def zorderLayout(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        (PortableHash.hash60(col("lang")) % 1024).as("lang_dim"),
        least(shiftright(graft.operators.TextStats.wsTokenCount(col("text")), 2),
          lit(1023L)).as("len_dim"))
      .withColumn("zval", graft.operators.ZOrder.zvalue(col("lang_dim"), col("len_dim"), 10))
    Shuffle.globalRankBy(d, "zval", domainBits = 20, tieBreak = "doc_id",
        posCol = "pos", bucketBits = 10)
      .withColumn("shard", expr("(pos - 1) div 100"))
      .select(col("doc_id"), col("lang_dim"), col("len_dim"), col("zval"),
        col("shard"))
      .orderBy("doc_id")
  }

  val zorderLayoutOracle: String = {
    val ws = """CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)"""
    val z = graft.operators.ZOrder.zvalueSql("lang_dim", "len_dim", 10)
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CAST((${DuckSql.hash60("lang")}) % 1024 AS BIGINT) AS lang_dim,
       |    least($ws >> 2, 1023) AS len_dim
       |  FROM documents),
       |z AS (SELECT doc_id, lang_dim, len_dim, $z AS zval FROM d),
       |p AS (SELECT *, row_number() OVER (ORDER BY zval, doc_id) AS pos FROM z)
       |SELECT doc_id, lang_dim, len_dim, zval,
       |  CAST((pos - 1) // 100 AS BIGINT) AS shard
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** Per-language OOV rate against a top-200 in-language shingle
    * vocabulary — the tokenizer-coverage readout that decides whether a
    * vocab needs retraining before a corpus lands. The vocabulary is
    * the two-phase bounded-heap top-200 per language
    * ([[graft.operators.Scale.topKPerGroup]] — map-side pruned, never a
    * rank window over the corpus-growing term table); the per-doc scan
    * broadcast-joins it. ppm via exact integer division.
    */
  def oovRate(spark: SparkSession, dir: String): DataFrame = {
    // ONE explode pass over the corpus, pre-aggregated to the compact
    // (doc_id, lang, term, tf) table and materialized (eager local
    // checkpoint) — both consumers (the vocab rank window and the
    // per-doc OOV sums) read the aggregate instead of re-running the
    // corpus-wide 3-shingle explode.
    val tf = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"),
        explode(TextDedup.shingles(col("text"), 3)).as("term"))
      .groupBy(col("doc_id"), col("lang"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val counts = tf.groupBy(col("lang"), col("term")).agg(sum(col("tf")).as("n"))
    // two-phase bounded-heap top-200 per language (Scale.topKPerGroup)
    // — the vocabulary table grows with the corpus, so a per-language
    // rank window over ALL of it would be one task per language
    val vocab = graft.operators.Scale.topKPerGroup(counts, "lang", "n", "term", 200)
      .select(col("lang"), col("term"), lit(true).as("in_vocab"))
    tf.join(broadcast(vocab), Seq("lang", "term"), "left")
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast(LongType).as("n_shingles"),
        sum(when(col("in_vocab").isNull, col("tf")).otherwise(lit(0L)))
          .cast(LongType).as("n_oov"))
      .withColumn("oov_ppm", expr("(1000000 * n_oov) div n_shingles"))
      .orderBy("doc_id")
  }

  val oovRateOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"), 3)
    s"""WITH sh AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |    unnest($sh) AS term
       |  FROM documents),
       |counts AS (SELECT lang, term, count(*) AS n FROM sh GROUP BY lang, term),
       |vocab AS (SELECT lang, term FROM (
       |    SELECT lang, term,
       |      row_number() OVER (PARTITION BY lang ORDER BY n DESC, term) AS rk
       |    FROM counts) WHERE rk <= 200)
       |SELECT sh.doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |  CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
       |  (1000000 * CAST(sum(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT))
       |    // count(*) AS oov_ppm
       |FROM sh LEFT JOIN vocab v ON v.lang = sh.lang AND v.term = sh.term
       |GROUP BY sh.doc_id ORDER BY doc_id""".stripMargin
  }

  /** Corpus snapshot diff: content-hash compare of two simulated
    * snapshots (docs `% 11 = 3` arrive later → added; `% 9 = 0` dropped
    * → removed; `% 6 = 0` get their text edited → changed), emitting
    * only the delta rows. The corpus-versioning primitive behind
    * incremental retraining decisions — one full-outer hash join on the
    * doc key, nothing corpus-sized held driver-side.
    */
  def corpusDiff(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    val oldSnap = d.filter(col("doc_id") % 11 =!= 3)
      .select(col("doc_id"), PortableHash.hash60(col("text")).as("old_hash"))
    val newSnap = d.filter(col("doc_id") % 9 =!= 0)
      .select(col("doc_id"),
        PortableHash.hash60(
          when(col("doc_id") % 6 === 0, concat(col("text"), lit(" updated")))
            .otherwise(col("text"))).as("new_hash"))
    oldSnap.join(newSnap, Seq("doc_id"), "full_outer")
      .withColumn("status",
        when(col("old_hash").isNull, "added")
          .when(col("new_hash").isNull, "removed")
          .when(col("old_hash") =!= col("new_hash"), "changed")
          .otherwise("unchanged"))
      .filter(col("status") =!= "unchanged")
      .select(col("doc_id"), col("status"), col("old_hash"), col("new_hash"))
      .orderBy("doc_id")
  }

  val corpusDiffOracle: String = {
    val oldH = DuckSql.hash60("text")
    val newH = DuckSql.hash60(
      "CASE WHEN doc_id % 6 = 0 THEN text || ' updated' ELSE text END")
    s"""WITH o AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $oldH AS old_hash
       |  FROM documents WHERE doc_id % 11 <> 3),
       |n AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $newH AS new_hash
       |  FROM documents WHERE doc_id % 9 <> 0),
       |j AS (SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_hash, new_hash,
       |    CASE WHEN o.doc_id IS NULL THEN 'added'
       |         WHEN n.doc_id IS NULL THEN 'removed'
       |         WHEN old_hash <> new_hash THEN 'changed'
       |         ELSE 'unchanged' END AS status
       |  FROM o FULL JOIN n ON o.doc_id = n.doc_id)
       |SELECT doc_id, status, old_hash, new_hash FROM j
       |WHERE status <> 'unchanged' ORDER BY doc_id""".stripMargin
  }

  /** Per-language token-length deciles (equal-frequency histogram) —
    * the distribution-shape readout feeding length-balanced sampling.
    * The bucket is computed from the per-language RANK
    * ([[Shuffle.groupedRank]] — range-decomposed, never a per-language
    * single-task `ntile` window) plus a broadcast per-language count,
    * replaying SQL ntile's earlier-buckets-get-the-remainder
    * definition exactly: with q = n div 10, rem = n mod 10, the first
    * `rem` buckets hold q+1 rows.
    */
  def lengthDeciles(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"),
        graft.operators.TextStats.wsTokenCount(col("text")).as("ws"))
    // null-safe count join (<=>): the oracle's PARTITION BY lang window
    // keeps NULL-lang rows as their own stratum — an equality join
    // would silently drop them (groupedRank already groups null-safe)
    val n = d.groupBy("lang").agg(count(lit(1)).cast(LongType).as("n_l"))
      .withColumnRenamed("lang", "__lang_key")
    Shuffle.groupedRank(d, Seq("lang"), Seq("ws", "doc_id"), "rk")
      .join(broadcast(n), col("lang") <=> col("__lang_key"))
      .drop("__lang_key")
      .withColumn("decile", expr(
        """CASE WHEN rk <= (n_l % 10) * (n_l div 10 + 1)
          |  THEN (rk - 1) div (n_l div 10 + 1) + 1
          |  ELSE (n_l % 10) + (rk - (n_l % 10) * (n_l div 10 + 1) - 1)
          |    div (n_l div 10) + 1 END""".stripMargin).cast(LongType))
      .groupBy(col("lang"), col("decile"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        min(col("ws")).cast(LongType).as("min_tokens"),
        max(col("ws")).cast(LongType).as("max_tokens"))
      .orderBy("lang", "decile")
  }

  val lengthDecilesOracle: String = {
    val ws = """CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)"""
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, $ws AS ws
       |  FROM documents),
       |t AS (SELECT lang, ws,
       |    CAST(ntile(10) OVER (PARTITION BY lang ORDER BY ws, doc_id) AS BIGINT) AS decile
       |  FROM d)
       |SELECT lang, decile, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(min(ws) AS BIGINT) AS min_tokens,
       |  CAST(max(ws) AS BIGINT) AS max_tokens
       |FROM t GROUP BY lang, decile ORDER BY lang, decile""".stripMargin
  }

  /** URL→registered-domain filtering: plant a deterministic URL on
    * every 3rd doc (rotating over four domains, two of them
    * blocklisted), extract the host, reduce it to the last-two-label
    * registered domain, and flag blocklisted docs. Narrow per-row regex
    * + an `isin` literal check — the honest shape for a handful of
    * domains; a blocklist past broadcast size goes through
    * [[graft.operators.Bloom]] instead (already built).
    */
  def urlFilter(spark: SparkSession, dir: String): DataFrame = {
    val doms = Seq("spam.example", "ok-site.org", "adfarm.net", "news.example")
    val domExpr = (0 until 4).foldRight(lit(""): org.apache.spark.sql.Column) { (i, acc) =>
      when(col("doc_id") % 4 === i, lit(doms(i))).otherwise(acc)
    }
    val planted = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" see https://www."), domExpr,
            lit("/p/"), col("doc_id")))
          .otherwise(col("text")).as("text"))
    planted
      .withColumn("host", regexp_extract(col("text"), "https?://([^/\\s]+)", 1))
      .withColumn("reg_domain",
        when(col("host") === "", lit(""))
          .otherwise(array_join(slice(split(col("host"), "\\."), -2, 2), ".")))
      .withColumn("blocked", col("reg_domain").isin("spam.example", "adfarm.net"))
      .select(col("doc_id"), col("reg_domain"), col("blocked"))
      .orderBy("doc_id")
  }

  val urlFilterOracle: String =
    """WITH planted AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    CASE WHEN doc_id % 3 = 0 THEN text || ' see https://www.' ||
      |      CASE CAST(doc_id % 4 AS INTEGER) WHEN 0 THEN 'spam.example'
      |        WHEN 1 THEN 'ok-site.org' WHEN 2 THEN 'adfarm.net'
      |        ELSE 'news.example' END || '/p/' || CAST(doc_id AS VARCHAR)
      |      ELSE text END AS text
      |  FROM documents),
      |h AS (SELECT doc_id, regexp_extract(text, 'https?://([^/\s]+)', 1) AS host
      |  FROM planted),
      |r AS (SELECT doc_id, host,
      |    CASE WHEN host = '' THEN ''
      |      ELSE array_to_string(string_split(host, '.')[-2:], '.') END AS reg_domain
      |  FROM h)
      |SELECT doc_id, reg_domain,
      |  reg_domain IN ('spam.example', 'adfarm.net') AS blocked
      |FROM r ORDER BY doc_id""".stripMargin

  /** URL-keyed crawl dedup ([[graft.operators.UrlOps.canonicalize]]):
    * plant a deterministic messy URL per doc — mixed-case scheme/host,
    * a trailing path slash on every 3rd, a `#fragment` on every 4th,
    * `utm_source`/`ref` tracking params in varying positions around the
    * one identity param — canonicalize, and keep the latest crawl
    * (max doc_id) per canonical URL. The whole normalization is one
    * narrow codegen'd regex chain; dedup is a single canonical-key
    * aggregation, map-side combined — the C4/RefinedWeb pre-dedup step
    * at its true cost.
    */
  def urlDedup(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("source"))
    val url = concat(
      lit("HTTPS://WWW."), col("source"), lit(".Example.COM/sec/"),
      (col("doc_id") % 50).cast(StringType),
      when(col("doc_id") % 3 === 0, lit("/")).otherwise(lit("")),
      when(col("doc_id") % 5 === 0,
        concat(lit("?id="), (col("doc_id") % 20).cast(StringType),
          lit("&utm_source=feed")))
        .otherwise(concat(lit("?utm_source=feed&id="),
          (col("doc_id") % 20).cast(StringType), lit("&ref=en"))),
      when(col("doc_id") % 4 === 0, lit("#frag")).otherwise(lit("")))
    d.withColumn("canonical_url", graft.operators.UrlOps.canonicalize(url))
      .groupBy("canonical_url")
      .agg(count(lit(1)).cast(LongType).as("n_crawls"),
        max(col("doc_id")).cast(LongType).as("keep_id"))
      .orderBy("canonical_url")
  }

  val urlDedupOracle: String =
    """WITH planted AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    'HTTPS://WWW.' || source || '.Example.COM/sec/' ||
      |    CAST(doc_id % 50 AS VARCHAR) ||
      |    CASE WHEN doc_id % 3 = 0 THEN '/' ELSE '' END ||
      |    CASE WHEN doc_id % 5 = 0
      |      THEN '?id=' || CAST(doc_id % 20 AS VARCHAR) || '&utm_source=feed'
      |      ELSE '?utm_source=feed&id=' || CAST(doc_id % 20 AS VARCHAR) || '&ref=en' END ||
      |    CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
      |  FROM documents),
      |canon AS (SELECT doc_id,
      |    regexp_replace(
      |      regexp_replace(
      |        regexp_replace(
      |          regexp_replace(
      |            regexp_replace(
      |              lower(regexp_extract(url, '^[A-Za-z]+://[^/?#]*', 0)) ||
      |                regexp_replace(url, '^[A-Za-z]+://[^/?#]*', '', 'g'),
      |              '#.*$', '', 'g'),
      |            '[?&](utm_[a-z]+|ref|fbclid)=[^&]*', '', 'g'),
      |          '^([^?&]*)&', '\1?', 'g'),
      |        '/+(\?|$)', '\1', 'g'),
      |      '\?$', '', 'g') AS canonical_url
      |  FROM planted)
      |SELECT canonical_url, CAST(count(*) AS BIGINT) AS n_crawls,
      |  CAST(max(doc_id) AS BIGINT) AS keep_id
      |FROM canon GROUP BY canonical_url ORDER BY canonical_url""".stripMargin

  /** Shard-skew report over the seeded-shuffle 100-doc shards (same
    * assignment as [[epochShards]]): per shard, its byte load and its
    * ppm share of ideal (1e6 = perfectly balanced) — the readout that
    * tells a layout job whether shards need re-balancing before
    * training reads them. The grand-total divisor is a 1-row scalar
    * cross-joined in (constant-size at any corpus scale).
    */
  def shardSkew(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        col("n_chars").cast(LongType).as("bytes"))
    val shards = Shuffle.globalOrderIndex(d, keyCol = "doc_id", seed = 7L,
        tieBreak = "doc_id")
      .withColumn("shard", expr("(shuffle_pos - 1) div 100"))
      .groupBy("shard")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("bytes")).cast(LongType).as("total_bytes"))
    val totals = shards.agg(count(lit(1)).cast(LongType).as("n_shards"),
      sum(col("total_bytes")).cast(LongType).as("grand_total"))
    shards.crossJoin(broadcast(totals))
      .withColumn("share_of_ideal_ppm",
        expr("(1000000 * total_bytes * n_shards) div grand_total"))
      .select(col("shard").cast(LongType).as("shard"), col("n_docs"),
        col("total_bytes"), col("share_of_ideal_ppm"))
      .orderBy("shard")
  }

  val shardSkewOracle: String = {
    val h = DuckSql.hash60Seeded("7", "CAST(doc_id AS VARCHAR)")
    s"""WITH pos AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CAST(n_chars AS BIGINT) AS bytes,
       |    CAST(row_number() OVER (ORDER BY $h, doc_id) AS BIGINT) AS shuffle_pos
       |  FROM documents),
       |shards AS (SELECT (shuffle_pos - 1) // 100 AS shard,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(bytes) AS BIGINT) AS total_bytes
       |  FROM pos GROUP BY 1),
       |t AS (SELECT CAST(count(*) AS BIGINT) AS n_shards,
       |    CAST(sum(total_bytes) AS BIGINT) AS grand_total FROM shards)
       |SELECT CAST(shard AS BIGINT) AS shard, n_docs, total_bytes,
       |  (1000000 * total_bytes * n_shards) // grand_total AS share_of_ideal_ppm
       |FROM shards CROSS JOIN t ORDER BY shard""".stripMargin
  }

  /** Count-Min frequency estimation over 3-token shingles
    * ([[graft.operators.CountMin]]): build the 4×512 sketch from the
    * full shingle vocabulary, then point-query every shingle with true
    * count >= 5 and report the (guaranteed non-negative) overcount.
    * ~16k+ distinct shingles into 2k cells forces real collisions, so
    * the estimates are non-trivial — and still hash-exact, because the
    * bucket hash is the portable md5 family on both engines.
    *
    * Scale shape: the vocabulary aggregation is map-side combined; the
    * sketch build collapses to <= depth×width rows; probing
    * broadcast-joins the constant-size sketch. Nothing here grows with
    * corpus size except the one term-keyed shuffle.
    */
  def cmsFreq(spark: SparkSession, dir: String): DataFrame = {
    // vocabulary table feeds the sketch build AND the probe side —
    // materialize once so the corpus shingle explode runs once
    val counts = DedupQueries.docs(spark, dir)
      .select(explode(TextDedup.shingles(col("text"), 3)).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).cast(LongType).as("n"))
      .localCheckpoint(true)
    val sk = graft.operators.CountMin.sketch(counts, "term", "n")
    val probes = counts.filter(col("n") >= 5)
      .select(col("term"), col("n").as("true_count"))
    graft.operators.CountMin.estimate(sk, probes, "term")
      .select(col("term"), col("true_count"), col("cms_estimate"),
        (col("cms_estimate") - col("true_count")).cast(LongType).as("overcount"))
      .orderBy("term")
  }

  val cmsFreqOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"), 3)
    val bucket = graft.operators.CountMin.bucketSql("j.j", "term", 512)
    s"""WITH tk AS (SELECT unnest($sh) AS term FROM documents),
       |counts AS (SELECT term, CAST(count(*) AS BIGINT) AS n FROM tk GROUP BY term),
       |cells AS (SELECT term, n, j.j AS rw, $bucket AS bucket
       |  FROM counts CROSS JOIN (SELECT unnest(range(0, 4)) AS j) j),
       |sketch AS (SELECT rw, bucket, CAST(sum(n) AS BIGINT) AS cell_count
       |  FROM cells GROUP BY rw, bucket),
       |est AS (SELECT c.term, c.n AS true_count, min(s.cell_count) AS cms_estimate
       |  FROM cells c JOIN sketch s ON s.rw = c.rw AND s.bucket = c.bucket
       |  WHERE c.n >= 5 GROUP BY c.term, c.n)
       |SELECT term, true_count, CAST(cms_estimate AS BIGINT) AS cms_estimate,
       |  CAST(cms_estimate - true_count AS BIGINT) AS overcount
       |FROM est ORDER BY term""".stripMargin
  }

  /** Exact per-source token-count quantiles via the mergeable
    * bounded-domain histogram sketch
    * ([[graft.operators.HistSketch]]): one map-side-combined pass, no
    * sort — the quantile member of the sketch family (KMV = distinct,
    * CMS = frequency, MG = heavy hitters, Bloom = membership). The
    * oracle is DuckDB's native `quantile_disc` over the same clamped
    * values — two independent implementations of the discrete-quantile
    * rule `idx = max(0, ceil(n*p) - 1)`.
    */
  def histQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val ws = DedupQueries.docs(spark, dir)
      .select(col("source"),
        graft.operators.TextStats.wsTokenCount(col("text")).as("ws"))
    graft.operators.HistSketch.groupedQuantiles(ws, "source", "ws",
        domain = 4096, probs = Seq(0.5, 0.9, 0.99))
      .orderBy("source")
  }

  val histQuantilesOracle: String = {
    val ws = """CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)"""
    s"""WITH w AS (SELECT source, least(greatest($ws, 0), 4095) AS ws FROM documents)
       |SELECT source, CAST(count(ws) AS BIGINT) AS n,
       |  CAST(quantile_disc(ws, 0.5) AS BIGINT) AS q_5,
       |  CAST(quantile_disc(ws, 0.9) AS BIGINT) AS q_9,
       |  CAST(quantile_disc(ws, 0.99) AS BIGINT) AS q_99
       |FROM w GROUP BY source ORDER BY source""".stripMargin
  }

  val epochShardsOracle: String = {
    val h = DuckSql.hash60Seeded("7", "CAST(doc_id AS VARCHAR)")
    s"""WITH pos AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CAST(row_number() OVER (ORDER BY $h, doc_id) AS BIGINT) AS shuffle_pos
       |  FROM documents)
       |SELECT CAST((shuffle_pos - 1) // 100 AS BIGINT) AS shard,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(min(shuffle_pos) AS BIGINT) AS min_pos,
       |  CAST(max(shuffle_pos) AS BIGINT) AS max_pos,
       |  CAST(min(doc_id) AS BIGINT) AS min_doc_id
       |FROM pos GROUP BY 1 ORDER BY shard""".stripMargin
  }

  /** Priority sampling ([[Sampling.prioritySample]]): 100 documents
    * drawn weight-proportionally to length (weight `n_chars + 1` so
    * empty docs stay drawable), deterministic via the seeded hash.
    */
  def prioritySample(spark: SparkSession, dir: String): DataFrame =
    Sampling.prioritySample(
        DedupQueries.docs(spark, dir)
          .select(col("doc_id").cast(LongType).as("doc_id"),
            (col("n_chars") + 1).cast(LongType).as("weight")),
        weightCol = "weight", tieBreak = "doc_id", k = 100, seed = 7L)
      .select(col("doc_id"), col("weight"), col("priority"), col("sample_rank"))
      .orderBy("sample_rank")

  val prioritySampleOracle: String = {
    val h = DuckSql.hash60Seeded("7", "CAST(doc_id AS VARCHAR)")
    s"""WITH p AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CAST(n_chars + 1 AS BIGINT) AS weight,
       |    CAST(($h) // (n_chars + 1) AS BIGINT) AS priority
       |  FROM documents)
       |SELECT doc_id, weight, priority,
       |  CAST(row_number() OVER (ORDER BY priority, doc_id) AS BIGINT) AS sample_rank
       |FROM p ORDER BY priority, doc_id LIMIT 100""".stripMargin
  }

  /** Deterministic positional negative sampling
    * ([[Sampling.positionalNegatives]]): 4 contrastive negatives per
    * query doc (every 100th), drawn at evenly-spaced offsets in the
    * seeded global shuffle order — reproducible, collision-free, O(n).
    */
  def negativeSamples(spark: SparkSession, dir: String): DataFrame =
    Sampling.positionalNegatives(
        DedupQueries.docs(spark, dir), "doc_id",
        isQuery = _ % 100 === 0, k = 4, seed = 7L)
      .orderBy("q_id", "neg_rank")

  val negativeSamplesOracle: String = {
    val h = DuckSql.hash60Seeded("7", "CAST(doc_id AS VARCHAR)")
    s"""WITH pos AS (SELECT CAST(doc_id AS BIGINT) AS id,
       |    CAST(row_number() OVER (ORDER BY $h, doc_id) AS BIGINT) AS pos
       |  FROM documents),
       |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pos),
       |q AS (SELECT id AS q_id, pos AS q_pos FROM pos WHERE id % 100 = 0),
       |e AS (SELECT q_id, q_pos, CAST(i AS BIGINT) AS neg_rank
       |  FROM q CROSS JOIN (SELECT unnest(range(1, 5)) AS i) r),
       |x AS (SELECT q_id, neg_rank,
       |    ((q_pos - 1 + neg_rank * (n // 5)) % n) + 1 AS neg_pos
       |  FROM e CROSS JOIN n)
       |SELECT q_id, neg_rank, pos.id AS neg_id
       |FROM x JOIN pos ON pos.pos = x.neg_pos
       |WHERE pos.id <> x.q_id
       |ORDER BY q_id, neg_rank""".stripMargin
  }

  /** Column profile / expectations table
    * ([[graft.operators.Profile.table]]) over `documents`: per column,
    * rows, nulls, exact distincts, and value (numeric) or length
    * (string) bounds — the validation report before trusting a corpus
    * drop.
    */
  def profileColumns(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Profile.table(
        DedupQueries.docs(spark, dir),
        Seq("doc_id", "text", "lang", "source", "n_chars"))
      .orderBy("column")

  val profileColumnsOracle: String = {
    def longCol(c: String) =
      s"""SELECT '$c' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
         |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
         |  CAST(min($c) AS BIGINT) AS min_value, CAST(max($c) AS BIGINT) AS max_value,
         |  CAST(NULL AS BIGINT) AS min_length, CAST(NULL AS BIGINT) AS max_length
         |FROM documents""".stripMargin
    def strCol(c: String) =
      s"""SELECT '$c', CAST(count(*) AS BIGINT),
         |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT),
         |  CAST(count(DISTINCT $c) AS BIGINT),
         |  CAST(NULL AS BIGINT), CAST(NULL AS BIGINT),
         |  CAST(min(length($c)) AS BIGINT), CAST(max(length($c)) AS BIGINT)
         |FROM documents""".stripMargin
    s"""${longCol("doc_id")}
       |UNION ALL ${strCol("text")}
       |UNION ALL ${strCol("lang")}
       |UNION ALL ${strCol("source")}
       |UNION ALL ${longCol("n_chars")}
       |ORDER BY "column"""".stripMargin
  }

  /** Flesch reading-ease readability
    * ([[TextStats.readabilityCounts]]), ×1e3 integer: the classic
    * readability feature over every document — proxy sentence/word/
    * syllable counts plus the exact-div score. Narrow per-row codegen;
    * no shuffle.
    */
  def readability(spark: SparkSession, dir: String): DataFrame =
    DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        TextStats.readabilityCounts(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_words").as("n_words"),
        col("r.n_sentences").as("n_sentences"),
        col("r.n_syllables").as("n_syllables"))
      .withColumn("flesch_e3",
        expr("""206835 - (1015 * n_words) div n_sentences
               | - (84600 * n_syllables) div n_words""".stripMargin))
      .orderBy("doc_id")

  val readabilityOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH c AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CAST(greatest(len(list_filter(string_split_regex(text, '[.!?]+'),
       |      s -> trim(s) <> '')), 1) AS BIGINT) AS n_sentences,
       |    CAST(greatest(len($t), 1) AS BIGINT) AS n_words,
       |    CAST(coalesce(list_sum(list_transform($t,
       |      tk -> greatest(len(regexp_extract_all(tk, '[aeiouy]+')), 1))), 0)
       |      AS BIGINT) AS n_syllables
       |  FROM documents)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  206835 - (1015 * n_words) // n_sentences
       |    - (84600 * n_syllables) // n_words AS flesch_e3
       |FROM c ORDER BY doc_id""".stripMargin
  }

  /** KMV set-operation estimates ([[graft.operators.Kmv.setOpsSketch]]):
    * the src0-vs-src1 token-vocabulary overlap — per-side distinct
    * estimates, the union estimate from the merged bottom-64 sketch,
    * the Jaccard-derived intersection estimate, and the exact
    * distinct-hash intersection as the audit column.
    */
  def kmvSetOps(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
    def side(src: String): DataFrame = d.filter(col("source") === src)
      .select(explode(Fts.tokens(Seq(col("text")))).as("term"))
    graft.operators.Kmv.setOpsSketch(side("src0"), side("src1"), "term", k = 64)
  }

  val kmvSetOpsOracle: String = {
    val t = DuckSql.tokens("text")
    val h = DuckSql.hash60("term")
    val dom = graft.operators.Kmv.HashDomain
    // 63 * HashDomain must multiply as BIGINT: DuckDB integer literals
    // are INT32 and the product overflows — invisible at small SF where
    // vocab < 64 keeps the CASE on its first (lazy) branch, found by
    // the sf1 gate
    def est(seen: String, kth: String): String =
      s"CASE WHEN $seen < 64 THEN $seen " +
        s"ELSE (CAST(63 AS BIGINT) * ${dom}) // greatest($kth, 1) END"
    s"""WITH ta AS (SELECT DISTINCT ($h) // ${dom} AS h FROM (
       |    SELECT unnest($t) AS term FROM documents WHERE source = 'src0')),
       |tb AS (SELECT DISTINCT ($h) // ${dom} AS h FROM (
       |    SELECT unnest($t) AS term FROM documents WHERE source = 'src1')),
       |sa AS (SELECT CAST(count(*) AS BIGINT) AS a_seen, max(h) AS a_kth
       |  FROM (SELECT h FROM ta ORDER BY h LIMIT 64)),
       |sb AS (SELECT CAST(count(*) AS BIGINT) AS b_seen, max(h) AS b_kth
       |  FROM (SELECT h FROM tb ORDER BY h LIMIT 64)),
       |m AS (SELECT h, max(in_a) AS in_a, max(in_b) AS in_b FROM (
       |    SELECT h, 1 AS in_a, 0 AS in_b FROM ta
       |    UNION ALL SELECT h, 0, 1 FROM tb) GROUP BY h),
       |su AS (SELECT CAST(count(*) AS BIGINT) AS u_seen, max(h) AS u_kth,
       |    CAST(sum(in_a * in_b) AS BIGINT) AS n_both
       |  FROM (SELECT * FROM m ORDER BY h LIMIT 64)),
       |ex AS (SELECT CAST(count(*) AS BIGINT) AS inter_hashes
       |  FROM ta JOIN tb USING (h))
       |SELECT CAST(${est("a_seen", "a_kth")} AS BIGINT) AS est_a,
       |  CAST(${est("b_seen", "b_kth")} AS BIGINT) AS est_b,
       |  CAST(${est("u_seen", "u_kth")} AS BIGINT) AS est_union,
       |  n_both,
       |  CAST(CASE WHEN u_seen > 0
       |    THEN (n_both * (${est("u_seen", "u_kth")})) // u_seen
       |    ELSE 0 END AS BIGINT) AS est_intersection,
       |  inter_hashes
       |FROM sa CROSS JOIN sb CROSS JOIN su CROSS JOIN ex""".stripMargin
  }

  /** Training-mix token budget plan: the one-glance per-source table a
    * training run is configured from — corpus shares, temperature-
    * rebalanced weights (T=0.5 via the integer-exact floor-sqrt idiom
    * of `x_temperature_sample`), the token allocation out of a fixed
    * 200k budget, and the implied effective epochs (ppm; > 1e6 means
    * that source repeats). Pure keyed aggregation + a 1-row scalar —
    * constant output at any corpus scale.
    */
  def tokenBudgetPlan(spark: SparkSession, dir: String): DataFrame = {
    val budget = 200000L
    // materialized once: the corpus-wide token-count pass feeds both
    // the totals scalar and the final select (sweep showed 2 scans)
    val perSrc = DedupQueries.docs(spark, dir)
      .groupBy(col("source"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(graft.operators.TextStats.wsTokenCount(col("text")))
          .cast(LongType).as("n_tokens"))
      .withColumn("w", floor(sqrt(col("n_tokens").cast(DoubleType))).cast(LongType))
      .localCheckpoint(true)
    val tot = perSrc.agg(sum(col("w")).cast(LongType).as("z"),
      sum(col("n_tokens")).cast(LongType).as("tok_tot"))
    perSrc.crossJoin(broadcast(tot))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        expr("(1000000 * n_tokens) div tok_tot").as("share_ppm"),
        expr(s"($budget * w) div z").as("alloc_tokens"),
        expr(s"(1000000 * (($budget * w) div z)) div n_tokens").as("epochs_ppm"))
      .orderBy("source")
  }

  val tokenBudgetPlanOracle: String = {
    val ws = """CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)"""
    s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum($ws) AS BIGINT) AS n_tokens,
       |    CAST(floor(sqrt(CAST(sum($ws) AS DOUBLE))) AS BIGINT) AS w
       |  FROM documents GROUP BY source),
       |z AS (SELECT CAST(sum(w) AS BIGINT) AS z,
       |    CAST(sum(n_tokens) AS BIGINT) AS tok_tot FROM c)
       |SELECT source, n_docs, n_tokens,
       |  (1000000 * n_tokens) // tok_tot AS share_ppm,
       |  (200000 * w) // z AS alloc_tokens,
       |  (1000000 * ((200000 * w) // z)) // n_tokens AS epochs_ppm
       |FROM c CROSS JOIN z ORDER BY source""".stripMargin
  }

  /** UniMax language-balanced budget allocation
    * ([[graft.operators.Sampling.unimaxAlloc]]): per-language token
    * counts, epoch cap 2, budget = 1.5× the corpus — the four tail
    * languages cap at 2 epochs and English absorbs the remainder
    * under-sampled, the fairness profile temperature sampling
    * ([[tokenBudgetPlan]]) cannot produce.
    */
  def unimaxAlloc(spark: SparkSession, dir: String): DataFrame = {
    val perLang = DedupQueries.docs(spark, dir)
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(graft.operators.TextStats.wsTokenCount(col("text")))
          .cast(LongType).as("n_tokens"))
    graft.operators.Sampling.unimaxAlloc(perLang, "lang",
        epochCap = 2, budgetNum = 3L, budgetDen = 2L)
      .orderBy("lang")
  }

  val unimaxAllocOracle: String = {
    val ws = """CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)"""
    s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum($ws) AS BIGINT) AS n_tokens FROM documents GROUP BY lang),
       |base AS (SELECT lang, n_docs, n_tokens, n_tokens * 2 AS cap_tok FROM c),
       |tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tok_tot,
       |    CAST(count(*) AS BIGINT) AS nlangs FROM base),
       |ord AS (SELECT base.*, nlangs, (tok_tot * 3) // 2 AS budget,
       |    CAST(row_number() OVER (ORDER BY cap_tok, lang) AS BIGINT) AS j,
       |    CAST(coalesce(sum(cap_tok) OVER (ORDER BY cap_tok, lang
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS p_prev
       |  FROM base CROSS JOIN tot),
       |flg AS (SELECT *, cap_tok * (nlangs - j + 1) + p_prev <= budget AS capped
       |  FROM ord),
       |star AS (SELECT
       |    CAST(coalesce(sum(CASE WHEN capped THEN cap_tok END), 0) AS BIGINT) AS p_star,
       |    CAST(coalesce(sum(CASE WHEN capped THEN 1 END), 0) AS BIGINT) AS n_capped
       |  FROM flg)
       |SELECT lang, n_docs, n_tokens, cap_tok, alloc_tok, capped,
       |  (1000000 * alloc_tok) // greatest(n_tokens, 1) AS epochs_ppm
       |FROM (SELECT lang, n_docs, n_tokens, cap_tok,
       |    CASE WHEN capped THEN cap_tok
       |      ELSE (budget - p_star) // greatest(nlangs - n_capped, 1)
       |        + (CASE WHEN j - n_capped <=
       |            (budget - p_star) % greatest(nlangs - n_capped, 1)
       |          THEN 1 ELSE 0 END)
       |    END AS alloc_tok,
       |    CAST(capped AS BIGINT) AS capped
       |  FROM flg CROSS JOIN star)
       |ORDER BY lang""".stripMargin
  }

  /** DSIR-style importance-weighted selection ([[graft.operators.Dsir]]):
    * `src0` plays the curated target domain; every document gets an
    * integer target-affinity score and a keep verdict.
    */
  def dsirSelect(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Dsir.score(
      DedupQueries.docs(spark, dir), col("source") === "src0")

  val dsirSelectOracle: String = {
    val t = DuckSql.tokens("text")
    val h = DuckSql.hash60("term")
    s"""WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    source = 'src0' AS is_target, unnest($t) AS term FROM documents),
       |tf AS (SELECT doc_id, is_target, CAST(($h) % 4096 AS BIGINT) AS bucket,
       |    CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2, 3),
       |w AS (SELECT bucket,
       |    CAST(1000000 * (sum(CASE WHEN is_target THEN tf ELSE 0 END) + 1)
       |      // (sum(tf) + 2) AS BIGINT) AS w_ppm
       |  FROM tf GROUP BY bucket)
       |SELECT tf.doc_id, CAST(sum(tf) AS BIGINT) AS n_tokens,
       |  CAST(sum(tf * w_ppm) // sum(tf) AS BIGINT) AS score_ppm,
       |  CAST(sum(tf * w_ppm) // sum(tf) >= 500000 AS BIGINT) AS keep
       |FROM tf JOIN w USING (bucket)
       |GROUP BY tf.doc_id ORDER BY doc_id""".stripMargin
  }

  /** CCNet-style bigram-LM quality scoring ([[graft.operators.NgramLm]]):
    * `src0` plays the curated target corpus; every document (>= 2
    * tokens) gets the integer mean bigram likelihood under the
    * add-one-smoothed target model.
    */
  def ngramLmScore(spark: SparkSession, dir: String): DataFrame =
    graft.operators.NgramLm.score(
      DedupQueries.docs(spark, dir), col("source") === "src0")

  /** The LM-score query body WITHOUT the final sort, reusable as a
    * subquery ([[ngramLmScoreOracle]], [[curriculumOrderOracle]]).
    */
  private val ngramLmBase: String = {
    val t = DuckSql.tokens("text")
    s"""WITH toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    source = 'src0' AS is_target, $t AS t FROM documents
       |  WHERE len($t) >= 2),
       |bg AS (SELECT doc_id, is_target, t[i] AS w1, t[i + 1] AS w2,
       |    CAST(count(*) AS BIGINT) AS tf
       |  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(t))) AS i) r
       |  GROUP BY 1, 2, 3, 4),
       |c2 AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2 FROM bg
       |  WHERE is_target GROUP BY 1, 2),
       |c1 AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2 GROUP BY 1),
       |v AS (SELECT CAST(greatest(count(DISTINCT w2), 1) AS BIGINT) AS v FROM c2)
       |SELECT bg.doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       |  CAST(sum(tf * (1000000 * (coalesce(c2.c2, 0) + 1)
       |      // (coalesce(c1.c1, 0) + v.v))) // sum(tf) AS BIGINT) AS lm_ppm
       |FROM bg LEFT JOIN c2 USING (w1, w2) LEFT JOIN c1 USING (w1) CROSS JOIN v
       |GROUP BY bg.doc_id""".stripMargin
  }

  val ngramLmScoreOracle: String = s"$ngramLmBase ORDER BY doc_id"

  /** Curriculum ordering: every scored document gets a 1-based position
    * in the easy→hard curriculum — descending target-LM likelihood
    * ([[ngramLmScore]]), ties by doc_id. The rank is the bounded
    * bucket-decomposed [[Shuffle.globalRankBy]] (lm_ppm ∈ [0, 1e6] →
    * 20-bit key domain), NOT a single-partition window — the standard
    * curriculum-learning data prep at corpus scale.
    */
  def curriculumOrder(spark: SparkSession, dir: String): DataFrame = {
    val scored = graft.operators.NgramLm.score(
        DedupQueries.docs(spark, dir), col("source") === "src0")
      .select(col("doc_id"), col("lm_ppm"))
      // descending likelihood via an ascending 20-bit key
      .withColumn("__k", expr("1000000 - lm_ppm"))
    Shuffle.globalRankBy(scored, "__k", domainBits = 20,
        tieBreak = "doc_id", posCol = "curriculum_pos")
      .select(col("doc_id"), col("lm_ppm"),
        col("curriculum_pos").cast(LongType).as("curriculum_pos"))
      .orderBy("curriculum_pos")
  }

  val curriculumOrderOracle: String =
    s"""SELECT doc_id, lm_ppm,
       |  CAST(row_number() OVER (ORDER BY lm_ppm DESC, doc_id) AS BIGINT)
       |    AS curriculum_pos
       |FROM ($ngramLmBase) s
       |ORDER BY curriculum_pos""".stripMargin

  /** CCNet perplexity buckets (Wenzek et al. 2020 §4.3: documents are
    * split into head/middle/tail by target-LM perplexity TERCILES
    * WITHIN EACH LANGUAGE, and training keeps head+middle): per doc the
    * likelihood score, its language tercile, and the keep verdict.
    * Per-language thirds are the point — a global cut would assign
    * whole low-resource languages to the tail.
    *
    * Bucket = `((rank−1)·3) div n_lang + 1` over the (likelihood desc,
    * doc_id) order — exact thirds, integer-deterministic. The
    * per-language rank is [[Shuffle.groupedRank]]'s range-decomposed
    * rank, NOT a per-language window (a dominant language would
    * serialize onto one task at 100 TB — see [[stratifiedTopPct]]'s
    * note); the per-language sizes ride a broadcast count table.
    */
  def ccnetBuckets(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
    val scored = graft.operators.NgramLm
      .score(d, col("source") === "src0")
      .select(col("doc_id"), col("lm_ppm"))
    val withLang = d.select(col("doc_id").cast(LongType).as("doc_id"),
        col("lang"))
      .join(scored, Seq("doc_id"))
      // head = LOWEST perplexity = HIGHEST likelihood; rank ascending
      // over the inverted 20-bit key like curriculumOrder
      .withColumn("__k", expr("1000000 - lm_ppm"))
    val ranked = Shuffle.groupedRank(withLang, Seq("lang"),
      Seq("__k", "doc_id"), "r")
    val counts = withLang.groupBy(col("lang"))
      .agg(count(lit(1)).cast(LongType).as("n_lang"))
    ranked.join(broadcast(counts), Seq("lang"))
      .withColumn("bucket3", expr("((r - 1) * 3) div n_lang + 1"))
      .select(col("doc_id"), col("lang"), col("lm_ppm"),
        when(col("bucket3") === 1, lit("head"))
          .when(col("bucket3") === 2, lit("middle"))
          .otherwise(lit("tail")).as("ppl_bucket"),
        when(col("bucket3") <= 2, lit(1L)).otherwise(lit(0L)).as("keep"))
      .orderBy("doc_id")
  }

  val ccnetBucketsOracle: String =
    s"""WITH s AS ($ngramLmBase),
       |wl AS (SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang, s.lm_ppm
       |  FROM documents d JOIN s ON s.doc_id = d.doc_id),
       |cnt AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_lang FROM wl GROUP BY lang),
       |rk AS (SELECT doc_id, lang, lm_ppm,
       |    CAST(row_number() OVER (PARTITION BY lang
       |      ORDER BY 1000000 - lm_ppm, doc_id) AS BIGINT) AS r
       |  FROM wl)
       |SELECT doc_id, lang, lm_ppm,
       |  CASE ((r - 1) * 3) // n_lang + 1
       |    WHEN 1 THEN 'head' WHEN 2 THEN 'middle' ELSE 'tail' END AS ppl_bucket,
       |  CAST(((r - 1) * 3) // n_lang + 1 <= 2 AS BIGINT) AS keep
       |FROM rk JOIN cnt USING (lang) ORDER BY doc_id""".stripMargin

  /** Moore–Lewis cross-entropy-difference selection
    * ([[graft.operators.NgramLm.contrastScore]]): in-domain model from
    * `source = 'src0'`, general model from the whole pool; per doc both
    * mean likelihoods and their difference (positive = select).
    */
  def mooreLewis(spark: SparkSession, dir: String): DataFrame =
    graft.operators.NgramLm.contrastScore(
      DedupQueries.docs(spark, dir), col("source") === "src0")

  /** The Moore–Lewis contrast CTE chain (both bigram LMs + per-doc
    * likelihoods), shared by [[mooreLewisOracle]] and
    * [[doremiWeightsOracle]]; splice after WITH.
    */
  private val mlContrastCtes: String = {
    val t = DuckSql.tokens("text")
    s"""toks AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    source = 'src0' AS is_target, $t AS t FROM documents
       |  WHERE len($t) >= 2),
       |bg AS (SELECT doc_id, is_target, t[i] AS w1, t[i + 1] AS w2,
       |    CAST(count(*) AS BIGINT) AS tf
       |  FROM toks CROSS JOIN LATERAL (SELECT unnest(range(1, len(t))) AS i) r
       |  GROUP BY 1, 2, 3, 4),
       |c2i AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2 FROM bg
       |  WHERE is_target GROUP BY 1, 2),
       |c1i AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2i GROUP BY 1),
       |vi AS (SELECT CAST(greatest(count(DISTINCT w2), 1) AS BIGINT) AS v FROM c2i),
       |c2g AS (SELECT w1, w2, CAST(sum(tf) AS BIGINT) AS c2 FROM bg GROUP BY 1, 2),
       |c1g AS (SELECT w1, CAST(sum(c2) AS BIGINT) AS c1 FROM c2g GROUP BY 1),
       |vg AS (SELECT CAST(greatest(count(DISTINCT w2), 1) AS BIGINT) AS v FROM c2g),
       |si AS (SELECT bg.doc_id, CAST(sum(tf) AS BIGINT) AS n_bigrams,
       |    CAST(sum(tf * (1000000 * (coalesce(c2i.c2, 0) + 1)
       |        // (coalesce(c1i.c1, 0) + vi.v))) // sum(tf) AS BIGINT) AS lm_in_ppm
       |  FROM bg LEFT JOIN c2i USING (w1, w2) LEFT JOIN c1i USING (w1) CROSS JOIN vi
       |  GROUP BY bg.doc_id),
       |sg AS (SELECT bg.doc_id,
       |    CAST(sum(tf * (1000000 * (coalesce(c2g.c2, 0) + 1)
       |        // (coalesce(c1g.c1, 0) + vg.v))) // sum(tf) AS BIGINT) AS lm_gen_ppm
       |  FROM bg LEFT JOIN c2g USING (w1, w2) LEFT JOIN c1g USING (w1) CROSS JOIN vg
       |  GROUP BY bg.doc_id)""".stripMargin
  }

  val mooreLewisOracle: String =
    s"""WITH $mlContrastCtes
       |SELECT si.doc_id, n_bigrams, lm_in_ppm, lm_gen_ppm,
       |  lm_in_ppm - lm_gen_ppm AS ml_delta_ppm
       |FROM si JOIN sg ON sg.doc_id = si.doc_id ORDER BY si.doc_id""".stripMargin

  /** DoReMi-style domain reweighting (Xie et al., "DoReMi: Optimizing
    * Data Mixtures Speeds Up Language Model Pretraining", NeurIPS
    * 2023): domains whose documents the REFERENCE (in-domain) model
    * likes more than the general proxy — positive EXCESS likelihood —
    * get their sampling weight pushed UP from the token-share baseline;
    * domains with nothing left to learn stay at (or fall below) their
    * share. One linearized exponentiated-gradient step, integer-exact:
    *
    *   excess_d  = mean over d's docs of max(0, ml_delta_ppm)
    *   w_raw_d   = share_ppm_d · (1e6 + excess_d)      (η = 1 step)
    *   weight_ppm = largest-remainder normalize of w_raw to Σ = 1e6
    *
    * `share_ppm` (the domain's bigram-mass share, ≤ 1e6) rather than
    * raw token counts keeps `1e6·w_raw` inside BIGINT at ANY corpus
    * size (raw counts overflow past ~1e12 tokens). The exact
    * largest-remainder rounding makes the weights a usable sampling
    * plan (they sum to exactly one million ppm).
    *
    * Scale shape: the per-doc contrast is [[graft.operators.NgramLm
    * .contrastScore]] (model-bounded keyed shuffles); everything after
    * the per-domain aggregate is |domains|-sized — scalars ride 1-row
    * broadcasts and the remainder rank is the same bounded
    * |domains|² grid as [[graft.operators.Sampling.unimaxAlloc]],
    * never a window over an unbounded child.
    */
  def doremiWeights(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
    val scored = graft.operators.NgramLm
      .contrastScore(d, col("source") === "src0")
      .select(col("doc_id"), col("n_bigrams"),
        greatest(col("ml_delta_ppm"), lit(0L)).as("excess"))
    val per = d.select(col("doc_id").cast(LongType).as("doc_id"), col("source"))
      .join(scored, Seq("doc_id"))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("n_bigrams")).cast(LongType).as("n_bigrams"),
        expr("sum(excess) div count(1)").cast(LongType).as("excess_ppm"))
    val tot = per.agg(sum(col("n_bigrams")).cast(LongType).as("tok_tot"))
    val raw = per.crossJoin(broadcast(tot))
      .withColumn("share_ppm", expr("(1000000 * n_bigrams) div tok_tot"))
      .withColumn("w_raw", expr("share_ppm * (1000000 + excess_ppm)"))
    val wTot = raw.agg(sum(col("w_raw")).cast(LongType).as("w_tot"))
    val based = raw.crossJoin(broadcast(wTot))
      .withColumn("base_ppm", expr("(1000000 * w_raw) div w_tot"))
      .withColumn("rem", expr("(1000000 * w_raw) % w_tot"))
      .localCheckpoint(true) // |domains| rows; feeds grid + two scalars
    val baseSum = based.agg(sum(col("base_ppm")).cast(LongType).as("base_sum"))
    // remainder rank via the bounded |domains|² grid (unimaxAlloc's
    // idiom) — NOT row_number over an unpartitioned window
    val other = based.select(col("source").as("s2"), col("rem").as("rem2"))
    based.join(broadcast(other),
        col("rem2") > col("rem") ||
          (col("rem2") === col("rem") && col("s2") < col("source")), "left")
      .groupBy(col("source"), col("n_docs"), col("n_bigrams"),
        col("excess_ppm"), col("base_ppm"), col("rem"))
      .agg(count(col("s2")).cast(LongType).as("rk_prev"))
      .crossJoin(broadcast(baseSum))
      .select(col("source"), col("n_docs"), col("n_bigrams"),
        col("excess_ppm"),
        (col("base_ppm") +
          when(col("rk_prev") + 1 <= lit(1000000L) - col("base_sum"), lit(1L))
            .otherwise(lit(0L))).cast(LongType).as("weight_ppm"))
      .orderBy("source")
  }

  val doremiWeightsOracle: String =
    s"""WITH $mlContrastCtes,
       |ml AS (SELECT si.doc_id, si.n_bigrams,
       |    greatest(lm_in_ppm - lm_gen_ppm, 0) AS excess
       |  FROM si JOIN sg ON sg.doc_id = si.doc_id),
       |per AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(ml.n_bigrams) AS BIGINT) AS n_bigrams,
       |    CAST(sum(ml.excess) // count(*) AS BIGINT) AS excess_ppm
       |  FROM ml JOIN documents d ON CAST(d.doc_id AS BIGINT) = ml.doc_id
       |  GROUP BY d.source),
       |tot AS (SELECT CAST(sum(n_bigrams) AS BIGINT) AS tok_tot FROM per),
       |raw AS (SELECT per.*,
       |    ((1000000 * n_bigrams) // tok_tot) * (1000000 + excess_ppm) AS w_raw
       |  FROM per CROSS JOIN tot),
       |wt AS (SELECT CAST(sum(w_raw) AS BIGINT) AS w_tot FROM raw),
       |based AS (SELECT raw.*, (1000000 * w_raw) // w_tot AS base_ppm,
       |    (1000000 * w_raw) % w_tot AS rem FROM raw CROSS JOIN wt),
       |bs AS (SELECT CAST(sum(base_ppm) AS BIGINT) AS base_sum FROM based),
       |rk AS (SELECT based.*, CAST(row_number() OVER (ORDER BY rem DESC, source)
       |    AS BIGINT) AS rk FROM based)
       |SELECT source, n_docs, n_bigrams, excess_ppm,
       |  CAST(base_ppm + CASE WHEN rk <= 1000000 - base_sum THEN 1 ELSE 0 END
       |    AS BIGINT) AS weight_ppm
       |FROM rk CROSS JOIN bs ORDER BY source""".stripMargin

  /** Per-document n-gram NOVELTY against the whole corpus in doc_id
    * ingestion order: the fraction of a document's distinct 3-shingles
    * whose FIRST corpus appearance (min doc_id over every holder) is
    * this document. The per-doc refinement of the decile-level Heaps
    * readout ([[vocabGrowth]]) — a curation pipeline uses it to rank
    * late-crawled documents by how much genuinely new n-gram surface
    * they still contribute (near-zero novelty late in the crawl = the
    * source has gone asymptotic).
    *
    * Scale shape: shingles travel as 60-bit hashes (never strings past
    * the explode); first-appearance is ONE map-side-combined
    * `min(doc_id)` per gram; the join back re-uses the same gram-key
    * exchange (the [[DedupQueries.dupNgramMass]] ReusedExchange idiom —
    * the corpus-wide shingle kernel runs once). No windows, no
    * collects.
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val grams = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        explode(graft.operators.TextDedup.shingleHashes(col("text"), 3)).as("g"))
    val first = grams.groupBy(col("g"))
      .agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, Seq("g"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_grams"),
        sum(when(col("first_doc") === col("doc_id"), lit(1L))
          .otherwise(lit(0L))).cast(LongType).as("n_novel"))
      .withColumn("novelty_ppm",
        expr("(1000000 * n_novel) div n_grams").cast(LongType))
      .orderBy("doc_id")
  }

  val ngramNoveltyOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"), 3)
    s"""WITH gr AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    unnest(list_distinct(list_transform($sh, x -> ${DuckSql.hash60("x")}))) AS g
       |  FROM documents),
       |f AS (SELECT g, min(doc_id) AS first_doc FROM gr GROUP BY g)
       |SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_novel,
       |  CAST((1000000 * sum(CASE WHEN f.first_doc = gr.doc_id THEN 1 ELSE 0 END))
       |    // count(*) AS BIGINT) AS novelty_ppm
       |FROM gr JOIN f USING (g) GROUP BY gr.doc_id ORDER BY gr.doc_id""".stripMargin
  }

  /** Incremental novelty: a NEW batch (doc_id >= 250) scored against
    * the PERSISTED distinct-gram index of everything ingested before it
    * (doc_id < 250) — the drop-by-drop form of [[ngramNovelty]], same
    * contract as the incremental dedup family (`x_dedup_incremental`):
    * the history never re-reads, only its gram index joins. `n_new`
    * counts grams absent from the index (novel vs HISTORY — batch-
    * internal repeats are not credited, matching what a daily crawl
    * pipeline wants to know: "how much of today is genuinely new").
    *
    * Scale shape: the index is a map-side-combined distinct on the
    * 60-bit gram key, persisted once per ingest; scoring is one keyed
    * left join (gram) + one per-doc aggregate. The batch side is the
    * small side at steady state — at 100 TB of history the index join
    * shuffles the BATCH, and the index itself bucket-joins or Bloom-
    * prefilters ([[graft.operators.Bloom]]) exactly like incremental
    * dedup.
    */
  def ngramNoveltyIncr(spark: SparkSession, dir: String): DataFrame = {
    val grams = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        explode(graft.operators.TextDedup.shingleHashes(col("text"), 3)).as("g"))
    val index = grams.filter(col("doc_id") < 250).select(col("g")).distinct()
      .withColumn("__seen", lit(1L))
    grams.filter(col("doc_id") >= 250)
      .join(index, Seq("g"), "left")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_grams"),
        sum(when(col("__seen").isNull, lit(1L)).otherwise(lit(0L)))
          .cast(LongType).as("n_new"))
      .withColumn("new_ppm",
        expr("(1000000 * n_new) div n_grams").cast(LongType))
      .orderBy("doc_id")
  }

  val ngramNoveltyIncrOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"), 3)
    s"""WITH gr AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    unnest(list_distinct(list_transform($sh, x -> ${DuckSql.hash60("x")}))) AS g
       |  FROM documents),
       |idx AS (SELECT DISTINCT g FROM gr WHERE doc_id < 250)
       |SELECT gr.doc_id, CAST(count(*) AS BIGINT) AS n_grams,
       |  CAST(sum(CASE WHEN idx.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
       |  CAST((1000000 * sum(CASE WHEN idx.g IS NULL THEN 1 ELSE 0 END))
       |    // count(*) AS BIGINT) AS new_ppm
       |FROM gr LEFT JOIN idx ON idx.g = gr.g
       |WHERE gr.doc_id >= 250 GROUP BY gr.doc_id ORDER BY gr.doc_id""".stripMargin
  }

  /** Domain classification ([[graft.operators.NaiveBayes]]): train the
    * multinomial NB model on the 80% of documents with `doc_id % 5 != 0`
    * (labels = `source`), predict a source for the held-out 20%, and
    * report the confusion matrix with mean score and argmax margin —
    * the end-to-end readout of whether source domains are separable
    * enough to route unlabeled crawl text by.
    */
  def nbDomain(spark: SparkSession, dir: String): DataFrame = {
    val docs = DedupQueries.docs(spark, dir)
    val preds = graft.operators.NaiveBayes.classifySplit(
      docs, when(col("doc_id") % 5 =!= 0, col("source")))
    preds
      .join(docs.select(col("doc_id").cast(LongType).as("doc_id"),
        col("source").as("true_label")), Seq("doc_id"))
      .filter(col("doc_id") % 5 === 0)
      .groupBy(col("true_label"), col("pred_label"))
      .agg(count(lit(1)).cast(LongType).as("n"),
        expr("sum(score_ppm) div count(1)").cast(LongType).as("mean_score_ppm"),
        expr("sum(margin_ppm) div count(1)").cast(LongType).as("mean_margin_ppm"))
      .orderBy("true_label", "pred_label")
  }

  val nbDomainOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       |    unnest($t) AS w FROM documents),
       |tf AS (SELECT doc_id, source, w, CAST(count(*) AS BIGINT) AS tf
       |  FROM tok GROUP BY 1, 2, 3),
       |m AS (SELECT source AS label, w, CAST(sum(tf) AS BIGINT) AS c
       |  FROM tf WHERE doc_id % 5 <> 0 GROUP BY 1, 2),
       |lab AS (SELECT label, CAST(sum(c) AS BIGINT) AS cl FROM m GROUP BY 1),
       |v AS (SELECT CAST(greatest(count(DISTINCT w), 1) AS BIGINT) AS v FROM m),
       |tot AS (SELECT doc_id, CAST(sum(tf) AS BIGINT) AS t FROM tf GROUP BY 1),
       |pres AS (SELECT tf.doc_id, m.label,
       |    CAST(sum(tf.tf * (1000000 * (m.c + 1) // (lab.cl + v.v))) AS BIGINT) AS sp,
       |    CAST(sum(tf.tf) AS BIGINT) AS tfp
       |  FROM tf JOIN m USING (w) JOIN lab USING (label) CROSS JOIN v
       |  GROUP BY 1, 2),
       |sc AS (SELECT tot.doc_id, lab.label,
       |    (coalesce(pres.sp, 0)
       |      + (tot.t - coalesce(pres.tfp, 0)) * (1000000 // (lab.cl + v.v)))
       |      // tot.t AS score_ppm
       |  FROM tot CROSS JOIN lab CROSS JOIN v
       |  LEFT JOIN pres ON pres.doc_id = tot.doc_id AND pres.label = lab.label),
       |pred AS (SELECT doc_id, label, score_ppm,
       |    row_number() OVER (PARTITION BY doc_id
       |      ORDER BY score_ppm DESC, label ASC) AS rn,
       |    coalesce(score_ppm - lead(score_ppm, 1) OVER (PARTITION BY doc_id
       |      ORDER BY score_ppm DESC, label ASC), 0) AS margin
       |  FROM sc)
       |SELECT d.source AS true_label, p.label AS pred_label,
       |  CAST(count(*) AS BIGINT) AS n,
       |  CAST(sum(p.score_ppm) // count(*) AS BIGINT) AS mean_score_ppm,
       |  CAST(sum(p.margin) // count(*) AS BIGINT) AS mean_margin_ppm
       |FROM pred p JOIN documents d ON d.doc_id = p.doc_id
       |WHERE p.rn = 1 AND p.doc_id % 5 = 0
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }

  // ---- vocabulary growth curve (Heaps' law readout) ----------------

  /** Vocabulary growth across corpus deciles — the Heaps'-law readout
    * that says whether a corpus keeps contributing NEW types (healthy
    * diversity) or has gone asymptotic (more of the same; marginal
    * training value declining). Types are 3-shingles (the synthetic
    * corpus's unigram vocabulary saturates in decile 0 — context
    * patterns are what keep growing, which is also the right unit for
    * an LM); deciles are doc_id ranges, so the curve is a
    * corpus-ingestion timeline.
    *
    * Scale shape: ONE corpus-wide explode pre-aggregated to the
    * (decile, term, tf) table and materialized (the [[oovRate]]
    * pattern); per-decile token totals AND term first-appearance both
    * derive from it — the vocabulary-sized shuffles are the only ones.
    * The cumulative window runs over exactly 10 rows (limit-bounded,
    * same idiom as [[Shuffle.globalOrderIndex]]'s offsets).
    */
  def vocabGrowth(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    val mx = d.agg(max(col("doc_id")).as("mx"))
    val tf = d.crossJoin(broadcast(mx))
      .withColumn("decile", expr("least(9, (doc_id * 10) div (mx + 1))").cast(LongType))
      .select(col("decile"), explode(TextDedup.shingles(col("text"), 3)).as("term"))
      .groupBy(col("decile"), col("term")).agg(count(lit(1)).as("tf"))
      .localCheckpoint(true)
    val perDec = tf.groupBy("decile").agg(sum(col("tf")).as("n_tokens"))
    val newTerms = tf.groupBy("term").agg(min(col("decile")).as("decile"))
      .groupBy("decile").agg(count(lit(1)).as("n_new_terms"))
    val base = perDec.join(newTerms, Seq("decile"), "left")
      .na.fill(0L, Seq("n_new_terms"))
      .limit(10) // bound visible to Catalyst: the window below is 10 rows
    val w = Window.orderBy("decile")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base
      .withColumn("n_tokens_cum", sum(col("n_tokens")).over(w).cast(LongType))
      .withColumn("vocab_cum", sum(col("n_new_terms")).over(w).cast(LongType))
      .select(col("decile"), col("n_tokens").cast(LongType).as("n_tokens"),
        col("n_new_terms").cast(LongType).as("n_new_terms"),
        col("n_tokens_cum"), col("vocab_cum"))
      .orderBy("decile")
  }

  val vocabGrowthOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"), 3)
    s"""WITH mx AS (SELECT max(doc_id) AS mx FROM documents),
       |d AS (SELECT least(9, (doc_id * 10) // (mx + 1)) AS decile, text
       |  FROM documents, mx),
       |tok AS (SELECT decile, unnest($sh) AS term FROM d),
       |tf AS (SELECT decile, term, count(*) AS tf FROM tok GROUP BY decile, term),
       |perdec AS (SELECT decile, sum(tf) AS n_tokens FROM tf GROUP BY decile),
       |firstseen AS (SELECT term, min(decile) AS decile FROM tf GROUP BY term),
       |newterms AS (SELECT decile, count(*) AS n_new_terms FROM firstseen GROUP BY decile)
       |SELECT CAST(p.decile AS BIGINT) AS decile,
       |  CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(coalesce(n_new_terms, 0) AS BIGINT) AS n_new_terms,
       |  CAST(sum(n_tokens) OVER (ORDER BY p.decile
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n_tokens_cum,
       |  CAST(sum(coalesce(n_new_terms, 0)) OVER (ORDER BY p.decile
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS vocab_cum
       |FROM perdec p LEFT JOIN newterms n USING (decile)
       |ORDER BY decile""".stripMargin
  }

  // ---- Merkle corpus manifest --------------------------------------

  /** Reproducibility manifest as a TWO-LEVEL Merkle tree: per-shard
    * content hash = md5 over the ordered md5s of bounded CHUNKS, each
    * chunk = md5 over ≤1024 per-doc md5 leaves concatenated in doc_id
    * order — plus a root hash over the shard hashes (`shard = -1`
    * row). The artifact a training run pins so "same corpus" is
    * checkable byte-for-byte later, shard-level so a diff localizes to
    * 1/S of the data. The chunk level is the giant-row guard: a flat
    * per-shard `collect_list` of leaves is one N/S-sized unspillable
    * row (~20 GB per shard at 100 TB — the shape
    * [[graft.plans.PlanGuard]] flags); chunking bounds level 1 at 1024
    * leaves per row, and level 2 at N/(S·1024) 32-byte hashes per
    * shard (~20 MB at 100 TB — add a third level or raise S/chunk
    * size past that). `chunk = (doc_id div S) div 1024` is pure narrow
    * compute: within a shard (`shard = doc_id % S`), `doc_id div S`
    * order IS doc_id order, so chunks are deterministic, bounded, and
    * order-preserving with no rank pass.
    */
  def corpusManifest(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        (col("doc_id") % 16).cast(LongType).as("shard"),
        expr("(CAST(doc_id AS BIGINT) div 16) div 1024").cast(LongType).as("chunk"),
        md5(col("text").cast("binary")).as("leaf"),
        octet_length(col("text")).cast(LongType).as("nb"))
    // level 1: one (shard, chunk)-keyed shuffle, ≤1024 leaves per row
    val chunks = d.groupBy(col("shard"), col("chunk")).agg(
        count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("nb")).cast(LongType).as("n_bytes"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("leaf")))),
          s => s("leaf")), "").cast("binary")).as("chunk_hash"))
    // level 2: shard ⊂ (shard, chunk) so AQE coalesces without a new
    // exchange; feeds the output AND the root aggregate
    val shards = chunks.groupBy(col("shard")).agg(
        sum(col("n_docs")).cast(LongType).as("n_docs"),
        sum(col("n_bytes")).cast(LongType).as("n_bytes"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("chunk"), col("chunk_hash")))),
          s => s("chunk_hash")), "").cast("binary")).as("shard_hash"))
      .localCheckpoint(true)
    // limit(65536) is a no-op on S=16 rows; it gives the checkpointed
    // frame (a LogicalRDD, no maxRows) a provable bound so the root
    // collect_list is visibly shard-count-sized, to the plan guard too
    val root = shards.limit(65536).agg(
        sum(col("n_docs")).cast(LongType).as("n_docs"),
        sum(col("n_bytes")).cast(LongType).as("n_bytes"),
        md5(array_join(transform(
          array_sort(collect_list(struct(col("shard"), col("shard_hash")))),
          s => s("shard_hash")), "").cast("binary")).as("shard_hash"))
      .select(lit(-1L).as("shard"), col("n_docs"), col("n_bytes"), col("shard_hash"))
    shards.select(col("shard"), col("n_docs"), col("n_bytes"), col("shard_hash"))
      .unionAll(root)
      .orderBy("shard")
  }

  val corpusManifestOracle: String =
    """WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |    CAST(doc_id % 16 AS BIGINT) AS shard,
      |    (CAST(doc_id AS BIGINT) // 16) // 1024 AS chunk,
      |    md5(text) AS leaf,
      |    CAST(octet_length(encode(text)) AS BIGINT) AS nb
      |  FROM documents),
      |chunks AS (SELECT shard, chunk, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(nb) AS BIGINT) AS n_bytes,
      |    md5(string_agg(leaf, '' ORDER BY doc_id)) AS chunk_hash
      |  FROM d GROUP BY shard, chunk),
      |shards AS (SELECT shard, CAST(sum(n_docs) AS BIGINT) AS n_docs,
      |    CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
      |    md5(string_agg(chunk_hash, '' ORDER BY chunk)) AS shard_hash
      |  FROM chunks GROUP BY shard)
      |SELECT shard, n_docs, n_bytes, shard_hash FROM shards
      |UNION ALL
      |SELECT CAST(-1 AS BIGINT) AS shard,
      |  CAST(sum(n_docs) AS BIGINT) AS n_docs,
      |  CAST(sum(n_bytes) AS BIGINT) AS n_bytes,
      |  md5(string_agg(shard_hash, '' ORDER BY shard)) AS shard_hash
      |FROM shards
      |ORDER BY shard""".stripMargin

  // ---- PageRank over a synthetic citation graph --------------------

  /** PageRank importance prior ([[graft.operators.PageRank]]): the
    * corpus gets a deterministic 2-out-regular citation graph
    * (`d → (7d+1) mod n`, `d → (13d+3) mod n` — affine maps, so
    * in-degrees vary and the rank distribution is non-trivial), then 5
    * integer-exact rounds; top-50 by rank. The oracle replays all 5
    * rounds as unrolled CTEs — bit-identical because the arithmetic is
    * ppb-integer throughout.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    val v = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("id"))
    // vertex count is bounded driver state (same stance as the BPE
    // merge table); it pins the edge modulus identically on both engines
    val n = v.count()
    def edge(a: Long, b: Long): DataFrame =
      v.select(col("id").as("src"), ((col("id") * a + b) % n).as("dst"))
    val edges = edge(7L, 1L).unionAll(edge(13L, 3L))
    graft.operators.PageRank.iterate(v, edges, iters = 5)
      .orderBy(col("rank_ppb").desc, col("id"))
      .limit(50)
      .select(col("id").as("doc_id"), col("rank_ppb"))
  }

  val pagerankOracle: String = {
    val nExpr = "SELECT count(*) FROM v"
    s"""WITH v AS (SELECT CAST(doc_id AS BIGINT) AS id FROM documents),
       |e AS (SELECT id AS src, (id * 7 + 1) % ($nExpr) AS dst FROM v
       |  UNION ALL SELECT id, (id * 13 + 3) % ($nExpr) FROM v),
       |${graft.operators.PageRank.iterateSql(nExpr, iters = 5)}
       |SELECT id AS doc_id, rank_ppb FROM rank_final
       |ORDER BY rank_ppb DESC, doc_id LIMIT 50""".stripMargin
  }

  // ---- manifest-based snapshot verification ------------------------

  /** Shard-level manifest check: recompute the [[corpusManifest]] shard
    * hashes for the stored snapshot and a live corpus with localized
    * damage (a shard-0 doc dropped — `%144 = 0`; a shard-14 doc edited
    * — `%48 = 30`; both residues pin the shard since shard = `%16`) and
    * report per shard whether content moved and by how many docs. The
    * cheap answer to "is this the corpus we trained on, and if not,
    * WHERE does it differ" — S shard rows instead of a corpus-sized
    * diff, and only the damaged shards flag; drill into a changed shard
    * with [[corpusDiff]].
    */
  def manifestCheck(spark: SparkSession, dir: String): DataFrame = {
    val base = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    // same two-level Merkle as [[corpusManifest]] (bounded chunk rows);
    // dropped/edited docs keep their chunk assignment, so damage stays
    // localized to the touched chunks' hashes
    def shardManifest(d: DataFrame): DataFrame =
      d.select(col("doc_id"), (col("doc_id") % 16).cast(LongType).as("shard"),
          expr("(CAST(doc_id AS BIGINT) div 16) div 1024").cast(LongType).as("chunk"),
          md5(col("text").cast("binary")).as("leaf"))
        .groupBy(col("shard"), col("chunk"))
        .agg(count(lit(1)).cast(LongType).as("n_docs"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("doc_id"), col("leaf")))),
            s => s("leaf")), "").cast("binary")).as("chunk_hash"))
        .groupBy(col("shard"))
        .agg(sum(col("n_docs")).cast(LongType).as("n_docs"),
          md5(array_join(transform(
            array_sort(collect_list(struct(col("chunk"), col("chunk_hash")))),
            s => s("chunk_hash")), "").cast("binary")).as("shard_hash"))
    val stored = shardManifest(base)
      .select(col("shard"), col("n_docs").as("n_docs_stored"),
        col("shard_hash").as("hash_stored"))
    val live = shardManifest(base.filter(col("doc_id") % 144 =!= 0)
        .select(col("doc_id"),
          when(col("doc_id") % 48 === 30, concat(col("text"), lit(" updated")))
            .otherwise(col("text")).as("text")))
      .select(col("shard"), col("n_docs").as("n_docs_live"),
        col("shard_hash").as("hash_live"))
    stored.join(live, Seq("shard"), "full_outer")
      .select(col("shard"),
        coalesce(col("n_docs_stored"), lit(0L)).as("n_docs_stored"),
        coalesce(col("n_docs_live"), lit(0L)).as("n_docs_live"),
        when(col("hash_stored") === col("hash_live"), lit("ok"))
          .otherwise(lit("changed")).as("status"))
      .orderBy("shard")
  }

  val manifestCheckOracle: String =
    """WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents),
      |sc AS (SELECT (doc_id // 16) // 1024 AS chunk,
      |    CAST(doc_id % 16 AS BIGINT) AS shard,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    md5(string_agg(md5(text), '' ORDER BY doc_id)) AS chunk_hash
      |  FROM base GROUP BY 1, 2),
      |stored AS (SELECT shard, CAST(sum(n_docs) AS BIGINT) AS n_docs_stored,
      |    md5(string_agg(chunk_hash, '' ORDER BY chunk)) AS hash_stored
      |  FROM sc GROUP BY shard),
      |live0 AS (SELECT doc_id,
      |    CASE WHEN doc_id % 48 = 30 THEN text || ' updated' ELSE text END AS text
      |  FROM base WHERE doc_id % 144 <> 0),
      |lc AS (SELECT (doc_id // 16) // 1024 AS chunk,
      |    CAST(doc_id % 16 AS BIGINT) AS shard,
      |    CAST(count(*) AS BIGINT) AS n_docs,
      |    md5(string_agg(md5(text), '' ORDER BY doc_id)) AS chunk_hash
      |  FROM live0 GROUP BY 1, 2),
      |live AS (SELECT shard, CAST(sum(n_docs) AS BIGINT) AS n_docs_live,
      |    md5(string_agg(chunk_hash, '' ORDER BY chunk)) AS hash_live
      |  FROM lc GROUP BY shard)
      |SELECT coalesce(stored.shard, live.shard) AS shard,
      |  CAST(coalesce(n_docs_stored, 0) AS BIGINT) AS n_docs_stored,
      |  CAST(coalesce(n_docs_live, 0) AS BIGINT) AS n_docs_live,
      |  CASE WHEN hash_stored = hash_live THEN 'ok' ELSE 'changed' END AS status
      |FROM stored FULL OUTER JOIN live ON live.shard = stored.shard
      |ORDER BY shard""".stripMargin

  // ---- tokenizer fertility per language ----------------------------

  /** Tokenizer fertility by language: UTF-8 bytes and whitespace words
    * per BPE-ish token, in exact integer ppm (×1e6 bytes/token). High
    * fertility = the tokenizer fragments that language's text into many
    * small pieces — the per-language cost multiplier that decides
    * whether a vocab is fair across languages (a doc costs its token
    * count, not its information content). One map-side-combined
    * aggregation; all per-row counts are narrow codegen.
    */
  def tokenFertility(spark: SparkSession, dir: String): DataFrame =
    DedupQueries.docs(spark, dir)
      .select(col("lang"),
        octet_length(col("text")).cast(LongType).as("nb"),
        TextStats.wsTokenCount(col("text")).as("nw"),
        TextStats.bpeishTokenCount(col("text")).as("nt"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("nb")).cast(LongType).as("n_bytes"),
        sum(col("nw")).cast(LongType).as("n_words"),
        sum(col("nt")).cast(LongType).as("n_tokens"))
      .withColumn("bytes_per_token_ppm",
        expr("(1000000 * n_bytes) div n_tokens").cast(LongType))
      .withColumn("tokens_per_word_ppm",
        expr("(1000000 * n_tokens) div n_words").cast(LongType))
      .orderBy("lang")

  val tokenFertilityOracle: String = {
    val ws = """len(list_filter(string_split_regex(text, '\s+'), x -> x <> ''))"""
    val bpe = """len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]'))"""
    s"""WITH d AS (SELECT lang,
       |    CAST(octet_length(encode(text)) AS BIGINT) AS nb,
       |    CAST($ws AS BIGINT) AS nw,
       |    CAST($bpe AS BIGINT) AS nt
       |  FROM documents),
       |g AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(nb) AS BIGINT) AS n_bytes,
       |    CAST(sum(nw) AS BIGINT) AS n_words,
       |    CAST(sum(nt) AS BIGINT) AS n_tokens
       |  FROM d GROUP BY lang)
       |SELECT lang, n_docs, n_bytes, n_words, n_tokens,
       |  CAST((1000000 * n_bytes) // n_tokens AS BIGINT) AS bytes_per_token_ppm,
       |  CAST((1000000 * n_tokens) // n_words AS BIGINT) AS tokens_per_word_ppm
       |FROM g ORDER BY lang""".stripMargin
  }

  // ---- source-mix drift between snapshots --------------------------

  /** Training-mix drift: each source's share of corpus tokens (ppm) in
    * two snapshots (the [[corpusDiff]] planting: docs `%11=3` arrive
    * later, `%9=0` get dropped), and the signed per-source delta — the
    * monitor that catches a refresh silently shifting the mix a
    * curriculum was tuned against. Two map-side-combined aggregations
    * over one scan pass each; totals ride a broadcast scalar.
    */
  def mixDrift(spark: SparkSession, dir: String): DataFrame = {
    val d = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("source"),
        TextStats.wsTokenCount(col("text")).as("nt"))
      .localCheckpoint(true) // feeds both snapshot aggregates
    def share(snap: DataFrame, outCol: String): DataFrame = {
      val bySource = snap.groupBy(col("source"))
        .agg(sum(col("nt")).cast(LongType).as("toks"))
      val tot = bySource.agg(sum(col("toks")).cast(LongType).as("tot"))
      bySource.crossJoin(broadcast(tot))
        .select(col("source"),
          expr("(1000000 * toks) div tot").cast(LongType).as(outCol))
    }
    val old = share(d.filter(col("doc_id") % 11 =!= 3), "share_old_ppm")
    val neu = share(d.filter(col("doc_id") % 9 =!= 0), "share_new_ppm")
    old.join(neu, Seq("source"), "full_outer")
      .na.fill(0L, Seq("share_old_ppm", "share_new_ppm"))
      .withColumn("delta_ppm",
        (col("share_new_ppm") - col("share_old_ppm")).cast(LongType))
      .orderBy("source")
  }

  val mixDriftOracle: String = {
    val ws = """CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)"""
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source, $ws AS nt
       |  FROM documents),
       |o AS (SELECT source, CAST(sum(nt) AS BIGINT) AS toks FROM d
       |  WHERE doc_id % 11 <> 3 GROUP BY source),
       |n AS (SELECT source, CAST(sum(nt) AS BIGINT) AS toks FROM d
       |  WHERE doc_id % 9 <> 0 GROUP BY source),
       |os AS (SELECT source,
       |    CAST((1000000 * toks) // (SELECT sum(toks) FROM o) AS BIGINT) AS share_old_ppm
       |  FROM o),
       |ns AS (SELECT source,
       |    CAST((1000000 * toks) // (SELECT sum(toks) FROM n) AS BIGINT) AS share_new_ppm
       |  FROM n)
       |SELECT coalesce(os.source, ns.source) AS source,
       |  CAST(coalesce(share_old_ppm, 0) AS BIGINT) AS share_old_ppm,
       |  CAST(coalesce(share_new_ppm, 0) AS BIGINT) AS share_new_ppm,
       |  CAST(coalesce(share_new_ppm, 0) - coalesce(share_old_ppm, 0) AS BIGINT) AS delta_ppm
       |FROM os FULL OUTER JOIN ns ON ns.source = os.source
       |ORDER BY source""".stripMargin
  }

  // ---- prefix-reuse layout audit -----------------------------------

  /** Prefix-sharing layout measurement: within each source, sort
    * documents lexicographically and count the tokens each document
    * shares with its predecessor's PREFIX — the quantity prefix-reuse
    * systems (KV-cache sharing across prompts, front-coded storage,
    * delta compression) actually save. The per-source lexicographic
    * neighbor is NOT a per-source `lag` window (one task sorting a
    * source's full text at 100 TB) — the sort order comes from
    * [[Shuffle.groupedRank]]'s range-decomposed rank and the
    * predecessor arrives through ONE (source, rank)-keyed equi-join
    * (high-cardinality key — shuffles, never serializes); the
    * common-prefix length is per-row array compute over
    * least-length-sliced neighbors.
    */
  def prefixSavings(spark: SparkSession, dir: String): DataFrame = {
    val base = graft.Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id").cast(LongType).as("doc_id"), col("source"),
        Fts.tokens(Seq(col("text"))).as("toks"))
      .withColumn("t", array_join(col("toks"), " "))
    // materializeInput=false: base carries the token-joined TEXT — a
    // corpus copy is worse than the range sampler's second cheap pass;
    // the post-rank checkpoint below is the one materialization
    val ranked = Shuffle.groupedRank(
        base, Seq("source"), Seq("t", "doc_id"), "rk",
        materializeInput = false)
      .localCheckpoint(true) // feeds both sides of the neighbor join
    ranked
      .join(ranked.select(col("source"), (col("rk") + 1).as("rk"),
          col("toks").as("prev")),
        Seq("source", "rk"), "left")
      .withColumn("m", least(size(col("toks")), size(col("prev"))))
      .withColumn("eq", zip_with(
        slice(col("toks"), lit(1), col("m")),
        slice(col("prev"), lit(1), col("m")), (a, b) => a === b))
      .withColumn("mismatch_at", array_position(col("eq"), false))
      .withColumn("common",
        when(col("prev").isNull, lit(0L))
          .when(col("mismatch_at") === 0, col("m").cast(LongType))
          .otherwise((col("mismatch_at") - 1).cast(LongType)))
      .groupBy(col("source"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(size(col("toks"))).cast(LongType).as("total_tokens"),
        sum(col("common")).cast(LongType).as("prefix_tokens"))
      .withColumn("savings_ppm", expr("prefix_tokens * 1000000 div total_tokens"))
      .orderBy("source")
  }

  val prefixSavingsOracle: String = {
    val toks = DuckSql.tokens("text")
    s"""WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
       |    $toks AS toks, array_to_string($toks, ' ') AS t
       |  FROM documents),
       |lg AS (SELECT doc_id, source, toks,
       |    lag(toks) OVER (PARTITION BY source ORDER BY t, doc_id) AS prev
       |  FROM base),
       |-- list_position yields 0/NULL (version-dependent) when no
       |-- mismatch exists -> coalesce to 0 and treat 0 as full-common
       |cm AS (SELECT doc_id, source, toks,
       |    CASE WHEN prev IS NULL THEN 0
       |      ELSE (CASE
       |        WHEN coalesce(list_position(list_transform(range(1, least(len(toks), len(prev)) + 1),
       |          i -> toks[i] = prev[i]), false), 0) = 0
       |          THEN least(len(toks), len(prev))
       |        ELSE list_position(list_transform(range(1, least(len(toks), len(prev)) + 1),
       |          i -> toks[i] = prev[i]), false) - 1 END)
       |    END AS common
       |  FROM lg)
       |SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
       |  CAST(sum(common) AS BIGINT) AS prefix_tokens,
       |  CAST(sum(common) * 1000000 // sum(len(toks)) AS BIGINT) AS savings_ppm
       |FROM cm GROUP BY source ORDER BY source""".stripMargin
  }

  // ---- T5 span corruption + seeded augmentation --------------------

  /** T5-style span corruption ([[graft.operators.SpanCorrupt]]):
    * hash-masked spans (seed 11, rate 3/20) -> sentinel-keyed
    * (input, target) pairs per document.
    */
  def spanCorrupt(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SpanCorrupt.corrupt(
        graft.Tables.loadSpread(spark, dir, "documents"), "doc_id", "text",
        seed = 11L, numer = 3, denom = 20)
      .orderBy("doc_id")

  val spanCorruptOracle: String = {
    val toks = DuckSql.tokens("text")
    val h = PortableHash.duckdbHash60("'11:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")
    s"""WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $toks AS toks FROM documents),
       |p AS (SELECT doc_id, i AS pos, toks[i] AS tok, ($h) % 20 < 3 AS masked
       |  FROM base CROSS JOIN LATERAL (SELECT unnest(range(1, len(toks) + 1)) AS i) r),
       |m1 AS (SELECT doc_id, pos, tok, masked,
       |    masked AND NOT coalesce(lag(masked) OVER
       |      (PARTITION BY doc_id ORDER BY pos), false) AS run_start
       |  FROM p),
       |m2 AS (SELECT *, CAST(sum(CASE WHEN run_start THEN 1 ELSE 0 END) OVER
       |    (PARTITION BY doc_id ORDER BY pos) - 1 AS BIGINT) AS span_k FROM m1),
       |pieces AS (SELECT doc_id, pos, masked, run_start,
       |    CASE WHEN run_start THEN '<extra_id_' || CAST(span_k AS VARCHAR) || '>'
       |         WHEN NOT masked THEN tok END AS in_piece,
       |    CASE WHEN run_start THEN '<extra_id_' || CAST(span_k AS VARCHAR) || '> ' || tok
       |         WHEN masked THEN tok END AS tgt_piece
       |  FROM m2)
       |SELECT doc_id,
       |  CAST(sum(CASE WHEN run_start THEN 1 ELSE 0 END) AS BIGINT) AS n_spans,
       |  CAST(sum(CASE WHEN masked THEN 1 ELSE 0 END) AS BIGINT) AS n_corrupted,
       |  coalesce(string_agg(in_piece, ' ' ORDER BY pos), '') AS input_text,
       |  coalesce(string_agg(tgt_piece, ' ' ORDER BY pos), '') AS target_text
       |FROM pieces GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  /** Seeded token dropout ([[graft.operators.TextAug.tokenDropout]]):
    * the contrastive-augmentation view (seed 5, drop rate 1/10).
    */
  def tokenDropout(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextAug.tokenDropout(
        graft.Tables.loadSpread(spark, dir, "documents"), "doc_id", "text",
        seed = 5L, numer = 1, denom = 10)
      .orderBy("doc_id")

  /** Cohesion-based chunking ([[graft.operators.SemanticChunk]]):
    * 8-token segments, 16-bucket hashed histograms, boundaries where
    * adjacent cosine < 0.2.
    */
  def semanticChunks(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SemanticChunk.chunks(
        graft.Tables.loadSpread(spark, dir, "documents"), "doc_id", "text",
        segTokens = 8, dims = 16, minCohesion = 0.2)
      .orderBy("doc_id", "seg_no")

  val semanticChunksOracle: String = {
    val toks = DuckSql.tokens("text")
    val h = PortableHash.duckdbHash60("t")
    s"""WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $toks AS toks FROM documents),
       |p AS (SELECT doc_id, (i - 1) // 8 AS seg_no, ($h) % 16 AS bucket
       |  FROM (SELECT doc_id, unnest(toks) AS t,
       |          generate_subscripts(toks, 1) AS i FROM base) e),
       |hist AS (SELECT doc_id, seg_no, bucket, CAST(count(*) AS BIGINT) AS c
       |  FROM p GROUP BY doc_id, seg_no, bucket),
       |grid AS (SELECT doc_id, seg_no, k.k AS bucket
       |  FROM (SELECT DISTINCT doc_id, seg_no FROM hist) s
       |  CROSS JOIN (SELECT unnest(range(0, 16)) AS k) k),
       |vec AS (SELECT g.doc_id, g.seg_no,
       |    list(coalesce(h.c, 0) ORDER BY g.bucket) AS v
       |  FROM grid g LEFT JOIN hist h
       |    ON h.doc_id = g.doc_id AND h.seg_no = g.seg_no AND h.bucket = g.bucket
       |  GROUP BY g.doc_id, g.seg_no),
       |wp AS (SELECT doc_id, seg_no, v,
       |    lag(v) OVER (PARTITION BY doc_id ORDER BY seg_no) AS pv FROM vec),
       |sc AS (SELECT doc_id, seg_no,
       |    CASE WHEN pv IS NULL THEN -1.0
       |      ELSE round(
       |        CAST(list_sum(list_transform(range(1, 17), i -> v[i] * pv[i])) AS DOUBLE) /
       |        (sqrt(CAST(list_sum(list_transform(range(1, 17), i -> v[i] * v[i])) AS DOUBLE)) *
       |         sqrt(CAST(list_sum(list_transform(range(1, 17), i -> pv[i] * pv[i])) AS DOUBLE))), 6)
       |    END AS cohesion
       |  FROM wp)
       |SELECT doc_id, seg_no, cohesion,
       |  CAST(sum(CASE WHEN cohesion >= 0 AND cohesion < 0.2 THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY doc_id ORDER BY seg_no) AS BIGINT) AS chunk_id
       |FROM sc ORDER BY doc_id, seg_no""".stripMargin
  }

  /** FIM transformation ([[graft.operators.TextAug.fimTransform]],
    * seed 3): PSM-ordered infilling pairs.
    */
  def fimTransform(spark: SparkSession, dir: String): DataFrame =
    graft.operators.TextAug.fimTransform(
        graft.Tables.loadSpread(spark, dir, "documents"), "doc_id", "text",
        seed = 3L)
      .orderBy("doc_id")

  val fimTransformOracle: String = {
    val toks = DuckSql.tokens("text")
    def h(tag: String) = PortableHash.duckdbHash60(s"'3:' || CAST(doc_id AS VARCHAR) || ':$tag'")
    s"""WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $toks AS toks FROM documents),
       |c AS (SELECT doc_id, toks, len(toks) AS n,
       |    (${h("a")}) % (len(toks) + 1) AS a,
       |    (${h("b")}) % (len(toks) + 1) AS b
       |  FROM base),
       |s AS (SELECT doc_id, toks, n, least(a, b) AS lo, greatest(a, b) AS hi FROM c),
       |parts AS (SELECT doc_id,
       |    toks[1:lo] AS pre, toks[lo+1:hi] AS mid, toks[hi+1:n] AS suf
       |  FROM s)
       |SELECT doc_id,
       |  CAST(len(pre) AS BIGINT) AS n_prefix,
       |  CAST(len(mid) AS BIGINT) AS n_middle,
       |  CAST(len(suf) AS BIGINT) AS n_suffix,
       |  array_to_string(['<PRE>'] || pre || ['<SUF>'] || suf || ['<MID>'] || mid, ' ') AS fim_text
       |FROM parts ORDER BY doc_id""".stripMargin
  }

  val tokenDropoutOracle: String = {
    val toks = DuckSql.tokens("text")
    val h = PortableHash.duckdbHash60("'5:' || CAST(doc_id AS VARCHAR) || ':' || CAST(i AS VARCHAR)")
    s"""WITH base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $toks AS toks FROM documents),
       |k AS (SELECT doc_id, len(toks) AS n_tokens,
       |    list_filter(toks, (t, i) -> ($h) % 10 >= 1) AS kept
       |  FROM base)
       |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       |  CAST(len(kept) AS BIGINT) AS n_kept,
       |  array_to_string(kept, ' ') AS aug_text
       |FROM k ORDER BY doc_id""".stripMargin
  }
}

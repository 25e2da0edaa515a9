package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.expressions.RollingHash
import graft.operators.{Fts, TextDedup, TextStats}

/** Graded extension queries: deduplication + text analysis over
  * `documents` (SURVEY §7.2.8).
  *
  * The synthetic corpus has no natural duplicates, so the dedup queries
  * first build a corpus with planted duplicates — exact clones
  * (id + 2,000,000) and near-duplicates with the first two tokens
  * dropped (id + 1,000,000). The planting is part of the query on BOTH
  * engines, which makes the operators' outputs non-trivial and still
  * oracle-exact.
  */
object DedupQueries {

  /** All dedup/analysis queries do heavy per-row compute -> spread the
    * single-file table across partitions (see [[Tables.loadSpread]]).
    */
  private[queries] def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(spark, dir, "documents")

  /** documents ∪ exact clones of every 5th doc. */
  private[graft] def corpusExact(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id").cast(LongType), col("text"))
    d.unionAll(d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
  }

  private[queries] val corpusExactSql: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
      |UNION ALL
      |SELECT CAST(doc_id + 2000000 AS BIGINT), text FROM documents WHERE doc_id % 5 = 0""".stripMargin

  /** documents ∪ near-dup copies (first two tokens dropped) of every
    * 10th doc.
    */
  private[graft] def corpusNear(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id").cast(LongType), col("text"))
    val toks = TextDedup.tokensCol(col("text"))
    val perturbed = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(toks, lit(3), greatest(size(toks) - 2, lit(1)))).as("text"))
    d.unionAll(perturbed)
  }

  private[queries] val corpusNearSql: String = {
    val t = DuckSql.tokens("text")
    s"""SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
       |UNION ALL
       |SELECT CAST(doc_id + 1000000 AS BIGINT),
       |  array_to_string(($t)[3:greatest(len($t), 3)], ' ')
       |FROM documents WHERE doc_id % 10 = 0""".stripMargin
  }

  // ---- exact dedup -------------------------------------------------

  def dedupExact(spark: SparkSession, dir: String): DataFrame =
    TextDedup.exact(corpusExact(spark, dir), "doc_id", "text")
      .orderBy("keep_id")

  val dedupExactOracle: String =
    s"""WITH corpus AS ($corpusExactSql)
       |SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
       |  ${DuckSql.hash60("text")} AS content_hash,
       |  CAST(count(*) AS BIGINT) AS n_copies
       |FROM corpus GROUP BY text ORDER BY keep_id""".stripMargin

  /** Incremental exact dedup: docs with doc_id < 250 are the "existing"
    * corpus (their keeper hashes the persisted state); the rest of
    * corpusExact (including its planted clones) is the NEW batch. Output
    * = keepers genuinely new in this batch.
    */
  def dedupIncremental(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusExact(spark, dir)
    val existing = TextDedup.exact(corpus.filter(col("doc_id") < 250), "doc_id", "text")
      .select(col("content_hash"))
    TextDedup.exactIncremental(
        corpus.filter(col("doc_id") >= 250), "doc_id", "text", existing)
      .orderBy("keep_id")
  }

  val dedupIncrementalOracle: String =
    s"""WITH corpus AS ($corpusExactSql),
       |existing AS (SELECT DISTINCT ${DuckSql.hash60("text")} AS content_hash
       |  FROM corpus WHERE doc_id < 250),
       |batch AS (SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
       |    ${DuckSql.hash60("text")} AS content_hash,
       |    CAST(count(*) AS BIGINT) AS n_copies
       |  FROM corpus WHERE doc_id >= 250 GROUP BY text)
       |SELECT keep_id, content_hash, n_copies FROM batch
       |WHERE content_hash NOT IN (SELECT content_hash FROM existing)
       |ORDER BY keep_id""".stripMargin

  // ---- MinHash signatures ------------------------------------------

  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      // materialize the shingle hashes first: CollapseProject keeps the
      // boundary (multi-referenced non-cheap expr), so md5 runs once per
      // shingle instead of once per (perm, shingle)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        TextDedup.shingleHashes(col("text")).as("hs"))
      .select(col("doc_id"),
        posexplode(TextDedup.minhashSignatureFromHashes(col("hs"), 16)).as(Seq("seed", "minhash")))
      .select(col("doc_id"), col("seed").cast(LongType).as("seed"), col("minhash"))
      .orderBy("doc_id", "seed")

  val minhashSignaturesOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"))
    s"""WITH shingled AS (SELECT doc_id, unnest(list_distinct(list_transform($sh, x -> ${DuckSql.hash60("x")}))) AS h
       |  FROM documents),
       |seeded AS (SELECT doc_id, s.seed, ${DuckSql.affine("h", "s.seed")} AS ah
       |  FROM shingled CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) s)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(seed AS BIGINT) AS seed,
       |  min(ah) AS minhash
       |FROM seeded GROUP BY doc_id, seed ORDER BY doc_id, seed""".stripMargin
  }

  // ---- MinHash + LSH near-dup pairs --------------------------------

  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    TextDedup.minhashPairs(corpusNear(spark, dir), "doc_id", "text",
        numPerms = 16, r = 2, jaccardThreshold = 0.5)
      .orderBy("id_a", "id_b")

  /** The shared CTE chain ending in `scored(id_a, id_b, jaccard)` —
    * used by both the pairs oracle and the clusters oracle.
    */
  /** The shared minhash-LSH CTE chain. Since the skew round it replays
    * the engine's identical-set pre-collapse
    * ([[graft.operators.TextDedup.collapseIdenticalSets]]): signatures,
    * bands, and Jaccard run over the distinct-set REPRESENTATIVES
    * (`reps`), and `scored` is rep pairs ∪ identity star pairs
    * (jaccard 1.0) — exactly the engine's emission.
    */
  private[queries] val minhashPairsCtes: String = {
    val t = DuckSql.tokens("text")
    val sh = DuckSql.shinglesFromTokens(t)
    s"""WITH corpus AS ($corpusNearSql),
       |sets AS (SELECT doc_id AS id, list_sort(list_distinct(list_transform($sh, x -> ${DuckSql.hash60("x")}))) AS sset FROM corpus),
       |mrids AS (SELECT sset, min(id) AS rid FROM sets GROUP BY sset),
       |members AS (SELECT m.rid, s.id FROM sets s JOIN mrids m ON m.sset = s.sset),
       |reps AS (SELECT rid AS id, sset FROM mrids),
       |shingled AS (SELECT id, unnest(sset) AS h FROM reps),
       |sig AS (SELECT id, s.seed AS seed, min(${DuckSql.affine("h", "s.seed")}) AS mh
       |  FROM shingled CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) s
       |  GROUP BY id, s.seed),
       |bands AS (SELECT lo.id, bb.b AS band,
       |    lo.mh * 2000000011 + hi.mh AS bsig
       |  FROM (SELECT unnest(range(0, 8)) AS b) bb
       |  JOIN sig lo ON lo.seed = bb.b * 2
       |  JOIN sig hi ON hi.id = lo.id AND hi.seed = bb.b * 2 + 1),
       |${DuckSql.cappedPairsCtes("candraw", "bands", Seq("band", "bsig"))},
       |cand AS (SELECT DISTINCT id_a, id_b FROM candraw),
       |scored AS (SELECT id_a, id_b,
       |    round(CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE) /
       |      (CAST(len(sa.sset) + len(sb.sset) AS DOUBLE) - len(list_intersect(sa.sset, sb.sset))), 6) AS jaccard
       |  FROM cand JOIN reps sa ON sa.id = cand.id_a JOIN reps sb ON sb.id = cand.id_b
       |  UNION ALL
       |  SELECT rid AS id_a, id AS id_b, CAST(1.0 AS DOUBLE) AS jaccard
       |  FROM members WHERE id <> rid)""".stripMargin
  }

  val minhashPairsOracle: String =
    s"""$minhashPairsCtes
       |SELECT id_a, id_b, jaccard FROM scored WHERE jaccard >= 0.5
       |ORDER BY id_a, id_b""".stripMargin

  /** b-bit minhash estimate vs exact Jaccard per LSH candidate pair
    * ([[TextDedup.bbitJaccardPairs]], b=1, 60 bit-perms over the
    * standard 16-perm band candidates).
    */
  def bbitJaccard(spark: SparkSession, dir: String): DataFrame = {
    val sets = corpusNear(spark, dir)
      .select(col("doc_id").cast(LongType).as("id"),
        TextDedup.shingleHashes(col("text"), 3).as("sset"))
    TextDedup.bbitJaccardPairs(sets).orderBy("id_a", "id_b")
  }

  val bbitJaccardOracle: String =
    s"""$minhashPairsCtes,
       |sigb AS (SELECT id, s.seed AS seed, min(${DuckSql.affine("h", "s.seed")}) AS mh
       |  FROM shingled CROSS JOIN (SELECT unnest(range(0, 60)) AS seed) s
       |  GROUP BY id, s.seed),
       |bits AS (SELECT id, CAST(sum((mh & 1) << seed) AS BIGINT) AS sigbits
       |  FROM sigb GROUP BY id),
       |pairx AS (SELECT cand.id_a, cand.id_b,
       |    CAST(len(list_intersect(sa.sset, sb.sset)) AS BIGINT) AS inter,
       |    CAST(len(sa.sset) AS BIGINT) + CAST(len(sb.sset) AS BIGINT)
       |      - CAST(len(list_intersect(sa.sset, sb.sset)) AS BIGINT) AS uni,
       |    CAST(60 - bit_count(xor(ba.sigbits, bb2.sigbits)) AS BIGINT) AS match_bits
       |  FROM cand JOIN sets sa ON sa.id = cand.id_a
       |    JOIN sets sb ON sb.id = cand.id_b
       |    JOIN bits ba ON ba.id = cand.id_a
       |    JOIN bits bb2 ON bb2.id = cand.id_b)
       |SELECT id_a, id_b, match_bits,
       |  greatest((2000000 * match_bits) // 60 - 1000000, 0) AS j_bbit_ppm,
       |  (1000000 * inter) // uni AS j_exact_ppm,
       |  abs(greatest((2000000 * match_bits) // 60 - 1000000, 0)
       |    - (1000000 * inter) // uni) AS err_ppm
       |FROM pairx ORDER BY id_a, id_b""".stripMargin

  /** Incremental near-dup scan: the near-dup planted batch (first two
    * tokens dropped, ids +1000000) checked against the ORIGINAL
    * documents as the existing corpus — each batch doc should
    * rediscover its source via the cross-side LSH band join.
    */
  def dedupIncrementalNear(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    val toks = TextDedup.tokensCol(col("text"))
    val batch = d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat_ws(" ", slice(toks, lit(3), greatest(size(toks) - 2, lit(1)))).as("text"))
    TextDedup.minhashPairsIncremental(batch, d, "doc_id", "text",
        numPerms = 16, r = 2, jaccardThreshold = 0.5)
      .orderBy("new_id", "old_id")
  }

  val dedupIncrementalNearOracle: String = {
    val t = DuckSql.tokens("text")
    val sh = DuckSql.shinglesFromTokens(t)
    val sset = s"list_distinct(list_transform($sh, x -> ${DuckSql.hash60("x")}))"
    s"""WITH batch AS (SELECT CAST(doc_id + 1000000 AS BIGINT) AS doc_id,
       |    array_to_string(($t)[3:greatest(len($t), 3)], ' ') AS text
       |  FROM documents WHERE doc_id % 10 = 0),
       |nsets AS (SELECT doc_id AS id, $sset AS sset FROM batch),
       |esets AS (SELECT CAST(doc_id AS BIGINT) AS id, $sset AS sset FROM documents),
       |nsh AS (SELECT id, unnest(sset) AS h FROM nsets),
       |esh AS (SELECT id, unnest(sset) AS h FROM esets),
       |nsig AS (SELECT id, s.seed AS seed, min(${DuckSql.affine("h", "s.seed")}) AS mh
       |  FROM nsh CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) s GROUP BY id, s.seed),
       |esig AS (SELECT id, s.seed AS seed, min(${DuckSql.affine("h", "s.seed")}) AS mh
       |  FROM esh CROSS JOIN (SELECT unnest(range(0, 16)) AS seed) s GROUP BY id, s.seed),
       |nbands AS (SELECT lo.id, bb.b AS band, lo.mh * 2000000011 + hi.mh AS bsig
       |  FROM (SELECT unnest(range(0, 8)) AS b) bb
       |  JOIN nsig lo ON lo.seed = bb.b * 2
       |  JOIN nsig hi ON hi.id = lo.id AND hi.seed = bb.b * 2 + 1),
       |ebands AS (SELECT lo.id, bb.b AS band, lo.mh * 2000000011 + hi.mh AS bsig
       |  FROM (SELECT unnest(range(0, 8)) AS b) bb
       |  JOIN esig lo ON lo.seed = bb.b * 2
       |  JOIN esig hi ON hi.id = lo.id AND hi.seed = bb.b * 2 + 1),
       |cand AS (SELECT DISTINCT n.id AS new_id, e.id AS old_id
       |  FROM nbands n JOIN ebands e ON n.band = e.band AND n.bsig = e.bsig),
       |scored AS (SELECT new_id, old_id,
       |    round(CAST(len(list_intersect(na.sset, ea.sset)) AS DOUBLE) /
       |      (CAST(len(na.sset) + len(ea.sset) AS DOUBLE) - len(list_intersect(na.sset, ea.sset))), 6) AS jaccard
       |  FROM cand JOIN nsets na ON na.id = cand.new_id JOIN esets ea ON ea.id = cand.old_id)
       |SELECT new_id, old_id, jaccard FROM scored WHERE jaccard >= 0.5
       |ORDER BY new_id, old_id""".stripMargin
  }

  // ---- Dedup clustering: connected components over the pair graph --

  /** Keeper assignment: connected components over the minhash near-dup
    * pair graph (threshold 0.5); every corpus doc labeled with its
    * component's min id.
    */
  def dedupClusters(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusNear(spark, dir)
    val pairs = TextDedup.minhashPairs(corpus, "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.5)
    TextDedup.dedupClusters(corpus, "doc_id", pairs).orderBy("doc_id")
  }

  val dedupClustersOracle: String = {
    // exact CC via unrolled min-label propagation + pointer jumping
    // (DuckSql.ccLabelCtes — the recursive-reach spelling is K² state
    // on a hot cluster; see the helper's doc), over the same scored
    // pairs the Spark side propagates on
    s"""$minhashPairsCtes,
       |good AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM good
       |  UNION ALL SELECT id_b, id_a FROM good),
       |${DuckSql.ccLabelCtes("SELECT doc_id AS id FROM corpus")}
       |SELECT CAST(id AS BIGINT) AS doc_id, CAST(cluster_id AS BIGINT) AS cluster_id
       |FROM labels ORDER BY doc_id""".stripMargin
  }

  /** Dedup observability: the cluster-SIZE histogram of the near-dup
    * clustering — (cluster_size, n_clusters, n_docs) — the one-glance
    * readout of how much a dedup pass collapsed (a heavy tail here
    * means boilerplate or a crawler loop, not organic duplication).
    * Composes [[TextDedup.dedupClusters]]; two further keyed
    * aggregations on the label table.
    */
  def dedupClusterSizes(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusNear(spark, dir)
    val pairs = TextDedup.minhashPairs(corpus, "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.5)
    TextDedup.dedupClusters(corpus, "doc_id", pairs)
      .groupBy(col("cluster_id")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz").cast(LongType).as("cluster_size"))
      .agg(count(lit(1)).cast(LongType).as("n_clusters"))
      .select(col("cluster_size"), col("n_clusters"),
        (col("cluster_size") * col("n_clusters")).cast(LongType).as("n_docs"))
      .orderBy("cluster_size")
  }

  val dedupClusterSizesOracle: String = {
    s"""$minhashPairsCtes,
       |good AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM good
       |  UNION ALL SELECT id_b, id_a FROM good),
       |${DuckSql.ccLabelCtes("SELECT doc_id AS id FROM corpus")},
       |sizes AS (SELECT cluster_id, count(*) AS sz FROM labels GROUP BY cluster_id)
       |SELECT CAST(sz AS BIGINT) AS cluster_size,
       |  CAST(count(*) AS BIGINT) AS n_clusters,
       |  CAST(sz * count(*) AS BIGINT) AS n_docs
       |FROM sizes GROUP BY sz ORDER BY cluster_size""".stripMargin
  }

  /** Canonical keeper selection ([[TextDedup.keepBest]]): within each
    * near-dup cluster keep the member with the most whitespace tokens
    * (ties → lowest doc_id) — the "keep the longest variant" policy, vs
    * the structural min-id keeper [[dedupSavings]] assumes. Exactly one
    * `keep = 1` per cluster.
    */
  def dedupKeepBest(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusNear(spark, dir)
    val pairs = TextDedup.minhashPairs(corpus, "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.5)
    val labels = TextDedup.dedupClusters(corpus, "doc_id", pairs)
    val quality = corpus.select(col("doc_id"),
      TextStats.wsTokenCount(col("text")).as("quality"))
    TextDedup.keepBest(labels, quality).orderBy("doc_id")
  }

  val dedupKeepBestOracle: String = {
    val ws = """CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)"""
    s"""$minhashPairsCtes,
       |good AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM good
       |  UNION ALL SELECT id_b, id_a FROM good),
       |${DuckSql.ccLabelCtes("SELECT doc_id AS id FROM corpus")},
       |q AS (SELECT doc_id, $ws AS quality FROM corpus)
       |SELECT CAST(labels.id AS BIGINT) AS doc_id,
       |  CAST(labels.cluster_id AS BIGINT) AS cluster_id,
       |  q.quality,
       |  CAST(row_number() OVER (PARTITION BY labels.cluster_id
       |    ORDER BY q.quality DESC, labels.id) = 1 AS BIGINT) AS keep
       |FROM labels JOIN q ON q.doc_id = labels.id
       |ORDER BY doc_id""".stripMargin
  }

  /** EXACT set-similarity join ([[graft.operators.SetJoin]], prefix
    * filtering): every pair with shingle-Jaccard >= 1/2 over the
    * near-dup-planted corpus — recall 1.0 by theorem, vs the LSH
    * pairs' banded approximation. Same output shape as
    * [[minhashPairs]] so the two families are directly comparable.
    */
  def ppjoinPairs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SetJoin.ppjoinPairs(corpusNear(spark, dir), "doc_id", "text")
      .orderBy("id_a", "id_b")

  val ppjoinPairsOracle: String =
    s"""WITH corpus AS ($corpusNearSql),
       |${graft.operators.SetJoin.ppjoinSql()}
       |SELECT id_a, id_b, jaccard FROM pp_pairs ORDER BY id_a, id_b""".stripMargin

  /** Duplicated n-gram mass ([[graft.operators.TextDedup.dupNgramMass]],
    * n=20 — the Lee et al. ACL'22 exact-substring window) over the
    * clone-planted exact-dup corpus: per doc, how much of its text is
    * a 20-token window that exists elsewhere in the corpus, in exact
    * ppm — the substring-level readout document-level dedup cannot
    * see.
    */
  def dupNgramMass(spark: SparkSession, dir: String): DataFrame =
    TextDedup.dupNgramMass(corpusExact(spark, dir), "doc_id", "text", n = 20)
      .orderBy("doc_id")

  val dupNgramMassOracle: String = {
    val t = DuckSql.tokens("text")
    val gh = DuckSql.hash60("array_to_string(t[i:i+19], ' ')")
    s"""WITH corpus AS ($corpusExactSql),
       |b AS (SELECT doc_id, $t AS t FROM corpus),
       |g AS (SELECT doc_id, $gh AS g
       |  FROM b CROSS JOIN LATERAL (SELECT unnest(range(1, len(t) - 18)) AS i) r
       |  WHERE len(t) >= 20),
       |pd AS (SELECT doc_id, g, CAST(count(*) AS BIGINT) AS cnt
       |  FROM g GROUP BY doc_id, g),
       |tt AS (SELECT g, CAST(sum(cnt) AS BIGINT) AS tot FROM pd GROUP BY g),
       |d AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams,
       |    CAST(sum(CASE WHEN tot >= 2 THEN cnt ELSE 0 END) AS BIGINT) AS dup_grams
       |  FROM pd JOIN tt USING (g) GROUP BY doc_id)
       |SELECT b.doc_id, CAST(len(b.t) AS BIGINT) AS n_tokens,
       |  CAST(coalesce(d.n_grams, 0) AS BIGINT) AS n_grams,
       |  CAST(coalesce(d.dup_grams, 0) AS BIGINT) AS dup_grams,
       |  CAST(CASE WHEN coalesce(d.n_grams, 0) > 0
       |    THEN (1000000 * d.dup_grams) // d.n_grams END AS BIGINT) AS dup_ppm
       |FROM b LEFT JOIN d USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  /** Duplicated-span pruning ([[graft.operators.TextDedup.dupSpanPrune]],
    * n=20) over the clone-planted corpus: each duplicated 20-token
    * window survives only at its corpus-wide first occurrence; clones
    * prune to empty, partial boilerplate is cut mid-page. The ACTION
    * twin of `x_dup_ngram_mass`'s readout.
    */
  def dupSpanPrune(spark: SparkSession, dir: String): DataFrame =
    TextDedup.dupSpanPrune(corpusExact(spark, dir), "doc_id", "text", n = 20)
      .orderBy("doc_id")

  /** The span-prune CTE chain ending in `p(doc_id, t, pruned)` over a
    * `corpus(doc_id, text)` CTE — shared by [[dupSpanPruneOracle]] and
    * the composed scrub pipeline's oracle (kept in lockstep with
    * [[graft.operators.TextDedup.dupSpanPrune]]).
    */
  private def spanPruneCtes: String = {
    val t = DuckSql.tokens("text")
    val gh = DuckSql.hash60("array_to_string(t[i:i+19], ' ')")
    s"""b AS (SELECT doc_id, $t AS t FROM corpus),
       |occ AS (SELECT doc_id, i AS pos, $gh AS g
       |  FROM b CROSS JOIN LATERAL (SELECT unnest(range(1, len(t) - 18)) AS i) r
       |  WHERE len(t) >= 20),
       |rn AS (SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
       |  FROM occ),
       |exp AS (SELECT doc_id, unnest(range(pos, pos + 20)) AS tp
       |  FROM rn WHERE rn >= 2),
       |mask AS (SELECT doc_id, list(DISTINCT tp) AS m FROM exp GROUP BY doc_id),
       |p AS (SELECT b.doc_id, b.t,
       |    list_filter(list_transform(range(1, len(b.t) + 1),
       |      i -> CASE WHEN NOT coalesce(list_contains(mask.m, i), false)
       |           THEN b.t[i] END), x -> x IS NOT NULL) AS pruned
       |  FROM b LEFT JOIN mask USING (doc_id))""".stripMargin
  }

  val dupSpanPruneOracle: String =
    s"""WITH corpus AS ($corpusExactSql),
       |$spanPruneCtes
       |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(len(t) - len(pruned) AS BIGINT) AS n_removed,
       |  -- DuckDB's array_to_string of an EMPTY list is NULL; Spark's
       |  -- array_join is '' — pin the fully-pruned doc to ''
       |  coalesce(array_to_string(pruned, ' '), '') AS pruned_text
       |FROM p ORDER BY doc_id""".stripMargin

  /** Scrub pipeline graded as ONE dataflow (the [[CurationQueries]]
    * composition pattern applied to the substring-dedup family):
    * span-prune the clone-planted corpus → drop husks (fewer than 5
    * surviving tokens — fully-scrubbed clones and boilerplate-only
    * pages) → exact-dedup the PRUNED texts (scrubbing different
    * originals can converge on identical residues) → keeper rows with
    * copy counts. Grades what a user actually runs: dedup acting on
    * the OUTPUT of another dedup stage.
    */
  def pipelineScrub(spark: SparkSession, dir: String): DataFrame = {
    val pruned = TextDedup.dupSpanPrune(corpusExact(spark, dir), "doc_id", "text", n = 20)
    val surv = pruned
      .withColumn("kept", (col("n_tokens") - col("n_removed")).cast(LongType))
      .filter(col("kept") >= 5)
      // the whole span-prune dataflow feeds BOTH the exact-dedup group
      // and the keeper-tokens join — materialize its (output-sized)
      // result once instead of re-running the prune per consumer
      .localCheckpoint(true)
    val kept = surv.select(col("doc_id").as("keep_id"), col("kept"))
    TextDedup.exact(surv, "doc_id", "pruned_text")
      .join(kept, Seq("keep_id"))
      .select(col("keep_id"), col("n_copies"),
        col("kept").cast(LongType).as("kept_tokens"))
      .orderBy("keep_id")
  }

  val pipelineScrubOracle: String =
    s"""WITH corpus AS ($corpusExactSql),
       |$spanPruneCtes,
       |surv AS (SELECT doc_id,
       |    coalesce(array_to_string(pruned, ' '), '') AS pt,
       |    CAST(len(pruned) AS BIGINT) AS kept
       |  FROM p WHERE len(pruned) >= 5)
       |SELECT CAST(min(doc_id) AS BIGINT) AS keep_id,
       |  CAST(count(*) AS BIGINT) AS n_copies,
       |  CAST(kept AS BIGINT) AS kept_tokens
       |FROM surv GROUP BY pt, kept ORDER BY keep_id""".stripMargin

  /** Incremental span pruning
    * ([[graft.operators.TextDedup.dupSpanPruneIncremental]]): docs
    * below 250 play the PRIOR corpus (their 20-gram hashes are the
    * persisted state), the rest arrive as the new batch — known grams
    * are cut wherever they appear, batch-new duplicated grams keep
    * their intra-batch first occurrence. The append-only ingest form
    * of `x_dup_span_prune`.
    */
  def dupSpanPruneIncremental(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusExact(spark, dir)
    // state = the prior corpus's distinct gram hashes — the 8-byte
    // rows a pipeline persists between runs
    val priorGrams = corpus.filter(col("doc_id") < 250)
      .filter(size(graft.operators.TextDedup.tokensCol(col("text"))) >= 20)
      .select(explode(graft.expressions.ShingleHashSeq60
        .shingle_hash_seq60(col("text"), 20)).as("g"))
      .distinct()
    TextDedup.dupSpanPruneIncremental(
        corpus.filter(col("doc_id") >= 250), "doc_id", "text", priorGrams, n = 20)
      .orderBy("doc_id")
  }

  val dupSpanPruneIncrementalOracle: String = {
    val t = DuckSql.tokens("text")
    val gh = DuckSql.hash60("array_to_string(t[i:i+19], ' ')")
    s"""WITH corpus AS ($corpusExactSql),
       |b AS (SELECT doc_id, $t AS t FROM corpus WHERE doc_id >= 250),
       |prior AS (SELECT DISTINCT $gh AS g
       |  FROM (SELECT $t AS t FROM corpus WHERE doc_id < 250)
       |  CROSS JOIN LATERAL (SELECT unnest(range(1, len(t) - 18)) AS i) r
       |  WHERE len(t) >= 20),
       |occ AS (SELECT doc_id, i AS pos, $gh AS g
       |  FROM b CROSS JOIN LATERAL (SELECT unnest(range(1, len(t) - 18)) AS i) r
       |  WHERE len(t) >= 20),
       |known AS (SELECT doc_id, pos FROM occ
       |  WHERE g IN (SELECT g FROM prior)),
       |fresh AS (SELECT doc_id, pos,
       |    row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn
       |  FROM occ WHERE g NOT IN (SELECT g FROM prior)),
       |removable AS (SELECT doc_id, pos FROM known
       |  UNION ALL SELECT doc_id, pos FROM fresh WHERE rn >= 2),
       |exp AS (SELECT doc_id, unnest(range(pos, pos + 20)) AS tp FROM removable),
       |mask AS (SELECT doc_id, list(DISTINCT tp) AS m FROM exp GROUP BY doc_id),
       |p AS (SELECT b.doc_id, b.t,
       |    list_filter(list_transform(range(1, len(b.t) + 1),
       |      i -> CASE WHEN NOT coalesce(list_contains(mask.m, i), false)
       |           THEN b.t[i] END), x -> x IS NOT NULL) AS pruned
       |  FROM b LEFT JOIN mask USING (doc_id))
       |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
       |  CAST(len(t) - len(pruned) AS BIGINT) AS n_removed,
       |  coalesce(array_to_string(pruned, ' '), '') AS pruned_text
       |FROM p ORDER BY doc_id""".stripMargin
  }

  /** PPJoin candidate-volume pre-flight
    * ([[graft.operators.SetJoin.prefixSkewReport]]) over the same
    * near-dup corpus as `x_ppjoin_pairs` — the observability readout
    * that surfaces a pathological prefix-token fan-out (near-identical
    * docs sharing a universal rare-ish token) before the exact join
    * runs at scale.
    */
  def ppjoinSkewReport(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SetJoin.prefixSkewReport(corpusNear(spark, dir), "doc_id", "text")

  val ppjoinSkewReportOracle: String =
    s"""WITH corpus AS ($corpusNearSql),
       |${graft.operators.SetJoin.prefixSkewSql()}
       |SELECT n_docs, n_reps, n_prefix_tokens, cand_pairs, max_token_df,
       |  top_token_share_ppm, within_pairs FROM pp_skew""".stripMargin

  /** Dedup savings summary: after near-dup clustering, the docs and
    * TOKENS the keeper policy removes, in exact ppm — the one-row
    * cost/benefit readout that justifies (or kills) a dedup pass:
    * training budgets are spent in tokens, so `tokens_saved_ppm` is the
    * number that matters, not the doc count.
    */
  def dedupSavings(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusNear(spark, dir)
    val pairs = TextDedup.minhashPairs(corpus, "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.5)
    val labels = TextDedup.dedupClusters(corpus, "doc_id", pairs)
    val toks = corpus.select(col("doc_id"),
      TextStats.wsTokenCount(col("text")).as("ws"))
    labels.join(toks, "doc_id")
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("ws")).cast(LongType).as("n_tokens"),
        sum(when(col("doc_id") === col("cluster_id"), 1L).otherwise(0L))
          .cast(LongType).as("n_docs_kept"),
        sum(when(col("doc_id") === col("cluster_id"), col("ws")).otherwise(0L))
          .cast(LongType).as("n_tokens_kept"))
      .withColumn("docs_saved_ppm",
        expr("(1000000 * (n_docs - n_docs_kept)) div n_docs"))
      .withColumn("tokens_saved_ppm",
        expr("(1000000 * (n_tokens - n_tokens_kept)) div n_tokens"))
  }

  val dedupSavingsOracle: String = {
    val ws = """CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT)"""
    s"""$minhashPairsCtes,
       |good AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM good
       |  UNION ALL SELECT id_b, id_a FROM good),
       |${DuckSql.ccLabelCtes("SELECT doc_id AS id FROM corpus")},
       |toks AS (SELECT doc_id, $ws AS ws FROM corpus),
       |j AS (SELECT labels.id, labels.cluster_id, toks.ws
       |  FROM labels JOIN toks ON toks.doc_id = labels.id)
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(ws) AS BIGINT) AS n_tokens,
       |  CAST(sum(CASE WHEN id = cluster_id THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_kept,
       |  CAST(sum(CASE WHEN id = cluster_id THEN ws ELSE 0 END) AS BIGINT) AS n_tokens_kept,
       |  (1000000 * (CAST(count(*) AS BIGINT) - CAST(sum(CASE WHEN id = cluster_id THEN 1 ELSE 0 END) AS BIGINT)))
       |    // CAST(count(*) AS BIGINT) AS docs_saved_ppm,
       |  (1000000 * (CAST(sum(ws) AS BIGINT) - CAST(sum(CASE WHEN id = cluster_id THEN ws ELSE 0 END) AS BIGINT)))
       |    // CAST(sum(ws) AS BIGINT) AS tokens_saved_ppm
       |FROM j""".stripMargin
  }

  /** Near-dup SPLIT LEAKAGE: near-duplicate pairs whose members landed
    * in different train/validation/test splits — the contamination mode
    * content-hash splitting cannot prevent (exact clones hash to the
    * same bucket and stay together; near-dups hash apart and leak).
    * One number to gate on: leaked pairs per million near-dup pairs.
    * Dedup-before-split is the mitigation this readout justifies.
    */
  def splitLeakage(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusNear(spark, dir)
    val pairs = TextDedup.minhashPairs(corpus, "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.5)
    val splits = corpus.select(col("doc_id"),
      graft.operators.Sampling.splitLabel(
        graft.operators.Sampling.hashBucket(col("text"), 1000), 90, 5).as("split"))
    pairs
      .join(splits.select(col("doc_id").as("id_a"), col("split").as("split_a")), Seq("id_a"))
      .join(splits.select(col("doc_id").as("id_b"), col("split").as("split_b")), Seq("id_b"))
      .agg(count(lit(1)).cast(LongType).as("n_pairs"),
        sum((col("split_a") =!= col("split_b")).cast(LongType))
          .cast(LongType).as("n_cross_split"))
      .withColumn("leak_ppm", expr("(1000000 * n_cross_split) div n_pairs"))
  }

  val splitLeakageOracle: String =
    s"""$minhashPairsCtes,
       |splits AS (SELECT doc_id, CASE
       |    WHEN (${DuckSql.hash60("text")}) % 1000 < 900 THEN 'train'
       |    WHEN (${DuckSql.hash60("text")}) % 1000 < 950 THEN 'validation'
       |    ELSE 'test' END AS split
       |  FROM corpus),
       |good AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5)
       |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
       |  CAST(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT) AS n_cross_split,
       |  (1000000 * CAST(sum(CASE WHEN a.split <> b.split THEN 1 ELSE 0 END) AS BIGINT))
       |    // CAST(count(*) AS BIGINT) AS leak_ppm
       |FROM good JOIN splits a ON a.doc_id = good.id_a
       |JOIN splits b ON b.doc_id = good.id_b""".stripMargin

  /** Measured LSH recall against exact ground truth: the banded MinHash
    * pairs ([[TextDedup.minhashPairs]]) scored against the
    * prefix-filter join's complete answer ([[graft.operators.SetJoin]])
    * on the same corpus at the same threshold — the metrology that
    * turns "LSH is probabilistic" into a NUMBER a pipeline can gate on
    * (vs [[graft.queries.AnalyticsQueries]]'s planted-pair audit, which
    * measures recovery of known clones only). Full-outer join of the
    * two pair sets + ONE aggregation — no driver-side counting, no
    * scalar cross joins.
    */
  def lshRecall(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusNear(spark, dir)
    // ONE shingle materialization feeds both pipelines — the exact
    // (ppjoin) and approximate (minhash) sides previously each
    // re-tokenized and re-hashed the whole corpus
    val sets = corpus.select(col("doc_id").cast(LongType).as("id"),
        TextDedup.shingleHashes(col("text"), 3).as("sset"))
      .localCheckpoint(true)
    // recall over DISTINCT-CONTENT pairs: both sides canonicalize each
    // id to its identical-set representative and dedupe — identical
    // copies (exact dedup's job, found without LSH by definition) no
    // longer inflate or deflate the LSH recall number, and the measure
    // is invariant to how either side spells its within-group emission
    // ONE collapse decision for the whole audit (r19): the canon
    // aggregation used to run three times — here, inside the minhash
    // pipeline, and (as a full-array group) inside the ppjoin build
    val (members0, reps0, collapsed) = TextDedup.collapseIdenticalSetsTagged(sets)
    // identity collapse (uniform corpus): rid == id for every doc, so the
    // four member-mapping joins below are identity maps — skip them (r18:
    // they cost 8 exchanges in this query's plan while provably re-keying
    // every pair to itself)
    val m = if (collapsed) members0.localCheckpoint(true) // four projection joins below
      else members0
    // reps stay lazy: on the collapsed path they are a cheap semi-join
    // over the collapse's own canon checkpoint
    val sharedCollapse = (m, reps0, collapsed)
    def canon(p: DataFrame): DataFrame = {
      val mapped = if (!collapsed)
        p.select(col("id_a").as("ra"), col("id_b").as("rb"))
      else p
        .join(m.select(col("id").as("id_a"), col("rid").as("ra")), Seq("id_a"))
        .join(m.select(col("id").as("id_b"), col("rid").as("rb")), Seq("id_b"))
      mapped
        .filter(col("ra") =!= col("rb"))
        .select(least(col("ra"), col("rb")).as("id_a"),
          greatest(col("ra"), col("rb")).as("id_b"))
        .distinct()
    }
    val exact = canon(graft.operators.SetJoin
        .ppjoinPairsFromSets(sets, precomputed = Some(sharedCollapse))
        .select(col("id_a"), col("id_b")))
      .withColumn("in_exact", lit(1L))
    val lsh = canon(TextDedup.minhashPairsFromCollapse(sharedCollapse,
        numPerms = 16, r = 2, jaccardThreshold = 0.5, maxBucket = 256)
        .select(col("id_a"), col("id_b")))
      .withColumn("in_lsh", lit(1L))
    exact.join(lsh, Seq("id_a", "id_b"), "full_outer")
      .agg(sum(coalesce(col("in_exact"), lit(0L))).cast(LongType).as("n_exact"),
        sum(coalesce(col("in_lsh"), lit(0L))).cast(LongType).as("n_lsh"),
        sum(coalesce(col("in_exact"), lit(0L)) * coalesce(col("in_lsh"), lit(0L)))
          .cast(LongType).as("n_common"))
      .select(col("n_exact"), col("n_lsh"), col("n_common"),
        expr("(1000000 * n_common) div n_exact").as("recall_ppm"))
  }

  val lshRecallOracle: String = {
    val pp = graft.operators.SetJoin.ppjoinSql()
    // minhashPairsCtes already begins with "WITH corpus AS (...)" — append
    // the prefix-filter chain to the same WITH list
    s"""$minhashPairsCtes,
       |$pp,
       |lsh0 AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
       |lsh AS (SELECT DISTINCT least(ma.rid, mb.rid) AS id_a,
       |    greatest(ma.rid, mb.rid) AS id_b
       |  FROM lsh0 JOIN members ma ON ma.id = lsh0.id_a
       |  JOIN members mb ON mb.id = lsh0.id_b
       |  WHERE ma.rid <> mb.rid),
       |ex0 AS (SELECT id_a, id_b FROM pp_pairs),
       |ex AS (SELECT DISTINCT least(ma.rid, mb.rid) AS id_a,
       |    greatest(ma.rid, mb.rid) AS id_b
       |  FROM ex0 JOIN members ma ON ma.id = ex0.id_a
       |  JOIN members mb ON mb.id = ex0.id_b
       |  WHERE ma.rid <> mb.rid),
       |u AS (SELECT coalesce(ex.id_a, lsh.id_a) AS id_a,
       |    CASE WHEN ex.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_exact,
       |    CASE WHEN lsh.id_a IS NOT NULL THEN 1 ELSE 0 END AS in_lsh
       |  FROM ex FULL JOIN lsh ON ex.id_a = lsh.id_a AND ex.id_b = lsh.id_b)
       |SELECT CAST(sum(in_exact) AS BIGINT) AS n_exact,
       |  CAST(sum(in_lsh) AS BIGINT) AS n_lsh,
       |  CAST(sum(in_exact * in_lsh) AS BIGINT) AS n_common,
       |  (1000000 * CAST(sum(in_exact * in_lsh) AS BIGINT))
       |    // CAST(sum(in_exact) AS BIGINT) AS recall_ppm
       |FROM u""".stripMargin
  }

  /** Cross-source duplicate leakage matrix: near-dup pairs classified
    * by the (source, source) edge they connect — original docs keep
    * their `source`, planted near-dups get `"planted"`. The readout
    * that tells a curation team WHICH crawls/dumps are duplicating each
    * other (and how much eval-set material leaks between them).
    * Canonicalized with least/greatest so the matrix is triangular.
    *
    * Scale: the (doc_id, source) side is corpus-sized, so it is NOT
    * broadcast — two hash joins keyed on the pair ids, then a tiny
    * grouped count.
    */
  def dedupLeakage(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val srcs = d.select(col("doc_id").cast(LongType).as("id"), col("source"))
      .unionAll(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("id"), lit("planted").as("source")))
    val pairs = TextDedup.minhashPairs(corpusNear(spark, dir), "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.5)
    pairs
      .join(srcs.select(col("id").as("id_a"), col("source").as("src_a")), Seq("id_a"))
      .join(srcs.select(col("id").as("id_b"), col("source").as("src_b")), Seq("id_b"))
      .select(least(col("src_a"), col("src_b")).as("source_a"),
        greatest(col("src_a"), col("src_b")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).cast(LongType).as("n_pairs"))
      .orderBy("source_a", "source_b")
  }

  val dedupLeakageOracle: String =
    s"""$minhashPairsCtes,
       |srcs AS (SELECT CAST(doc_id AS BIGINT) AS id, source FROM documents
       |  UNION ALL
       |  SELECT CAST(doc_id + 1000000 AS BIGINT), 'planted' FROM documents
       |  WHERE doc_id % 10 = 0),
       |good AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5)
       |SELECT least(a.source, b.source) AS source_a,
       |  greatest(a.source, b.source) AS source_b,
       |  CAST(count(*) AS BIGINT) AS n_pairs
       |FROM good JOIN srcs a ON a.id = good.id_a JOIN srcs b ON b.id = good.id_b
       |GROUP BY 1, 2 ORDER BY source_a, source_b""".stripMargin

  /** Dedup removal manifest: per keeper, the count and the sorted
    * comma-joined list of removed doc ids — the provenance record a
    * pipeline writes alongside a dedup pass so removals are auditable
    * and reversible. Sorted NUMERICALLY before stringifying (a
    * lexicographic sort of stringified ids would scramble cross-engine
    * parity and human readability alike).
    */
  def dedupManifest(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusNear(spark, dir)
    val pairs = TextDedup.minhashPairs(corpus, "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.5)
    TextDedup.dedupClusters(corpus, "doc_id", pairs)
      .filter(col("doc_id") =!= col("cluster_id"))
      .groupBy(col("cluster_id").as("keep_id"))
      .agg(count(lit(1)).cast(LongType).as("n_removed"),
        array_join(transform(sort_array(collect_list(col("doc_id"))),
          _.cast(StringType)), ",").as("removed_ids"))
      .orderBy("keep_id")
  }

  val dedupManifestOracle: String = {
    s"""$minhashPairsCtes,
       |good AS (SELECT id_a, id_b FROM scored WHERE jaccard >= 0.5),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM good
       |  UNION ALL SELECT id_b, id_a FROM good),
       |${DuckSql.ccLabelCtes("SELECT doc_id AS id FROM corpus")}
       |SELECT CAST(cluster_id AS BIGINT) AS keep_id,
       |  CAST(count(*) AS BIGINT) AS n_removed,
       |  string_agg(CAST(id AS VARCHAR), ',' ORDER BY id) AS removed_ids
       |FROM labels WHERE id <> cluster_id
       |GROUP BY cluster_id ORDER BY keep_id""".stripMargin
  }

  // ---- SimHash fingerprints + near-dup pairs -----------------------

  def simhashFingerprints(spark: SparkSession, dir: String): DataFrame =
    TextDedup.withSimhash(
        docs(spark, dir).select(col("doc_id").cast(LongType).as("doc_id"), col("text")), "text")
      .select(col("doc_id"), col("sim").as("simhash"))
      .orderBy("doc_id")

  val simhashFingerprintsOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH toks AS (SELECT doc_id, unnest($t) AS tok FROM documents),
       |h AS (SELECT doc_id, ${DuckSql.hash60("tok")} AS h FROM toks),
       |bits AS (SELECT doc_id, bb.b,
       |    CASE WHEN sum(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
       |      THEN (CAST(1 AS BIGINT) << bb.b) ELSE 0 END AS bit
       |  FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bb
       |  GROUP BY doc_id, bb.b)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, CAST(sum(bit) AS BIGINT) AS simhash
       |FROM bits GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  def simhashPairs(spark: SparkSession, dir: String): DataFrame =
    TextDedup.simhashPairs(corpusNear(spark, dir), "doc_id", "text", maxHamming = 20)
      .orderBy("id_a", "id_b")

  val simhashPairsOracle: String = {
    val t = DuckSql.tokens("text")
    // replays the engine's identical-fingerprint pre-collapse: chunk
    // buckets over one representative per distinct sim, identity star
    // pairs (hamming 0) for same-sim copies
    s"""WITH corpus AS ($corpusNearSql),
       |toks AS (SELECT doc_id AS id, unnest($t) AS tok FROM corpus),
       |h AS (SELECT id, ${DuckSql.hash60("tok")} AS h FROM toks),
       |bits AS (SELECT id, bb.b,
       |    CASE WHEN sum(CASE WHEN (h >> bb.b) & 1 = 1 THEN 1 ELSE -1 END) > 0
       |      THEN (CAST(1 AS BIGINT) << bb.b) ELSE 0 END AS bit
       |  FROM h CROSS JOIN (SELECT unnest(range(0, 60)) AS b) bb
       |  GROUP BY id, bb.b),
       |sims AS (SELECT id, CAST(sum(bit) AS BIGINT) AS sim FROM bits GROUP BY id),
       |srids AS (SELECT sim, min(id) AS rid FROM sims GROUP BY sim),
       |smembers AS (SELECT r.rid, s.id FROM sims s JOIN srids r ON r.sim = s.sim),
       |sreps AS (SELECT rid AS id, sim FROM srids),
       |chunked AS (SELECT id, sim, cc.c AS chunk, (sim >> (15 * cc.c)) & 32767 AS ckey
       |  FROM sreps CROSS JOIN (SELECT unnest(range(0, 4)) AS c) cc),
       |${DuckSql.cappedPairsCtes("cand", "chunked", Seq("chunk", "ckey"))},
       |pairs AS (SELECT DISTINCT c.id_a, c.id_b, a.sim AS sim_a, b.sim AS sim_b
       |  FROM cand c JOIN sreps a ON a.id = c.id_a JOIN sreps b ON b.id = c.id_b)
       |SELECT id_a, id_b, CAST(bit_count(xor(sim_a, sim_b)) AS BIGINT) AS hamming
       |FROM pairs WHERE bit_count(xor(sim_a, sim_b)) <= 20
       |UNION ALL
       |SELECT rid AS id_a, id AS id_b, CAST(0 AS BIGINT) AS hamming
       |FROM smembers WHERE id <> rid
       |ORDER BY id_a, id_b""".stripMargin
  }

  // ---- n-gram Jaccard of adjacent doc pairs ------------------------

  def ngramJaccard(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // The shingle pipeline feeds both sides of the self-join; eager
    // local checkpoint so the corpus-wide explode+distinct runs once
    // (same idiom as TextDedup.minhashPairs).
    val sets = d.select(col("doc_id").cast(LongType).as("id"),
      array_distinct(TextDedup.shingles(col("text"), 3)).as("sset"))
      .localCheckpoint(true)
    val a = sets.as("a")
    val b = sets.as("b")
    a.join(b, col("b.id") === col("a.id") + 1)
      .withColumn("inter", size(array_intersect(col("a.sset"), col("b.sset"))).cast(DoubleType))
      .withColumn("uni",
        (size(col("a.sset")) + size(col("b.sset"))).cast(DoubleType) - col("inter"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        round(col("inter") / col("uni"), 6).as("jaccard"))
      .orderBy("id_a")
  }

  val ngramJaccardOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"))
    s"""WITH sets AS (SELECT CAST(doc_id AS BIGINT) AS id, list_distinct($sh) AS sset FROM documents)
       |SELECT a.id AS id_a, b.id AS id_b,
       |  round(CAST(len(list_intersect(a.sset, b.sset)) AS DOUBLE) /
       |    (CAST(len(a.sset) + len(b.sset) AS DOUBLE) - len(list_intersect(a.sset, b.sset))), 6) AS jaccard
       |FROM sets a JOIN sets b ON b.id = a.id + 1
       |ORDER BY id_a""".stripMargin
  }

  // ---- deterministic split assignment ------------------------------

  /** Content-hash 90/5/5 train/validation/test assignment (1000
    * buckets) — stable under re-sharding and corpus growth.
    */
  def splitAssign(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        graft.operators.Sampling.hashBucket(col("text"), 1000).as("bucket"))
      .withColumn("split", graft.operators.Sampling.splitLabel(col("bucket"), 90, 5))
      .orderBy("doc_id")

  val splitAssignOracle: String =
    s"""WITH b AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    (${DuckSql.hash60("text")}) % 1000 AS bucket
       |  FROM documents)
       |SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
       |  CASE WHEN bucket < 900 THEN 'train'
       |       WHEN bucket < 950 THEN 'validation'
       |       ELSE 'test' END AS split
       |FROM b ORDER BY doc_id""".stripMargin

  /** Quality-aware deterministic downsampling: docs scoring at or above
    * the threshold are always kept; the rest survive only a 25%
    * content-hash sample. Narrow per-row compute (the curation filter a
    * pipeline applies before training-set assembly).
    */
  def qualitySample(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        TextStats.quality(col("text")).getField("quality_score").as("quality_score"),
        graft.operators.Sampling.hashBucket(col("text"), 1000).as("bucket"))
      .filter(col("quality_score") >= 0.5 || col("bucket") < 250)
      .select(col("doc_id"), col("quality_score"),
        (col("quality_score") >= 0.5).as("kept_by_quality"))
      .orderBy("doc_id")

  val qualitySampleOracle: String = {
    val t = DuckSql.tokens("text")
    val allStop = TextStats.stopwords.values.flatten.toSeq.distinct.sorted
    s"""WITH t AS (SELECT doc_id, text,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len($t) AS BIGINT) AS n_tokens,
       |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS alnum,
       |    CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS spaces,
       |    CAST(${DuckSql.hitCount(t, allStop)} AS BIGINT) AS stop_hits
       |  FROM documents),
       |q AS (SELECT doc_id, text,
       |    ${DuckSql.qualityScoreFromCounts("n_chars", "n_tokens", "alnum", "spaces", "stop_hits")} AS quality_score
       |  FROM t)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, quality_score,
       |  quality_score >= 0.5 AS kept_by_quality
       |FROM q
       |WHERE quality_score >= 0.5 OR (${DuckSql.hash60("text")}) % 1000 < 250
       |ORDER BY doc_id""".stripMargin
  }

  /** Sequence-packing assignment: docs are routed to one of 100
    * content-hash buckets (so the window is partitioned — no global
    * single-partition cumsum, the property that matters at corpus
    * scale), ordered by doc_id within the bucket, and packed greedily
    * into 2048-token sequences by cumulative BPE-ish token count:
    * `pack_no = (cumsum - tokens) / 2048`. Exact integer arithmetic
    * end to end.
    */
  def packAssign(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        graft.operators.Sampling.hashBucket(col("text"), 100).as("bucket"),
        TextStats.bpeishTokenCount(col("text")).as("n_tokens"))
      // Materialize the 3-column per-row compute once: the final
      // orderBy's range-partitioner sampling pass would otherwise
      // re-run the token-count scan over the full corpus.
      .localCheckpoint(true)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w).cast(LongType))
      // `div`, not `/`: Long / Long in Spark is DOUBLE division, which
      // loses exactness past 2^53 cumulative tokens
      .withColumn("pack_no", expr("(cum_tokens - n_tokens) div 2048").cast(LongType))
      .select(col("doc_id"), col("bucket"), col("n_tokens"), col("cum_tokens"), col("pack_no"))
      .orderBy("doc_id")
  }

  val packAssignOracle: String =
    s"""WITH b AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CAST((${DuckSql.hash60("text")}) % 100 AS BIGINT) AS bucket,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, bucket, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM b)
       |SELECT doc_id, bucket, n_tokens, cum_tokens,
       |  CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS pack_no
       |FROM c ORDER BY doc_id""".stripMargin

  /** Pack attention-contamination stats: per packed sequence, the ppm
    * of token-pair attention mass that stays INTRA-document —
    * `Σnᵢ² / (Σnᵢ)²` — the number that decides whether packing needs
    * boundary masking (unmasked packs let tokens attend across
    * unrelated documents; a pack of one doc scores 1e6, many small
    * docs score low). Pure aggregation on top of [[packAssign]]'s
    * per-doc assignment — one extra keyed groupBy, nothing new
    * touches the corpus.
    */
  def packAttention(spark: SparkSession, dir: String): DataFrame =
    packAssign(spark, dir)
      .groupBy(col("bucket"), col("pack_no"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("n_tokens")).cast(LongType).as("n_tokens"),
        sum(col("n_tokens") * col("n_tokens")).cast(LongType).as("sq"))
      // guard the zero-token pack (all-empty docs): Spark's `div` would
      // yield NULL but DuckDB's `//` raises a division-by-zero error —
      // an ENGINE-divergent failure, not a hash mismatch. when/NULLIF
      // pins both engines to NULL.
      .withColumn("intra_ppm",
        when(col("n_tokens") > 0,
          expr("(1000000 * sq) div (n_tokens * n_tokens)")).cast(LongType))
      .select(col("bucket"), col("pack_no"), col("n_docs"), col("n_tokens"),
        col("intra_ppm"))
      .orderBy("bucket", "pack_no")

  val packAttentionOracle: String =
    s"""WITH b AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CAST((${DuckSql.hash60("text")}) % 100 AS BIGINT) AS bucket,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, bucket, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM b),
       |p AS (SELECT bucket, CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS pack_no,
       |    n_tokens FROM c)
       |SELECT bucket, pack_no, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
       |  CAST((1000000 * CAST(sum(n_tokens * n_tokens) AS BIGINT))
       |    // NULLIF(CAST(sum(n_tokens) AS BIGINT) * CAST(sum(n_tokens) AS BIGINT), 0) AS BIGINT) AS intra_ppm
       |FROM p GROUP BY bucket, pack_no ORDER BY bucket, pack_no""".stripMargin

  /** Packed-sequence CONSTRUCTION: the step after [[packAssign]] that
    * actually materializes each 2048-token training sequence — docs of
    * a (bucket, pack) concatenated in doc_id order with doc and token
    * counts. The grouped concat runs per pack (bounded by the token
    * budget), never over the corpus; order inside the string is pinned
    * by sorting the collected (doc_id, text) structs, the exact twin of
    * the oracle's `string_agg(... ORDER BY doc_id)`.
    */
  def packSequences(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"),
        graft.operators.Sampling.hashBucket(col("text"), 100).as("bucket"),
        TextStats.bpeishTokenCount(col("text")).as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w).cast(LongType))
      .withColumn("pack_no", expr("(cum_tokens - n_tokens) div 2048").cast(LongType))
      .groupBy(col("bucket"), col("pack_no"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("n_tokens")).cast(LongType).as("pack_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("doc_id"), col("text")))),
          s => s("text")), " ").as("seq_text"))
      .orderBy("bucket", "pack_no")
  }

  val packSequencesOracle: String =
    s"""WITH b AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, text,
       |    CAST((${DuckSql.hash60("text")}) % 100 AS BIGINT) AS bucket,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |c AS (SELECT doc_id, text, bucket, n_tokens,
       |    CAST(sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM b),
       |p AS (SELECT doc_id, text, bucket, n_tokens,
       |    CAST((cum_tokens - n_tokens) // 2048 AS BIGINT) AS pack_no
       |  FROM c)
       |SELECT bucket, pack_no, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_tokens) AS BIGINT) AS pack_tokens,
       |  string_agg(text, ' ' ORDER BY doc_id) AS seq_text
       |FROM p GROUP BY bucket, pack_no ORDER BY bucket, pack_no""".stripMargin

  /** Inference/training batch padding waste: batches of 8 docs padded
    * to the batch max length, under two batching orders — arrival
    * (doc_id) vs length-sorted — the measurement behind length-bucketed
    * batching (the sorted strategy's waste_ppm is the achievable
    * floor). Global positions come from [[graft.operators.Shuffle
    * .globalRankBy]] (bucket-decomposed rank, no single-partition
    * window); the token-count scan materializes once and feeds both
    * strategies. Exact integer ppm.
    */
  def batchPadding(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Shuffle
    val d = docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        TextStats.bpeishTokenCount(col("text")).as("n_tokens"))
      .localCheckpoint(true) // feeds both strategies (rank offsets + join, ×2)
    def waste(ranked: DataFrame, label: String): DataFrame =
      ranked.withColumn("batch", expr("(pos - 1) div 8"))
        .groupBy(col("batch"))
        .agg(max(col("n_tokens")).as("mx"), sum(col("n_tokens")).as("sm"),
          count(lit(1)).as("n"))
        .agg(count(lit(1)).cast(LongType).as("n_batches"),
          sum(col("sm")).cast(LongType).as("real_tokens"),
          sum(col("mx") * col("n") - col("sm")).cast(LongType).as("padded_tokens"))
        .select(lit(label).as("strategy"), col("n_batches"), col("real_tokens"),
          col("padded_tokens"),
          expr("(1000000 * padded_tokens) div (real_tokens + padded_tokens)")
            .cast(LongType).as("waste_ppm"))
    val arrival = Shuffle.globalRankBy(d, "doc_id", domainBits = 40,
      tieBreak = "doc_id", posCol = "pos")
    val bySize = Shuffle.globalRankBy(d, "n_tokens", domainBits = 30,
      tieBreak = "doc_id", posCol = "pos")
    waste(arrival, "arrival").unionAll(waste(bySize, "length_sorted"))
      .orderBy("strategy")
  }

  val batchPaddingOracle: String =
    s"""WITH d AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\\s]')) AS BIGINT) AS n_tokens
       |  FROM documents),
       |ra AS (SELECT n_tokens, row_number() OVER (ORDER BY doc_id) AS pos FROM d),
       |rs AS (SELECT n_tokens, row_number() OVER (ORDER BY n_tokens, doc_id) AS pos FROM d),
       |ba AS (SELECT (pos - 1) // 8 AS batch, max(n_tokens) AS mx,
       |    sum(n_tokens) AS sm, count(*) AS n FROM ra GROUP BY 1),
       |bs AS (SELECT (pos - 1) // 8 AS batch, max(n_tokens) AS mx,
       |    sum(n_tokens) AS sm, count(*) AS n FROM rs GROUP BY 1),
       |wa AS (SELECT 'arrival' AS strategy, CAST(count(*) AS BIGINT) AS n_batches,
       |    CAST(sum(sm) AS BIGINT) AS real_tokens,
       |    CAST(sum(mx * n - sm) AS BIGINT) AS padded_tokens FROM ba),
       |ws AS (SELECT 'length_sorted' AS strategy, CAST(count(*) AS BIGINT) AS n_batches,
       |    CAST(sum(sm) AS BIGINT) AS real_tokens,
       |    CAST(sum(mx * n - sm) AS BIGINT) AS padded_tokens FROM bs),
       |u AS (SELECT * FROM wa UNION ALL SELECT * FROM ws)
       |SELECT strategy, n_batches, real_tokens, padded_tokens,
       |  CAST((1000000 * padded_tokens) // (real_tokens + padded_tokens) AS BIGINT) AS waste_ppm
       |FROM u ORDER BY strategy""".stripMargin

  /** PII scrubbing: every 3rd doc gets a deterministic email + URL
    * appended (the synthetic corpus has none), then the scrubber
    * redacts and counts them. Both the planting and the redaction are
    * part of the query on both engines.
    */
  def redactPii(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Redact
    val planted = docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" contact user"), col("doc_id"),
            lit("@example.com via https://example.com/u/"), col("doc_id")))
          .otherwise(col("text")).as("text"))
    planted.select(col("doc_id"),
        Redact.countEmails(col("text")).as("n_emails"),
        Redact.countUrls(col("text")).as("n_urls"),
        Redact.scrub(col("text")).as("clean_text"))
      .orderBy("doc_id")
  }

  val redactPiiOracle: String =
    s"""WITH planted AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CASE WHEN doc_id % 3 = 0
       |      THEN text || ' contact user' || CAST(doc_id AS VARCHAR) ||
       |        '@example.com via https://example.com/u/' || CAST(doc_id AS VARCHAR)
       |      ELSE text END AS text
       |  FROM documents)
       |SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '${graft.operators.Redact.EmailRe}')) AS BIGINT) AS n_emails,
       |  CAST(len(regexp_extract_all(text, '${graft.operators.Redact.UrlRe}')) AS BIGINT) AS n_urls,
       |  regexp_replace(regexp_replace(text, '${graft.operators.Redact.EmailRe}', '<EMAIL>', 'g'),
       |    '${graft.operators.Redact.UrlRe}', '<URL>', 'g') AS clean_text
       |FROM planted ORDER BY doc_id""".stripMargin

  /** Luhn-validated card-number detection
    * ([[graft.operators.Redact.countCardNumbers]]): every 50th doc
    * gets a VALID test card planted (4111-...-1111 passes Luhn), every
    * 70th an INVALID card-shaped number — the count must accept the
    * first and reject the second, per-doc over the whole corpus.
    */
  def cardNumbers(spark: SparkSession, dir: String): DataFrame = {
    import graft.operators.Redact
    val planted = docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        when(col("doc_id") % 50 === 0,
          concat(col("text"), lit(" card 4111 1111 1111 1111 ok")))
          .when(col("doc_id") % 70 === 0,
            concat(col("text"), lit(" num 1234 5678 9012 3456 x")))
          .otherwise(col("text")).as("text"))
    planted.select(col("doc_id"),
        Redact.countCardNumbers(col("text")).as("n_cards"))
      .orderBy("doc_id")
  }

  val cardNumbersOracle: String = {
    val shape = graft.operators.Redact.CardShapeRe
    s"""WITH planted AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    CASE WHEN doc_id % 50 = 0 THEN text || ' card 4111 1111 1111 1111 ok'
       |         WHEN doc_id % 70 = 0 THEN text || ' num 1234 5678 9012 3456 x'
       |         ELSE text END AS text
       |  FROM documents),
       |cand AS (SELECT doc_id,
       |    list_transform(regexp_extract_all(text, '$shape'),
       |      c -> regexp_replace(c, '[^0-9]', '', 'g')) AS cards
       |  FROM planted)
       |SELECT doc_id, CAST(len(list_filter(cards, ds ->
       |    len(ds) BETWEEN 13 AND 19 AND
       |    list_sum(list_transform(range(1, len(ds) + 1), i ->
       |      CASE WHEN i % 2 = 0
       |        THEN CASE WHEN 2 * CAST(reverse(ds)[i] AS INTEGER) > 9
       |          THEN 2 * CAST(reverse(ds)[i] AS INTEGER) - 9
       |          ELSE 2 * CAST(reverse(ds)[i] AS INTEGER) END
       |        ELSE CAST(reverse(ds)[i] AS INTEGER) END)) % 10 = 0))
       |  AS BIGINT) AS n_cards
       |FROM cand ORDER BY doc_id""".stripMargin
  }

  // ---- text analysis ------------------------------------------------

  def langId(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"),
        TextStats.langId(col("text")).as("lang_pred"))
      .orderBy("doc_id")

  val langIdOracle: String = {
    val t = DuckSql.tokens("text")
    val hits = TextStats.stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      s"${DuckSql.hitCount("toks", words)} AS h_$lang"
    }.mkString(",\n  ")
    s"""WITH t AS (SELECT doc_id, lang, $t AS toks FROM documents),
       |scored AS (SELECT doc_id, lang, $hits FROM t)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
       |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
       |       WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
       |       WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
       |       WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
       |       ELSE 'fr' END AS lang_pred
       |FROM scored ORDER BY doc_id""".stripMargin
  }

  def quality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        TextStats.quality(col("text")).as("q"))
      .select(col("doc_id"), col("q.n_chars").as("n_chars"),
        col("q.n_tokens").as("n_tokens"), col("q.mean_token_len").as("mean_token_len"),
        col("q.punct_ratio").as("punct_ratio"), col("q.stopword_ratio").as("stopword_ratio"),
        col("q.quality_score").as("quality_score"))
      .orderBy("doc_id")

  val qualityOracle: String = {
    val t = DuckSql.tokens("text")
    val allStop = TextStats.stopwords.values.flatten.toSeq.distinct.sorted
    s"""WITH t AS (SELECT doc_id,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len($t) AS BIGINT) AS n_tokens,
       |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS alnum,
       |    CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS spaces,
       |    CAST(${DuckSql.hitCount(t, allStop)} AS BIGINT) AS stop_hits
       |  FROM documents),
       |m AS (SELECT doc_id, n_chars, n_tokens, alnum, spaces, stop_hits,
       |    CASE WHEN n_tokens > 0 THEN CAST(alnum AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS mean_token_len,
       |    CASE WHEN n_chars > 0 THEN CAST(n_chars - alnum - spaces AS DOUBLE) / CAST(n_chars AS DOUBLE) ELSE 0.0 END AS punct_ratio,
       |    CASE WHEN n_tokens > 0 THEN CAST(stop_hits AS DOUBLE) / CAST(n_tokens AS DOUBLE) ELSE 0.0 END AS stopword_ratio
       |  FROM t)
       |SELECT CAST(doc_id AS BIGINT) AS doc_id, n_chars, n_tokens, mean_token_len,
       |  punct_ratio, stopword_ratio,
       |  ${DuckSql.qualityScoreFromCounts("n_chars", "n_tokens", "alnum", "spaces", "stop_hits")} AS quality_score
       |FROM m ORDER BY doc_id""".stripMargin
  }

  def tokenCounts(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        TextStats.wsTokenCount(col("text")).as("ws_tokens"),
        TextStats.bpeishTokenCount(col("text")).as("bpeish_tokens"),
        length(col("text")).cast(LongType).as("n_chars"))
      .orderBy("doc_id")

  val tokenCountsOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |  CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS ws_tokens,
       |  CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpeish_tokens,
       |  CAST(length(text) AS BIGINT) AS n_chars
       |FROM documents ORDER BY doc_id""".stripMargin

  /** Corpus curation report: per (predicted language, split) — doc
    * count, total whitespace tokens, total chars, quality min/max. One
    * narrow pass + one grouped aggregation; every measure is an exact
    * integer sum or an order statistic (no double summation, whose
    * order-dependence would break cross-engine hashing).
    */
  def corpusReport(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        TextStats.langId(col("text")).as("lang_pred"),
        graft.operators.Sampling.splitLabel(
          graft.operators.Sampling.hashBucket(col("text"), 1000), 90, 5).as("split"),
        TextStats.wsTokenCount(col("text")).as("ws"),
        length(col("text")).cast(LongType).as("nc"),
        TextStats.quality(col("text")).getField("quality_score").as("qs"))
      .groupBy(col("lang_pred"), col("split"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        sum(col("ws")).cast(LongType).as("total_tokens"),
        sum(col("nc")).cast(LongType).as("total_chars"),
        min(col("qs")).as("min_quality"),
        max(col("qs")).as("max_quality"))
      .orderBy("lang_pred", "split")

  val corpusReportOracle: String = {
    val t = DuckSql.tokens("text")
    val hits = TextStats.stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      s"${DuckSql.hitCount("toks", words)} AS h_$lang"
    }.mkString(",\n  ")
    val allStop = TextStats.stopwords.values.flatten.toSeq.distinct.sorted
    s"""WITH t AS (SELECT text, $t AS toks FROM documents),
       |scored AS (SELECT text, toks, $hits FROM t),
       |lang AS (SELECT text, toks,
       |  CASE WHEN greatest(h_de, h_en, h_es, h_fr) = 0 THEN 'und'
       |       WHEN h_de = greatest(h_de, h_en, h_es, h_fr) THEN 'de'
       |       WHEN h_en = greatest(h_de, h_en, h_es, h_fr) THEN 'en'
       |       WHEN h_es = greatest(h_de, h_en, h_es, h_fr) THEN 'es'
       |       ELSE 'fr' END AS lang_pred
       |  FROM scored),
       |m AS (SELECT lang_pred,
       |    CASE WHEN (${DuckSql.hash60("text")}) % 1000 < 900 THEN 'train'
       |         WHEN (${DuckSql.hash60("text")}) % 1000 < 950 THEN 'validation'
       |         ELSE 'test' END AS split,
       |    CAST(len(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS BIGINT) AS ws,
       |    CAST(length(text) AS BIGINT) AS nc,
       |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS alnum,
       |    CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS spaces,
       |    CAST(len(toks) AS BIGINT) AS n_tokens,
       |    CAST(${DuckSql.hitCount("toks", allStop)} AS BIGINT) AS stop_hits
       |  FROM lang),
       |q AS (SELECT lang_pred, split, ws, nc,
       |    ${DuckSql.qualityScoreFromCounts("nc", "n_tokens", "alnum", "spaces", "stop_hits")} AS qs
       |  FROM m)
       |SELECT lang_pred, split, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(ws) AS BIGINT) AS total_tokens,
       |  CAST(sum(nc) AS BIGINT) AS total_chars,
       |  min(qs) AS min_quality, max(qs) AS max_quality
       |FROM q GROUP BY lang_pred, split ORDER BY lang_pred, split""".stripMargin
  }

  def fingerprints(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"),
        RollingHash.rolling_hash(col("text")).as("fingerprint"))
      .orderBy("doc_id")

  val fingerprintsOracle: String =
    """SELECT CAST(doc_id AS BIGINT) AS doc_id,
      |  CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(string_split(text, ''), c -> CAST(ord(c) AS BIGINT))),
      |    (acc, x) -> (acc * 31 + x) % 1000000007) AS BIGINT) AS fingerprint
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Stratified quality sampling: per LANGUAGE, keep the top 20% of
    * docs by (quality_score desc, doc_id) —
    * [[graft.operators.Sampling.stratifiedTopPct]]'s proportional
    * per-stratum retention, vs [[qualitySample]]'s global threshold
    * (which lets a dominant language crowd out the rest).
    */
  def stratifiedSample(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"),
        TextStats.quality(col("text")).getField("quality_score").as("quality_score"))
    graft.operators.Sampling.stratifiedTopPct(d, "lang", "doc_id", "quality_score", 20)
      .orderBy("lang", "stratum_rank")
  }

  val stratifiedSampleOracle: String = {
    val t = DuckSql.tokens("text")
    val allStop = TextStats.stopwords.values.flatten.toSeq.distinct.sorted
    s"""WITH t AS (SELECT doc_id, lang,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len($t) AS BIGINT) AS n_tokens,
       |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS alnum,
       |    CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS spaces,
       |    CAST(${DuckSql.hitCount(t, allStop)} AS BIGINT) AS stop_hits
       |  FROM documents),
       |q AS (SELECT doc_id, lang,
       |    ${DuckSql.qualityScoreFromCounts("n_chars", "n_tokens", "alnum", "spaces", "stop_hits")} AS quality_score
       |  FROM t),
       |r AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, quality_score,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY quality_score DESC, doc_id) AS BIGINT) AS stratum_rank,
       |    count(*) OVER (PARTITION BY lang) AS cnt
       |  FROM q)
       |SELECT doc_id, lang, quality_score, stratum_rank FROM r
       |WHERE stratum_rank <= CAST(ceil(cnt * 20 / 100.0) AS BIGINT)
       |ORDER BY lang, stratum_rank""".stripMargin
  }

  /** Cross-lingual quality calibration: within each language, the
    * quality score is replaced by its integer percent-rank in ppm
    * (`(rank-1)·1e6 div (n-1)`; single-doc stratum pins to the
    * midpoint) — so a "top-10%-German" doc and a "top-10%-French" doc
    * carry the SAME calibrated score even when the raw distributions
    * differ. The quantile-mapping step before any cross-language
    * quality threshold. The per-language rank is
    * [[graft.operators.Shuffle.groupedRank]]'s range-decomposed rank
    * (a per-language window would serialize each language onto one
    * task at 100 TB); the per-language count arrives as a broadcast
    * join. Exact integer arithmetic end to end.
    */
  def qualityCalibrated(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("lang"),
        TextStats.quality(col("text")).getField("quality_score").as("quality_score"))
    // null-safe count join (<=>): the oracle's PARTITION BY lang window
    // keeps NULL-lang rows as their own stratum — an equality join
    // would silently drop them (groupedRank already groups null-safe)
    val n = d.groupBy("lang").agg(count(lit(1)).cast(LongType).as("n_l"))
      .withColumnRenamed("lang", "__lang_key")
    graft.operators.Shuffle.groupedRank(
        d, Seq("lang"), Seq("quality_score", "doc_id"), "rk")
      .join(broadcast(n), col("lang") <=> col("__lang_key"))
      .drop("__lang_key")
      .withColumn("pr_ppm",
        when(col("n_l") === 1, 500000L)
          .otherwise(expr("((rk - 1) * 1000000) div (n_l - 1)")))
      .select(col("doc_id"), col("lang"), col("quality_score"), col("pr_ppm"))
      .orderBy("doc_id")
  }

  val qualityCalibratedOracle: String = {
    val t = DuckSql.tokens("text")
    val allStop = TextStats.stopwords.values.flatten.toSeq.distinct.sorted
    s"""WITH t AS (SELECT doc_id, lang,
       |    CAST(length(text) AS BIGINT) AS n_chars,
       |    CAST(len($t) AS BIGINT) AS n_tokens,
       |    CAST(length(regexp_replace(lower(text), '[^a-z0-9]', '', 'g')) AS BIGINT) AS alnum,
       |    CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS BIGINT) AS spaces,
       |    CAST(${DuckSql.hitCount(t, allStop)} AS BIGINT) AS stop_hits
       |  FROM documents),
       |q AS (SELECT doc_id, lang,
       |    ${DuckSql.qualityScoreFromCounts("n_chars", "n_tokens", "alnum", "spaces", "stop_hits")} AS quality_score
       |  FROM t),
       |r AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, quality_score,
       |    CAST(row_number() OVER (PARTITION BY lang ORDER BY quality_score, doc_id) AS BIGINT) AS rk,
       |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n_l
       |  FROM q)
       |SELECT doc_id, lang, quality_score,
       |  CASE WHEN n_l = 1 THEN 500000
       |       ELSE ((rk - 1) * 1000000) // (n_l - 1) END AS pr_ppm
       |FROM r ORDER BY doc_id""".stripMargin
  }

  /** Token-length distribution per language: exact continuous
    * percentiles (both engines implement the same R-7 linear
    * interpolation, so the doubles match on exact-integer inputs).
    * One grouped aggregation; Spark's exact `percentile` keeps a
    * value→count map per group — fine for bounded-cardinality strata;
    * `approx_percentile` (t-digest, mergeable) is the drop-in for
    * open-ended groups at 100 TB.
    */
  def lengthQuantiles(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(col("lang"), TextStats.wsTokenCount(col("text")).as("ws"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast(LongType).as("n_docs"),
        round(percentile(col("ws"), lit(0.5)), 6).as("p50_tokens"),
        round(percentile(col("ws"), lit(0.9)), 6).as("p90_tokens"),
        round(percentile(col("ws"), lit(0.99)), 6).as("p99_tokens"),
        max(col("ws")).cast(LongType).as("max_tokens"))
      .orderBy("lang")

  val lengthQuantilesOracle: String =
    """WITH t AS (SELECT lang,
      |    CAST(len(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS BIGINT) AS ws
      |  FROM documents)
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(quantile_cont(ws, 0.5), 6) AS p50_tokens,
      |  round(quantile_cont(ws, 0.9), 6) AS p90_tokens,
      |  round(quantile_cont(ws, 0.99), 6) AS p99_tokens,
      |  CAST(max(ws) AS BIGINT) AS max_tokens
      |FROM t GROUP BY lang ORDER BY lang""".stripMargin

  /** Document chunking: 64-token windows every 48 tokens (16-token
    * overlap) — the sequence-prep step feeding [[packAssign]].
    */
  def chunkDocs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.Chunk.chunkDocs(docs(spark, dir), "doc_id", "text",
        chunkTokens = 64, stride = 48)
      .orderBy("doc_id", "chunk_no")

  val chunkDocsOracle: String = {
    val t = DuckSql.tokens("text")
    s"""WITH tok AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, $t AS t FROM documents),
       |k AS (SELECT doc_id, t,
       |    CASE WHEN len(t) > 64 THEN CAST(ceil((len(t) - 64) / 48.0) AS BIGINT)
       |         ELSE 0 END AS kmax
       |  FROM tok),
       |e AS (SELECT doc_id, t, unnest(range(0, kmax + 1)) AS i FROM k)
       |SELECT doc_id, CAST(i AS BIGINT) AS chunk_no,
       |  array_to_string(t[i*48 + 1 : i*48 + 64], ' ') AS chunk_text,
       |  CAST(least(64, len(t) - i*48) AS BIGINT) AS chunk_tokens
       |FROM e ORDER BY doc_id, chunk_no""".stripMargin
  }

  /** Temperature resampling (alpha = 0.5): per-language keep rate
    * proportional to sqrt(corpus share) / share — the multilingual
    * rebalancing that boosts low-resource languages. Budget = n_tot/5
    * docs; language l targets share w_l / z with INTEGER weights
    * w_l = floor(sqrt(n_l)) and z = Σ w_l, so the whole threshold
    * `keep_buckets = (1000 * n_tot * w_l) div (5 * z * n_l)` is exact
    * BIGINT arithmetic — no cross-engine floating-point at all
    * (floor(sqrt(int)) is safe below 2^52: IEEE sqrt is correctly
    * rounded). The BIGINT product bounds the corpus at ~10^12 docs per
    * run; past that, rearrange to doubles and accept ulp risk.
    * Keep rule: content-hash bucket < keep_buckets — deterministic and
    * stable under re-sharding like every sampler here.
    */
  def temperatureSample(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id").cast(LongType).as("doc_id"),
      col("lang"), col("text"))
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).cast(LongType).as("n_l"))
      .withColumn("w_l", floor(sqrt(col("n_l").cast(DoubleType))).cast(LongType))
    val tot = counts.agg(sum(col("w_l")).cast(LongType).as("z"),
      sum(col("n_l")).cast(LongType).as("n_tot"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("keep_buckets",
        expr("(1000 * n_tot * w_l) div (5 * z * n_l)"))
    d.join(broadcast(rates.select(col("lang"), col("keep_buckets"))), Seq("lang"))
      .filter(graft.operators.Sampling.hashBucket(col("text"), 1000) < col("keep_buckets"))
      .select(col("doc_id"), col("lang"), col("keep_buckets"))
      .orderBy("doc_id")
  }

  val temperatureSampleOracle: String =
    s"""WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n_l,
       |    CAST(floor(sqrt(CAST(count(*) AS DOUBLE))) AS BIGINT) AS w_l
       |  FROM documents GROUP BY lang),
       |z AS (SELECT CAST(sum(w_l) AS BIGINT) AS z, CAST(sum(n_l) AS BIGINT) AS n_tot FROM c),
       |r AS (SELECT lang, (1000 * n_tot * w_l) // (5 * z * n_l) AS keep_buckets
       |  FROM c CROSS JOIN z)
       |SELECT CAST(d.doc_id AS BIGINT) AS doc_id, d.lang, r.keep_buckets
       |FROM documents d JOIN r USING (lang)
       |WHERE (${DuckSql.hash60("text")}) % 1000 < keep_buckets
       |ORDER BY doc_id""".stripMargin

  // ---- within-doc repetition (Gopher-style filters) ----------------

  /** Repetition metrics over documents ∪ self-doubled copies (every 7th
    * doc re-emitted as `text || ' ' || text` under id+3000000) — the
    * planted rows exercise the high-duplication regime the filter
    * exists to catch; planting is part of the query on both engines.
    */
  def repetitionReport(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    val corpus = d.unionAll(d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 3000000L).as("doc_id"),
        concat_ws(" ", col("text"), col("text")).as("text")))
    corpus.select(col("doc_id"), TextStats.repetition(col("text")).as("r"))
      .select(col("doc_id"), col("r.n_tokens").as("n_tokens"),
        col("r.distinct_token_ratio").as("distinct_token_ratio"),
        col("r.dup_2gram_frac").as("dup_2gram_frac"),
        col("r.dup_3gram_frac").as("dup_3gram_frac"))
      .orderBy("doc_id")
  }

  val repetitionReportOracle: String = {
    val t = DuckSql.tokens("text")
    val s2 = DuckSql.shinglesFromTokens("t", 2)
    val s3 = DuckSql.shinglesFromTokens("t", 3)
    s"""WITH corpus AS (
       |  SELECT CAST(doc_id AS BIGINT) AS doc_id, text FROM documents
       |  UNION ALL
       |  SELECT CAST(doc_id + 3000000 AS BIGINT), text || ' ' || text
       |  FROM documents WHERE doc_id % 7 = 0),
       |tok AS (SELECT doc_id, $t AS t FROM corpus),
       |sh AS (SELECT doc_id, t, $s2 AS s2, $s3 AS s3 FROM tok)
       |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
       |  CASE WHEN len(t) > 0
       |    THEN round(CAST(len(list_distinct(t)) AS DOUBLE) / len(t), 6)
       |    ELSE CAST(1.0 AS DOUBLE) END AS distinct_token_ratio,
       |  round(CAST(len(s2) - len(list_distinct(s2)) AS DOUBLE) / len(s2), 6) AS dup_2gram_frac,
       |  round(CAST(len(s3) - len(list_distinct(s3)) AS DOUBLE) / len(s3), 6) AS dup_3gram_frac
       |FROM sh ORDER BY doc_id""".stripMargin
  }

  // ---- eval-set decontamination ------------------------------------

  /** Contamination scan: benchmark = every 50th document (a stand-in
    * eval set, broadcast); corpus = documents ∪ near-dup copies. The
    * planted near-dups of benchmark docs (50 | id ⇒ 10 | id) are the
    * contamination the scan must find; exact self-copies are excluded
    * by id.
    */
  def decontaminate(spark: SparkSession, dir: String): DataFrame = {
    val bench = docs(spark, dir).filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").cast(LongType).as("doc_id"), col("text"))
    TextDedup.contaminationCheck(
        corpusNear(spark, dir), "doc_id", "text", bench, "doc_id", "text")
      .orderBy("doc_id", "bench_id")
  }

  val decontaminateOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"))
    val sset = s"list_distinct(list_transform($sh, x -> ${DuckSql.hash60("x")}))"
    s"""WITH corpus AS ($corpusNearSql),
       |csets AS (SELECT doc_id, $sset AS sset FROM corpus),
       |bsets AS (SELECT CAST(doc_id AS BIGINT) AS bench_id, $sset AS bset
       |  FROM documents WHERE doc_id % 50 = 0),
       |cx AS (SELECT doc_id, unnest(sset) AS h FROM csets),
       |bx AS (SELECT bench_id, CAST(len(bset) AS BIGINT) AS bench_size, unnest(bset) AS h FROM bsets)
       |SELECT cx.doc_id, bx.bench_id,
       |  CAST(count(*) AS BIGINT) AS n_shared,
       |  round(CAST(count(*) AS DOUBLE) / bench_size, 6) AS containment
       |FROM cx JOIN bx USING (h)
       |WHERE cx.doc_id <> bx.bench_id
       |GROUP BY cx.doc_id, bx.bench_id, bench_size
       |HAVING round(CAST(count(*) AS DOUBLE) / bench_size, 6) >= 0.5
       |ORDER BY doc_id, bench_id""".stripMargin
  }

  /** Contamination span audit ([[TextDedup.contaminationSpans]]): same
    * benchmark (every 50th doc) and corpus (documents ∪ perturbed
    * copies) as [[decontaminate]], minus the benchmark originals
    * themselves — each remaining doc that shares any shingle reports
    * its longest consecutive contaminated run. The planted copies
    * surface with near-total spans; docs sharing only scattered common
    * trigrams stay at `max_run` ~1.
    */
  def contamSpan(spark: SparkSession, dir: String): DataFrame = {
    val bench = docs(spark, dir).filter(col("doc_id") % 50 === 0).select(col("text"))
    val corpus = corpusNear(spark, dir)
      .filter(!(col("doc_id") % 50 === 0 && col("doc_id") < 1000000L))
    TextDedup.contaminationSpans(corpus, "doc_id", "text", bench, "text")
      .orderBy("doc_id")
  }

  val contamSpanOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"))
    s"""WITH corpus AS ($corpusNearSql),
       |filt AS (SELECT * FROM corpus
       |  WHERE NOT (doc_id % 50 = 0 AND doc_id < 1000000)),
       |shl AS (SELECT doc_id, $sh AS sh FROM filt),
       |pos AS (SELECT doc_id, CAST(len(sh) AS BIGINT) AS n_shingles, i,
       |    ${DuckSql.hash60("sh[i]")} AS h
       |  FROM shl CROSS JOIN LATERAL (SELECT unnest(range(1, len(sh) + 1)) AS i) r),
       |bset AS (SELECT DISTINCT ${DuckSql.hash60("s")} AS h FROM (
       |    SELECT unnest($sh) AS s FROM documents WHERE doc_id % 50 = 0) b),
       |hits AS (SELECT pos.doc_id, pos.i FROM pos JOIN bset USING (h)),
       |runs AS (SELECT doc_id,
       |    i - row_number() OVER (PARTITION BY doc_id ORDER BY i) AS grp
       |  FROM hits),
       |rl AS (SELECT doc_id, grp, CAST(count(*) AS BIGINT) AS run
       |  FROM runs GROUP BY 1, 2),
       |agg AS (SELECT doc_id, CAST(sum(run) AS BIGINT) AS n_contaminated,
       |    CAST(max(run) AS BIGINT) AS max_run FROM rl GROUP BY 1),
       |tot AS (SELECT doc_id, CAST(max(n_shingles) AS BIGINT) AS n_shingles
       |  FROM pos GROUP BY 1)
       |SELECT tot.doc_id, tot.n_shingles, agg.n_contaminated,
       |  1000000 * agg.n_contaminated // tot.n_shingles AS contam_ppm,
       |  agg.max_run
       |FROM tot JOIN agg USING (doc_id) ORDER BY doc_id""".stripMargin
  }

  // ---- winnowing fingerprints (MOSS; SIGMOD'03) --------------------

  /** Winnowed (k=8, w=4) fingerprint selections over the first 50 docs
    * ([[graft.operators.Winnow.fingerprints]]): per-row native deque
    * selection, no shuffle. The oracle replays the selection as the
    * per-window rightmost-min group-by with packed keys — a different
    * spelling of the same function, pinned equivalent in WinnowSpec.
    */
  def winnowFingerprints(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).filter(col("doc_id") < 50)
    graft.operators.Winnow.fingerprints(d, "doc_id", "text", k = 8, w = 4)
      .orderBy("doc_id", "pos")
  }

  /** The winnowing selection in DuckDB: explode windows, group to the
    * rightmost-min per window (packed key `h*4 + (we-1-offset)`),
    * distinct selected (pos, fp).
    */
  private def winnowFpSql(sourceSql: String): String = {
    val sh = DuckSql.shinglesFromTokens("toks", 8)
    s"""base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, ${DuckSql.tokens("text")} AS toks
       |  FROM ($sourceSql) src),
       |hl AS (SELECT doc_id,
       |    list_transform($sh, s -> CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT)) AS hs
       |  FROM base),
       |hh AS (SELECT doc_id, len(hs) AS p, least(4, len(hs)) AS we,
       |    unnest(hs) AS h, generate_subscripts(hs, 1) AS pos FROM hl),
       |ex AS (SELECT doc_id, pos, h, we, pos - o.o AS s
       |  FROM hh CROSS JOIN (SELECT unnest(range(0, 4)) AS o) o
       |  WHERE pos - o.o >= 1 AND pos - o.o <= p - we + 1),
       |sel AS (SELECT doc_id, s, we, min(h * 4 + (we - 1 - (pos - s))) AS key
       |  FROM ex GROUP BY doc_id, s, we),
       |fps AS (SELECT DISTINCT doc_id,
       |    CAST(s + we - 1 - (key % 4) AS BIGINT) AS pos,
       |    CAST(key // 4 AS BIGINT) AS fp
       |  FROM sel)""".stripMargin
  }

  val winnowFingerprintsOracle: String =
    s"""WITH ${winnowFpSql("SELECT doc_id, text FROM documents WHERE doc_id < 50")}
       |SELECT doc_id, pos, fp FROM fps ORDER BY doc_id, pos""".stripMargin

  /** Document pairs sharing >= 6 distinct winnow fingerprints
    * ([[graft.operators.Winnow.sharedPairs]]) — local-overlap
    * detection: shared verbatim runs of k+w-1 = 11 tokens are
    * guaranteed to surface. One fingerprint-keyed shuffle with the
    * LSH-style bucket cap.
    */
  def winnowPairs(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    graft.operators.Winnow.sharedPairs(d, "doc_id", "text", k = 8, w = 4, minShared = 6L)
      .orderBy("id_a", "id_b")
  }

  /** Sorted-neighborhood near-dup pairs
    * ([[graft.operators.SetJoin.snmPairs]], bag-of-words key, window 3,
    * J >= 1/2): O(n·window) candidates regardless of skew — the
    * blocking family that trades key-dependent recall for a hard
    * candidate bound (~85% of the exact PPJoin pairs on this corpus).
    */
  def snmPairs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SetJoin.snmPairs(
        corpusNear(spark, dir), "doc_id", "text", w = 3, window = 3,
        tNum = 1, tDen = 2)
      .orderBy("id_a", "id_b")

  val snmPairsOracle: String = {
    val sh = DuckSql.shinglesFromTokens("toks", 3)
    val h = DuckSql.hash60("x")
    s"""WITH corpus AS ($corpusNearSql),
       |base AS (SELECT CAST(doc_id AS BIGINT) AS doc_id, ${DuckSql.tokens("text")} AS toks
       |  FROM corpus),
       |s AS (SELECT doc_id,
       |    list_distinct(list_transform($sh, x -> $h)) AS ss,
       |    array_to_string(list_sort(toks), ' ') AS k
       |  FROM base),
       |r AS (SELECT doc_id, ss,
       |    row_number() OVER (ORDER BY k, doc_id) AS pos FROM s),
       |cand AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       |    CAST(len(list_intersect(a.ss, b.ss)) AS BIGINT) AS inter,
       |    CAST(len(a.ss) + len(b.ss) - len(list_intersect(a.ss, b.ss)) AS BIGINT) AS uni
       |  FROM r a JOIN r b ON b.pos BETWEEN a.pos + 1 AND a.pos + 3)
       |SELECT least(id_a, id_b) AS id_a, greatest(id_a, id_b) AS id_b,
       |  round(CAST(inter AS DOUBLE) / CAST(uni AS DOUBLE), 6) AS jaccard
       |FROM cand WHERE inter * 2 >= uni * 1
       |ORDER BY id_a, id_b""".stripMargin
  }

  /** Content-defined chunking duplication report
    * ([[graft.operators.CdcChunk]], mod=16): hash-positioned chunk
    * boundaries re-align after edits, so the planted perturbed docs
    * share most chunks with their originals — the storage-dedup /
    * byte-level-dedup signal fixed strides can't give.
    */
  def cdcChunks(spark: SparkSession, dir: String): DataFrame =
    graft.operators.CdcChunk.dupReport(
        corpusNear(spark, dir), "doc_id", "text", mod = 16)
      .orderBy("doc_id")

  val cdcChunksOracle: String = {
    val t = DuckSql.tokens("text")
    val hTok = DuckSql.hash60("t")
    s"""WITH corpus AS ($corpusNearSql),
       |hl AS (SELECT CAST(doc_id AS BIGINT) AS doc_id,
       |    list_transform($t, t -> $hTok) AS hs
       |  FROM corpus),
       |p AS (SELECT doc_id, generate_subscripts(hs, 1) AS pos, unnest(hs) AS h
       |  FROM hl),
       |b AS (SELECT doc_id, pos, h,
       |    CASE WHEN h % 16 = 0 THEN 1 ELSE 0 END AS boundary FROM p),
       |c AS (SELECT doc_id, pos, h,
       |    coalesce(sum(boundary) OVER (PARTITION BY doc_id ORDER BY pos
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS chunk_no
       |  FROM b),
       |ch AS (SELECT doc_id, chunk_no,
       |    CAST(count(*) AS BIGINT) AS n_tokens,
       |    CAST(('0x' || substring(md5(string_agg(CAST(h AS VARCHAR), '|' ORDER BY pos)), 1, 15)) AS BIGINT) AS chunk_hash
       |  FROM c GROUP BY doc_id, chunk_no),
       |f AS (SELECT chunk_hash, count(*) AS n_slots FROM ch GROUP BY chunk_hash)
       |SELECT ch.doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
       |  CAST(sum(CASE WHEN f.n_slots > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       |  CAST(sum(CASE WHEN f.n_slots > 1 THEN 1 ELSE 0 END) * 1000000
       |    // count(*) AS BIGINT) AS dup_ppm
       |FROM ch JOIN f USING (chunk_hash)
       |GROUP BY ch.doc_id ORDER BY doc_id""".stripMargin
  }

  /** Containment pairs over the near-dup corpus
    * ([[graft.operators.SetJoin.containmentPairs]], w=8, t=4/5): the
    * planted perturbed docs (first two tokens dropped) are full shingle
    * SUBSETS of their originals — Jaccard sees ~0.9, containment sees
    * 1.0, and the keep-superset policy needs the latter.
    */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    graft.operators.SetJoin.containmentPairs(
        corpusNear(spark, dir), "doc_id", "text", w = 8, tNum = 4, tDen = 5)
      .orderBy("id_a", "id_b")

  val containmentPairsOracle: String = {
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"), 8)
    val h = DuckSql.hash60("x")
    // candidates replay the engine's capped posting buckets
    // (TextDedup.bucketedPairs over the h key, cap 256) — the naive
    // full posting self-join diverges exactly when a hot posting list
    // engages the cap (found by the skew-torture gate: 4.5M naive pairs
    // vs the engine's 431k capped ones on the boilerplate cluster)
    s"""WITH corpus AS ($corpusNearSql),
       |s AS (SELECT CAST(doc_id AS BIGINT) AS id,
       |    list_sort(list_distinct(list_transform($sh, x -> $h))) AS ss
       |  FROM corpus),
       |crids AS (SELECT ss, min(id) AS rid FROM s GROUP BY ss),
       |cmembers AS (SELECT r.rid, s.id FROM s JOIN crids r ON r.ss = s.ss),
       |creps AS (SELECT rid AS id, ss FROM crids),
       |ex AS (SELECT id, unnest(ss) AS h FROM creps),
       |${DuckSql.cappedPairsCtes("candraw", "ex", Seq("h"))},
       |cand AS (SELECT DISTINCT id_a, id_b FROM candraw),
       |v AS (SELECT id_a, id_b,
       |    CAST(len(list_intersect(sa.ss, sb.ss)) AS BIGINT) AS n_shared,
       |    CAST(len(sa.ss) AS BIGINT) AS na, CAST(len(sb.ss) AS BIGINT) AS nb
       |  FROM cand JOIN creps sa ON sa.id = cand.id_a JOIN creps sb ON sb.id = cand.id_b)
       |SELECT id_a, id_b, n_shared,
       |  CAST(n_shared * 1000000 // na AS BIGINT) AS cont_a_ppm,
       |  CAST(n_shared * 1000000 // nb AS BIGINT) AS cont_b_ppm
       |FROM v
       |WHERE greatest(n_shared * 1000000 // na, n_shared * 1000000 // nb) >= 800000
       |UNION ALL
       |SELECT m.rid AS id_a, m.id AS id_b,
       |  CAST(len(r.ss) AS BIGINT) AS n_shared,
       |  CAST(1000000 AS BIGINT) AS cont_a_ppm,
       |  CAST(1000000 AS BIGINT) AS cont_b_ppm
       |FROM cmembers m JOIN creps r ON r.id = m.rid
       |WHERE m.id <> m.rid
       |ORDER BY id_a, id_b""".stripMargin
  }

  val winnowPairsOracle: String =
    // replays the engine exactly: identical-fp-SET collapse, then
    // per-fp capped buckets over the representatives (the shared count
    // is capped pair OCCURRENCES — one per fp bucket emitting the pair,
    // chain links included), plus identity star pairs with
    // shared = |fp set|
    s"""WITH ${winnowFpSql("SELECT doc_id, text FROM documents")},
       |dfp AS (SELECT DISTINCT doc_id AS id, fp FROM fps),
       |wsets AS (SELECT id, list_sort(list(fp)) AS fpset FROM dfp GROUP BY id),
       |wrids AS (SELECT fpset, min(id) AS rid FROM wsets GROUP BY fpset),
       |wmembers AS (SELECT r.rid, s.id FROM wsets s JOIN wrids r ON r.fpset = s.fpset),
       |wreps AS (SELECT rid AS id, fpset FROM wrids),
       |wrfp AS (SELECT id, unnest(fpset) AS fp FROM wreps),
       |${DuckSql.cappedPairsCtes("wp", "wrfp", Seq("fp"))}
       |SELECT id_a, id_b, CAST(count(*) AS BIGINT) AS shared
       |FROM wp GROUP BY 1, 2 HAVING count(*) >= 6
       |UNION ALL
       |SELECT m.rid AS id_a, m.id AS id_b, CAST(len(r.fpset) AS BIGINT) AS shared
       |FROM wmembers m JOIN wreps r ON r.id = m.rid
       |WHERE m.id <> m.rid AND len(r.fpset) >= 6
       |ORDER BY id_a, id_b""".stripMargin

  // ---- soft dedup: repetition down-weighting -----------------------

  /** Soft dedup — instead of dropping duplicates, every doc carries a
    * sampling weight `1e6 div n_copies` so a text seen n times
    * contributes one doc's worth of expected tokens (the
    * down-weighting alternative to hard removal when near-boundary
    * duplicates carry signal). Over the clone-planted corpus so
    * n_copies > 1 actually occurs. One content-hash-keyed aggregation
    * broadcast back is WRONG at scale (the count table is corpus-sized)
    * — so it's a shuffle join on the hash key, map-side combined.
    */
  def softDedupWeights(spark: SparkSession, dir: String): DataFrame = {
    val corpus = corpusExact(spark, dir)
      .select(col("doc_id"), graft.functions.PortableHash.hash60(col("text")).as("h"))
    val counts = corpus.groupBy(col("h"))
      .agg(count(lit(1)).cast(LongType).as("n_copies"))
    corpus.join(counts, Seq("h"))
      .select(col("doc_id"), col("n_copies"),
        expr("1000000 div n_copies").cast(LongType).as("weight_ppm"))
      .orderBy("doc_id")
  }

  val softDedupWeightsOracle: String =
    s"""WITH corpus AS ($corpusExactSql),
       |hashed AS (SELECT doc_id, ${DuckSql.hash60("text")} AS h FROM corpus),
       |counts AS (SELECT h, CAST(count(*) AS BIGINT) AS n_copies
       |  FROM hashed GROUP BY h)
       |SELECT doc_id, n_copies,
       |  CAST(1000000 // n_copies AS BIGINT) AS weight_ppm
       |FROM hashed JOIN counts USING (h)
       |ORDER BY doc_id""".stripMargin
}

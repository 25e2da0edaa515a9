package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Exact set-similarity join via prefix filtering (extension; SURVEY
  * §2.10) — the PPJoin family (Xiao, Wang, Lin, Yu, "Efficient
  * Similarity Joins for Near Duplicate Detection", WWW 2008; Chaudhuri,
  * Ganti, Kaushik, "A Primitive Operator for Similarity Joins", ICDE
  * 2006 — the SSJoin prefix-filter principle).
  *
  * Complement of [[TextDedup.minhashPairs]]: LSH banding is
  * probabilistic (tunable recall, may MISS true pairs); prefix
  * filtering is EXACT — it returns every pair with Jaccard >= t, no
  * more, no less. The price is sensitivity to token-frequency skew
  * (a prefix token shared by k sets expands k² candidates), which LSH's
  * banded signatures bound by construction. The worst skew mode —
  * many IDENTICAL sets, every shared token at df=n — is neutralized by
  * an exactness-preserving pre-collapse (see [[ppjoinPairs]]); residual
  * skew (many distinct-but-similar sets sharing a rare token) is the
  * price of recall 1.0. A pipeline uses LSH for web-scale
  * recall-tolerant dedup and the exact join where recall must be 1.0
  * (eval-set decontamination, legal takedown sweeps).
  *
  * Prefix-filter theorem: order every set by one GLOBAL total order of
  * tokens and keep each set's first `p = n - ceil(t·n) + 1` tokens. Two
  * sets with J >= t must overlap in >= 1 prefix token (if they shared
  * none, their intersection <= matches outside either prefix
  * <= min share of the suffixes < what J >= t requires). Candidates =
  * the inverted-index self-join of prefixes; each candidate then
  * verifies with the exact Jaccard. The global order is
  * FREQUENCY-ASCENDING (df, then hash) — the PPJoin refinement: every
  * prefix holds its set's RAREST tokens, so the candidate volume
  * Σ df_prefix² collapses compared to an arbitrary order (a token
  * shared by k sets expands k² candidates — you want k small exactly
  * where tokens land in prefixes). Any fixed total order is CORRECT;
  * this one is the fast one, and the two df-table shuffles it costs are
  * vocabulary-sized.
  *
  * Threshold is a RATIONAL tNum/tDen so the prefix length and length
  * filter are exact integer arithmetic on both engines (a double
  * `ceil(0.5 * n)` invites ulp drift; `(n·tNum + tDen - 1) div tDen`
  * cannot drift).
  *
  * Scale shape: one shuffle keyed by prefix token (the inverted
  * index), candidate distinct, two id-keyed verification joins. The
  * length filter `least·tDen >= greatest·tNum` prunes inside the token
  * join. No cartesian anywhere.
  */
object SetJoin {

  /** All pairs (id_a < id_b) with Jaccard(shingle-set a, shingle-set b)
    * >= tNum/tDen. Output: (id_a, id_b, jaccard) with jaccard rounded
    * to 6 dp (the same rounding every scored-pair operator here uses).
    *
    * Skew guard (exactness-preserving): before prefix filtering, docs
    * with IDENTICAL shingle sets collapse to one representative. The
    * degenerate corpus — n byte-identical docs, every token at df=n —
    * previously expanded ~n²/2 candidates per prefix token; collapsed,
    * it is ONE group and zero prefix candidates. Within-group pairs are
    * emitted directly (identical non-empty sets have Jaccard exactly 1,
    * which passes every valid threshold t <= 1; identical EMPTY sets
    * share no prefix token and so, in parity with prefix filtering,
    * never pair). Cross-group pairs come from the prefix join over
    * representatives and re-expand through the membership table —
    * output-sized work only. Token df is counted over distinct sets
    * rather than docs; any fixed total order is correct (the theorem is
    * order-agnostic), this one additionally stops duplicated docs from
    * inflating prefix selectivity.
    */
  def ppjoinPairs(df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, tNum: Long = 1, tDen: Long = 2): DataFrame =
    ppjoinPairsFromSets(df.select(col(idCol).cast(LongType).as("id"),
      TextDedup.shingleHashes(col(textCol), w).as("sset"))
      .localCheckpoint(true), tNum, tDen)

  /** [[ppjoinPairs]] over a pre-built, MATERIALIZED `(id LONG, sset
    * ARRAY<LONG>)` shingle-set frame (localCheckpoint / cache / table
    * scan — the collapse contract) — the shared-materialization twin of
    * [[graft.operators.TextDedup.minhashPairsFromSets]], so a recall
    * audit runs the shingle pipeline once for both the exact and
    * approximate sides. `precomputed` additionally lets such a caller
    * share ONE identical-set collapse decision between the pipelines
    * ([[graft.queries.DedupQueries.lshRecall]]).
    */
  def ppjoinPairsFromSets(raw: DataFrame,
      tNum: Long = 1, tDen: Long = 2,
      precomputed: Option[(DataFrame, DataFrame, Boolean)] = None): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "threshold in (0, 1]")
    val (memb, mat, prefix, collapsed) =
      collapsedPrefixBuildFromSets(raw, tNum, tDen, precomputed)
    val members = memb.select(col("rid"), col("id"))
    // within-group: identical non-empty sets, all C(g,2) pairs at J=1 —
    // the pair fan-out is legitimate output (it IS the answer for a
    // duplicated corpus). Spelled as a flat rid-keyed self-join: a
    // sort-merge join STREAMS the g² output rows of a degenerate group
    // instead of materializing any O(g) array row.
    def m = memb.filter(col("n0") > 0).select(col("rid"), col("id"))
    def within = m.as("x").join(m.as("y"),
        col("x.rid") === col("y.rid") && col("x.id") < col("y.id"))
      .select(col("x.id").as("id_a"), col("y.id").as("id_b"),
        lit(1.0).as("jaccard"))
    // PPJoin positional filter (Xiao et al., WWW'08): at a shared
    // prefix token at 1-based positions (pa, pb) of the rare-first
    // sorted sets, the overlap can be at most 1 + min(na−pa, nb−pb);
    // a true pair needs overlap ≥ α = ceil((na+nb)·t/(1+t)). LOSSLESS:
    // for any qualifying pair the FIRST common token (global order)
    // has no common tokens before it, so the bound is tight there and
    // that edge always survives — DISTINCT keeps the pair. Measured
    // 2.5× candidate reduction (360k → 145k) on the sf0.1 near-dup
    // corpus; exact integer ceil, no drift.
    val cand = prefix.as("a").join(prefix.as("b"),
        col("a.tk") === col("b.tk") && col("a.id") < col("b.id") &&
          least(col("a.n"), col("b.n")) * tDen >=
            greatest(col("a.n"), col("b.n")) * tNum &&
          expr(s"""1 + least(a.n - a.pos, b.n - b.pos) >=
            ((a.n + b.n) * $tNum + ${tNum + tDen - 1}) div ${tNum + tDen}"""))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val repPairs = cand
      .join(mat.select(col("id").as("id_a"), col("sset").as("sa")), Seq("id_a"))
      .join(mat.select(col("id").as("id_b"), col("sset").as("sb")), Seq("id_b"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast(LongType))
      .withColumn("uni", size(col("sa")) + size(col("sb")) - col("inter"))
      .filter(col("inter") * tDen >= col("uni") * tNum)
      .select(col("id_a"), col("id_b"),
        round(col("inter").cast("double") / col("uni").cast("double"), 6).as("jaccard"))
    // Identity collapse (all-distinct corpus): rid == id for every doc,
    // so the within self-join is provably empty and the member
    // expansion below re-keys every pair to itself — skip both (the
    // r18 minhash-family elision, extended to the exact join in r19).
    if (!collapsed) repPairs
    else {
      // cross-group expansion: every member pair inherits its
      // representatives' Jaccard; re-orient so id_a < id_b holds even
      // when group memberships interleave
      val cross = repPairs
        .join(members.select(col("rid").as("id_a"), col("id").as("ma")), Seq("id_a"))
        .join(members.select(col("rid").as("id_b"), col("id").as("mb")), Seq("id_b"))
        .select(least(col("ma"), col("mb")).as("id_a"),
          greatest(col("ma"), col("mb")).as("id_b"), col("jaccard"))
      cross.unionAll(within)
    }
  }

  /** The shared front of [[ppjoinPairs]] and [[prefixSkewReport]]:
    * identical-set pre-collapse + the (df, hash)-ordered prefix index
    * over representatives. Returns `(members, mat, prefix)` where
    * `members(rid, id, n0)` is the FLAT collapse (one row per input
    * doc, `rid` = its group representative = min id of the identical
    * shingle set, `n0` = set size — no per-group array anywhere),
    * `mat(id, sset, n, p)` the rare-first-sorted representative sets
    * with prefix length, `prefix(id, n, tk)` the exploded prefix
    * inverted index.
    *
    *   - exact-dedup pre-collapse: one hash-keyed shuffle on the SORTED
    *     shingle-hash array (shingleHashes output is distinct but
    *     insertion-ordered — sorting canonicalizes, so equal sets are
    *     equal window keys); a spilling window min, never a
    *     collect_list; materialized once, it feeds the representative
    *     pipeline and the callers' expansion joins.
    *   - global (df, hash) token order over REPRESENTATIVES: explode
    *     once, count distinct sets per token (map-side combined),
    *     regroup each set sorted rare-first. Struct array_sort is
    *     lexicographic (df, then h) — a total order because h is
    *     distinct within a set.
    *   - p = n - ceil(t*n) + 1, exact integer ceil (`div`, never
    *     Column./ whose double division drifts past 2^53).
    */
  private[graft] def collapsedPrefixBuild(
      df: DataFrame, idCol: String, textCol: String,
      w: Int, tNum: Long, tDen: Long): (DataFrame, DataFrame, DataFrame, Boolean) =
    collapsedPrefixBuildFromSets(df.select(col(idCol).cast(LongType).as("id"),
      TextDedup.shingleHashes(col(textCol), w).as("sset"))
      .localCheckpoint(true), tNum, tDen)

  /** `raw0` must be MATERIALIZED (the collapse contract). Returns
    * `(members, mat, prefix, collapsed)`; when `collapsed` is false the
    * members table is the identity map and callers skip their
    * within-group/expansion plan branches outright.
    */
  private[graft] def collapsedPrefixBuildFromSets(
      raw0: DataFrame, tNum: Long, tDen: Long,
      precomputed: Option[(DataFrame, DataFrame, Boolean)] = None)
      : (DataFrame, DataFrame, DataFrame, Boolean) = {
    // Array-free collapse (since r19 the shared fingerprint collapse —
    // [[TextDedup.collapseIdenticalSetsTagged]]): grouping and the
    // members join-back ride the 128-bit canonical-array fingerprint
    // (24 bytes/row on the wire) with a map-side-combined `min(id)`
    // aggregate, so a million-copy boilerplate set combines per input
    // partition BEFORE the shuffle and no row ever carries a per-group
    // ids array. On the identity path (every set distinct — decided by
    // ONE bounded aggregation) members is a narrow projection and the
    // former full-array group + join-back disappear entirely. The
    // false-merge bound (both 64-bit lanes colliding, p <= n²/2^129) is
    // the same one the whole approximate family carries; any such event
    // is oracle-visible since the DuckDB replay groups on the set.
    val (members0, reps, collapsed) =
      precomputed.getOrElse(TextDedup.collapseIdenticalSetsTagged(raw0))
    val members =
      if (!collapsed)
        raw0.select(col("id").as("rid"), col("id"),
          size(col("sset")).cast(LongType).as("n0"))
      else
        // identical sets share their size, so the rep's carries the
        // member's — one broadcast-sized join on the unique rid
        members0.join(
          reps.select(col("id").as("rid"), size(col("sset")).cast(LongType).as("n0")),
          Seq("rid"))
          .select(col("rid"), col("id"), col("n0"))
    val ex = reps.select(col("id"), explode(col("sset")).as("h"))
    val dfreq = ex.groupBy("h").agg(count(lit(1)).as("df"))
    val sets = ex.join(dfreq, "h")
      .groupBy("id")
      .agg(transform(array_sort(collect_list(struct(col("df"), col("h")))),
        s => s("h")).as("sset"))
      .withColumn("n", size(col("sset")).cast(LongType))
      .withColumn("p", expr(s"n - ((n * $tNum + ${tDen - 1}) div $tDen) + 1"))
    // the sets table feeds the inverted index AND the callers'
    // verification joins — materialize once, same pattern as
    // minhashPairs
    val mat = sets.localCheckpoint(true)
    val prefix = mat
      .select(col("id"), col("n"),
        posexplode(slice(col("sset"), lit(1), col("p").cast("int"))))
      .select(col("id"), col("n"), (col("pos") + 1).cast(LongType).as("pos"),
        col("col").as("tk"))
    (members, mat, prefix, collapsed)
  }

  /** PPJoin candidate-volume observability (defense-in-depth next to
    * the identical-set pre-collapse): the per-prefix-token candidate
    * mass a [[ppjoinPairs]] run WOULD generate, as a one-row summary —
    * the pre-flight readout that makes a pathological corpus (near-
    * identical docs sharing a universal rare-ish token) visible before
    * it burns a cluster. NOT a cap: the join is exact by contract;
    * this reports, the operator never drops.
    *
    * Columns: `n_docs`, `n_reps` (distinct shingle sets after the
    * collapse), `n_prefix_tokens`, `cand_pairs` = Σ_tk C(df_tk, 2)
    * (the prefix join's candidate upper bound, before the length
    * filter), `max_token_df`, `top_token_share_ppm` (heaviest token's
    * share of cand_pairs — the salting/investigation trigger), and
    * `within_pairs` (identical-set pairs the collapse emits directly —
    * output-sized, NOT candidates). All exact integers; same
    * shuffle budget as the ppjoin front itself.
    */
  def prefixSkewReport(df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, tNum: Long = 1, tDen: Long = 2): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "threshold in (0, 1]")
    val (memb, _, prefix, _) = collapsedPrefixBuild(df, idCol, textCol, w, tNum, tDen)
    val tokdf = prefix.groupBy(col("tk"))
      .agg(count(lit(1)).cast(LongType).as("dfp"))
      // dfp*(dfp-1) wraps Long past dfp ~ 3.04e9 — precisely the
      // pathological corpus this pre-flight exists to surface, so it
      // must fail LOUD there (DuckDB raises on BIGINT overflow; a
      // silently negative cand_pairs would fail open)
      .withColumn("__cpairs",
        when(col("dfp") <= 3037000499L, expr("(dfp * (dfp - 1)) div 2"))
          .otherwise(raise_error(concat(
            lit("prefixSkewReport: prefix token df "), col("dfp").cast("string"),
            lit(" overflows the pair-count domain — the corpus is already "),
            lit("pathological; investigate the token before joining")))))
    val tok = tokdf.agg(
      count(lit(1)).cast(LongType).as("n_prefix_tokens"),
      coalesce(sum(col("__cpairs")), lit(0L))
        .cast(LongType).as("cand_pairs"),
      coalesce(max(col("dfp")), lit(0L)).cast(LongType).as("max_token_df"),
      coalesce(max(col("__cpairs")), lit(0L))
        .cast(LongType).as("max_token_pairs"))
    val counts = memb.agg(
      count(lit(1)).cast(LongType).as("n_docs"),
      sum(when(col("id") === col("rid"), 1L).otherwise(0L))
        .cast(LongType).as("n_reps"))
    // group sizes from the flat membership (one long per group — the
    // former sum over size(ids) without ever building an ids array)
    val within = memb.filter(col("n0") > 0)
      .groupBy(col("rid")).agg(count(lit(1)).as("g"))
      .agg(coalesce(sum(expr("(g * (g - 1)) div 2")), lit(0L))
        .cast(LongType).as("within_pairs"))
    // three 1-row scalars — constant-size broadcast cross joins
    counts.crossJoin(tok).crossJoin(within)
      .withColumn("top_token_share_ppm",
        when(col("cand_pairs") > 0,
          expr("(1000000 * max_token_pairs) div cand_pairs")).cast(LongType))
      .select(col("n_docs"), col("n_reps"), col("n_prefix_tokens"),
        col("cand_pairs"), col("max_token_df"), col("top_token_share_ppm"),
        col("within_pairs"))
  }

  /** DuckDB oracle CTE chain ending in
    * `pp_skew(n_docs, n_reps, n_prefix_tokens, cand_pairs,
    * max_token_df, top_token_share_ppm, within_pairs)` over a CTE
    * `corpus(doc_id, text)` — [[prefixSkewReport]] kept in lockstep,
    * INCLUDING the identical-set pre-collapse (unlike [[ppjoinSql]],
    * which skips it because the collapse is answer-preserving for the
    * pair output; for the skew report the collapse IS the semantics —
    * it reports post-guard candidate volume).
    */
  def prefixSkewSql(w: Int = 3, tNum: Long = 1, tDen: Long = 2): String = {
    val t = graft.queries.DuckSql.tokens("text")
    val sh = graft.queries.DuckSql.shinglesFromTokens(t, w)
    val hashed = s"list_sort(list_distinct(list_transform($sh, x -> ${graft.queries.DuckSql.hash60("x")})))"
    s"""ps_raw AS (SELECT doc_id AS id, $hashed AS sset0 FROM corpus),
       |ps_grp AS (SELECT sset0, list_sort(list(id)) AS ids, min(id) AS rid
       |  FROM ps_raw GROUP BY sset0),
       |ps_ex AS (SELECT rid AS id, unnest(sset0) AS h FROM ps_grp),
       |ps_df AS (SELECT h, count(*) AS df FROM ps_ex GROUP BY h),
       |ps_sets AS (SELECT id, list(h ORDER BY df, h) AS sset,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM ps_ex JOIN ps_df USING (h) GROUP BY id),
       |ps_pref AS (SELECT id, n, sset,
       |    n - ((n * $tNum + ${tDen - 1}) // $tDen) + 1 AS p
       |  FROM ps_sets),
       |ps_tok AS (SELECT id, n, unnest(sset[1:p]) AS tk FROM ps_pref),
       |ps_tokdf AS (SELECT tk, CAST(count(*) AS BIGINT) AS dfp
       |  FROM ps_tok GROUP BY tk),
       |ps_tagg AS (SELECT CAST(count(*) AS BIGINT) AS n_prefix_tokens,
       |    CAST(coalesce(sum((dfp * (dfp - 1)) // 2), 0) AS BIGINT) AS cand_pairs,
       |    CAST(coalesce(max(dfp), 0) AS BIGINT) AS max_token_df,
       |    CAST(coalesce(max((dfp * (dfp - 1)) // 2), 0) AS BIGINT) AS max_token_pairs
       |  FROM ps_tokdf),
       |ps_counts AS (SELECT CAST(sum(len(ids)) AS BIGINT) AS n_docs,
       |    CAST(count(*) AS BIGINT) AS n_reps FROM ps_grp),
       |ps_within AS (SELECT CAST(coalesce(sum(
       |      (CAST(len(ids) AS BIGINT) * (len(ids) - 1)) // 2), 0) AS BIGINT) AS within_pairs
       |  FROM ps_grp WHERE len(sset0) > 0),
       |pp_skew AS (SELECT n_docs, n_reps, n_prefix_tokens, cand_pairs,
       |    max_token_df,
       |    CAST((1000000 * max_token_pairs) // NULLIF(cand_pairs, 0) AS BIGINT)
       |      AS top_token_share_ppm,
       |    within_pairs
       |  FROM ps_counts, ps_tagg, ps_within)""".stripMargin
  }

  /** DuckDB oracle CTE chain ending in `pp_pairs(id_a, id_b, jaccard)`
    * over a CTE `corpus(doc_id, text)` — the same prefix-filter
    * algorithm, kept in lockstep with [[ppjoinPairs]].
    */
  def ppjoinSql(w: Int = 3, tNum: Long = 1, tDen: Long = 2): String = {
    val t = graft.queries.DuckSql.tokens("text")
    val sh = graft.queries.DuckSql.shinglesFromTokens(t, w)
    val hashed = s"list_sort(list_distinct(list_transform($sh, x -> ${graft.queries.DuckSql.hash60("x")})))"
    s"""pp_raw AS (SELECT doc_id AS id, $hashed AS sset0 FROM corpus),
       |pp_ex AS (SELECT id, unnest(sset0) AS h FROM pp_raw),
       |pp_df AS (SELECT h, count(*) AS df FROM pp_ex GROUP BY h),
       |pp_sets AS (SELECT id, list(h ORDER BY df, h) AS sset,
       |    CAST(count(*) AS BIGINT) AS n
       |  FROM pp_ex JOIN pp_df USING (h) GROUP BY id),
       |pp_pref AS (SELECT id, sset, n,
       |    n - ((n * $tNum + ${tDen - 1}) // $tDen) + 1 AS p
       |  FROM pp_sets),
       |pp_tok AS (SELECT id, n, unnest(sset[1:p]) AS tk,
       |    CAST(generate_subscripts(sset[1:p], 1) AS BIGINT) AS pos
       |  FROM pp_pref),
       |pp_cand AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
       |  FROM pp_tok a JOIN pp_tok b
       |    ON a.tk = b.tk AND a.id < b.id
       |    AND least(a.n, b.n) * $tDen >= greatest(a.n, b.n) * $tNum
       |    AND 1 + least(a.n - a.pos, b.n - b.pos) >=
       |      ((a.n + b.n) * $tNum + ${tNum + tDen - 1}) // ${tNum + tDen}),
       |pp_pairs AS (SELECT id_a, id_b,
       |    round(CAST(len(list_intersect(sa.sset, sb.sset)) AS DOUBLE) /
       |      (CAST(sa.n + sb.n - len(list_intersect(sa.sset, sb.sset)) AS DOUBLE)), 6) AS jaccard
       |  FROM pp_cand
       |  JOIN pp_sets sa ON sa.id = pp_cand.id_a
       |  JOIN pp_sets sb ON sb.id = pp_cand.id_b
       |  WHERE len(list_intersect(sa.sset, sb.sset)) * $tDen >=
       |    (sa.n + sb.n - len(list_intersect(sa.sset, sb.sset))) * $tNum)""".stripMargin
  }

  /** Sorted-neighborhood near-dup pairs (Hernández & Stolfo, SIGMOD'95
    * merge/purge) — the THIRD blocking family next to LSH bands
    * (probabilistic, tunable recall) and prefix filtering (exact,
    * skew-sensitive): sort the corpus by a similarity-preserving key
    * and compare each record only to its next `window` neighbors —
    * candidates are O(n·window) REGARDLESS of skew, the property
    * neither of the others can promise. Recall depends entirely on the
    * key; the canonical bag-of-words key (space-joined SORTED tokens)
    * puts token-multiset-similar docs adjacent, so token-level edits
    * (drops, reorders) land neighbors while topic-different docs never
    * meet.
    *
    * Shape: one bounded-rank global sort ([[Shuffle.rangeOrderIndex]] —
    * range partitions, per-partition windows, |partitions|-row offset
    * broadcast), an equi-join on rank offsets 1..window, exact Jaccard
    * verification. No candidate blowup exists to cap.
    */
  def snmPairs(df: DataFrame, idCol: String, textCol: String,
      w: Int = 3, window: Int = 3, tNum: Long = 1, tDen: Long = 2): DataFrame = {
    require(window >= 1, "neighborhood window must be >= 1")
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "threshold in (0, 1]")
    val keyed = df.select(col(idCol).cast(LongType).as("id"),
      TextDedup.shingleHashes(col(textCol), w).as("sset"),
      array_join(array_sort(TextDedup.tokensCol(col(textCol))), " ").as("k"))
    val ranked = Shuffle.rangeOrderIndex(keyed, Seq("k", "id"), "pos")
      .select(col("id"), col("sset"), col("pos"))
      .localCheckpoint(true) // feeds both sides of the neighbor join
    val lhs = ranked.select(col("id").as("id_a"), col("sset").as("sa"),
      explode(sequence(col("pos") + 1, col("pos") + window)).as("pos"))
    lhs.join(ranked.select(col("id").as("id_b"), col("sset").as("sb"), col("pos")), Seq("pos"))
      .withColumn("inter", size(array_intersect(col("sa"), col("sb"))).cast(LongType))
      .withColumn("uni", size(col("sa")) + size(col("sb")) - col("inter"))
      .filter(col("inter") * tDen >= col("uni") * tNum)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        round(col("inter").cast("double") / col("uni").cast("double"), 6).as("jaccard"))
  }

  /** ASYMMETRIC containment join: pairs where either set's shingles are
    * >= tNum/tDen contained in the other — `|A∩B| / |A|` (resp. `/|B|`)
    * — the near-superset/quote-detection mode Jaccard structurally
    * misses (a 40-token doc quoted inside a 4000-token doc has J ≈ 0.01
    * but containment 1.0). The dedup policy for it is KEEP-SUPERSET,
    * not keep-one.
    *
    * Candidates come from shared-shingle buckets with the LSH-style cap
    * ([[TextDedup.cappedBucketPairsLong]]) — one shingle-keyed shuffle,
    * per-bucket O(n·cap); recall is exact while no shingle's df exceeds
    * the cap (massively duplicated corpora should pre-collapse with
    * [[TextDedup.exact]], same trade as [[ppjoinPairs]] documents).
    * Verification is two id-keyed joins + exact integer ppm.
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      w: Int = 8, tNum: Long = 4, tDen: Long = 5,
      maxBucket: Int = 256): DataFrame = {
    require(tNum > 0 && tDen > 0 && tNum <= tDen, "threshold in (0, 1]")
    val thresholdPpm = tNum * 1000000L / tDen
    val sets = df.select(col(idCol).cast(LongType).as("id"),
      TextDedup.shingleHashes(col(textCol), w).as("sset"))
      .localCheckpoint(true) // feeds the collapse + both verification joins
    // identical-set pre-collapse (the skew-round contract shared with
    // the minhash family): posting buckets and containment verification
    // run over one REPRESENTATIVE per distinct set; same-content copies
    // emit identity star pairs (containment 1.0/1.0 by definition)
    val (members, reps, collapsed) = TextDedup.collapseIdenticalSetsTagged(sets)
    // bounded member rows (TextDedup.bucketedPairs): same pair set as
    // the one-row-per-bucket spelling, but no O(|bucket|) array row
    val cand = TextDedup.bucketedPairs(
        reps.select(col("id"), explode(col("sset")).as("h")), Seq("h"), maxBucket)
      .dropDuplicates("id_a", "id_b")
    val repPairs = cand
      .join(reps.select(col("id").as("id_a"), col("sset").as("sa")), Seq("id_a"))
      .join(reps.select(col("id").as("id_b"), col("sset").as("sb")), Seq("id_b"))
      .withColumn("n_shared", size(array_intersect(col("sa"), col("sb"))).cast(LongType))
      .withColumn("na", size(col("sa")).cast(LongType))
      .withColumn("nb", size(col("sb")).cast(LongType))
      .withColumn("cont_a_ppm", expr("n_shared * 1000000 div na"))
      .withColumn("cont_b_ppm", expr("n_shared * 1000000 div nb"))
      .filter(greatest(col("cont_a_ppm"), col("cont_b_ppm")) >= lit(thresholdPpm))
      .select(col("id_a"), col("id_b"), col("n_shared"),
        col("cont_a_ppm"), col("cont_b_ppm"))
    // identity star pairs are EMPTY when nothing collapsed — skip the union
    if (!collapsed) repPairs
    else repPairs.unionByName(
      TextDedup.identityStarPairs(members)
        .join(reps.select(col("id").as("id_a"), size(col("sset")).cast(LongType).as("n_shared")),
          Seq("id_a"))
        .withColumn("cont_a_ppm", lit(1000000L))
        .withColumn("cont_b_ppm", lit(1000000L))
        .select(col("id_a"), col("id_b"), col("n_shared"),
          col("cont_a_ppm"), col("cont_b_ppm")))
  }
}

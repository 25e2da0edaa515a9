package graft.queries

/** Shared DuckDB-SQL fragments mirroring graft's column-level operators
  * exactly (tokenizer, shingles, portable hash). Every fragment is the
  * oracle twin of a Spark expression; keep the two in lockstep.
  */
object DuckSql {

  /** ASCII-corpus twin of [[graft.operators.Fts.tokens]]. The Spark
    * side now implements SQLite's full unicode61 tokenizer
    * ([[graft.functions.Unicode61]]); on pure-ASCII text — which every
    * testdata corpus is (probe-verified over all string columns at
    * sf0.1) — unicode61 is exactly `lower` + split on `[^a-z0-9]+`, so
    * this fragment stays the exact oracle twin for corpus-fed queries.
    * Queries that PLANT non-ASCII text in-query must use
    * [[tokensUnicode]] instead.
    */
  def tokens(expr: String): String =
    s"list_filter(string_split_regex(lower($expr), '[^a-z0-9]+'), t -> t <> '')"

  /** Unicode twin of [[graft.operators.Fts.tokens]] for queries that
    * plant non-ASCII text in-query: `strip_accents(lower(x))` then
    * split on RE2 `[^\p{L}\p{N}]+`. This is NOT a universal unicode61
    * replica — probed divergences: utf8proc strips the breve/diaeresis
    * off accented CYRILLIC letters (й→и, ё→е) where unicode61 keeps
    * them as distinct letters, and folds µ→µ, ſ→ſ where unicode61 maps
    * µ→μ, ſ→s. It IS exact on the planted-alphabet contract the
    * queries using it commit to (unaccented Latin-1 vowels-with-
    * diacritics, base Cyrillic а-я minus й/ё, CJK, ASCII) —
    * Unicode61Spec pins that agreement char-by-char, so a new planted
    * char outside the safe alphabet fails the spec, not the oracle
    * hash.
    */
  def tokensUnicode(expr: String): String =
    s"list_filter(string_split_regex(strip_accents(lower($expr)), " +
      s"'[^\\p{L}\\p{N}]+'), t -> t <> '')"

  /** Twin of [[graft.functions.PortableHash.hash60]]. */
  def hash60(expr: String): String =
    s"CAST(('0x' || substring(md5($expr), 1, 15)) AS BIGINT)"

  /** Twin of [[graft.functions.PortableHash.hash60Seeded]]. */
  def hash60Seeded(seedExpr: String, expr: String): String =
    hash60(s"CAST($seedExpr AS VARCHAR) || ':' || ($expr)")

  /** Twin of [[graft.functions.PortableHash.affine]]. */
  def affine(hExpr: String, kExpr: String): String =
    s"((($hExpr) % 1000000007) * (2 * ($kExpr) + 1) + (12345 * ($kExpr) + 677)) % 1000000007"

  /** Twin of [[graft.operators.TextDedup.cappedBucketPairsLong]] (the
    * per-bucket skew cap) as a CTE fragment over a source CTE
    * `src(keys..., id)`: members rank by id within each bucket, every
    * pair within a cap-sized slice is a candidate, plus the chain
    * links (head of slice i, head of slice i+1) that preserve
    * connectivity. Emits CTEs `<pfx>_rk` and `<pfx>(id_a, id_b)`;
    * splice into a WITH list. The cap is INVISIBLE while every bucket
    * stays under `cap` members (all shipped SFs) — the sf1 gate found
    * three oracles replaying uncapped all-pairs where the engine
    * correctly capped 2000-member buckets.
    */
  def cappedPairsCtes(pfx: String, srcCte: String, keyCols: Seq[String],
      cap: Int = 256): String = {
    val keys = keyCols.mkString(", ")
    val eq = keyCols.map(k => s"a.$k = b.$k").mkString(" AND ")
    s"""${pfx}_rk AS (SELECT $keys, id,
       |    row_number() OVER (PARTITION BY $keys ORDER BY id) - 1 AS r
       |  FROM $srcCte),
       |$pfx AS (
       |  SELECT a.id AS id_a, b.id AS id_b
       |  FROM ${pfx}_rk a JOIN ${pfx}_rk b
       |    ON $eq AND a.id < b.id AND a.r // $cap = b.r // $cap
       |  UNION ALL
       |  SELECT a.id, b.id
       |  FROM ${pfx}_rk a JOIN ${pfx}_rk b
       |    ON $eq AND a.r % $cap = 0 AND b.r = a.r + $cap)""".stripMargin
  }

  /** Exact connected-components labels as UNROLLED min-label
    * propagation with pointer jumping — the skew-robust replacement for
    * the `WITH RECURSIVE reach(id, label)` spelling, whose state is
    * (node, label) for EVERY label in the component: on a K-node
    * near-clique (the skew corpus's 3000-copy boilerplate cluster) that
    * is K² rows joined against degree ~K edges per iteration — billions
    * of intermediate rows, hours in DuckDB. This spelling carries ONE
    * label per node; each round takes the min over (self, neighbors'
    * labels, label-of-label). The jump step compresses label chains so
    * convergence is far under `rounds` for any real diameter; a final
    * delta check POISONS the labels (a VARCHAR→BIGINT cast error, loud
    * in the harness) if the fixpoint was not reached, so a
    * pathological corpus fails the gate instead of silently
    * mislabeling.
    *
    * Expects an `edges(src, dst)` CTE (both directions) in scope;
    * `nodesSql` must select one column `id`. Emits CTEs ending in
    * `labels(id, cluster_id)` — `cluster_id` = min id in the component,
    * the same contract as `graft.operators.TextDedup.dedupClusters`.
    */
  def ccLabelCtes(nodesSql: String, rounds: Int = 24): String = {
    val sb = new StringBuilder
    // AS MATERIALIZED is load-bearing: each round references the prior
    // one three times, and DuckDB's default CTE inlining re-evaluates
    // the whole chain per reference — exponential work and fd
    // exhaustion by round 12 (default 24 rounds: the engine once measured an
    // embedding ε-graph needing 18 propagation rounds, and jumping does not
    // shortcut blob-chains — see TextDedup.dedupClusters's phase-2 note)
    sb.append(s"cc0 AS MATERIALIZED (SELECT id, id AS lbl FROM ($nodesSql) ccn),")
    // edges chains back into the caller's full candidate pipeline —
    // materialize once, not once per round
    sb.append("\nccedges AS MATERIALIZED (SELECT src, dst FROM edges)")
    for (k <- 1 to rounds) {
      val p = s"cc${k - 1}"
      sb.append(s""",
         |ccnb$k AS (SELECT e.dst AS id, min(c.lbl) AS nl
         |  FROM ccedges e JOIN $p c ON c.id = e.src GROUP BY e.dst),
         |ccjp$k AS (SELECT c.id, c2.lbl AS jl
         |  FROM $p c JOIN $p c2 ON c2.id = c.lbl),
         |cc$k AS MATERIALIZED (SELECT c.id,
         |    least(c.lbl, coalesce(n.nl, c.lbl), coalesce(j.jl, c.lbl)) AS lbl
         |  FROM $p c
         |  LEFT JOIN ccnb$k n ON n.id = c.id
         |  LEFT JOIN ccjp$k j ON j.id = c.id)""".stripMargin)
    }
    sb.append(s""",
       |ccdelta AS (SELECT count(*) AS n FROM cc$rounds a
       |  JOIN cc${rounds - 1} b ON b.id = a.id WHERE a.lbl <> b.lbl),
       |labels AS (SELECT id,
       |    CASE WHEN (SELECT n FROM ccdelta) = 0 THEN lbl
       |         ELSE CAST('cc-not-converged' AS BIGINT) END AS cluster_id
       |  FROM cc$rounds)""".stripMargin)
    sb.toString
  }

  /** Twin of [[graft.operators.TextDedup.shingles]] given a token-list
    * expression.
    */
  def shinglesFromTokens(t: String, w: Int = 3): String =
    s"""CASE WHEN len($t) >= $w
       | THEN list_transform(range(1, len($t) - ${w - 2}), i -> array_to_string(($t)[i:i+${w - 1}], ' '))
       | ELSE [array_to_string($t, ' ')] END""".stripMargin.replace("\n", " ")

  /** Twin of [[graft.operators.TextStats]] stopword hit count. */
  def hitCount(toksExpr: String, words: Seq[String]): String = {
    val inList = words.map(w => s"'$w'").mkString(", ")
    s"len(list_filter($toksExpr, t -> t IN ($inList)))"
  }

  /** Twin of [[graft.operators.TextStats.quality]]'s `quality_score`
    * over pre-computed BIGINT counts: the EXACT-INTEGER spelling.
    * score = (sh/nt)/2 + (ac/nt)/10 - pc/nc over the common
    * denominator 10·nt·nc, clamped to [0,1], rounded half-up at 6 dp
    * as integer ppm, then ONE exact division to double. Both engines
    * compute identical BIGINTs and the final ppm/1e6 is a single
    * correctly-rounded IEEE op — no 6-dp rounding of an arbitrary
    * double anywhere (Spark's round() rounds the SHORTEST-DECIMAL-REPR
    * of a double, DuckDB rounds its binary value; they disagree on
    * midpoint-repr scores — found by the sf1 gate on a doc whose exact
    * score is 119833/237440 = 0.5046875, a 6-dp midpoint).
    */
  def qualityScoreFromCounts(nc: String, nt: String, alnum: String,
      spaces: String, stopHits: String): String = {
    val num = s"(5 * ($stopHits) * ($nc) + ($alnum) * ($nc) " +
      s"- 10 * (($nc) - ($alnum) - ($spaces)) * ($nt))"
    val den = s"(10 * ($nt) * ($nc))"
    s"""(CAST(CASE WHEN ($nt) <= 0 OR ($nc) <= 0 OR $num <= 0 THEN 0
       |  WHEN $num >= $den THEN 1000000
       |  ELSE ($num * 1000000 + $den // 2) // $den END AS DOUBLE) / 1000000.0)"""
      .stripMargin.replace("\n", " ")
  }

  /** [[qualityScoreFromCounts]] derived from raw text, as ONE scalar
    * expression (keep in lockstep with the count-CTE oracles in
    * DedupQueries).
    */
  def qualityScore(textExpr: String): String = {
    val t = tokens(textExpr)
    val allStop = graft.operators.TextStats.stopwords.values.flatten.toSeq.distinct.sorted
    val alnum = s"length(regexp_replace(lower($textExpr), '[^a-z0-9]', '', 'g'))"
    val spaces = s"length(regexp_replace($textExpr, '[^ ]', '', 'g'))"
    qualityScoreFromCounts(s"length($textExpr)", s"len($t)", alnum, spaces,
      hitCount(t, allStop))
  }

  /** Twin of [[graft.operators.Fts.ilog2Fixed]] plus the
    * [[graft.operators.Fts.EpsIdf]] branch, as a generated CTE chain:
    * the integer square-and-shift fixed-point log2 (30 unrolled
    * iterations of pure BIGINT `*`, `//` and CASE — bit-identical to
    * the Scala loop, which is the whole point: a float `ln` could
    * never be replayed engine-exactly, this can).
    *
    * Input CTE `src` must provide `keep` columns plus BIGINT `p`, `q`
    * (`p = 2(N-df)+1`, `q = 2df+1`; both >= 1, p < 2^62). Emits CTEs
    * `<pfx>_ini`, `<pfx>_s1.._s30`, `<pfx>_t1.._t30` and a final
    * `<pfx>` with columns `<keep...>, idf2` where
    * `idf2 = 1549 when p <= q else floor_ish(log2(p/q) * 2^30)`.
    * Splice the result into a WITH list (it is a comma-joined CTE
    * fragment, no leading/trailing comma).
    */
  def ilog2Cte(src: String, pfx: String, keep: Seq[String]): String = {
    val ks = keep.mkString(", ")
    def pw(k: Int): String = (1L << k).toString
    // largest ip in [0, 61] with p // 2^ip >= q (the overflow-free
    // spelling of q * 2^ip <= p), and b0 = q * 2^ip alongside
    val ipLadder = (61 to 1 by -1)
      .map(k => s"WHEN p // ${pw(k)} >= q THEN $k").mkString(" ")
    val b0Ladder = (61 to 1 by -1)
      .map(k => s"WHEN p // ${pw(k)} >= q THEN q * ${pw(k)}").mkString(" ")
    // normalize a/b by a common shift so b lands in [2^29, 2^30)
    def norm(v: String): String =
      ((62 to 30 by -1).map(k => s"WHEN b0 >= ${pw(k)} THEN ($v) // ${pw(k - 29)}") ++
        Seq(s"WHEN b0 >= ${pw(29)} THEN ($v)") ++
        (28 to 1 by -1).map(k => s"WHEN b0 >= ${pw(k)} THEN ($v) * ${pw(29 - k)}"))
        .mkString(" ") + s" ELSE ($v) * ${pw(29)}"
    val ini =
      s"""${pfx}_ini AS (SELECT $ks, p, q,
         |    CAST(CASE $ipLadder ELSE 0 END AS BIGINT) AS acc,
         |    CASE ${norm("p")} END AS a,
         |    CASE ${norm("b0")} END AS b
         |  FROM (SELECT $ks, p, q, CASE $b0Ladder ELSE q END AS b0 FROM $src))""".stripMargin
    val iters = (1 to 30).map { i =>
      val prev = if (i == 1) s"${pfx}_ini" else s"${pfx}_t${i - 1}"
      // bb = b^2 doubled when the emitted bit is 1; then both renormalize
      // by the shift that puts b back into [2^29, 2^30)
      s"""${pfx}_s$i AS (SELECT $ks, p, q, acc, a*a AS aa, b*b AS b2,
         |    CASE WHEN a*a >= 2*(b*b) THEN 1 ELSE 0 END AS bit FROM $prev),
         |${pfx}_t$i AS (SELECT $ks, p, q, acc*2 + bit AS acc,
         |    CASE WHEN b2*(1+bit) >= ${pw(60)} THEN aa // ${pw(31)}
         |         WHEN b2*(1+bit) >= ${pw(59)} THEN aa // ${pw(30)}
         |         ELSE aa // ${pw(29)} END AS a,
         |    CASE WHEN b2*(1+bit) >= ${pw(60)} THEN (b2*(1+bit)) // ${pw(31)}
         |         WHEN b2*(1+bit) >= ${pw(59)} THEN (b2*(1+bit)) // ${pw(30)}
         |         ELSE (b2*(1+bit)) // ${pw(29)} END AS b
         |  FROM ${pfx}_s$i)""".stripMargin
    }
    val fin =
      s"""$pfx AS (SELECT $ks,
         |    CASE WHEN p <= q THEN 1549 ELSE acc END AS idf2
         |  FROM ${pfx}_t30)""".stripMargin
    (ini +: iters :+ fin).mkString(",\n")
  }
}

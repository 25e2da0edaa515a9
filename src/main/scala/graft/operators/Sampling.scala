package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.PortableHash

/** Deterministic sampling / dataset splitting for training pipelines
  * (extension — SURVEY §7.2.8).
  *
  * Assignment is keyed on a CONTENT hash, not row position: stable under
  * re-sharding, repartitioning, and incremental corpus growth — the
  * property a train/val/test split must have so a document never
  * migrates between splits across pipeline runs. Pure narrow codegen
  * per-row compute; no shuffle at any corpus size.
  */
object Sampling {

  /** raise_error message that survives NULL interpolants: concat()
    * nulls out the whole message if any piece is NULL (raise_error
    * then fires with a null message, losing the diagnostic), so every
    * dynamic piece gets a "NULL" sentinel before concatenation.
    */
  private def errMsg(parts: Column*): Column =
    concat(parts.map(p => coalesce(p, lit("NULL"))): _*)

  /** Stable bucket in [0, nBuckets) from any string key. */
  def hashBucket(key: Column, nBuckets: Int): Column = {
    require(nBuckets > 0, "nBuckets must be positive")
    PortableHash.hash60(key) % nBuckets
  }

  /** train/validation/test label from a bucket: first `trainPct`% of
    * buckets are train, next `valPct`% validation, rest test.
    */
  def splitLabel(bucket: Column, trainPct: Int, valPct: Int, nBuckets: Int = 1000): Column = {
    require(trainPct >= 0 && valPct >= 0 && trainPct + valPct <= 100,
      "percentages must be non-negative and sum to <= 100")
    when(bucket < nBuckets * trainPct / 100, "train")
      .when(bucket < nBuckets * (trainPct + valPct) / 100, "validation")
      .otherwise("test")
  }

  /** Deterministic ~pct% sample predicate over a string key. */
  def samplePredicate(key: Column, pct: Int, nBuckets: Int = 1000): Column =
    hashBucket(key, nBuckets) < nBuckets * pct / 100

  /** Source/domain mixture resampling: deterministic downsampling to an
    * EXPLICIT target mixture — the "domain weights" knob (DoReMi-style
    * static weights, Pile/RedPajama-style mixture tables), distinct
    * from temperature rebalancing (which derives rates from corpus
    * shares alone). Given per-source integer weights w_s, a budget of
    * `budgetNum/budgetDen` of the corpus, and z = Σ w_s, source s
    * targets `budget * w_s / z` documents; its keep rate is
    * `target_s / n_s`, capped at 1 (sampling is without replacement —
    * an over-weighted tiny source keeps everything; re-weight upstream
    * if true upsampling is needed).
    *
    * Exact BIGINT thresholds end to end: keep iff
    * `hashBucket(text) < least(buckets, (buckets * budgetNum * n_tot *
    * w_s) div (budgetDen * z * n_s))` — deterministic, re-shard-stable,
    * engine-exact. Scale shape: ONE map-side-combined count per source,
    * a 1-row total, and a broadcast rate join back — the fact table
    * never shuffles.
    *
    * `weightOf` maps the source column to its integer weight (a
    * foldable expression so both engines agree; a literal map join
    * works too).
    */
  def mixtureSample(
      df: DataFrame, srcCol: String, keyCol: String,
      weightOf: Column => Column,
      budgetNum: Int, budgetDen: Int, buckets: Int = 10000): DataFrame = {
    require(budgetNum > 0 && budgetDen >= budgetNum, "budget must be in (0, 1]")
    val counts = df.groupBy(col(srcCol))
      .agg(count(lit(1)).cast(LongType).as("n_s"))
      .withColumn("w_s", weightOf(col(srcCol)).cast(LongType))
    val tot = counts.agg(sum(col("n_s")).cast(LongType).as("n_tot"),
      sum(col("w_s")).cast(LongType).as("z"))
    val rates = counts.crossJoin(broadcast(tot))
      .withColumn("keep_buckets",
        least(lit(buckets.toLong),
          expr(s"($buckets * $budgetNum * n_tot * w_s) div ($budgetDen * z * n_s)")))
      .select(col(srcCol), col("keep_buckets"))
    df.join(broadcast(rates), Seq(srcCol))
      .filter(hashBucket(col(keyCol), buckets) < col("keep_buckets"))
  }

  /** UniMax budget allocation (Chung et al., "UniMax: Fairer and More
    * Effective Language Sampling for Large-Scale Multilingual
    * Pretraining", ICLR 2023): split a token budget across languages as
    * EVENLY as possible subject to a per-language epoch cap — water
    * filling. Small languages get capped at `epochCap` epochs of their
    * data (repeating more overfits them); the freed budget spreads
    * equally over the rest. Temperature sampling
    * ([[graft.queries.CorpusQueries.tokenBudgetPlan]]) reweights
    * proportionally and can still starve tail languages or
    * over-repeat them; the cap is the point of UniMax.
    *
    * Integer-exact closed form (the iterative UniMax loop has this
    * water-level solution): sort groups ascending by cap
    * `c_j = epochCap·tok_j` (ties by name); group j is CAPPED iff
    * `c_j·(n−j+1) + P_{j−1} <= B` (even an equal split of what remains
    * at its turn meets its cap; the condition is monotone in j so the
    * capped set is a prefix). Uncapped groups share the remaining
    * budget `B − P*` by integer division, the first `R = (B−P*) mod m`
    * of them (in sort order) taking one extra token — allocations sum
    * to exactly B whenever B <= Σcap.
    *
    * `perGroup` must have (`groupCol`, n_docs, n_tokens) — a
    * model-sized frame (|languages|), so the prefix sums run as a
    * bounded self-join grid (|groups|² rows), NOT a single-partition
    * window, and the totals ride 1-row broadcast scalars. Budget
    * `B = (tok_tot·budgetNum) div budgetDen`.
    *
    * Output: `(groupCol, n_docs, n_tokens, cap_tok, alloc_tok, capped,
    * epochs_ppm)` — `epochs_ppm = (1e6·alloc) div n_tokens`.
    */
  def unimaxAlloc(perGroup: DataFrame, groupCol: String, epochCap: Int,
      budgetNum: Long, budgetDen: Long): DataFrame = {
    require(epochCap >= 1, "epochCap must be >= 1")
    require(budgetNum > 0 && budgetDen > 0, "budget fraction must be positive")
    val base = perGroup.select(col(groupCol).as("g"),
        col("n_docs").cast(LongType).as("n_docs"),
        col("n_tokens").cast(LongType).as("n_tokens"))
      .withColumn("cap_tok", col("n_tokens") * epochCap)
      .localCheckpoint(true)
    val tot = base.agg(sum(col("n_tokens")).cast(LongType).as("tok_tot"),
      count(lit(1)).cast(LongType).as("nlangs"))
    // prefix sums over the ascending (cap, name) order via the bounded
    // |groups|^2 grid
    val other = base.select(col("g").as("g2"), col("cap_tok").as("cap2"))
    val pref = base.join(broadcast(other),
        col("cap2") < col("cap_tok") ||
          (col("cap2") === col("cap_tok") && col("g2") < col("g")), "left")
      .groupBy(col("g"), col("n_docs"), col("n_tokens"), col("cap_tok"))
      .agg(coalesce(sum(col("cap2")), lit(0L)).cast(LongType).as("p_prev"),
        count(col("g2")).cast(LongType).as("j_prev"))
      .crossJoin(broadcast(tot))
      .withColumn("budget", expr(s"(tok_tot * $budgetNum) div $budgetDen"))
      .withColumn("capped",
        (col("cap_tok") * (col("nlangs") - col("j_prev")) + col("p_prev"))
          <= col("budget"))
      .localCheckpoint(true)
    val star = pref.agg(
      coalesce(sum(when(col("capped"), col("cap_tok"))), lit(0L))
        .cast(LongType).as("p_star"),
      coalesce(sum(when(col("capped"), lit(1L))), lit(0L))
        .cast(LongType).as("n_capped"))
    pref.crossJoin(broadcast(star))
      .withColumn("m", greatest(col("nlangs") - col("n_capped"), lit(1L)))
      .withColumn("share", expr("(budget - p_star) div m"))
      .withColumn("extra_r", expr("(budget - p_star) % m"))
      .withColumn("u", col("j_prev") + 1 - col("n_capped"))
      .withColumn("alloc_tok", when(col("capped"), col("cap_tok"))
        .otherwise(col("share") +
          when(col("u") <= col("extra_r"), lit(1L)).otherwise(lit(0L))))
      .select(col("g").as(groupCol), col("n_docs"), col("n_tokens"),
        col("cap_tok"), col("alloc_tok"),
        when(col("capped"), lit(1L)).otherwise(lit(0L)).as("capped"),
        // greatest(·,1): a group whose docs are ALL empty has
        // n_tokens=0 (cap 0, alloc 0) — 0 div 0 is NULL in Spark but
        // an error in DuckDB; pin epochs_ppm to 0 on both engines
        expr("(1000000 * alloc_tok) div greatest(n_tokens, 1)")
          .as("epochs_ppm"))
  }

  /** Stratified deterministic downsampling: keep the best
    * ceil(|stratum| * pct / 100) rows of EACH stratum by
    * (score desc, id asc) — proportional representation per stratum
    * (language, source), where a global threshold would let a dominant
    * stratum crowd out the rest. Appends `stratum_rank` (1-based within
    * the stratum).
    *
    * Strata are low-cardinality by contract (languages, sources), so a
    * per-stratum rank WINDOW would serialize each stratum onto one
    * task — a multi-TB sort at 100 TB. The rank is instead
    * [[Shuffle.groupedRank]]'s range-decomposed rank (bounded
    * per-partition sorts + a broadcast per-(partition, stratum) offset
    * table) on the negated score, and the per-stratum size arrives as
    * a broadcast count aggregate. Same total order, same output, no
    * single-task stage.
    *
    * `scoreCol` must be NON-NULL — ENFORCED, not just documented: the
    * rank orders by the negated score ascending, where a NULL would
    * sort FIRST (= best) and silently promote unscored rows to the
    * stratum's top. A NULL score raises; coalesce a sentinel before
    * calling if nulls are legitimate. A NULL STRATUM is legitimate
    * (e.g. failed language-ID) and ranks as its own stratum — the
    * count join is null-safe (`<=>`), matching
    * [[Shuffle.groupedRank]]'s null-safe group semantics.
    *
    * `materializeInput` forwards to [[Shuffle.groupedRank]]: keep the
    * default when `df` is a compact projection (the sampler's second
    * pass would re-run the score compute); pass false when `df` still
    * carries corpus-width columns (full text) — a corpus copy is worse.
    */
  def stratifiedTopPct(
      df: DataFrame, stratumCol: String, idCol: String,
      scoreCol: String, pct: Int,
      materializeInput: Boolean = true): DataFrame = {
    require(pct > 0 && pct <= 100, "pct must be in (0, 100]")
    val n = df.groupBy(col(stratumCol))
      .agg(count(lit(1)).as("__stratum_n"))
      .withColumnRenamed(stratumCol, "__stratum_key")
    val ranked = Shuffle.groupedRank(
      df.withColumn("__neg_score",
        when(col(scoreCol).isNull, raise_error(errMsg(
          lit(s"stratifiedTopPct: NULL $scoreCol for "),
          col(idCol).cast("string"),
          lit(" — coalesce a sentinel before calling"))))
          .otherwise(-col(scoreCol))),
      Seq(stratumCol), Seq("__neg_score", idCol), "stratum_rank",
      materializeInput = materializeInput)
    ranked
      .join(broadcast(n), col(stratumCol) <=> col("__stratum_key"))
      .filter(col("stratum_rank") <= ceil(col("__stratum_n") * pct / lit(100.0)))
      .drop("__stratum_key", "__stratum_n", "__neg_score")
  }

  /** Priority sampling (Duffield–Lund–Thorup, JACM 2007):
    * weight-proportional sampling without replacement — each row gets
    * priority `hash div weight` (the integer spelling of `u/w`, u
    * uniform from the seeded 60-bit hash) and the sample is the k
    * SMALLEST priorities. Heavier rows divide by more, land lower,
    * and are proportionally likelier to be drawn — the published
    * scheme's near-optimal subset-sum variance comes with it for free.
    * Deterministic (hash-keyed, no RNG state), so the sample is stable
    * across runs and engines.
    *
    * Scale shape: one narrow projection + `orderBy(priority).limit(k)`
    * — Spark's TakeOrderedAndProject (per-partition bottom-k, driver
    * merge of partitions × k rows); the corpus is never globally
    * sorted. Zero/negative weights are rejected loudly.
    *
    * Output: input columns + `priority`, `sample_rank` (1..k by
    * (priority, tieBreak)).
    */
  def prioritySample(
      df: DataFrame, weightCol: String, tieBreak: String, k: Int,
      seed: Long = 7L): DataFrame = {
    require(k > 0, "k must be positive")
    // the rank window runs AFTER limit(k): bounded input, same stance
    // as globalOrderIndex's offsets window
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("priority"), col(tieBreak))
    df.withColumn("__ph",
        PortableHash.hash60Seeded(lit(seed), col(tieBreak).cast("string")))
      .withColumn("priority",
        when(col(weightCol) <= 0, raise_error(errMsg(
          lit(s"prioritySample: non-positive weight in $weightCol for "),
          col(tieBreak).cast("string"))))
          .otherwise(expr(s"__ph div `$weightCol`")).cast(LongType))
      .drop("__ph")
      .orderBy(col("priority"), col(tieBreak))
      .limit(k)
      .withColumn("sample_rank", row_number().over(w).cast(LongType))
  }

  /** Deterministic positional negative sampling for contrastive /
    * embedding training: each query document gets `k` negatives drawn
    * at evenly-spaced offsets in the seeded global shuffle order —
    *
    *   neg_pos(q, i) = ((pos(q) − 1 + i·(N div (k+1))) mod N) + 1
    *
    * The shuffle position IS the randomness (seeded 60-bit hash rank,
    * [[Shuffle.globalOrderIndex]]), so negatives are uniform-ish,
    * reproducible across runs and cluster sizes, and collision-free
    * with the query whenever N > k (i·stride < N for i ≤ k). This is
    * the O(n) at-scale shape: the naive "hash-rank every (query,
    * candidate) pair" is a q×n cross join, while positions need one
    * bounded-rank pass and the lookup is ONE position-keyed equi-join.
    * Self-pairs (only possible when N ≤ k, where stride = 0) are
    * filtered, never emitted.
    *
    * Output: `(q_id, neg_rank, neg_id)`, neg_rank 1..k.
    */
  def positionalNegatives(
      docs: DataFrame, idCol: String, isQuery: Column => Column,
      k: Int = 4, seed: Long = 7L): DataFrame = {
    require(k > 0, "k must be positive")
    val pos = Shuffle.globalOrderIndex(
        docs.select(col(idCol).cast(LongType).as("id")),
        keyCol = "id", seed = seed, tieBreak = "id", posCol = "pos")
      .localCheckpoint(true) // feeds the query side AND the lookup side
    val n = pos.agg(count(lit(1)).cast(LongType).as("n"))
    pos.filter(isQuery(col("id")))
      .select(col("id").as("q_id"), col("pos").as("q_pos"))
      .crossJoin(broadcast(n))
      .select(col("q_id"), col("q_pos"), col("n"),
        explode(sequence(lit(1), lit(k))).as("neg_rank"))
      .withColumn("neg_pos",
        expr(s"((q_pos - 1 + neg_rank * (n div ${k + 1})) % n) + 1"))
      .join(pos.select(col("id").as("neg_id"), col("pos").as("neg_pos")),
        Seq("neg_pos"))
      .filter(col("neg_id") =!= col("q_id"))
      .select(col("q_id"), col("neg_rank").cast(LongType).as("neg_rank"),
        col("neg_id"))
  }

  /** Weighted fair-queuing interleave: serialize a multi-source corpus
    * into one deterministic stream order where a weight-w source
    * surfaces w times as often as a weight-1 source, evenly spread —
    * doc r of a source runs at virtual time `r · (1e6 div w)` and the
    * stream is ordered by virtual time (ties by `idCol`). The
    * per-source rank is [[Shuffle.groupedRank]]'s range-decomposed
    * rank (a per-source window would serialize each source onto one
    * task at 100 TB); the global order is [[Shuffle.globalRankBy]]'s
    * bucket-decomposed rank — no single-partition window anywhere.
    * `domainBits` must bound `maxSrcRank · 1e6` (42 bits ≈ 4.4M docs
    * in the heaviest source; raise it for bigger corpora) — an
    * out-of-domain vtime would silently overflow globalRankBy's bucket
    * decomposition, so the bound is ENFORCED per row: a codegen'd
    * `raise_error` fires on the first row whose vtime reaches
    * 2^domainBits (or whose weight is null/zero), failing the job in
    * seconds instead of corrupting stream positions.
    */
  def wfqInterleave(df: DataFrame, sourceCol: String, idCol: String,
      weight: Column => Column, domainBits: Int = 42,
      posCol: String = "stream_pos",
      materializeInput: Boolean = true): DataFrame = {
    require(domainBits > 0 && domainBits <= 60, "domainBits in (0, 60]")
    val vt = Shuffle.groupedRank(
        df.withColumn("w", weight(col(sourceCol))),
        Seq(sourceCol), Seq(idCol), "src_rank",
        materializeInput = materializeInput)
      .withColumn("__vt_raw", col("src_rank") * expr("1000000 div w"))
      // the when() keeps the guard in the vtime value path (never
      // pruned); `1e6 div w` is NULL for w = 0/NULL, which also routes
      // to raise_error via the non-matching when branch
      .withColumn("vtime",
        when(col("__vt_raw") >= 0 && col("__vt_raw") < lit(1L << domainBits),
          col("__vt_raw"))
          .otherwise(raise_error(errMsg(
            lit(s"wfqInterleave: vtime out of [0, 2^$domainBits) for "),
            col(sourceCol).cast("string"),
            lit(" rank "), col("src_rank").cast("string"),
            lit(" weight "), col("w").cast("string"),
            lit(" — raise domainBits or fix the weight")))))
      .drop("__vt_raw")
    Shuffle.globalRankBy(vt, "vtime", domainBits = domainBits,
      tieBreak = idCol, posCol = posCol)
  }
}

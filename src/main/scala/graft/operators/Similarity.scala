package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (extension — SURVEY §7.2.8).
  *
  * Embeddings are quantized to integer vectors (`round(x * 1000)`) before
  * any arithmetic: integer dot products and norms are EXACT, so cosine
  * similarity is the same double in Spark and DuckDB regardless of
  * floating-point summation order — the one thing that makes ANN results
  * oracle-comparable across engines. The quantization error (~5e-4
  * relative) is far below any meaningful similarity resolution.
  *
  * Scale design:
  *   - brute-force top-k: queries broadcast against the corpus; per-row
  *     dot products are narrow; ranking is a per-query window over k
  *     candidates. At 100 TB the corpus side stays partitioned and never
  *     shuffles; cost is O(|corpus| * |queries|) FLOPs, the right
  *     baseline below ~10^4 queries.
  *   - IVF: corpus bucketed by centroid (one shuffle at build), queries
  *     probe nProbe nearest centroids and scan only those buckets —
  *     the classic inverted-file trade of recall for a |corpus|/nlist
  *     scan reduction.
  */
object Similarity {

  /** Quantize a float-array embedding to exact BIGINTs — native
    * single-pass expression ([[graft.expressions.QuantizeVec]]); the
    * HOF spelling ([[quantizeHof]]) is CodegenFallback.
    */
  def quantize(emb: Column): Column =
    graft.expressions.QuantizeVec.quantize_vec(emb)

  /** Parity reference for the spec. */
  private[graft] def quantizeHof(emb: Column): Column =
    transform(emb, x => round(x.cast(DoubleType) * 1000).cast(LongType))

  /** Exact integer dot product of two quantized vectors — native codegen
    * expression ([[graft.expressions.IntVecDot]]); the HOF spelling
    * (`aggregate(zip_with(...))`) is CodegenFallback and ~10x slower.
    */
  def idot(a: Column, b: Column): Column =
    graft.expressions.IntVecDot.int_vec_dot(a, b)

  /** Exact integer squared norm. */
  def inorm2(a: Column): Column = idot(a, a)

  /** Cosine similarity from exact integer components, rounded to 6 dp. */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    round(dot.cast(DoubleType) /
      (sqrt(n2a.cast(DoubleType)) * sqrt(n2b.cast(DoubleType))), 6)

  /** Micro-cosine: round(1e6·cos) as an exact BIGINT — ONE double
    * rounding at the source, after which every downstream combination
    * (sums, averages, the margin ratio) stays in integer arithmetic and
    * can never hit a float-repr seam.
    */
  def cosineMicro(dot: Column, n2a: Column, n2b: Column): Column =
    round(dot.cast(DoubleType) * 1e6 /
      (sqrt(n2a.cast(DoubleType)) * sqrt(n2b.cast(DoubleType)))).cast(LongType)

  /** Brute-force cosine top-k: for each query vector (`queries` must be
    * small — it is broadcast), the k nearest corpus vectors excluding
    * itself. Deterministic: ties broken by corpus id.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast(LongType).as("c_id"),
      quantize(col(embCol)).as("c_q"))
      .withColumn("c_n2", inorm2(col("c_q")))
    val q = broadcast(queries.select(col(idCol).cast(LongType).as("q_id"),
      quantize(col(embCol)).as("q_q"))
      .withColumn("q_n2", inorm2(col("q_q"))))
    val scored = c.join(q, col("c_id") =!= col("q_id"))
      .withColumn("cosine", cosine(idot(col("c_q"), col("q_q")), col("c_n2"), col("q_n2")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cosine"))
  }

  /** [[bruteForceTopK]] over vectors that are ALREADY exact integers
    * (quantized, truncated, or sign-projected) — same scoring, ranking
    * and tie order, minus the ×1000 quantization step.
    */
  def bruteForceTopKInt(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast(LongType).as("c_id"),
      col(vecCol).as("c_q"))
      .withColumn("c_n2", inorm2(col("c_q")))
    val q = broadcast(queries.select(col(idCol).cast(LongType).as("q_id"),
      col(vecCol).as("q_q"))
      .withColumn("q_n2", inorm2(col("q_q"))))
    val scored = c.join(q, col("c_id") =!= col("q_id"))
      .withColumn("cosine", cosine(idot(col("c_q"), col("q_q")), col("c_n2"), col("q_n2")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cosine"))
  }

  /** Margin-based bitext mining (Artetxe & Schwenk, "Margin-based
    * Parallel Corpus Mining with Multilingual Sentence Embeddings",
    * ACL 2019 — the CCMatrix/LASER miner): a raw cosine threshold
    * cannot separate true translation pairs from hubs (vectors near
    * everything), so each pair is scored by its cosine RELATIVE to the
    * two endpoints' neighborhoods:
    *
    *   margin(x,y) = cos(x,y) / ((avgₖ cos(x,NNₖ(y-side)) +
    *                              avgₖ cos(y,NNₖ(x-side))) / 2)
    *
    * the "ratio" variant, >1 iff the pair is closer than its
    * neighborhoods' average. Per source vector the best target by
    * margin is emitted.
    *
    * Exactness: all scores are micro-cosines ([[cosineMicro]]), so the
    * margin is a pure BIGINT division —
    * `(2e6·cm·cnt_a·cnt_b) div (a_sum·cnt_b + b_sum·cnt_a)` with
    * a_sum/b_sum the top-k micro-cosine SUMS and cnt_a/cnt_b the
    * ACTUAL neighbor counts (a vector can have fewer than k
    * positive-cosine candidates; dividing by k there would inflate
    * sparse neighborhoods' margins). With full neighborhoods
    * (cnt=k both sides) this reduces to `(2e6·k·cm) div
    * (a_sum+b_sum)`. Bit-identical across engines. Only
    * positive-cosine candidates are mined (the criterion presumes
    * similarity; it also keeps the integer division in
    * truncation-=-floor territory).
    *
    * Shape: `srcBatch` is the handful being mined — it broadcasts and
    * the target corpus streams past it once (the same all-pairs scorer
    * shape as [[bruteForceTopK]]); the reverse-direction penalty
    * re-scores ONLY the ≤|batch|·nCand candidate vectors (broadcast
    * semi-join on ids, then candidates × batch — bounded by the batch,
    * never |corpus|²). At 100 TB the forward pass plugs [[ivfTopK]] in
    * as the candidate generator; the margin algebra is unchanged.
    */
  def marginMine(tgtCorpus: DataFrame, srcBatch: DataFrame, idCol: String,
      embCol: String, k: Int = 4, nCand: Int = 8): DataFrame = {
    require(k >= 1 && nCand >= k, "marginMine: need nCand >= k >= 1")
    // margin_ppm's numerator is 2e6 * cm(<=1e6) * cnt_a(<=k) * cnt_b(<=k)
    // ~= 2e12 * k^2, which exceeds Long.MaxValue (~9.2e18) near k ~ 2100.
    // Bound well below the overflow point; mining margins over more than
    // a thousand neighbors per vector is not a meaningful criterion anyway.
    require(k <= 1000, "marginMine: k > 1000 would overflow the ppm margin")
    val t = tgtCorpus.select(col(idCol).cast(LongType).as("t_id"),
      quantize(col(embCol)).as("t_q"))
      .withColumn("t_n2", inorm2(col("t_q")))
    val s = broadcast(srcBatch.select(col(idCol).cast(LongType).as("q_id"),
      quantize(col(embCol)).as("q_q"))
      .withColumn("q_n2", inorm2(col("q_q"))))
    def scoreAgainstBatch(side: DataFrame): DataFrame = side
      .join(s, col("t_id") =!= col("q_id"))
      .select(col("q_id"), col("t_id"),
        cosineMicro(idot(col("t_q"), col("q_q")), col("t_n2"), col("q_n2")).as("cm"))
      .filter(col("cm") > 0)
    val wq = Window.partitionBy(col("q_id")).orderBy(col("cm").desc, col("t_id"))
    // |batch|·nCand rows — the only materialized state
    val cand = scoreAgainstBatch(t)
      .withColumn("r", row_number().over(wq).cast(LongType))
      .filter(col("r") <= nCand)
      .localCheckpoint(true)
    val aSum = cand.filter(col("r") <= k)
      .groupBy(col("q_id")).agg(sum(col("cm")).as("a_sum"),
        count(lit(1)).as("cnt_a"))
    val candVecs = t.join(broadcast(cand.select(col("t_id")).distinct()),
      Seq("t_id"), "left_semi")
    val wt = Window.partitionBy(col("t_id")).orderBy(col("cm").desc, col("q_id"))
    val bSum = scoreAgainstBatch(candVecs)
      .withColumn("r", row_number().over(wt))
      .filter(col("r") <= k)
      .groupBy(col("t_id")).agg(sum(col("cm")).as("b_sum"),
        count(lit(1)).as("cnt_b"))
    val wBest = Window.partitionBy(col("q_id"))
      .orderBy(col("margin_ppm").desc, col("t_id"))
    cand
      .join(broadcast(aSum), Seq("q_id"))
      .join(broadcast(bSum), Seq("t_id"))
      .filter(col("a_sum") + col("b_sum") > 0)
      .withColumn("margin_ppm",
        expr("(2000000 * cm * cnt_a * cnt_b) div (a_sum * cnt_b + b_sum * cnt_a)"))
      .withColumn("best", row_number().over(wBest))
      .filter(col("best") === 1)
      .select(col("q_id"), col("t_id").as("tgt_id"),
        col("cm").as("cos_micro"), col("margin_ppm"))
  }

  /** A driver-resident centroid: cluster id, integer component sums,
    * squared norm. k×dim longs by definition — collecting these is how
    * k-means drivers work on real clusters too, and it lets every
    * assignment/probe against them be a NARROW codegen expression over
    * literal vectors instead of a crossJoin + window shuffle.
    */
  private case class Centroid(cluster: Long, cent: Seq[Long], n2: Long)

  private def driverNorm2(v: Seq[Long]): Long =
    v.foldLeft(0L)((acc, x) => acc + x * x) // Long wrap == Spark LongType

  /** Per-cluster element-wise integer sums in ONE job with ONE shuffle:
    * posexplode to (cluster, pos, v) with map-side partial aggregation
    * (k×dim rows per partition cross the wire), collected as k×dim longs
    * and assembled into arrays on the driver. No dim probe needed, and
    * the generated code stays small (a 64-column `sum` aggregate
    * compiles measurably slower than it runs).
    *
    * `c` must have columns (cluster, q).
    */
  private def sumCentroids(c: DataFrame): Seq[Centroid] = {
    val rows = c.select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("cluster"), col("pos"))
      .agg(sum(col("v")).cast(LongType).as("s"))
      .collect()
    rows.groupBy(_.getLong(0)).map { case (cl, rs) =>
      val cent = rs.sortBy(_.getInt(1)).map(_.getLong(2)).toIndexedSeq
      Centroid(cl, cent, driverNorm2(cent))
    }.toSeq.sortBy(_.cluster)
  }

  /** Struct (cosine, -cluster, cluster) vs one literal centroid: max
    * struct = highest cosine, ties to the LOWEST cluster id — the same
    * order as `row_number over (order by cos desc, cluster)` rank 1.
    */
  private def centroidScore(q: Column, n2: Column, ct: Centroid): Column =
    struct(
      cosine(idot(q, typedLit(ct.cent)), n2, lit(ct.n2)).as("cos"),
      lit(-ct.cluster).as("neg"),
      lit(ct.cluster).as("cluster"))

  /** Narrow nearest-centroid assignment — ONE native expression per row
    * ([[graft.expressions.NearestCentroids]]; ranking identical to the
    * `greatest` over (cos, -cluster) structs it replaced, which built a
    * ~15·k-node Catalyst tree per call that the driver re-analyzed on
    * every Lloyd job). No shuffle — the corpus never moves, which is
    * the property that matters at 100 TB.
    */
  private def assignNearest(c: DataFrame, cents: Seq[Centroid]): DataFrame =
    c.withColumn("cluster", element_at(
      graft.expressions.NearestCentroids.nearest_centroids(
        col("q"), col("n2"), cents.map(ct => (ct.cluster, ct.cent, ct.n2)), 1), 1))

  /** The struct-greatest spelling of [[assignNearest]], kept as the
    * parity reference the spec pins [[graft.expressions.NearestCentroids]]
    * against (same scores, same rounding, same tie order).
    */
  private[graft] def assignNearestStructs(c: DataFrame, cents: Seq[(Long, Seq[Long], Long)]): DataFrame = {
    val scores = cents.map { case (cluster, cent, n2) =>
      struct(
        cosine(idot(col("q"), typedLit(cent)), col("n2"), lit(n2)).as("cos"),
        lit(-cluster).as("neg"),
        lit(cluster).as("cluster"))
    }
    val best = if (scores.size == 1) scores.head else greatest(scores: _*)
    c.withColumn("cluster", best.getField("cluster"))
  }

  /** IVF top-k: centroids are exact per-cluster integer component sums,
    * queries probe the `nProbe` nearest centroids by cosine and rank
    * only vectors in those clusters. `clusterCol` supplies the cluster
    * assignment (the `label` column, or [[kmeansAssign]] output).
    *
    * Plan shape: one single-shuffle centroid aggregation (collected —
    * k×dim longs), then a narrow per-query probe (sort a k-element
    * literal score array, take nProbe), then a broadcast join of the
    * probed (query, cluster) pairs against the corpus with one window
    * over the candidate rows only. The corpus is never crossJoined or
    * window-shuffled in full.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, clusterCol: String,
      k: Int, nProbe: Int = 2): DataFrame =
    ivfTopKPrepared(
      corpus.select(col(idCol).cast(LongType).as("c_id"),
        col(clusterCol).cast(LongType).as("cluster"),
        quantize(col(embCol)).as("c_q"))
        .withColumn("c_n2", inorm2(col("c_q"))),
      queries, idCol, embCol, k, nProbe)

  /** IVF over an already-prepared corpus `(c_id, cluster, c_q, c_n2)` —
    * lets a caller that just trained clusters ([[kmeansPrepared]]) feed
    * the SAME persisted quantized corpus straight in, instead of joining
    * assignments back to the raw table and re-quantizing it.
    */
  private[graft] def ivfTopKPrepared(
      c: DataFrame, queries: DataFrame,
      idCol: String, embCol: String,
      k: Int, nProbe: Int): DataFrame = {
    val centroids = sumCentroids(
      c.select(col("cluster"), col("c_q").as("q")))
    val probed = probeQueries(queries, idCol, embCol, centroids, nProbe)
    scanProbed(c, probed, k)
  }

  /** Probe: nProbe nearest centroids per query — narrow (sort a
    * k-element literal array of (cos, -cluster) scores, slice nProbe).
    * Output: (q_id, q_q, q_n2, cluster), one row per probed cluster.
    */
  private def probeQueries(
      queries: DataFrame, idCol: String, embCol: String,
      centroids: Seq[Centroid], nProbe: Int): DataFrame = {
    val q = queries.select(col(idCol).cast(LongType).as("q_id"),
      quantize(col(embCol)).as("q_q"))
      .withColumn("q_n2", inorm2(col("q_q")))
    // rank order identical to sort_array over (cos, -cluster, cluster)
    // structs descending — see NearestCentroids' exactness note
    q.withColumn("cluster", explode(
        graft.expressions.NearestCentroids.nearest_centroids(
          col("q_q"), col("q_n2"),
          centroids.map(ct => (ct.cluster, ct.cent, ct.n2)), nProbe)))
      .select(col("q_id"), col("q_q"), col("q_n2"), col("cluster"))
  }

  /** Scan only the probed clusters of a prepared corpus
    * `(c_id, cluster, c_q, c_n2)` and rank per query. */
  private def scanProbed(c: DataFrame, probed: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    c.join(broadcast(probed), Seq("cluster"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cosine", cosine(idot(col("c_q"), col("q_q")), col("c_n2"), col("q_n2")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cosine"))
  }

  /** IVF-PQ with asymmetric distance (Jégou et al., TPAMI 2011 — the
    * billion-scale index layout): candidate generation by the COARSE
    * partition (nProbe nearest label-clusters per query, centroids =
    * integer sums of the raw member vectors, exactly [[ivfTopK]]'s
    * probe), scoring by the PQ-RECONSTRUCTED vectors (concatenated
    * codebook entries), so the scan reads `m` codes per candidate
    * instead of the full vector. At 100 TB the decoded/reconstructed
    * corpus is the m·log2(k)-bit code table plus a k·(d/m)-entry
    * codebook literal — the memory shape that makes the scan fit.
    *
    * Exact-integer throughout (quantized grid, integer code
    * assignment, integer reconstruction), so the DuckDB oracle replays
    * it hash-exactly. Output: (q_id, rank, neighbor_id, cosine) with
    * cosine the ADC approximation.
    */
  def ivfAdcTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, clusterCol: String,
      model: DataFrame, k: Int, nProbe: Int = 2): DataFrame = {
    // coarse centroids from the RAW vectors (the probe must not depend
    // on code quality)
    val raw = corpus.select(col(clusterCol).cast(LongType).as("cluster"),
      quantize(col(embCol)).as("q"))
    val centroids = sumCentroids(raw)
    val probed = probeQueries(queries, idCol, embCol, centroids, nProbe)
    // ADC side: reconstructed integer vectors, cluster carried through
    val c = graft.operators.ProductQuantize
      .decode(corpus, idCol, embCol, model, keep = Seq(clusterCol))
      .select(col("vec_id").as("c_id"),
        col(clusterCol).cast(LongType).as("cluster"), col("rv").as("c_q"))
      .withColumn("c_n2", inorm2(col("c_q")))
    scanProbed(c, probed, k)
  }

  /** Deterministic k-means (Lloyd) for IVF training — exact across
    * engines because centroids are element-wise integer SUMS of member
    * vectors, never means: cosine is scale-invariant, so the sum points
    * in the same direction as the mean and assignments are identical,
    * while every intermediate stays exact integer arithmetic.
    *
    * Init: centroids = vectors with id 0..k-1. Each iteration:
    * assign every vector to the nearest centroid by (rounded) cosine
    * with cluster-index tie-break, then re-sum. Clusters that lose all
    * members drop out (standard Lloyd variant).
    *
    * Scale: assignment is k dot products per row against broadcast
    * centroids (no shuffle of the corpus); the re-sum is one
    * posexplode + groupBy per iteration, shuffling k*dim rows.
    */
  def kmeansAssign(
      corpus: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int): DataFrame =
    kmeansPrepared(corpus, idCol, embCol, k, iters)
      .select(col("c_id").as("vec_id"), col("cluster"))

  /** Self-supervised prototype pruning (Sorscher et al., "Beyond neural
    * scaling laws: beating power law scaling via data pruning",
    * NeurIPS 2022): cluster the embeddings, score every example by
    * cosine to ITS OWN cluster's centroid ("prototypicality"), and mark
    * the most prototypical fraction for pruning — at large data scale
    * the EASY (prototypical) examples are the ones worth dropping,
    * which is the opposite of what a quality filter keeps and why this
    * is its own operator.
    *
    * Output: `(vec_id, cluster, proto_cos, proto_rank, pruned)` —
    * micro-cosine to the final-assignment centroid, 1-based rank within
    * the cluster (most prototypical first, ties by id), and
    * `pruned = 1` iff `denom·rank <= cluster size` (the top 1/denom
    * slice; denom=4 prunes 25%). Integer-exact throughout.
    *
    * Shape: k-means corpus never shuffles (see [[kmeansPrepared]]);
    * final centroids are ONE k×dim driver collect; prototypicality is a
    * narrow CASE over literal centroids. The per-cluster rank is
    * [[Shuffle.groupedRank]]'s RANGE-DECOMPOSED rank, NOT a
    * cluster-partitioned window — with k=8 clusters a window would put
    * ~N/k corpus rows into ONE task's sort (the low-cardinality-key
    * scale killer [[graft.plans.PlanGuard]] flags); groupedRank never
    * sorts more than one range partition per task. Cluster sizes ride
    * a k-row broadcast count table instead of a second window.
    */
  def protoPrune(corpus: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int, denom: Int = 4): DataFrame =
    protoPruneFromQuantized(
      quantizedCorpus(corpus, idCol, embCol), k, iters, denom)

  /** [[protoPrune]] over an already-quantized, MATERIALIZED
    * `(id, q, n2)` frame — the shared-checkpoint entry point
    * [[graft.queries.SimilarityQueries.d4Select]] uses so SemDeDup and
    * prototype pruning quantize the corpus once, not twice.
    */
  private[graft] def protoPruneFromQuantized(c: DataFrame,
      k: Int, iters: Int, denom: Int): DataFrame = {
    require(denom >= 1, "protoPrune: denom must be >= 1")
    val prepared = kmeansFromQuantized(c, k, iters)
      .localCheckpoint(true)
    val cents = sumCentroids(prepared.select(col("cluster"), col("c_q").as("q")))
    val protoCos = coalesce(cents.map { ct =>
      when(col("cluster") === ct.cluster,
        cosineMicro(idot(col("c_q"), typedLit(ct.cent)), col("c_n2"), lit(ct.n2)))
    }: _*)
    // rank ascending over the NEGATED micro-cosine = descending
    // prototypicality; (__nk, c_id) is a total order within a cluster
    val scored = prepared
      .withColumn("proto_cos", protoCos)
      .select(col("c_id"), col("cluster"), col("proto_cos"))
      .withColumn("__nk", -col("proto_cos"))
    // materializeInput=false: `scored` is a narrow CASE projection of
    // the already-checkpointed k-means output — recomputing it for the
    // range sampler is cheaper than a third corpus materialization
    val ranked = Shuffle.groupedRank(scored, Seq("cluster"),
      Seq("__nk", "c_id"), "proto_rank", materializeInput = false)
    val counts = scored.groupBy("cluster")
      .agg(count(lit(1)).cast(LongType).as("csize"))
    ranked.join(broadcast(counts), Seq("cluster"))
      .select(col("c_id").as("vec_id"), col("cluster"), col("proto_cos"),
        col("proto_rank"),
        when(col("proto_rank") * denom <= col("csize"), lit(1L))
          .otherwise(lit(0L)).as("pruned"))
  }

  /** k-means core: the persisted quantized corpus with final cluster
    * assignments attached, as `(c_id, cluster, c_q, c_n2)` — directly
    * consumable by [[ivfTopKPrepared]] with no join/re-quantize.
    */
  private[graft] def kmeansPrepared(
      corpus: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int): DataFrame =
    kmeansFromQuantized(quantizedCorpus(corpus, idCol, embCol), k, iters)

  /** The quantize/norm front shared by every k-means entry point:
    * `(id, q, n2)`, eagerly local-checkpointed. Checkpoint, not
    * persist: the frame feeds every Lloyd iteration, and checkpoint
    * blocks are freed by the ContextCleaner when the returned plan is
    * dropped (a persist here leaked its cache entry across calls —
    * nothing ever unpersisted it).
    */
  private[graft] def quantizedCorpus(
      corpus: DataFrame, idCol: String, embCol: String): DataFrame =
    corpus.select(col(idCol).cast(LongType).as("id"),
      quantize(col(embCol)).as("q"))
      .withColumn("n2", inorm2(col("q")))
      .localCheckpoint(true)

  /** [[kmeansPrepared]] over an already-quantized MATERIALIZED
    * `(id, q, n2)` frame (caller owns the checkpoint — the Lloyd loop
    * reads it once per iteration).
    */
  private[graft] def kmeansFromQuantized(
      c: DataFrame, k: Int, iters: Int): DataFrame =
    assignNearest(c, lloyd(c, k, iters)).select(col("id").as("c_id"), col("cluster"),
      col("q").as("c_q"), col("n2").as("c_n2"))

  /** The Lloyd loop over a prepared (id, q, n2) frame. Each iteration
    * is ONE job with ONE shuffle: narrow assignment against the literal
    * centroids (k codegen dot products per row, no data movement)
    * feeding the per-cluster component-sum aggregation, whose k×dim
    * result comes back to the driver. The corpus itself never shuffles —
    * the property that matters at 100 TB. Clusters that lose all
    * members drop out (standard Lloyd variant). Init: vectors with id
    * 0..k-1.
    */
  private def lloyd(c: DataFrame, k: Int, iters: Int): Seq[Centroid] = {
    var cents: Seq[Centroid] = c.filter(col("id") < k)
      .select(col("id"), col("q")).collect()
      .map { r =>
        val v = r.getSeq[Long](1)
        Centroid(r.getLong(0), v, driverNorm2(v))
      }.toSeq.sortBy(_.cluster)
    (1 to iters).foreach { _ =>
      cents = sumCentroids(assignNearest(c, cents).select(col("cluster"), col("q")))
    }
    cents
  }

  /** Train and MATERIALIZE the centroid model as a DataFrame
    * `(cluster, cent, n2)` — the persistable IVF index artifact: write
    * it with `.write.parquet(...)`, reload next run, and assign with
    * [[assignFromCentroids]] without retraining (the same cross-run
    * contract as [[Bloom.save]] for blocklists). k×dim longs — tiny at
    * any corpus scale.
    */
  def trainCentroids(
      corpus: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast(LongType).as("id"),
      quantize(col(embCol)).as("q"))
      .withColumn("n2", inorm2(col("q")))
      .localCheckpoint(true)
    val spark = corpus.sparkSession
    import spark.implicits._
    lloyd(c, k, iters).map(ct => (ct.cluster, ct.cent, ct.n2))
      .toDF("cluster", "cent", "n2")
  }

  /** Nearest-centroid assignment against a saved model: collects the
    * (small) centroid table and runs the narrow literal-centroid
    * assignment — zero shuffles over the corpus, no training jobs.
    */
  def assignFromCentroids(
      corpus: DataFrame, idCol: String, embCol: String,
      centroids: DataFrame): DataFrame = {
    val cents = centroids.select(col("cluster").cast(LongType),
        col("cent"), col("n2").cast(LongType))
      .collect()
      .map(r => Centroid(r.getLong(0), r.getSeq[Long](1), r.getLong(2)))
      .toSeq.sortBy(_.cluster)
    require(cents.nonEmpty, "empty centroid model")
    val c = corpus.select(col(idCol).cast(LongType).as("id"),
      quantize(col(embCol)).as("q"))
      .withColumn("n2", inorm2(col("q")))
    assignNearest(c, cents).select(col("id").as("vec_id"), col("cluster"))
  }

  /** Deterministic ±1 random hyperplanes for sign-LSH: entry (p, d) is
    * +1 iff the 60-bit md5 hash of "p:d" is odd — the same portable hash
    * family as everything else, so the DuckDB oracle reproduces the
    * exact matrix.
    */
  private[graft] def hyperplanes(nBits: Int, dim: Int): Seq[Seq[Long]] =
    (0 until nBits).map { p =>
      (0 until dim).map { d =>
        if (graft.expressions.MinHashKernel.hash60(s"$p:$d") % 2 == 1) 1L else -1L
      }
    }

  /** Sign-LSH bucket of a quantized vector: bit p set iff
    * `dot(v, plane_p) > 0`. Narrow codegen — nBits integer dot products
    * against literal planes per row.
    */
  private def lshBucket(q: Column, planes: Seq[Seq[Long]]): Column =
    planes.zipWithIndex.map { case (pv, i) =>
      when(idot(q, typedLit(pv)) > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Random-hyperplane LSH top-k (the LSH-bucketed ANN scale path,
    * complementing [[ivfTopK]]): corpus rows get a narrow nBits-bit
    * sign bucket; each query probes its own bucket plus every hamming-1
    * neighbor (multi-probe), and only those candidates are ranked by
    * exact cosine.
    *
    * Scale shape: bucketing is per-row compute (no shuffle, no training
    * pass — unlike IVF there is no centroid job at all), the probe list
    * is a per-query explode of nBits+1 keys, and the candidate join is a
    * broadcast of (query, bucket) pairs against the corpus with one
    * window over matched candidates. Expected candidates per query:
    * (nBits+1)/2^nBits of the corpus. Queries in sparse buckets may
    * return fewer than k rows — recall, not cost, is the LSH trade.
    */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String,
      k: Int, nBits: Int = 8): DataFrame = {
    require(nBits >= 1 && nBits <= 62, "nBits must be in [1, 62]")
    val c = corpus.select(col(idCol).cast(LongType).as("c_id"),
      quantize(col(embCol)).as("c_q"))
      .withColumn("c_n2", inorm2(col("c_q")))
    val q = queries.select(col(idCol).cast(LongType).as("q_id"),
      quantize(col(embCol)).as("q_q"))
      .withColumn("q_n2", inorm2(col("q_q")))

    // dim probe against the (small) query side only; no queries → empty
    // result (same schema), not a driver-side NoSuchElementException
    val dimOpt = q.select(size(col("q_q"))).limit(1).collect().headOption
    if (dimOpt.isEmpty) {
      return q.select(col("q_id"), lit(0L).as("rank"),
        col("q_id").as("neighbor_id"), lit(0.0d).as("cosine")).limit(0)
    }
    val planes = hyperplanes(nBits, dimOpt.get.getInt(0))

    val cb = c.withColumn("bucket", lshBucket(col("c_q"), planes))
    val probeKeys = array(
      (col("__b0") +: (0 until nBits).map(i =>
        col("__b0").bitwiseXOR(lit(1L << i)))): _*)
    val probed = q.withColumn("__b0", lshBucket(col("q_q"), planes))
      .select(col("q_id"), col("q_q"), col("q_n2"),
        explode(probeKeys).as("bucket"))

    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    cb.join(broadcast(probed), Seq("bucket"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cosine", cosine(idot(col("c_q"), col("q_q")), col("c_n2"), col("q_n2")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cosine"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, blocked by
    * cluster equality (the LSH-style bucket: only intra-bucket pairs are
    * scored, so the join cost is bucket-bounded, never n²).
    *
    * Same shape as [[TextDedup.minhashPairs]]: candidates come from the
    * bounded bucket build ([[TextDedup.bucketedPairs]] — no row ever
    * holds more than a capped slice-run of member ids, and a degenerate
    * cluster emits O(n·cap) pairs with slice-chain connectivity instead
    * of n²), and the quantize/norm pipeline is materialized once and
    * joined by id, not re-evaluated per join side.
    */
  def nearDupPairs(
      corpus: DataFrame, idCol: String, embCol: String, clusterCol: String,
      threshold: Double, maxBucket: Int = 256): DataFrame =
    nearDupPairsFromQuantized(
      quantizedClusteredCorpus(corpus, idCol, embCol, clusterCol),
      threshold, maxBucket)

  /** The blocked quantize/norm front shared by [[nearDupPairs]] and
    * [[semDedup]]: `(id, cluster, q, n2)`, eagerly local-checkpointed
    * ONCE (freed by the ContextCleaner, unlike a never-unpersisted
    * persist) because it feeds three consumers — the bucket build and
    * the two scoring joins.
    */
  private[graft] def quantizedClusteredCorpus(
      corpus: DataFrame, idCol: String, embCol: String,
      clusterCol: String): DataFrame =
    corpus.select(col(idCol).cast(LongType).as("id"),
      col(clusterCol).cast(LongType).as("cluster"),
      quantize(col(embCol)).as("q"))
      .withColumn("n2", inorm2(col("q")))
      .localCheckpoint(true)

  /** [[nearDupPairs]] over an already-quantized MATERIALIZED
    * `(id, cluster, q, n2)` frame. Buckets hold IDS ONLY (pair
    * expansion over longs, never over vector-laden structs); vectors
    * re-attach through the two joins against the materialized corpus.
    */
  private[graft] def nearDupPairsFromQuantized(
      c: DataFrame, threshold: Double, maxBucket: Int): DataFrame = {
    // lowCardKeys: label/k-means cluster blocking has ~k distinct keys
    // — the bucket-membership rank must range-decompose, not window
    val pairs = TextDedup.bucketedPairs(
      c.select(col("id"), col("cluster")), Seq("cluster"), maxBucket,
      lowCardKeys = true)
    pairs
      .join(c.select(col("id").as("id_a"), col("q").as("q_a"), col("n2").as("n2_a")), Seq("id_a"))
      .join(c.select(col("id").as("id_b"), col("q").as("q_b"), col("n2").as("n2_b")), Seq("id_b"))
      .withColumn("cosine", cosine(idot(col("q_a"), col("q_b")), col("n2_a"), col("n2_b")))
      .filter(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): embedding-level
    * semantic dedup — within each cluster, vectors whose cosine exceeds
    * `threshold` form an ε-group and only one representative survives.
    * Composes [[nearDupPairs]] (cluster-blocked, skew-capped pair
    * generation) with [[TextDedup.dedupClusters]] (iterative min-label
    * connected components), so the keeper is the MIN id of each
    * semantic component and singletons keep themselves. Output:
    * (vec_id, keeper_id, is_dup 0/1).
    *
    * Scale shape: identical to its two building blocks — pair volume is
    * bucket-bounded, CC state is O(|pairs|) not O(|corpus|), and the
    * final labeling is one left join against the corpus ids.
    */
  def semDedup(
      corpus: DataFrame, idCol: String, embCol: String, clusterCol: String,
      threshold: Double, maxBucket: Int = 256): DataFrame =
    semDedupFromQuantized(
      quantizedClusteredCorpus(corpus, idCol, embCol, clusterCol),
      threshold, maxBucket)

  /** [[semDedup]] over an already-quantized MATERIALIZED
    * `(id, cluster, q, n2)` frame — lets
    * [[graft.queries.SimilarityQueries.d4Select]] share one quantize
    * pass between SemDeDup and prototype pruning.
    */
  private[graft] def semDedupFromQuantized(
      c: DataFrame, threshold: Double, maxBucket: Int = 256): DataFrame = {
    val pairs = nearDupPairsFromQuantized(c, threshold, maxBucket)
    TextDedup.dedupClusters(c, "id", pairs)
      .select(col("doc_id").as("vec_id"),
        col("cluster_id").as("keeper_id"),
        (col("doc_id") =!= col("cluster_id")).cast(LongType).as("is_dup"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.PortableHash

/** KMV (k-minimum-values) distinct-count sketch — the deterministic
  * alternative to HLL (extension; SURVEY §2.10). Keep the k smallest
  * hash values of the distinct inputs; with hashes uniform on [0, D)
  * the k-th smallest h_k estimates the distinct count as
  * `(k-1) * D / h_k` (Bar-Yossef et al., "Counting distinct elements
  * in a data stream", RANDOM 2002 — the bottom-k generalization).
  *
  * Why this exists next to `approx_count_distinct`: HLL register values
  * are engine-specific, so the HLL query is graded rows-only. A KMV
  * sketch built on the portable md5-based hash is bit-identical in any
  * engine that sorts the same hashes — the ONLY sketch family where the
  * oracle can demand hash-exact equality. It is also trivially
  * mergeable (union the bottom-k sets, re-take bottom-k), which is the
  * 100 TB path: per-partition bottom-k, merge at the group level.
  *
  * Implementation shape: distinct (group, h) is one map-side-combined
  * aggregation; the per-group bottom-k is a rank window PARTITIONED BY
  * group — parallel across groups, and the sort input is the distinct
  * value set (vocabulary-sized, orders of magnitude below the fact
  * table). A custom bottom-k Aggregator would avoid even that sort;
  * the window form is chosen because Catalyst handles the partial
  * distinct and the plan stays whole-stage-codegen.
  *
  * The hash is the 60-bit portable hash truncated to 30 bits
  * (`h60 div 2^30`): the estimate arithmetic `(k-1) * 2^30 / h_k` then
  * stays inside BIGINT for any k, so Spark and DuckDB floor-divide
  * identically — no DECIMAL rounding drift. 30 bits is plenty for the
  * estimate's own ±1/sqrt(k-1) error; truncation collisions only merge
  * hash-adjacent values (deterministically, on both engines).
  */
object Kmv {

  val HashBits = 30
  val HashDomain: Long = 1L << HashBits // 2^30

  /** Per-group KMV sketch + estimate.
    *
    * Output: (groupCol, k_seen, kth_min, est_distinct) where
    * `k_seen` = min(k, observed distinct hashes), `kth_min` = largest
    * retained hash, and `est_distinct` = exact `k_seen` while the group
    * is under-filled (the sketch has seen everything) else
    * `(k-1) * 2^30 div kth_min`.
    */
  def distinctSketch(df: DataFrame, groupCol: String, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    // shiftright, not Column./ (double division — rounds 60-bit hashes)
    val hashed = df
      .select(col(groupCol), hash30(col(valueCol)).as("h"))
      .distinct()
    val w = Window.partitionBy(groupCol).orderBy(col("h"))
    hashed
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= k)
      .groupBy(col(groupCol))
      .agg(max(col("rk")).cast(LongType).as("k_seen"),
        max(col("h")).as("kth_min"))
      .withColumn("est_distinct",
        when(col("k_seen") < k, col("k_seen"))
          .otherwise(
            expr(s"(${k - 1} * ${HashDomain}L) div greatest(kth_min, 1L)"))
          .cast(LongType))
  }

  /** Deterministic bottom-k-by-hash sample per group — the KMV idea
    * applied to SAMPLING: keep the k rows whose (hash, tiebreak) is
    * smallest. Mergeable exactly like the distinct sketch (bottom-k of
    * a union of bottom-k sets is the bottom-k of the union), and fully
    * replayable in SQL, so sample-derived statistics stay hash-exact
    * cross-engine.
    *
    * Two-stage rank so no single per-group sort sees the whole corpus:
    * stage 1 ranks within (group, h mod fanout) sub-buckets — corpus
    * partitioned `fanout` ways per group — and keeps at most k rows
    * each; stage 2 ranks the surviving <= fanout·k candidate rows per
    * group. Equivalent to one global rank (a row in the global bottom-k
    * is in its sub-bucket's bottom-k a fortiori).
    *
    * Output: input columns + `sample_rk` (1-based position in the
    * group's (hash, tiebreak) order).
    */
  def bottomKByHash(df: DataFrame, groupCol: String, hashCol: String,
      tieCol: String, k: Int, fanout: Int = 256): DataFrame = {
    require(k >= 1 && fanout >= 1)
    val pre = Window.partitionBy(col(groupCol), pmod(col(hashCol), lit(fanout.toLong)))
      .orderBy(col(hashCol), col(tieCol))
    val cand = df.withColumn("__pre_rk", row_number().over(pre))
      .filter(col("__pre_rk") <= k).drop("__pre_rk")
    val fin = Window.partitionBy(col(groupCol)).orderBy(col(hashCol), col(tieCol))
    cand.withColumn("sample_rk", row_number().over(fin))
      .filter(col("sample_rk") <= k)
  }

  // ---- Aggregator form (the mergeable 100 TB / streaming path) -----

  /** Bottom-k buffer: ascending, distinct, size <= k. */
  case class KmvState(hs: Seq[Long])

  case class KmvSummary(k_seen: Long, kth_min: Long, est_distinct: Long)

  /** KMV as a typed [[Aggregator]] over pre-hashed values: O(k) state
    * per group, partials combine map-side (bottom-k of a union of
    * bottom-k sets IS the bottom-k of the union — mergeability is
    * exact, per Agarwal et al., "Mergeable Summaries", PODS'12), and
    * the same UDAF drops into a streaming groupBy in update/complete
    * mode. Unlike Misra-Gries/HLL, the merged result is bit-identical
    * to the single-pass result — the companion spec asserts equality
    * with the window-based [[distinctSketch]], not an error bound.
    */
  class KmvAgg(k: Int) extends Aggregator[Long, KmvState, KmvSummary] {
    require(k >= 2, "KMV needs k >= 2")

    override def zero: KmvState = KmvState(Vector.empty)

    override def reduce(s: KmvState, h: Long): KmvState =
      if (s.hs.contains(h)) s
      else if (s.hs.size < k) KmvState((s.hs :+ h).sorted)
      else if (h < s.hs.last) KmvState(((s.hs.init :+ h): Seq[Long]).sorted)
      else s

    override def merge(a: KmvState, b: KmvState): KmvState =
      KmvState((a.hs ++ b.hs).distinct.sorted.take(k))

    override def finish(s: KmvState): KmvSummary = {
      val seen = s.hs.size.toLong
      val kth = if (s.hs.isEmpty) 0L else s.hs.last
      val est =
        if (seen < k) seen
        else (k - 1).toLong * HashDomain / math.max(kth, 1L)
      KmvSummary(seen, kth, est)
    }

    override def bufferEncoder: Encoder[KmvState] = Encoders.product[KmvState]
    override def outputEncoder: Encoder[KmvSummary] = Encoders.product[KmvSummary]
  }

  /** Column form: `kmv_sketch(hash_col)` for any groupBy (batch or
    * streaming). Feed it [[hash30]] of the value column.
    */
  def sketchAgg(hashCol: org.apache.spark.sql.Column, k: Int = 64): org.apache.spark.sql.Column =
    udaf(new KmvAgg(k)).apply(hashCol)

  /** The 30-bit portable hash [[distinctSketch]] sorts on
    * (`shiftright` = `div 2^30` on the non-negative 60-bit hash).
    */
  def hash30(value: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    shiftright(PortableHash.hash60(value.cast("string")), HashBits)
      .cast(LongType)

  /** KMV set-operation estimates between two value sets sharing the
    * 30-bit hash space: distinct-count estimates for each side, their
    * union (bottom-k of the merged distinct hashes — KMV sketches are
    * closed under union), and the intersection via the
    * Jaccard-from-union-sketch identity (Beyer et al., SIGMOD'07):
    * of the union sketch's k smallest hashes, the fraction present in
    * BOTH sides estimates the Jaccard, so
    *
    *   est_intersection = n_both · est_union div u_seen
    *
    * (integer arithmetic; under-filled sketches degrade to EXACT
    * values, since the sketch then holds the whole union). The audit
    * column `inter_hashes` is the exact distinct-hash intersection.
    *
    * This is the sketch algebra a query planner / corpus-diff tool
    * runs INSTEAD of a distinct-join at 100 TB: each side collapses to
    * k longs (`orderBy(h).limit(k)` is Spark's TakeOrderedAndProject —
    * per-partition bottom-k, driver merge of partitions × k rows, no
    * global sort), and only the vocabulary-sized exact-audit join
    * touches more.
    *
    * Output (1 row): est_a, est_b, est_union, n_both, est_intersection,
    * inter_hashes.
    */
  def setOpsSketch(a: DataFrame, b: DataFrame, valueCol: String,
      k: Int = 64): DataFrame = {
    require(k >= 2, "KMV needs k >= 2")
    val ha = a.select(hash30(col(valueCol)).as("h")).distinct()
      .localCheckpoint(true) // feeds own sketch + merge + exact audit
    val hb = b.select(hash30(col(valueCol)).as("h")).distinct()
      .localCheckpoint(true)
    def est(seen: String, kth: String): org.apache.spark.sql.Column =
      when(col(seen) < k, col(seen))
        .otherwise(expr(s"(${k - 1} * ${HashDomain}L) div greatest($kth, 1L)"))
        .cast(LongType)
    def side(h: DataFrame, tag: String): DataFrame =
      h.orderBy("h").limit(k)
        .agg(count(lit(1)).cast(LongType).as(s"${tag}_seen"),
          max(col("h")).as(s"${tag}_kth"))
    val merged = ha.select(col("h"), lit(1L).as("in_a"), lit(0L).as("in_b"))
      .unionAll(hb.select(col("h"), lit(0L).as("in_a"), lit(1L).as("in_b")))
      .groupBy("h")
      .agg(max(col("in_a")).as("in_a"), max(col("in_b")).as("in_b"))
    val u = merged.orderBy("h").limit(k)
      .agg(count(lit(1)).cast(LongType).as("u_seen"),
        max(col("h")).as("u_kth"),
        sum(col("in_a") * col("in_b")).cast(LongType).as("n_both"))
    val exact = ha.join(hb, Seq("h"))
      .agg(count(lit(1)).cast(LongType).as("inter_hashes"))
    side(ha, "a").crossJoin(broadcast(side(hb, "b")))
      .crossJoin(broadcast(u)).crossJoin(broadcast(exact))
      .select(
        est("a_seen", "a_kth").as("est_a"),
        est("b_seen", "b_kth").as("est_b"),
        est("u_seen", "u_kth").as("est_union"),
        col("n_both"),
        when(col("u_seen") > 0,
          expr(s"(n_both * (CASE WHEN u_seen < $k THEN u_seen ELSE (${k - 1} * ${HashDomain}L) div greatest(u_kth, 1L) END)) div u_seen"))
          .otherwise(lit(0L)).cast(LongType).as("est_intersection"),
        col("inter_hashes"))
  }

  /** DuckDB oracle twin of [[distinctSketch]] over a CTE exposing
    * (group, value) rows; keep in lockstep.
    */
  def distinctSketchSql(srcCte: String, groupCol: String, valueExpr: String,
      k: Int = 64): String = {
    val h = graft.queries.DuckSql.hash60(s"CAST($valueExpr AS VARCHAR)")
    s"""hashed AS (SELECT DISTINCT $groupCol, ($h) // ${HashDomain} AS h FROM $srcCte),
       |ranked AS (SELECT $groupCol, h,
       |    row_number() OVER (PARTITION BY $groupCol ORDER BY h) AS rk
       |  FROM hashed),
       |kmv AS (SELECT $groupCol,
       |    CAST(max(rk) AS BIGINT) AS k_seen,
       |    CAST(max(h) AS BIGINT) AS kth_min,
       |    CAST(CASE WHEN max(rk) < $k THEN max(rk)
       |         ELSE (CAST(${k - 1} AS BIGINT) * CAST(${HashDomain} AS BIGINT))
       |           // greatest(max(h), 1) END AS BIGINT)
       |      AS est_distinct
       |  FROM ranked WHERE rk <= $k GROUP BY $groupCol)""".stripMargin
  }
}

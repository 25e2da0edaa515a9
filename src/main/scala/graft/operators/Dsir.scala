package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.PortableHash

/** DSIR-style importance-weighted data selection (Xie et al. 2023,
  * "Data Selection for Language Models via Importance Resampling",
  * arXiv:2302.03169), integer-exact variant.
  *
  * The published method scores raw documents by a hashed n-gram
  * log-likelihood ratio log p_target(x)/p_raw(x) and resamples toward
  * the target distribution. This keeps the architecture — tokens feed a
  * fixed D-bucket feature hash, bucket unigram counts estimate each
  * distribution — but replaces the float log-ratio with an integer
  * per-bucket target-affinity weight
  *
  *   w_b = 1e6 * (t_b + 1) div (t_b + r_b + 2)     (add-one smoothing)
  *
  * and scores a document as the tf-weighted mean of its buckets'
  * weights (ppm). Selection pressure is the same direction as DSIR's
  * ratio — buckets dominated by target text pull a document's score
  * toward 1e6, raw-only buckets toward 0 — and every value is exactly
  * reproducible in any engine (the DuckDB oracle hash-matches).
  *
  * 100 TB shape: ONE tokenize+hash pass, pre-aggregated to the compact
  * `(doc_id, bucket, tf)` table and materialized once for its two
  * consumers (bucket totals, per-doc scores). The bucket weight table
  * is bounded by D (2^12 here, 2^20 in production — still broadcast
  * range) so the corpus-sized side joins against a broadcast and never
  * reshuffles. Map-side partial aggregation carries both count passes.
  */
object Dsir {

  /** Compact `(doc_id, is_target, bucket, tf)` feature table — the one
    * tokenize+hash pass everything else reads.
    */
  private def bucketTf(docs: DataFrame, isTarget: Column, d: Int): DataFrame =
    docs
      .select(col("doc_id").cast(LongType).as("doc_id"), isTarget.as("is_target"),
        explode(graft.operators.Fts.tokens(Seq(col("text")))).as("term"))
      .withColumn("bucket", PortableHash.hash60(col("term")) % d)
      .groupBy(col("doc_id"), col("is_target"), col("bucket"))
      .agg(count(lit(1)).as("tf"))

  /** Train the bucket-weight model `(bucket, w_ppm)` from a corpus with
    * marked target exemplars — the persistable DSIR artifact (same
    * cross-run contract as [[Similarity.trainCentroids]] /
    * [[Bloom.save]]): write it with `.write.parquet(...)`, reload, and
    * score future batches with [[applyWeights]] without re-reading the
    * reference corpus. At most D rows at any corpus scale.
    */
  def weights(docs: DataFrame, isTarget: Column, d: Int = 4096): DataFrame =
    bucketTf(docs, isTarget, d).groupBy(col("bucket"))
      .agg(
        sum(when(col("is_target"), col("tf")).otherwise(lit(0L))).as("t_raw"),
        sum(when(!col("is_target"), col("tf")).otherwise(lit(0L))).as("r_raw"))
      .select(col("bucket"),
        expr("1000000 * (t_raw + 1) div (t_raw + r_raw + 2)").as("w_ppm"))

  /** The MERGEABLE form of the model: raw per-bucket target/raw counts
    * `(bucket, t_raw, r_raw)` — the sufficient statistic behind
    * [[weights]]'s collapsed ratio (which is NOT mergeable). Counts
    * add across corpus drops; collapse with [[weightsFromCounts]] at
    * apply time. `mergeCounts(counts(A), counts(B)) == counts(A ∪ B)`
    * exactly (spec-proven).
    */
  def counts(docs: DataFrame, isTarget: Column, d: Int = 4096): DataFrame =
    bucketTf(docs, isTarget, d).groupBy(col("bucket"))
      .agg(
        sum(when(col("is_target"), col("tf")).otherwise(lit(0L)))
          .cast(LongType).as("t_raw"),
        sum(when(!col("is_target"), col("tf")).otherwise(lit(0L)))
          .cast(LongType).as("r_raw"))

  def mergeCounts(parts: Seq[DataFrame]): DataFrame = {
    require(parts.nonEmpty, "merge at least one count table")
    parts.reduce(_ unionAll _)
      .groupBy(col("bucket"))
      .agg(sum(col("t_raw")).cast(LongType).as("t_raw"),
        sum(col("r_raw")).cast(LongType).as("r_raw"))
  }

  /** Collapse a (merged) count table to the `(bucket, w_ppm)` model
    * [[applyWeights]] consumes — identical to [[weights]] on the same
    * corpus.
    */
  def weightsFromCounts(counts: DataFrame): DataFrame =
    counts.select(col("bucket"),
      expr("1000000 * (t_raw + 1) div (t_raw + r_raw + 2)").as("w_ppm"))

  /** Score a batch against a trained weight model. Buckets unseen at
    * training time carry the uninformative prior 1e6*1/2 = 500000
    * (t=r=0 in the smoothed weight), so novel vocabulary neither
    * attracts nor repels. One explode pass, one broadcast join — the
    * batch never shuffles on anything wider than its own tf aggregate.
    */
  def applyWeights(batch: DataFrame, model: DataFrame, d: Int = 4096,
      keepPpm: Long = 500000L): DataFrame = {
    val tf = bucketTf(batch, lit(false), d).drop("is_target")
    tf.join(broadcast(model), Seq("bucket"), "left")
      .withColumn("w_ppm", coalesce(col("w_ppm"), lit(500000L)))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast(LongType).as("n_tokens"),
        sum(col("tf") * col("w_ppm")).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        expr("s div n_tokens").cast(LongType).as("score_ppm"))
      .withColumn("keep", (col("score_ppm") >= keepPpm).cast(LongType))
      .orderBy("doc_id")
  }

  /** Per-document target-affinity scores, trained and applied on the
    * same corpus (one materialized feature pass feeds both).
    *
    * @param docs     corpus with `doc_id`, `text` columns
    * @param isTarget predicate marking the target-domain exemplars
    *                 (evaluated per document; e.g. a curated source)
    * @param d        feature-hash bucket count
    * @param keepPpm  keep threshold on the ppm score
    * @return (doc_id, n_tokens, score_ppm, keep) ordered by doc_id;
    *         zero-token documents drop out (no evidence either way)
    */
  def score(docs: DataFrame, isTarget: Column, d: Int = 4096,
      keepPpm: Long = 500000L): DataFrame = {
    val tf = bucketTf(docs, isTarget, d).localCheckpoint(true)
    val w = tf.groupBy(col("bucket"))
      .agg(
        sum(when(col("is_target"), col("tf")).otherwise(lit(0L))).as("t_raw"),
        sum(when(!col("is_target"), col("tf")).otherwise(lit(0L))).as("r_raw"))
      .select(col("bucket"),
        expr("1000000 * (t_raw + 1) div (t_raw + r_raw + 2)").as("w_ppm"))
    tf.join(broadcast(w), Seq("bucket"))
      .groupBy(col("doc_id"))
      .agg(sum(col("tf")).cast(LongType).as("n_tokens"),
        sum(col("tf") * col("w_ppm")).as("s"))
      .select(col("doc_id"), col("n_tokens"),
        expr("s div n_tokens").cast(LongType).as("score_ppm"))
      .withColumn("keep", (col("score_ppm") >= keepPpm).cast(LongType))
      .orderBy("doc_id")
  }
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.PortableHash
import graft.operators.Fts

/** Stateless streaming DSIR scoring (extension — SURVEY §7.2.8): apply
  * a trained [[graft.operators.Dsir.weights]] model to documents AS
  * THEY ARRIVE, so target-affinity selection happens at ingest instead
  * of in a nightly batch.
  *
  * The batch scorer ([[graft.operators.Dsir.applyWeights]]) joins the
  * batch's bucket-tf aggregate against the model — a shuffle, which a
  * streaming ingest filter should not pay. But the DSIR model is
  * D-bounded BY CONSTRUCTION (one row per feature-hash bucket, D=4096
  * here, 2^20 in production — a few MB either way), so it collapses to
  * a plain broadcast map and scoring becomes ONE narrow projection:
  * tokenize, hash each token to its bucket, sum the buckets' weights,
  * integer-divide by the token count. No join, no shuffle, no state
  * store; works in `append` mode with no watermark; integer-identical
  * to the batch scorer on the same rows (the spec proves it).
  *
  * Per-token bucket weights sum in a single JVM call per ROW (array in,
  * sum out) — same stance as [[graft.operators.Bloom.mightContainLong]]:
  * a UDF is acceptable OUTSIDE hot aggregation paths, and the
  * tokenizer/hash stay the shared native expressions so the feature
  * space cannot drift from the batch side.
  */
object StreamScore {

  /** Add `n_tokens`, `score_ppm`, `keep` to `df` (streaming or batch)
    * from a collected DSIR model. Zero-token documents are dropped,
    * matching [[graft.operators.Dsir.applyWeights]]. `model` is the
    * `(bucket, w_ppm)` table collected to a map — use [[collectModel]].
    */
  def dsirScore(
      df: DataFrame, textCol: String, model: Map[Long, Long],
      d: Int = 4096, keepPpm: Long = 500000L): DataFrame = {
    val bcast = df.sparkSession.sparkContext.broadcast(model)
    val sumW = udf((buckets: Seq[Long]) =>
      buckets.map(b => bcast.value.getOrElse(b, 500000L)).sum)
    df.withColumn("__buckets",
        transform(Fts.tokens(Seq(col(textCol))),
          t => PortableHash.hash60(t) % d))
      .withColumn("n_tokens", size(col("__buckets")).cast(LongType))
      .filter(col("n_tokens") >= 1)
      .withColumn("__sum_w", sumW(col("__buckets")))
      .withColumn("score_ppm",
        expr("__sum_w div n_tokens").cast(LongType))
      .withColumn("keep", (col("score_ppm") >= keepPpm).cast(LongType))
      .drop("__buckets", "__sum_w")
  }

  /** Collect a `(bucket, w_ppm)` model table to the driver map the
    * stream broadcasts — bounded by D rows, the same "bounded driver
    * state" budget as BPE merge tables and k-means centroids.
    */
  def collectModel(model: DataFrame): Map[Long, Long] =
    model.select(col("bucket").cast(LongType), col("w_ppm").cast(LongType))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
}

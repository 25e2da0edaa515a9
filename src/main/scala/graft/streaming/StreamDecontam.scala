package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType
import org.apache.spark.util.sketch.BloomFilter

import graft.operators.TextDedup

/** Streaming eval-set decontamination (extension — SURVEY §7.2.8): flag
  * documents that overlap a held-out benchmark BEFORE they enter the
  * training corpus, at ingest time.
  *
  * The batch gate ([[graft.operators.TextDedup.contaminationCheck]])
  * joins corpus shingles against the benchmark set and aggregates per
  * (doc, bench) pair — fine offline, but a streaming aggregation would
  * hold per-pair state and emit on watermark close. Ingest filtering
  * wants a STATELESS verdict per arriving row, so this flags via a
  * broadcast Bloom filter over the benchmark's shingle hashes instead:
  *
  *   hit_ppm = 1e6 * |{s ∈ S(doc) : bloom(s)}| div |S(doc)|
  *
  * — one narrow map per row, no shuffle, no state store, works in
  * `append` mode with no watermark. The trade is direction-al: Bloom
  * false positives can only INFLATE hit_ppm, so the flag over-quarantines
  * (safe for decontamination — a flagged doc goes to the exact batch
  * check, an unflagged doc is provably below threshold minus fpp noise).
  * Containment here is doc-sided (share of the DOC's shingles that are
  * benchmark-tainted), the natural per-row quantity when the benchmark
  * side is a merged set; the batch check's bench-sided containment
  * remains the authority on which benchmark item leaked.
  *
  * 100 TB shape: the benchmark bloom is ~1.2 bits/shingle at 1% fpp
  * (150 MB per billion shingles — broadcastable where the raw set is
  * not), built once offline ([[graft.operators.Bloom.buildLong]]),
  * persisted ([[graft.operators.Bloom.save]]), and loaded per stream
  * restart in milliseconds. Identical semantics on a batch DataFrame —
  * the spec proves stream/batch agreement.
  */
object StreamDecontam {

  /** Add `n_shingles`, `n_hits`, `hit_ppm`, `contaminated` to `df`
    * (streaming or batch). `bf` holds the benchmark's distinct
    * w-shingle 60-bit hashes ([[TextDedup.shingleHashes]] space).
    */
  def flagContaminated(
      df: DataFrame, textCol: String, bf: BloomFilter,
      w: Int = 3, minHitPpm: Long = 500000L): DataFrame = {
    val bcast = df.sparkSession.sparkContext.broadcast(bf)
    // one JVM call per ROW (array in, count out), not per shingle —
    // the probe sits outside any aggregation, same stance as
    // Bloom.mightContainLong
    val hits = udf((hs: Seq[Long]) =>
      if (hs == null) 0L else hs.count(h => bcast.value.mightContainLong(h)).toLong)
    df.withColumn("__sh", TextDedup.shingleHashes(col(textCol), w))
      .withColumn("n_shingles", size(col("__sh")).cast(LongType))
      .withColumn("n_hits", hits(col("__sh")))
      // shingleHashes yields >= 1 element even for empty text, so the
      // divisor is never zero
      .withColumn("hit_ppm", expr("(1000000 * n_hits) div n_shingles"))
      .withColumn("contaminated", (col("hit_ppm") >= minHitPpm).cast(LongType))
      .drop("__sh")
  }

  /** Build the benchmark bloom from a benchmark table: distinct
    * w-shingle hashes across all its documents, merged into one filter.
    */
  def benchmarkBloom(
      benchmark: DataFrame, textCol: String,
      expectedShingles: Long, fpp: Double = 0.01, w: Int = 3): BloomFilter =
    graft.operators.Bloom.buildLong(
      benchmark
        .select(explode(TextDedup.shingleHashes(col(textCol), w)).as("h"))
        .distinct(),
      "h", expectedShingles, fpp)
}

package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.PortableHash

/** Streaming ingest deduplication (extension — SURVEY §7.2.8): drop
  * exact-duplicate documents as they arrive, keeping the FIRST
  * occurrence, via Structured Streaming's stateful `dropDuplicates`.
  *
  * Scale design: state is keyed on the 60-bit content hash — a fixed
  * 8-byte key per distinct document instead of the full text, so the
  * state store holds O(distinct) small entries and the stream shuffles
  * once on the hash (the same key the batch [[graft.operators.TextDedup.exact]]
  * groups on). With an event-time watermark
  * (`dropDuplicatesWithinWatermark`) state for keys older than the
  * watermark is evicted — bounded memory on an unbounded stream, the
  * standard trade (exact dedup within the watermark horizon, re-admits
  * beyond it).
  */
object StreamDedup {

  /** Unbounded-state variant: exact dedup over the whole stream history.
    * `df` must contain `textCol`; emits input rows plus `content_hash`.
    */
  def exactDedupStream(df: DataFrame, textCol: String): DataFrame =
    df.withColumn("content_hash", PortableHash.hash60(col(textCol)))
      .dropDuplicates("content_hash")

  /** Watermarked variant: state bounded to the watermark horizon.
    * `df` must contain an event-time column `tsCol`.
    */
  def exactDedupStreamWatermarked(
      df: DataFrame, textCol: String, tsCol: String, watermark: String): DataFrame =
    df.withColumn("content_hash", PortableHash.hash60(col(textCol)))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("content_hash")

  /** URL-keyed crawl dedup at ingest: canonicalize
    * ([[graft.operators.UrlOps.canonicalize]] — a stateless codegen'd
    * regex chain, streaming-safe by construction) and keep the FIRST
    * crawl per canonical URL. State is keyed on the canonical string's
    * 60-bit hash — 8 bytes per distinct page, same footprint argument
    * as [[exactDedupStream]]. (The batch `x_url_dedup` keeps the LATEST
    * crawl; an unbounded stream has no "latest", so ingest-time policy
    * is first-wins.) State here is PERMANENT by design — plain
    * `dropDuplicates` never evicts, so every re-crawl of a page is
    * dropped for the life of the query and state grows with the number
    * of DISTINCT pages (8 bytes each). For an unbounded crawl frontier
    * use [[urlDedupStreamWatermarked]], which bounds state to the
    * watermark horizon at the cost of re-admitting a page re-crawled
    * after the horizon passes.
    */
  def urlDedupStream(df: DataFrame, urlCol: String): DataFrame =
    df.withColumn("canonical_url", graft.operators.UrlOps.canonicalize(col(urlCol)))
      .withColumn("url_hash", PortableHash.hash60(col("canonical_url")))
      .dropDuplicates("url_hash")

  /** Watermarked URL dedup: state bounded to the watermark horizon —
    * the bounded-state ingest variant of [[urlDedupStream]] (same
    * canonical-hash key; `df` must carry an event-time `tsCol`). A page
    * re-crawled within the horizon is dropped; beyond it the key has
    * been evicted and the re-crawl is admitted — the same exact-within-
    * horizon trade as [[exactDedupStreamWatermarked]].
    */
  def urlDedupStreamWatermarked(
      df: DataFrame, urlCol: String, tsCol: String, watermark: String): DataFrame =
    df.withColumn("canonical_url", graft.operators.UrlOps.canonicalize(col(urlCol)))
      .withColumn("url_hash", PortableHash.hash60(col("canonical_url")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("url_hash")

  /** Ingest-time SPAN scrubbing — the streaming twin of
    * [[graft.operators.TextDedup.dupSpanPruneIncremental]]'s
    * known-gram path: every n-token window whose gram hash probes
    * positive in a broadcast Bloom of the PRIOR corpus's grams is cut
    * from the arriving document. Entirely per-row (window hashes via
    * the native kernel, probe + interval-merge + rebuild in one UDF
    * call, O(tokens) per doc) — NO state, NO aggregation, NO
    * watermark, so it composes into any append-mode ingest at any
    * rate. The trade vs the batch twin: (a) no intra-stream dedup
    * (two novel near-identical docs in the stream both pass — run the
    * batch pass over the accumulated corpus periodically), and (b)
    * Bloom false positives OVER-prune ~fpp of novel windows — size
    * the filter for the token budget (1% fpp ≈ 1.2 bits/gram; a
    * 1e10-gram prior corpus is a ~1.5 GB broadcast, the scalable form
    * of "the state table" that a stream-static join would re-shuffle
    * every micro-batch).
    *
    * Output: `(<idCol>, n_tokens, n_removed, pruned_text)` — the batch
    * family's schema.
    */
  def spanScrubStream(
      df: DataFrame, idCol: String, textCol: String,
      grams: org.apache.spark.util.sketch.BloomFilter,
      n: Int = 20): DataFrame = {
    require(n >= 2, "window must be >= 2 tokens")
    val bcast = df.sparkSession.sparkContext.broadcast(grams)
    val scrub = udf((toks: Seq[String], hs: Seq[Long]) => {
      // null text -> null outputs (the batch twin's behavior); a task
      // NPE here would take down the whole append-mode streaming query
      if (toks == null || hs == null) null
      else {
      val m = toks.length
      if (m < n) (m.toLong, 0L, toks.mkString(" "))
      else {
        val covered = new Array[Boolean](m)
        var end = 0 // exclusive end of coverage so far — O(m) total
        var i = 0
        while (i <= m - n) {
          if (bcast.value.mightContainLong(hs(i))) {
            var j = math.max(i, end)
            while (j < i + n) { covered(j) = true; j += 1 }
            end = i + n
          }
          i += 1
        }
        val kept = toks.indices.collect { case j if !covered(j) => toks(j) }
        (m.toLong, (m - kept.length).toLong, kept.mkString(" "))
      }
      }
    })
    df.select(col(idCol),
        graft.operators.TextDedup.tokensCol(col(textCol)).as("__toks"),
        graft.expressions.ShingleHashSeq60
          .shingle_hash_seq60(col(textCol), n).as("__hs"))
      .withColumn("__out", scrub(col("__toks"), col("__hs")))
      .select(col(idCol),
        col("__out._1").as("n_tokens"),
        col("__out._2").as("n_removed"),
        col("__out._3").as("pruned_text"))
  }
}

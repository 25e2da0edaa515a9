package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.PortableHash
import graft.operators.TextDedup

/** End-to-end incremental ingest pipeline — the production shape of a
  * crawl pipeline, composed from the per-operator incremental pieces
  * the engine already grades separately (`x_dedup_incremental`,
  * `x_novelty_incremental`, `x_corpus_manifest`) into ONE dataflow with
  * ONE oracle, so cross-operator seams (keeper hashes feeding the
  * dedup gate feeding the novelty scorer feeding the manifest update)
  * are themselves hash-graded.
  *
  * Replay: drop A (`doc_id < 250` of the exact-dedup fixture corpus)
  * is yesterday's ingest — its persisted state is the keeper content-
  * hash index, the distinct 3-gram index, and the two-level Merkle
  * shard manifest. Drop B (everything else, including the fixture's
  * planted clones: copies of A docs → cross-drop dups; copies of B
  * docs → in-batch dups) arrives today and flows through:
  *
  *   1. history gate — drop B docs whose content hash is already in
  *      A's keeper index (`dup_history`);
  *   2. in-batch exact dedup — keep the min-id doc per content hash
  *      among survivors (`accepted`), the rest are `dup_batch`
  *      ([[TextDedup.exactIncremental]]'s two steps, spelled with the
  *      per-doc ledger retained so dispositions aggregate by shard);
  *   3. novelty — accepted docs' distinct 3-gram hashes left-join A's
  *      gram index; grams absent from history count as new (same
  *      contract as `x_novelty_incremental`: batch-internal repeats
  *      are not credited);
  *   4. manifest update — the two-level Merkle shard hash (bounded
  *      1024-leaf chunks, see [[CorpusQueries.corpusManifest]]) over
  *      A's keepers (before) and A's keepers ∪ accepted B (after).
  *
  * Output: one row per shard — arrival/disposition counts, novelty
  * mass, and the before/after manifest hashes with a changed/ok
  * status. Shard-grain (S=16 rows) so the report is bounded at any
  * corpus size.
  *
  * Scale shape (100 TB): the history keeper index and gram index join
  * on their hash keys — both are single keyed exchanges where the
  * BATCH is the small side at steady state (Bloom-prefilter the index
  * side exactly like incremental dedup, [[graft.operators.Bloom]]);
  * history texts are never re-read beyond the one manifest pass, and a
  * real pipeline persists the chunk hashes so "before" is a read of
  * S·(N/(S·1024)) chunk rows, not a corpus scan. No windows, no
  * unbounded collects (chunk rows are ≤1024 leaves), every aggregate
  * map-side combined.
  */
object PipelineQueries {

  private val S = 16 // manifest shard count, matches corpusManifest

  /** Two-level Merkle shard hashes of `(doc_id, text)` rows: bounded
    * chunk hashes (≤1024 leaves, `chunk = (doc_id div S) div 1024` —
    * within a shard, doc_id div S order IS doc_id order), then one
    * hash per shard over the ordered chunk hashes.
    */
  private def shardHashes(d: DataFrame, outCol: String): DataFrame =
    d.select(col("doc_id"),
        (col("doc_id") % S).cast(LongType).as("shard"),
        expr(s"(CAST(doc_id AS BIGINT) div $S) div 1024").cast(LongType).as("chunk"),
        md5(col("text").cast("binary")).as("leaf"))
      .groupBy(col("shard"), col("chunk"))
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(col("doc_id"), col("leaf")))),
        s => s("leaf")), "").cast("binary")).as("chunk_hash"))
      .groupBy(col("shard"))
      .agg(md5(array_join(transform(
        array_sort(collect_list(struct(col("chunk"), col("chunk_hash")))),
        s => s("chunk_hash")), "").cast("binary")).as(outCol))

  /** Stages 1+2 of the ingest replay as a reusable batch ledger:
    * history gate against `histIndex`'s `content_hash` column, then
    * in-batch min-id dedup. One row per arriving doc with `status` in
    * {dup_history, accepted, dup_batch}. The history join is keyed on
    * the content hash — NOT broadcast: at steady state the history
    * side is the big one. [[graft.streaming.StreamIngest]] is the
    * online twin (StreamingSpec pins disposition equality on the
    * two-drop replay).
    */
  private[graft] def ingestLedger(b: DataFrame, histIndex: DataFrame): DataFrame = {
    val gated = b.join(
      histIndex.select(col("content_hash"), lit(1L).as("__hist")).distinct(),
      Seq("content_hash"), "left")
    val bMin = gated.filter(col("__hist").isNull)
      .groupBy(col("content_hash"))
      .agg(min(col("doc_id")).as("__keep"))
    gated.join(bMin, Seq("content_hash"), "left")
      .withColumn("status",
        when(col("__hist").isNotNull, lit("dup_history"))
          .when(col("doc_id") === col("__keep"), lit("accepted"))
          .otherwise(lit("dup_batch")))
      .select(col("doc_id"), col("shard"), col("text"), col("status"))
  }

  def pipelineIncremental(spark: SparkSession, dir: String): DataFrame = {
    val corpus = DedupQueries.corpusExact(spark, dir)
    val a = corpus.filter(col("doc_id") < 250)
    val b = corpus.filter(col("doc_id") >= 250)
      .select(col("doc_id"), (col("doc_id") % S).cast(LongType).as("shard"),
        col("text"), PortableHash.hash60(col("text")).as("content_hash"))

    // persisted state of drop A: keeper ledger (hash + keeper id +
    // text — the text only feeds the manifest pass; a real pipeline
    // persists the chunk hashes instead and never re-reads history)
    val aKeep = a
      .groupBy(PortableHash.hash60(col("text")).as("content_hash"), col("text"))
      .agg(min(col("doc_id")).cast(LongType).as("keep_id"))

    // stage 1+2: history gate, then in-batch min-id dedup
    val ledger = ingestLedger(b, aKeep)
      // three consumers (counts, novelty, manifest-after) of a
      // two-join subtree — evaluate once
      .localCheckpoint(true)

    // stage 3: novelty of accepted docs vs A's distinct-gram index
    val aGrams = a
      .select(explode(TextDedup.shingleHashes(col("text"), 3)).as("g"))
      .distinct().withColumn("__seen", lit(1L))
    val bGrams = ledger.filter(col("status") === "accepted")
      .select(col("doc_id"), col("shard"),
        explode(TextDedup.shingleHashes(col("text"), 3)).as("g"))
    val novelty = bGrams.join(aGrams, Seq("g"), "left")
      .groupBy(col("shard"))
      .agg(count(lit(1)).cast(LongType).as("n_grams"),
        sum(when(col("__seen").isNull, lit(1L)).otherwise(lit(0L)))
          .cast(LongType).as("n_new"))

    // stage 4: manifest before/after
    val before = shardHashes(
      aKeep.select(col("keep_id").as("doc_id"), col("text")), "hash_before")
    val after = shardHashes(
      aKeep.select(col("keep_id").as("doc_id"), col("text"))
        .unionAll(ledger.filter(col("status") === "accepted")
          .select(col("doc_id"), col("text"))), "hash_after")

    // shard rollup (S rows — every join below is shard-grain)
    val nBefore = aKeep
      .groupBy((col("keep_id") % S).cast(LongType).as("shard"))
      .agg(count(lit(1)).cast(LongType).as("n_before"))
    val counts = ledger.groupBy(col("shard"))
      .agg(count(lit(1)).cast(LongType).as("n_arrived"),
        sum(when(col("status") === "dup_history", 1L).otherwise(0L))
          .cast(LongType).as("n_dup_history"),
        sum(when(col("status") === "dup_batch", 1L).otherwise(0L))
          .cast(LongType).as("n_dup_batch"),
        sum(when(col("status") === "accepted", 1L).otherwise(0L))
          .cast(LongType).as("n_accepted"))
    nBefore.join(counts, Seq("shard"), "full_outer")
      .join(novelty, Seq("shard"), "left")
      .join(before, Seq("shard"), "left")
      .join(after, Seq("shard"), "left")
      .select(col("shard"),
        coalesce(col("n_before"), lit(0L)).as("n_before"),
        coalesce(col("n_arrived"), lit(0L)).as("n_arrived"),
        coalesce(col("n_dup_history"), lit(0L)).as("n_dup_history"),
        coalesce(col("n_dup_batch"), lit(0L)).as("n_dup_batch"),
        coalesce(col("n_accepted"), lit(0L)).as("n_accepted"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_new"), lit(0L)).as("n_new"),
        expr("(1000000 * coalesce(n_new, 0)) div greatest(coalesce(n_grams, 0), 1)")
          .cast(LongType).as("new_ppm"),
        col("hash_before"), col("hash_after"),
        when(col("hash_before") <=> col("hash_after"), lit("ok"))
          .otherwise(lit("changed")).as("status"))
      .orderBy("shard")
  }

  val pipelineIncrementalOracle: String = {
    val h = DuckSql.hash60("text")
    val sh = DuckSql.shinglesFromTokens(DuckSql.tokens("text"), 3)
    s"""WITH corpus AS (${DedupQueries.corpusExactSql}),
       |a AS (SELECT doc_id, text FROM corpus WHERE doc_id < 250),
       |b AS (SELECT doc_id, CAST(doc_id % $S AS BIGINT) AS shard, text,
       |    $h AS content_hash
       |  FROM corpus WHERE doc_id >= 250),
       |akeep AS (SELECT min(doc_id) AS keep_id, $h AS content_hash, text
       |  FROM a GROUP BY text),
       |gated AS (SELECT b.*, CASE WHEN ak.content_hash IS NOT NULL
       |      THEN 1 ELSE 0 END AS hist
       |  FROM b LEFT JOIN (SELECT DISTINCT content_hash FROM akeep) ak
       |    USING (content_hash)),
       |bmin AS (SELECT content_hash, min(doc_id) AS keep
       |  FROM gated WHERE hist = 0 GROUP BY content_hash),
       |ledger AS (SELECT gated.doc_id, gated.shard, gated.text,
       |    CASE WHEN hist = 1 THEN 'dup_history'
       |         WHEN gated.doc_id = bmin.keep THEN 'accepted'
       |         ELSE 'dup_batch' END AS status
       |  FROM gated LEFT JOIN bmin USING (content_hash)),
       |agrams AS (SELECT DISTINCT g FROM (
       |    SELECT unnest(list_distinct(list_transform($sh,
       |      x -> ${DuckSql.hash60("x")}))) AS g FROM a)),
       |bgr AS (SELECT doc_id, shard,
       |    unnest(list_distinct(list_transform($sh,
       |      x -> ${DuckSql.hash60("x")}))) AS g
       |  FROM ledger WHERE status = 'accepted'),
       |nov AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_grams,
       |    CAST(sum(CASE WHEN ag.g IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_new
       |  FROM bgr LEFT JOIN agrams ag USING (g) GROUP BY shard),
       |mbc AS (SELECT CAST(keep_id % $S AS BIGINT) AS shard,
       |    (keep_id // $S) // 1024 AS chunk,
       |    md5(string_agg(md5(text), '' ORDER BY keep_id)) AS ch
       |  FROM akeep GROUP BY 1, 2),
       |mb AS (SELECT shard, md5(string_agg(ch, '' ORDER BY chunk)) AS hash_before
       |  FROM mbc GROUP BY shard),
       |after0 AS (SELECT keep_id AS doc_id, text FROM akeep
       |  UNION ALL
       |  SELECT doc_id, text FROM ledger WHERE status = 'accepted'),
       |mac AS (SELECT CAST(doc_id % $S AS BIGINT) AS shard,
       |    (doc_id // $S) // 1024 AS chunk,
       |    md5(string_agg(md5(text), '' ORDER BY doc_id)) AS ch
       |  FROM after0 GROUP BY 1, 2),
       |ma AS (SELECT shard, md5(string_agg(ch, '' ORDER BY chunk)) AS hash_after
       |  FROM mac GROUP BY shard),
       |nb AS (SELECT CAST(keep_id % $S AS BIGINT) AS shard,
       |    CAST(count(*) AS BIGINT) AS n_before
       |  FROM akeep GROUP BY 1),
       |cnt AS (SELECT shard, CAST(count(*) AS BIGINT) AS n_arrived,
       |    CAST(sum(CASE WHEN status = 'dup_history' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_history,
       |    CAST(sum(CASE WHEN status = 'dup_batch' THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_batch,
       |    CAST(sum(CASE WHEN status = 'accepted' THEN 1 ELSE 0 END) AS BIGINT) AS n_accepted
       |  FROM ledger GROUP BY shard)
       |SELECT coalesce(nb.shard, cnt.shard) AS shard,
       |  CAST(coalesce(n_before, 0) AS BIGINT) AS n_before,
       |  CAST(coalesce(n_arrived, 0) AS BIGINT) AS n_arrived,
       |  CAST(coalesce(n_dup_history, 0) AS BIGINT) AS n_dup_history,
       |  CAST(coalesce(n_dup_batch, 0) AS BIGINT) AS n_dup_batch,
       |  CAST(coalesce(n_accepted, 0) AS BIGINT) AS n_accepted,
       |  CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       |  CAST(coalesce(n_new, 0) AS BIGINT) AS n_new,
       |  CAST((1000000 * coalesce(n_new, 0))
       |    // greatest(coalesce(n_grams, 0), 1) AS BIGINT) AS new_ppm,
       |  hash_before, hash_after,
       |  CASE WHEN hash_before IS NOT DISTINCT FROM hash_after
       |    THEN 'ok' ELSE 'changed' END AS status
       |FROM nb FULL OUTER JOIN cnt ON cnt.shard = nb.shard
       |LEFT JOIN nov ON nov.shard = coalesce(nb.shard, cnt.shard)
       |LEFT JOIN mb ON mb.shard = coalesce(nb.shard, cnt.shard)
       |LEFT JOIN ma ON ma.shard = coalesce(nb.shard, cnt.shard)
       |ORDER BY shard""".stripMargin
  }
}

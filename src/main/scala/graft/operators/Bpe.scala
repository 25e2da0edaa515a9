package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Distributed BPE (byte-pair-encoding) merge training — the tokenizer
  * primitive of every LLM data pipeline, trained corpus-parallel
  * (extension; SURVEY §2.10; algorithm: Sennrich et al., "Neural
  * Machine Translation of Rare Words with Subword Units", ACL 2016 —
  * public knowledge).
  *
  * Classic BPE on the word-frequency table: each word is a symbol
  * sequence (initially characters); per round, the highest-count
  * adjacent symbol pair (ties: pair lexicographic) is merged
  * leftmost-greedy in every word. Training state is VOCABULARY-sized,
  * not corpus-sized — the corpus is touched once to build word counts;
  * at 100 TB that's the only full scan, and each round is one
  * map-side-combined pair aggregation over the vocab plus a ONE-ROW
  * driver collect of the argmax (same bounded driver pattern as
  * k-means centroids). The merge application is a narrow per-row
  * array fold; a lazy `localCheckpoint` per round keeps the iterative
  * plan O(1) (the dedupClusters lesson — Catalyst re-analysis, not
  * data volume, is the iterative-loop trap).
  *
  * Determinism: counts are exact integers, the argmax tie-break is
  * total, and the fold is leftmost-greedy — so the learned merge table
  * is bit-identical in any engine, and the DuckDB oracle replays
  * training round-for-round (see [[trainSqlCtes]]).
  */
object Bpe {

  final case class Merge(round: Int, lsym: String, rsym: String, pairCnt: Long)

  /** Characters of `word` as an array<string> (explicit transform —
    * `split(word, "")` edge behavior differs across engines).
    */
  private val charSyms =
    "transform(sequence(1, length(word)), i -> substring(word, i, 1))"

  /** Leftmost-greedy merge of adjacent (l, r) into one symbol.
    * Symbols are [a-z0-9]+ tokens, so embedding them as SQL string
    * literals is injection-safe.
    */
  private def mergeFold(l: String, r: String): String =
    s"""CASE WHEN size(syms) <= 1 THEN syms ELSE
       |  aggregate(slice(syms, 2, size(syms) - 1), array(element_at(syms, 1)),
       |    (acc, x) -> CASE WHEN element_at(acc, -1) = '$l' AND x = '$r'
       |      THEN concat(slice(acc, 1, size(acc) - 1),
       |                  array(concat(element_at(acc, -1), x)))
       |      ELSE concat(acc, array(x)) END) END""".stripMargin

  private val adjacentPairs =
    "transform(sequence(1, size(syms) - 1), i -> struct(element_at(syms, i) AS l, element_at(syms, i + 1) AS r))"

  /** Train `rounds` merges over a (word, cnt) frequency table; returns
    * the merge table and the final per-word symbol state.
    */
  def train(words: DataFrame, rounds: Int): (Seq[Merge], DataFrame) = {
    require(rounds >= 1, "BPE needs at least one merge round")
    var state = words
      .select(col("word"), col("cnt").cast(LongType).as("cnt"),
        expr(charSyms).as("syms"))
      .localCheckpoint(false)
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var round = 1
    var exhausted = false
    // the round-k checkpoint can be released only after round k+1's
    // checkpoint has MATERIALIZED (it is k+1's lineage until then), so
    // the release trails one round: live checkpoint state stays O(1)
    // rounds instead of piling up one per merge (round-12 audit, same
    // issue as dedupClusters')
    var prev: DataFrame = null
    while (round <= rounds && !exhausted) {
      val best = state
        .filter(size(col("syms")) >= 2)
        .select(col("cnt"), explode(expr(adjacentPairs)).as("p"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum(col("cnt")).as("c"))
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .collect() // materializes `state` — `prev` had its last use
      if (prev != null) {
        org.apache.spark.sql.graftshim.GraftShim.unpersistCheckpoint(prev)
        prev = null
      }
      if (best.isEmpty) exhausted = true
      else {
        val (l, r, c) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        merges += Merge(round, l, r, c)
        prev = state
        state = state
          .withColumn("syms", expr(mergeFold(l, r)))
          .localCheckpoint(false) // next round's agg materializes it
        round += 1
      }
    }
    // `prev` (if any) backs the still-lazy final state — the caller's
    // first action materializes it; the ContextCleaner reaps both after
    (merges.toSeq, state)
  }

  /** Merge table as a DataFrame: (merge_round, lsym, rsym, pair_cnt). */
  def mergesDf(spark: SparkSession, merges: Seq[Merge]): DataFrame = {
    import spark.implicits._
    merges.map(m => (m.round.toLong, m.lsym, m.rsym, m.pairCnt))
      .toDF("merge_round", "lsym", "rsym", "pair_cnt")
  }

  /** Persist a learned merge table (tiny: `rounds` rows) so training
    * runs once and any number of tokenization runs reuse it — same
    * artifact pattern as the persisted LSH index and centroid model.
    */
  def saveMerges(spark: SparkSession, merges: Seq[Merge], path: String): Unit =
    mergesDf(spark, merges).coalesce(1).write.mode("overwrite").parquet(path)

  def loadMerges(spark: SparkSession, path: String): Seq[Merge] =
    spark.read.parquet(path)
      .select(col("merge_round"), col("lsym"), col("rsym"), col("pair_cnt"))
      .collect()
      .map(r => Merge(r.getLong(0).toInt, r.getString(1), r.getString(2), r.getLong(3)))
      .toIndexedSeq
      .sortBy(_.round)

  /** Apply a trained merge table to a (word) table: each word's BPE
    * segmentation under the merges, in training order. Run this on the
    * DISTINCT word set (vocabulary-sized) and join the result back to
    * the token stream — never fold per corpus token.
    */
  def applyMerges(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    val init = words.withColumn("syms", expr(charSyms))
    merges.sortBy(_.round).foldLeft(init)((df, m) =>
      df.withColumn("syms", expr(mergeFold(m.lsym, m.rsym))))
  }

  /** DuckDB oracle: replay `rounds` training rounds over a CTE
    * `words(word, cnt)`. Emits CTEs `r0..r$rounds` (per-round symbol
    * state) and `b1..b$rounds` (per-round argmax) — the caller selects
    * from them. Keep in lockstep with [[train]].
    */
  def trainSqlCtes(rounds: Int): String = {
    val sb = new StringBuilder
    sb ++= s"""r0 AS (SELECT word, cnt,
              |    list_transform(range(1, length(word) + 1), i -> substr(word, i, 1)) AS syms
              |  FROM words)""".stripMargin
    for (m <- 1 to rounds) {
      val prev = s"r${m - 1}"
      sb ++= s""",
                |p$m AS (SELECT syms[i] AS l, syms[i + 1] AS r, CAST(sum(cnt) AS BIGINT) AS c
                |  FROM $prev CROSS JOIN LATERAL (SELECT unnest(range(1, len(syms))) AS i) t$m
                |  WHERE len(syms) >= 2 GROUP BY 1, 2),
                |b$m AS (SELECT l, r, c FROM p$m ORDER BY c DESC, l, r LIMIT 1),
                |r$m AS (SELECT word, cnt,
                |    list_reduce(list_transform(syms, s -> [s]),
                |      (acc, x) -> CASE WHEN acc[-1] = b$m.l AND x[1] = b$m.r
                |                  THEN acc[:len(acc) - 1] || [acc[-1] || x[1]]
                |                  ELSE acc || x END) AS syms
                |  FROM $prev CROSS JOIN b$m)""".stripMargin
    }
    sb.result()
  }

  /** Oracle fragment: the merge table from [[trainSqlCtes]]'s `b*`. */
  def mergesSql(rounds: Int): String =
    (1 to rounds).map(m =>
      s"SELECT CAST($m AS BIGINT) AS merge_round, l AS lsym, r AS rsym, c AS pair_cnt FROM b$m")
      .mkString("\nUNION ALL\n")
}

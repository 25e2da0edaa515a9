package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.expressions.ShingleHashSeq60

/** Multi-phrase blocklist matching (extension): count token-aligned
  * occurrences of any of N phrases per document — the screening step
  * behind profanity/spam/boilerplate blocklists, which at production
  * scale hold thousands of phrases (far past what N chained
  * `contains()` predicates can do).
  *
  * Match semantics are TOKEN-ALIGNED: phrase `p` of token length L
  * matches at position i iff the document's L-token shingle at i
  * equals p under the engine tokenizer (lower + non-alphanumeric
  * split). That makes a phrase occurrence exactly a positional
  * L-shingle hash equality — one native shingle pass per distinct
  * phrase length ([[graft.expressions.ShingleHashSeq60]]), a BROADCAST
  * join against the tiny (hash → phrase) table, and one count per doc.
  *
  * 100 TB shape: the corpus never shuffles for matching (broadcast
  * hash join on the exploded positions); the only keyed shuffle is the
  * per-doc count aggregation, map-side combined. Blocklist size only
  * affects the broadcast table. Documents with fewer than L tokens
  * hash as one whole-document shingle — they match only a phrase equal
  * to the entire document, the correct degenerate case.
  */
object Blocklist {

  private def norm(phrase: String): Seq[String] =
    phrase.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  /** One row per (doc, position, phrase) match. */
  def matches(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String]): DataFrame = {
    val normed = phrases.map(p => (p, norm(p))).filter(_._2.nonEmpty)
    require(normed.nonEmpty, "empty blocklist")
    val spark = df.sparkSession
    import spark.implicits._
    val byLen = normed.groupBy(_._2.length)
    val parts = byLen.toSeq.sortBy(_._1).map { case (len, ps) =>
      val table = ps.map { case (orig, toks) =>
        (graft.expressions.MinHashKernel.hash60(toks.mkString(" ")), orig)
      }.toDF("h", "phrase")
      df.select(col(idCol).cast(LongType).as("doc_id"),
          posexplode(ShingleHashSeq60.shingle_hash_seq60(col(textCol), len))
            .as(Seq("pos0", "h")))
        .join(broadcast(table), "h")
        .select(col("doc_id"), (col("pos0") + 1).cast(LongType).as("pos"),
          col("phrase"))
    }
    parts.reduce(_ unionAll _)
  }

  /** Per-ROW screening column — the stateless/streaming form of
    * [[summary]]: `struct(n_hits, n_phrases)` computed entirely inside
    * the row (one positional shingle array per phrase length, filtered
    * against the phrase-hash literals). No join, no aggregation —
    * drops into a `readStream` select unchanged, and batch == streaming
    * row-for-row (StreamingSpec). Phrases of different lengths are
    * distinct by construction, so per-length distinct hash counts add.
    */
  def screen(textCol: org.apache.spark.sql.Column,
      phrases: Seq[String]): org.apache.spark.sql.Column = {
    val normed = phrases.map(norm).filter(_.nonEmpty)
    require(normed.nonEmpty, "empty blocklist")
    val perLen = normed.groupBy(_.length).toSeq.sortBy(_._1).map { case (len, ps) =>
      val hs = ps.map(toks => graft.expressions.MinHashKernel.hash60(toks.mkString(" ")))
      val matched = filter(ShingleHashSeq60.shingle_hash_seq60(textCol, len),
        h => h.isInCollection(hs))
      (size(matched).cast(LongType), size(array_distinct(matched)).cast(LongType))
    }
    val (hits, distincts) = perLen.reduce((a, b) => (a._1 + b._1, a._2 + b._2))
    struct(hits.as("n_hits"), distincts.as("n_phrases"))
  }

  /** Per-document totals over the WHOLE corpus (zero rows kept):
    * `(doc_id, n_hits, n_phrases, blocked)` with `blocked` when hits
    * reach `blockAt`.
    */
  def summary(df: DataFrame, idCol: String, textCol: String,
      phrases: Seq[String], blockAt: Long = 3L): DataFrame = {
    val m = matches(df, idCol, textCol, phrases)
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_hits"),
        countDistinct(col("phrase")).cast(LongType).as("n_phrases"))
    df.select(col(idCol).cast(LongType).as("doc_id"))
      .join(m, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        coalesce(col("n_phrases"), lit(0L)).as("n_phrases"))
      .withColumn("blocked", (col("n_hits") >= blockAt).cast(LongType))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.PortableHash

/** Corpus-wide exact block-level dedup with document reconstruction
  * (extension — SURVEY §7.2.8): the block-granular version of exact
  * substring dedup (Lee et al., "Deduplicating Training Data Makes
  * Language Models Better") — repeated passages are removed EVERYWHERE
  * they occur except their first appearance, and the surviving blocks
  * are stitched back into cleaned documents. Catches boilerplate shared
  * across documents (headers, license blocks, templated passages) that
  * document-level dedup can't.
  *
  * Blocks are non-overlapping fixed-token windows over the canonical
  * tokenizer ([[Chunk.chunkDocs]] with stride = block size), so block
  * identity is whitespace/punctuation-stable. "First appearance" is the
  * global minimum of `doc_id * 2^20 + block_no` — total, deterministic,
  * and engine-independent (requires block_no < 2^20, i.e. docs under
  * ~25M tokens at the default block size, and doc_id < 2^43).
  *
  * Scale shape: chunk explode is narrow; keeper selection is ONE
  * map-side-combined aggregation keyed by the 60-bit block hash; the
  * keeper join back is on the same key (exchange reuse, no extra
  * shuffle); reconstruction is one doc-keyed aggregation whose
  * collect_list is bounded by blocks-per-doc. Nothing is ever
  * all-pairs, and the iterative state is zero.
  */
object ParaDedup {

  /** Returns one row per input document:
    * (doc_id, n_blocks, n_kept, clean_text) where clean_text is the
    * space-join of the document's surviving blocks in original order
    * (empty string when every block was a repeat).
    */
  def dedupBlocks(
      df: DataFrame, idCol: String, textCol: String,
      blockTokens: Int = 25): DataFrame = {
    val blocks = Chunk
      .chunkDocs(df, idCol, textCol, chunkTokens = blockTokens, stride = blockTokens)
      .select(col("doc_id"), col("chunk_no"), col("chunk_text"),
        PortableHash.hash60(col("chunk_text")).as("h"),
        (col("doc_id") * lit(1048576L) + col("chunk_no")).as("pos_key"))
    val keepers = blocks.groupBy(col("h"))
      .agg(min(col("pos_key")).as("keeper_key"))
    blocks.join(keepers, Seq("h"))
      .withColumn("kept", col("pos_key") === col("keeper_key"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast(LongType).as("n_blocks"),
        sum(when(col("kept"), 1L).otherwise(0L)).cast(LongType).as("n_kept"),
        // collect_list drops nulls -> only kept blocks; sort restores
        // original block order regardless of shuffle arrival order
        concat_ws(" ", transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("chunk_no"), col("chunk_text"))))),
          b => b.getField("chunk_text"))).as("clean_text"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.expressions.TokenHash60
import graft.functions.PortableHash

/** Content-defined chunking (extension): split documents at positions
  * where the content hash, not the offset, says so — the
  * Rabin-fingerprint boundary idea behind storage dedup (LBFS,
  * Muthitacharoen et al. SOSP'01) and byte/chunk-level corpus dedup.
  * Fixed-stride chunking shifts every boundary after one insertion;
  * CDC boundaries re-align immediately, so shared runs between
  * near-identical documents land in IDENTICAL chunks.
  *
  * Deterministic re-expression on the engine tokenizer: a boundary
  * closes after token position i iff `tokenHash(i) % mod == 0`
  * (expected chunk length = mod tokens). Chunk identity is the hash of
  * the space-joined chunk tokens; duplicate detection is one
  * chunk-hash-keyed count.
  *
  * Shape: posexplode, one codegen hash per token, doc-partitioned
  * running-sum window for chunk ids, one (doc, chunk) aggregation
  * rebuilding chunk text in position order, one chunk-hash aggregation
  * for cross-doc duplication — every shuffle keyed by doc or chunk
  * hash, nothing global.
  */
object CdcChunk {

  /** One row per chunk: `(doc_id, chunk_no, n_tokens, chunk_hash)`. */
  def chunks(df: DataFrame, idCol: String, textCol: String,
      mod: Int = 16): DataFrame = {
    require(mod >= 2, "boundary modulus must be >= 2")
    val byPos = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    df.select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(TokenHash60.token_hash60(col(textCol))).as(Seq("pos0", "h")))
      .select(col("doc_id"), (col("pos0") + 1).cast(LongType).as("pos"),
        col("h"), (col("h") % mod === 0).cast(LongType).as("boundary"))
      // chunk_no = boundaries CLOSED before this position
      .withColumn("chunk_no",
        coalesce(sum(col("boundary")).over(
          byPos.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .groupBy(col("doc_id"), col("chunk_no"))
      .agg(count(lit(1)).cast(LongType).as("n_tokens"),
        PortableHash.hash60(concat_ws("|",
          transform(array_sort(collect_list(struct(col("pos"), col("h")))),
            x => x.getField("h").cast("string")))).as("chunk_hash"))
  }

  /** Per-document duplication report against the whole corpus:
    * `(doc_id, n_chunks, n_dup_chunks, dup_ppm)` — a chunk is `dup`
    * when its hash occurs in more than one (doc, chunk) slot anywhere.
    */
  def dupReport(df: DataFrame, idCol: String, textCol: String,
      mod: Int = 16): DataFrame = {
    val c = chunks(df, idCol, textCol, mod).localCheckpoint(true)
    val freq = c.groupBy(col("chunk_hash"))
      .agg(count(lit(1)).cast(LongType).as("n_slots"))
    c.join(freq, "chunk_hash")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast(LongType).as("n_chunks"),
        sum(when(col("n_slots") > 1, 1L).otherwise(0L)).cast(LongType).as("n_dup_chunks"))
      .withColumn("dup_ppm", expr("n_dup_chunks * 1000000 div n_chunks"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Document chunking for sequence preparation (extension — SURVEY
  * §7.2.8): split each document into fixed-size token windows with a
  * stride (overlap = chunkTokens - stride), the step between corpus
  * curation and sequence packing ([[graft.queries.DedupQueries.packAssign]]).
  *
  * Pure narrow per-row compute — one tokenize pass and an explode;
  * no shuffle at any corpus size, and the output inherits the input's
  * partitioning (each chunk row carries its parent doc id for
  * provenance). Chunk text is the canonical token join (the engine-wide
  * tokenizer), so chunk identity is stable under whitespace/punctuation
  * noise.
  */
object Chunk {

  /** Explode `df` into (all original columns minus text, chunk_no,
    * chunk_text, chunk_tokens): windows of `chunkTokens` tokens starting
    * every `stride` tokens. The final window may be shorter; documents
    * with <= chunkTokens tokens (including empty) yield exactly one
    * chunk 0.
    */
  def chunkDocs(
      df: DataFrame, idCol: String, textCol: String,
      chunkTokens: Int = 64, stride: Int = 48): DataFrame = {
    require(chunkTokens > 0 && stride > 0 && stride <= chunkTokens,
      "need 0 < stride <= chunkTokens")
    val toks: Column = TextDedup.tokensCol(col(textCol))
    // materialize token array + count behind a projection boundary so
    // the tokenizer runs once per doc, not once per chunk
    val withToks = df.withColumn("__t", toks).withColumn("__n", size(col("__t")))
    val lastChunk = when(col("__n") > chunkTokens,
      ceil((col("__n") - chunkTokens).cast(DoubleType) / stride)).otherwise(lit(0L))
    val chunks = transform(sequence(lit(0L), lastChunk), i =>
      struct(i.cast(LongType).as("chunk_no"),
        concat_ws(" ", slice(col("__t"), (i * stride + 1).cast(IntegerType),
          lit(chunkTokens))).as("chunk_text"),
        least(lit(chunkTokens.toLong),
          (col("__n") - i * stride).cast(LongType)).as("chunk_tokens")))
    withToks
      .select(col(idCol).cast(LongType).as("doc_id"), explode(chunks).as("c"))
      .select(col("doc_id"), col("c.chunk_no").as("chunk_no"),
        col("c.chunk_text").as("chunk_text"),
        col("c.chunk_tokens").as("chunk_tokens"))
  }
}

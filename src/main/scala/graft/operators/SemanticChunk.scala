package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.expressions.TokenHash60

/** Cohesion-based (semantic) chunking (extension): split documents
  * where adjacent-segment lexical similarity DROPS, instead of at
  * fixed strides — the TextTiling idea (Hearst, CL 1997) that RAG
  * pipelines use so chunk boundaries fall between topics rather than
  * mid-thought. Complement of [[Chunk.chunkDocs]] (fixed stride).
  *
  * Deterministic, engine-exact re-expression: consecutive `segTokens`-
  * token segments get a bag-of-hashed-words histogram (token hash60
  * mod `dims` bucket counts — a crude but REAL lexical embedding);
  * cohesion between neighbors is the histograms' cosine (6 dp, the
  * repo-wide rounding); a boundary opens where cohesion falls below
  * `minCohesion`; chunk ids are the running boundary count per doc.
  *
  * Shape: posexplode to (doc, seg, bucket) with ONE map-side-combined
  * aggregation to segment histograms (dims columns), then
  * doc-partitioned lag + running-sum windows — never a global window.
  * At 100 TB this is two doc-keyed shuffles, both bounded by segment
  * count, not token count.
  */
object SemanticChunk {

  /** `(doc_id, seg_no, cohesion, chunk_id)` — one row per segment;
    * `cohesion` is the 6-dp cosine vs the PREVIOUS segment (-1.0 for
    * the first). Kept as the rounded DOUBLE — a ×1e6 integer cast would
    * diverge cross-engine (Spark's long cast truncates, SQL's rounds),
    * while the rounded double itself is bit-identical.
    */
  def chunks(df: DataFrame, idCol: String, textCol: String,
      segTokens: Int = 8, dims: Int = 16,
      minCohesion: Double = 0.2): DataFrame = {
    require(segTokens >= 1 && dims >= 2, "bad segmentation config")
    val hist = df
      .select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(TokenHash60.token_hash60(col(textCol))).as(Seq("pos0", "h")))
      .select(col("doc_id"),
        expr(s"pos0 div $segTokens").cast(LongType).as("seg_no"),
        pmod(col("h"), lit(dims.toLong)).as("bucket"))
      .groupBy(col("doc_id"), col("seg_no"))
      .agg(sum(when(col("bucket") === 0, 1L).otherwise(0L)).as("c0"),
        (1 until dims).map(k =>
          sum(when(col("bucket") === k, 1L).otherwise(0L)).as(s"c$k")): _*)
    val vec = hist.select(col("doc_id"), col("seg_no"),
      array((0 until dims).map(k => col(s"c$k")): _*).as("v"))
    val bySeg = Window.partitionBy(col("doc_id")).orderBy(col("seg_no"))
    val withPrev = vec.withColumn("pv", lag(col("v"), 1).over(bySeg))
    val scored = withPrev.withColumn("cohesion",
      when(col("pv").isNull, lit(-1.0))
        .otherwise(Similarity.cosine(
          Similarity.idot(col("v"), col("pv")),
          Similarity.inorm2(col("v")), Similarity.inorm2(col("pv")))))
    scored
      .withColumn("boundary",
        (col("cohesion") >= 0.0 && col("cohesion") < minCohesion)
          .cast(LongType))
      .withColumn("chunk_id", sum(col("boundary")).over(bySeg))
      .select(col("doc_id"), col("seg_no"), col("cohesion"), col("chunk_id"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.expressions.{QuantizeVec, SignProject}

/** Johnson–Lindenstrauss dimensionality reduction for embedding columns
  * (extension — SURVEY §7.2.8 family): project d-dim vectors onto
  * `outDim` ±1 sign directions (Achlioptas 2003), shrinking ANN index
  * storage/bandwidth by d/outDim while approximately preserving
  * cosine geometry — the standard "search small, re-rank full"
  * compression step next to quantization ([[EmbedQuantize]]) and
  * truncation (matryoshka).
  *
  * Everything is exact integer arithmetic: inputs quantize to the ×1000
  * grid ([[graft.expressions.QuantizeVec]]), the sign matrix is derived
  * from the portable hash (`"rp:j:k"` parity — any engine reconstructs
  * it from the dims alone, nothing is stored or shipped), and the
  * projection is one native codegen pass per row
  * ([[graft.expressions.SignProject]]).
  *
  * 100 TB shape: a NARROW per-row transform — no shuffle, no join, no
  * broadcast; the corpus never moves. Overflow: |y_k| ≤ d · max|qv| —
  * at d=64 and unit-norm float inputs (|qv| ≤ ~1000·√d) this is ~1e6,
  * and downstream dot/norm products stay ≤ outDim·(d·max|qv|)² « 2^63.
  */
object RandomProjection {

  /** `(vec_id, yv)` — projected integer vectors, one per input row. */
  def projectVecs(
      df: DataFrame, idCol: String, embCol: String,
      outDim: Int, inDim: Int = 64): DataFrame =
    df.select(col(idCol).cast(LongType).as("vec_id"),
      SignProject.sign_project(
        QuantizeVec.quantize_vec(col(embCol)), inDim, outDim).as("yv"))

  /** Flattened `(vec_id, k, y)` rows — the sink/dump shape. */
  def projectRows(
      df: DataFrame, idCol: String, embCol: String,
      outDim: Int, inDim: Int = 64): DataFrame =
    projectVecs(df, idCol, embCol, outDim, inDim)
      .select(col("vec_id"), posexplode(col("yv")).as(Seq("k", "y")))
      .select(col("vec_id"), col("k").cast(LongType).as("k"), col("y"))
}

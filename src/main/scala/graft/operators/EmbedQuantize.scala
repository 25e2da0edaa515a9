package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.expressions.QuantizeVec

/** Int8 affine embedding quantization (extension — SURVEY §7.2.8):
  * per-dimension affine codes `(x - min_d) * 255 div (max_d - min_d) -
  * 128` ∈ [-128, 127] — the 4x storage/bandwidth compression step a
  * training pipeline applies before shipping embeddings to an ANN index
  * or a feature store.
  *
  * Everything happens on the exact ×1000 integer grid
  * ([[graft.expressions.QuantizeVec]]), so codes are pure BIGINT
  * arithmetic: numerator `(x - min_d)` is non-negative by construction,
  * hence truncating (Spark `div`) and flooring (DuckDB `//`) integer
  * division agree and results are engine-exact. A constant dimension
  * (max = min) codes to 0.
  *
  * Scale shape: two passes over the corpus, the unavoidable minimum for
  * exact affine ranges — (1) per-dimension min/max via posexplode +
  * ONE map-side-combined aggregation (64 rows out), collapsed to a
  * single scales row (bounded by dim, same pattern as the E2 dictionary
  * build); (2) a NARROW transform that broadcast-joins the one scales
  * row and encodes every vector in place. No per-vector shuffle in the
  * encode pass. Pipelines that tolerate approximate ranges can compute
  * pass 1 on a sample; the operator keeps exact ranges for oracle
  * parity.
  */
object EmbedQuantize {

  /** One row per (vector, dimension): (vec_id, pos, code). */
  def int8Codes(df: DataFrame, idCol: String, embCol: String): DataFrame = {
    val q = df.select(col(idCol).cast(LongType).as("vec_id"),
      QuantizeVec.quantize_vec(col(embCol)).as("qv"))
    val dims = q.select(posexplode(col("qv")).as(Seq("pos", "x")))
      .groupBy(col("pos"))
      .agg(min(col("x")).as("mn"), max(col("x")).as("mx"))
    val scales = dims.agg(
      sort_array(collect_list(struct(col("pos"), col("mn"), col("mx"))))
        .as("scales"))
    // SQL-expr lambda (not the Column DSL): `div` — exact integral
    // division — has no Column spelling, and scales[i] is 0-based here
    q.crossJoin(broadcast(scales))
      .select(col("vec_id"),
        posexplode(expr(
          """transform(qv, (x, i) ->
            |  CASE WHEN scales[i].mx > scales[i].mn
            |    THEN (x - scales[i].mn) * 255L div (scales[i].mx - scales[i].mn) - 128L
            |    ELSE 0L END)""".stripMargin)).as(Seq("pos", "code")))
      .select(col("vec_id"), col("pos").cast(LongType).as("pos"),
        col("code").cast(LongType).as("code"))
  }
}

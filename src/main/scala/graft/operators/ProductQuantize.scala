package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.expressions.QuantizeVec

/** Product quantization for embedding columns (Jégou, Douze, Schmid —
  * "Product Quantization for Nearest Neighbor Search", TPAMI 2011):
  * split each d-dim vector into `m` subvectors, learn a small codebook
  * per subspace, and store each vector as `m` small codes —
  * `d·4 bytes → m·log2(k) bits` (64-dim float → 8 bytes at m=8, k=16),
  * the compression step that makes billion-scale ANN indexes fit in
  * memory. Queries score against RECONSTRUCTED vectors (concatenated
  * codebook entries), the asymmetric-distance idea of the paper.
  *
  * This variant is spherical (cosine) and integer-exact, matching the
  * repo-wide k-means convention ([[Similarity.kmeansAssign]]):
  * quantized ×1000 grid, integer-SUM centroids (same direction as the
  * mean, so cosine ranking is identical), deterministic init from the
  * first `k` vectors, ties to the lowest cluster id. Every step replays
  * bit-identically in SQL.
  *
  * 100 TB shape: training runs ALL `m` subspaces per pass — each Lloyd
  * iteration is one narrow assignment (m·k small dot products per row
  * against literal centroids; the corpus never moves) feeding ONE
  * map-side-combined aggregation whose m·k·(d/m) = k·d long result
  * returns to the driver. Encode and decode are pure per-row codegen
  * expressions — no shuffle, no join. Centroid component sums grow with
  * cluster cardinality (|sum| ≤ n·1000); beyond ~1e15 members per
  * cluster re-center on a sample.
  */
object ProductQuantize {

  private case class SubCentroid(sub: Int, cluster: Long, cent: Seq[Long], n2: Long)

  private def norm2(v: Seq[Long]): Long =
    v.foldLeft(0L)((acc, x) => acc + x * x)

  /** (id, sv0..sv{m-1}, sn0..sn{m-1}): quantized subvector slices with
    * their squared norms, computed once per row.
    */
  private def sliced(df: DataFrame, idCol: String, embCol: String,
      m: Int, sub: Int, keep: Seq[String] = Nil): DataFrame = {
    val base = df.select(col(idCol).cast(LongType).as("id") +:
      QuantizeVec.quantize_vec(col(embCol)).as("q") +:
      keep.map(col): _*)
    val cols = (col("id") +:
      (0 until m).map(i => slice(col("q"), i * sub + 1, sub).as(s"sv$i"))) ++
      keep.map(col)
    val withSlices = base.select(cols: _*)
    (0 until m).foldLeft(withSlices)((d, i) =>
      d.withColumn(s"sn$i", Similarity.inorm2(col(s"sv$i"))))
  }

  /** Nearest-codebook-entry column for subspace `i`: highest cosine,
    * ties to the lowest cluster id — one native
    * [[graft.expressions.NearestCentroids]] node per subspace (the
    * former per-entry struct-greatest tree made PQ plans ~2,000
    * Catalyst nodes, re-analyzed by the driver per Lloyd job and
    * Janino-compiled for seconds on first execution).
    */
  private def codeCol(i: Int, cents: Seq[SubCentroid]): Column =
    element_at(graft.expressions.NearestCentroids.nearest_centroids(
      col(s"sv$i"), col(s"sn$i"),
      cents.filter(_.sub == i).map(ct => (ct.cluster, ct.cent, ct.n2)), 1), 1)

  /** Train m codebooks of k entries with `iters` Lloyd iterations.
    * Returns the model as (sub, cluster, cent, n2) — m·k rows, a
    * persistable parquet artifact like [[Similarity.trainCentroids]].
    */
  def train(df: DataFrame, idCol: String, embCol: String,
      m: Int = 8, k: Int = 16, iters: Int = 2, dim: Int = 64): DataFrame = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val sub = dim / m
    val c = sliced(df, idCol, embCol, m, sub).localCheckpoint(true)
    // init: subvectors of the first k ids, per subspace
    var cents: Seq[SubCentroid] = c.filter(col("id") < k)
      .collect().flatMap { r =>
        (0 until m).map { i =>
          val v = r.getSeq[Long](r.fieldIndex(s"sv$i"))
          SubCentroid(i, r.getLong(0), v, norm2(v))
        }
      }.toSeq.sortBy(ct => (ct.sub, ct.cluster))
    (1 to iters).foreach { _ =>
      val assigned = (0 until m).foldLeft(c)((d, i) =>
        d.withColumn(s"cl$i", codeCol(i, cents)))
      // ONE aggregation for every (sub, cluster, pos) component sum
      val stacked = assigned.select(explode(array((0 until m).map(i =>
          struct(lit(i).as("sub"), col(s"cl$i").as("cluster"),
            col(s"sv$i").as("sv"))): _*)).as("e"))
        .select(col("e.sub").as("sub"), col("e.cluster").as("cluster"),
          posexplode(col("e.sv")).as(Seq("pos", "v")))
        .groupBy(col("sub"), col("cluster"), col("pos"))
        .agg(sum(col("v")).cast(LongType).as("s"))
        .collect()
      cents = stacked.groupBy(r => (r.getInt(0), r.getLong(1))).map {
        case ((s, cl), rs) =>
          val cent = rs.sortBy(_.getInt(2)).map(_.getLong(3)).toIndexedSeq
          SubCentroid(s, cl, cent, norm2(cent))
      }.toSeq.sortBy(ct => (ct.sub, ct.cluster))
    }
    val spark = df.sparkSession
    import spark.implicits._
    cents.map(ct => (ct.sub.toLong, ct.cluster, ct.cent, ct.n2))
      .toDF("sub", "cluster", "cent", "n2")
  }

  private def collectModel(model: DataFrame): Seq[SubCentroid] =
    model.select(col("sub").cast(LongType), col("cluster").cast(LongType),
        col("cent"), col("n2").cast(LongType))
      .collect()
      .map(r => SubCentroid(r.getLong(0).toInt, r.getLong(1),
        r.getSeq[Long](2), r.getLong(3)))
      .toIndexedSeq
      .sortBy(ct => (ct.sub, ct.cluster))

  /** Encode: (vec_id, sub, code) — m rows per vector, no shuffle. */
  def encode(df: DataFrame, idCol: String, embCol: String,
      model: DataFrame, dim: Int = 64): DataFrame = {
    val cents = collectModel(model)
    val m = cents.map(_.sub).distinct.size
    val c = sliced(df, idCol, embCol, m, dim / m)
    val coded = (0 until m).foldLeft(c)((d, i) =>
      d.withColumn(s"cl$i", codeCol(i, cents)))
    coded.select(col("id").as("vec_id"), explode(array((0 until m).map(i =>
        struct(lit(i.toLong).as("sub"), col(s"cl$i").as("code"))): _*)).as("e"))
      .select(col("vec_id"), col("e.sub").as("sub"), col("e.code").as("code"))
  }

  /** Decode: (vec_id, rv) — the reconstructed full-dim integer vector
    * (concatenated codebook entries). Scoring queries against `rv` is
    * exactly the paper's asymmetric distance: per-subspace
    * query-to-centroid products, since `dot(concat(c_i), q) =
    * Σ_i dot(c_i, q_i)`. Pure per-row compute.
    */
  def decode(df: DataFrame, idCol: String, embCol: String,
      model: DataFrame, dim: Int = 64, keep: Seq[String] = Nil): DataFrame = {
    val cents = collectModel(model)
    val m = cents.map(_.sub).distinct.size
    val c = sliced(df, idCol, embCol, m, dim / m, keep)
    val coded = (0 until m).foldLeft(c)((d, i) =>
      d.withColumn(s"cl$i", codeCol(i, cents)))
    val lookup = (0 until m).map { i =>
      val entries = cents.filter(_.sub == i).map(ct => ct.cluster -> ct.cent).toMap
      element_at(typedLit(entries), col(s"cl$i"))
    }
    coded.select(col("id").as("vec_id") +: flatten(array(lookup: _*)).as("rv") +:
      keep.map(col): _*)
  }
}

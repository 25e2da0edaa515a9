package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Similarity search over embedding columns (extension — SURVEY §7.2.8).
  *
  * Embeddings are quantized to integer vectors (`round(x * 1000)`) before
  * any arithmetic: integer dot products and norms are EXACT, so cosine
  * similarity is the same double in Spark and DuckDB regardless of
  * floating-point summation order — the one thing that makes ANN results
  * oracle-comparable across engines. The quantization error (~5e-4
  * relative) is far below any meaningful similarity resolution.
  *
  * Scale design:
  *   - brute-force top-k: queries broadcast against the corpus; per-row
  *     dot products are narrow; ranking is a per-query window over k
  *     candidates. At 100 TB the corpus side stays partitioned and never
  *     shuffles; cost is O(|corpus| * |queries|) FLOPs, the right
  *     baseline below ~10^4 queries.
  *   - IVF: corpus bucketed by centroid (one shuffle at build), queries
  *     probe nProbe nearest centroids and scan only those buckets —
  *     the classic inverted-file trade of recall for a |corpus|/nlist
  *     scan reduction.
  */
object Similarity {

  /** Quantize a float-array embedding to exact BIGINTs. */
  def quantize(emb: Column): Column =
    transform(emb, x => round(x.cast(DoubleType) * 1000).cast(LongType))

  /** Exact integer dot product of two quantized vectors — native codegen
    * expression ([[graft.expressions.IntVecDot]]); the HOF spelling
    * (`aggregate(zip_with(...))`) is CodegenFallback and ~10x slower.
    */
  def idot(a: Column, b: Column): Column =
    graft.expressions.IntVecDot.int_vec_dot(a, b)

  /** Exact integer squared norm. */
  def inorm2(a: Column): Column = idot(a, a)

  /** Cosine similarity from exact integer components, rounded to 6 dp. */
  def cosine(dot: Column, n2a: Column, n2b: Column): Column =
    round(dot.cast(DoubleType) /
      (sqrt(n2a.cast(DoubleType)) * sqrt(n2b.cast(DoubleType))), 6)

  /** Brute-force cosine top-k: for each query vector (`queries` must be
    * small — it is broadcast), the k nearest corpus vectors excluding
    * itself. Deterministic: ties broken by corpus id.
    */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast(LongType).as("c_id"),
      quantize(col(embCol)).as("c_q"))
      .withColumn("c_n2", inorm2(col("c_q")))
    val q = broadcast(queries.select(col(idCol).cast(LongType).as("q_id"),
      quantize(col(embCol)).as("q_q"))
      .withColumn("q_n2", inorm2(col("q_q"))))
    val scored = c.join(q, col("c_id") =!= col("q_id"))
      .withColumn("cosine", cosine(idot(col("c_q"), col("q_q")), col("c_n2"), col("q_n2")))
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    scored.withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cosine"))
  }

  /** IVF top-k: centroids are exact per-cluster integer component sums
    * (counts kept separately), queries probe the `nProbe` nearest
    * centroids by cosine and rank only vectors in those clusters.
    * `clusterCol` supplies the cluster assignment (here: the `label`
    * column — a deterministic stand-in for k-means training, which is a
    * separate offline job in a real pipeline).
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, embCol: String, clusterCol: String,
      k: Int, nProbe: Int = 2): DataFrame = {
    val c = corpus.select(col(idCol).cast(LongType).as("c_id"),
      col(clusterCol).cast(LongType).as("cluster"),
      quantize(col(embCol)).as("c_q"))
      .withColumn("c_n2", inorm2(col("c_q")))

    // centroid: element-wise SUM of quantized vectors (exact integers)
    val dims = sequence(lit(0), size(col("c_q")) - 1)
    val exploded = c.select(col("cluster"), posexplode(col("c_q")).as(Seq("pos", "v")))
    val centroids = exploded.groupBy(col("cluster"), col("pos"))
      .agg(sum(col("v")).cast(LongType).as("s"))
      .groupBy(col("cluster"))
      .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
      .select(col("cluster"), transform(col("ps"), p => p.getField("s")).as("cent"))
      .withColumn("cent_n2", inorm2(col("cent")))

    val q = queries.select(col(idCol).cast(LongType).as("q_id"),
      quantize(col(embCol)).as("q_q"))
      .withColumn("q_n2", inorm2(col("q_q")))

    // probe: nProbe nearest centroids per query
    val probeW = Window.partitionBy(col("q_id")).orderBy(col("cent_cos").desc, col("cluster"))
    val probed = q.crossJoin(broadcast(centroids))
      .withColumn("cent_cos", cosine(idot(col("q_q"), col("cent")), col("q_n2"), col("cent_n2")))
      .withColumn("probe_rank", row_number().over(probeW))
      .filter(col("probe_rank") <= nProbe)
      .select(col("q_id"), col("q_q"), col("q_n2"), col("cluster"))

    // scan only the probed clusters
    val w = Window.partitionBy(col("q_id")).orderBy(col("cosine").desc, col("c_id"))
    c.join(broadcast(probed), Seq("cluster"))
      .filter(col("c_id") =!= col("q_id"))
      .withColumn("cosine", cosine(idot(col("c_q"), col("q_q")), col("c_n2"), col("q_n2")))
      .withColumn("rank", row_number().over(w).cast(LongType))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("rank"), col("c_id").as("neighbor_id"), col("cosine"))
  }

  /** Deterministic k-means (Lloyd) for IVF training — exact across
    * engines because centroids are element-wise integer SUMS of member
    * vectors, never means: cosine is scale-invariant, so the sum points
    * in the same direction as the mean and assignments are identical,
    * while every intermediate stays exact integer arithmetic.
    *
    * Init: centroids = vectors with id 0..k-1. Each iteration:
    * assign every vector to the nearest centroid by (rounded) cosine
    * with cluster-index tie-break, then re-sum. Clusters that lose all
    * members drop out (standard Lloyd variant).
    *
    * Scale: assignment is k dot products per row against broadcast
    * centroids (no shuffle of the corpus); the re-sum is one
    * posexplode + groupBy per iteration, shuffling k*dim rows.
    */
  def kmeansAssign(
      corpus: DataFrame, idCol: String, embCol: String,
      k: Int, iters: Int): DataFrame = {
    val c = corpus.select(col(idCol).cast(LongType).as("id"),
      quantize(col(embCol)).as("q"))
      .withColumn("n2", inorm2(col("q")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    def assign(centroids: DataFrame): DataFrame = {
      val w = Window.partitionBy(col("id")).orderBy(col("cos").desc, col("cluster"))
      c.crossJoin(broadcast(centroids))
        .withColumn("cos", cosine(idot(col("q"), col("cent")), col("n2"), col("cn2")))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") === 1)
        .select(col("id"), col("q"), col("cluster"))
    }

    // Re-summed centroids are collected to the driver each iteration —
    // they are k*dim integers by definition, and materializing them
    // flattens the lineage so the final assignment is one shallow job
    // (this is how k-means drivers work on real clusters too).
    def resum(assigned: DataFrame): DataFrame = {
      val spark = assigned.sparkSession
      val summed = assigned
        .select(col("cluster"), posexplode(col("q")).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg(sum(col("v")).cast(LongType).as("s"))
        .groupBy(col("cluster"))
        .agg(array_sort(collect_list(struct(col("pos"), col("s")))).as("ps"))
        .select(col("cluster"), transform(col("ps"), p => p.getField("s")).as("cent"))
        .collect()
      val rows = summed.map(r =>
        org.apache.spark.sql.Row(r.getLong(0), r.getSeq[Long](1)))
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("cluster", LongType, nullable = false),
        org.apache.spark.sql.types.StructField("cent",
          org.apache.spark.sql.types.ArrayType(LongType, containsNull = false))))
      spark.createDataFrame(
        spark.sparkContext.parallelize(rows.toIndexedSeq, 1), schema)
        .withColumn("cn2", inorm2(col("cent")))
    }

    var centroids = c.filter(col("id") < k)
      .select(col("id").cast(LongType).as("cluster"), col("q").as("cent"))
      .withColumn("cn2", inorm2(col("cent")))
    (1 to iters).foreach { _ => centroids = resum(assign(centroids)) }
    assign(centroids).select(col("id").as("vec_id"), col("cluster"))
  }

  /** Embedding-cosine near-duplicate pairs above `threshold`, blocked by
    * cluster equality (the LSH-style bucket: only intra-bucket pairs are
    * scored, so the join cost is bucket-bounded, never n²).
    *
    * Same shape as [[TextDedup.minhashPairs]]: buckets are built with ONE
    * aggregation (groupBy + collect_list), so the quantize/norm pipeline
    * evaluates once — the earlier self-join spelling evaluated it once
    * per join side — and pair expansion reuses the shared per-bucket skew
    * cap ([[TextDedup.cappedBucketPairs]]): a degenerate cluster emits
    * O(n·cap) pairs with slice-chain connectivity instead of n².
    */
  def nearDupPairs(
      corpus: DataFrame, idCol: String, embCol: String, clusterCol: String,
      threshold: Double, maxBucket: Int = 256): DataFrame = {
    val c = corpus.select(col(idCol).cast(LongType).as("id"),
      col(clusterCol).cast(LongType).as("cluster"),
      quantize(col(embCol)).as("q"))
      .withColumn("n2", inorm2(col("q")))
    c.groupBy(col("cluster"))
      .agg(collect_list(struct(col("id"), col("q"), col("n2"))).as("members"))
      .filter(size(col("members")) > 1)
      .select(explode(
        TextDedup.cappedBucketPairs(array_sort(col("members")), maxBucket)).as("p"))
      .withColumn("cosine",
        cosine(idot(col("p.id_a.q"), col("p.id_b.q")), col("p.id_a.n2"), col("p.id_b.n2")))
      .filter(col("cosine") >= threshold)
      .select(col("p.id_a.id").as("id_a"), col("p.id_b.id").as("id_b"), col("cosine"))
  }
}

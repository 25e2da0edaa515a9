package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.operators.Similarity

/** Graded ANN / similarity queries over `embeddings` (SURVEY §7.2.8).
  * Vectors are quantized to integers before all arithmetic (see
  * [[Similarity]]) so cosine values are bit-identical across engines.
  */
object SimilarityQueries {

  private def emb(spark: SparkSession, dir: String): DataFrame =
    Tables.loadSpread(spark, dir, "embeddings")

  /** The handful-of-query-vectors side: plain scan, no repartition —
    * spreading a <20-row filter result across 32 partitions only buys an
    * extra shuffle stage per query.
    */
  private def embSmall(spark: SparkSession, dir: String): DataFrame =
    Tables.load(spark, dir, "embeddings")

  /** DuckDB CTEs shared by all oracles: quantized vectors + exact
    * integer norms + dot products via fixed 64-dim position lists.
    */
  private val quantCte: String =
    """q AS (SELECT CAST(vec_id AS BIGINT) AS id, CAST(label AS BIGINT) AS cluster,
      |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
      |  FROM embeddings),
      |n AS (SELECT id, cluster, qv,
      |  CAST(list_sum(list_transform(range(1, 65), i -> qv[i] * qv[i])) AS BIGINT) AS n2
      |  FROM q)""".stripMargin

  private def duckDot(a: String, b: String): String =
    s"CAST(list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i])) AS BIGINT)"

  private def duckCos(dot: String, n2a: String, n2b: String): String =
    s"round(CAST($dot AS DOUBLE) / (sqrt(CAST($n2a AS DOUBLE)) * sqrt(CAST($n2b AS DOUBLE))), 6)"

  /** Brute-force cosine top-10 for query vectors vec_id < 10. */
  def annTopK(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Similarity.bruteForceTopK(e, embSmall(spark, dir).filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 10)
      .orderBy("q_id", "rank")
  }

  val annTopKOracle: String =
    s"""WITH $quantCte,
       |scored AS (SELECT qq.id AS q_id, c.id AS c_id,
       |    ${duckCos(duckDot("c.qv", "qq.qv"), "c.n2", "qq.n2")} AS cosine
       |  FROM n c JOIN n qq ON qq.id < 10 AND c.id <> qq.id),
       |ranked AS (SELECT q_id, c_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT q_id, rank, c_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""".stripMargin

  /** DPR-style hard-negative mining: for each query vector, the exact
    * cosine neighbors at ranks 6–10 — past the top-5 likely positives,
    * but close enough to be confusable — the negatives that actually
    * move a contrastive encoder's decision boundary. Complements
    * `x_negative_samples` (uniform positional draws): uniform negatives
    * buy coverage, hard negatives buy the boundary. Same plan shape as
    * [[annTopK]] (broadcast queries, corpus never shuffles).
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame =
    Similarity.bruteForceTopK(emb(spark, dir),
        embSmall(spark, dir).filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 10)
      .filter(col("rank") > 5)
      .select(col("q_id"), (col("rank") - 5).cast(LongType).as("hn_rank"),
        col("neighbor_id"), col("cosine"))
      .orderBy("q_id", "hn_rank")

  val hardNegativesOracle: String =
    s"""WITH $quantCte,
       |scored AS (SELECT qq.id AS q_id, c.id AS c_id,
       |    ${duckCos(duckDot("c.qv", "qq.qv"), "c.n2", "qq.n2")} AS cosine
       |  FROM n c JOIN n qq ON qq.id < 10 AND c.id <> qq.id),
       |ranked AS (SELECT q_id, c_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT q_id, CAST(rank - 5 AS BIGINT) AS hn_rank, c_id AS neighbor_id, cosine
       |FROM ranked WHERE rank BETWEEN 6 AND 10 ORDER BY q_id, hn_rank""".stripMargin

  /** IVF top-5, probing the 2 nearest of the label-cluster centroids. */
  def annIvf(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    Similarity.ivfTopK(e,
        embSmall(spark, dir).filter(col("vec_id") >= 10 && col("vec_id") < 20),
        "vec_id", "embedding", "label", k = 5, nProbe = 2)
      .orderBy("q_id", "rank")
  }

  val annIvfOracle: String =
    s"""WITH $quantCte,
       |comp AS (SELECT cluster, i.i AS pos, sum(qv[i.i]) AS s
       |  FROM q CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
       |  GROUP BY cluster, i.i),
       |cent AS (SELECT cluster, array_agg(CAST(s AS BIGINT) ORDER BY pos) AS cv FROM comp GROUP BY cluster),
       |centn AS (SELECT cluster, cv,
       |  CAST(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])) AS BIGINT) AS cn2 FROM cent),
       |qry AS (SELECT id AS q_id, qv AS qq, n2 AS qn2 FROM n WHERE id >= 10 AND id < 20),
       |probe AS (SELECT q_id, qq, qn2, cluster,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      ${duckCos(duckDot("qq", "cv"), "qn2", "cn2")} DESC, cluster) AS pr
       |  FROM qry CROSS JOIN centn),
       |probed AS (SELECT q_id, qq, qn2, cluster FROM probe WHERE pr <= 2),
       |scored AS (SELECT p.q_id, c.id AS c_id,
       |    ${duckCos(duckDot("c.qv", "p.qq"), "c.n2", "p.qn2")} AS cosine
       |  FROM n c JOIN probed p ON c.cluster = p.cluster AND c.id <> p.q_id),
       |ranked AS (SELECT q_id, c_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT q_id, rank, c_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin

  /** Measured IVF recall@5 against brute-force ground truth — the
    * vector-side twin of [[DedupQueries.lshRecall]]: the nProbe=2
    * probe-and-scan answer joined against the exact top-5, per query,
    * recall in exact ppm. The number that decides whether nProbe needs
    * raising before an index ships.
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val qs = embSmall(spark, dir).filter(col("vec_id") >= 10 && col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
      .select(col("q_id"), col("neighbor_id"))
    val ivf = Similarity.ivfTopK(e, qs, "vec_id", "embedding", "label",
        k = 5, nProbe = 2)
      .select(col("q_id"), col("neighbor_id"))
    val common = exact.join(ivf, Seq("q_id", "neighbor_id"))
      .groupBy("q_id").agg(count(lit(1)).cast(LongType).as("n_common"))
    qs.select(col("vec_id").cast(LongType).as("q_id"))
      .join(common, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("recall_ppm", expr("(1000000 * n_common) div 5"))
      .orderBy("q_id")
  }

  val annRecallOracle: String =
    s"""WITH $quantCte,
       |ex_scored AS (SELECT qq.id AS q_id, c.id AS c_id,
       |    ${duckCos(duckDot("c.qv", "qq.qv"), "c.n2", "qq.n2")} AS cosine
       |  FROM n c JOIN n qq ON qq.id >= 10 AND qq.id < 20 AND c.id <> qq.id),
       |ex AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
       |  FROM ex_scored) WHERE rank <= 5),
       |comp AS (SELECT cluster, i.i AS pos, sum(qv[i.i]) AS s
       |  FROM q CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
       |  GROUP BY cluster, i.i),
       |cent AS (SELECT cluster, array_agg(CAST(s AS BIGINT) ORDER BY pos) AS cv FROM comp GROUP BY cluster),
       |centn AS (SELECT cluster, cv,
       |  CAST(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])) AS BIGINT) AS cn2 FROM cent),
       |qry AS (SELECT id AS q_id, qv AS qq, n2 AS qn2 FROM n WHERE id >= 10 AND id < 20),
       |probe AS (SELECT q_id, qq, qn2, cluster,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      ${duckCos(duckDot("qq", "cv"), "qn2", "cn2")} DESC, cluster) AS pr
       |  FROM qry CROSS JOIN centn),
       |probed AS (SELECT q_id, qq, qn2, cluster FROM probe WHERE pr <= 2),
       |iv_scored AS (SELECT p.q_id, c.id AS c_id,
       |    ${duckCos(duckDot("c.qv", "p.qq"), "c.n2", "p.qn2")} AS cosine
       |  FROM n c JOIN probed p ON c.cluster = p.cluster AND c.id <> p.q_id),
       |iv AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
       |  FROM iv_scored) WHERE rank <= 5),
       |common AS (SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_common
       |  FROM ex JOIN iv ON iv.q_id = ex.q_id AND iv.c_id = ex.c_id
       |  GROUP BY ex.q_id),
       |qlist AS (SELECT id AS q_id FROM n WHERE id >= 10 AND id < 20)
       |SELECT qlist.q_id AS q_id, coalesce(n_common, 0) AS n_common,
       |  (1000000 * coalesce(n_common, 0)) // 5 AS recall_ppm
       |FROM qlist LEFT JOIN common ON common.q_id = qlist.q_id
       |ORDER BY qlist.q_id""".stripMargin

  /** Margin-based bitext mining ([[Similarity.marginMine]]): even
    * vec_ids < 40 are the source batch, odd vec_ids the target corpus;
    * per source the best target by ratio margin (k=4 neighborhood,
    * 8 candidates), all scores exact micro-cosine BIGINTs.
    */
  def bitextMargin(spark: SparkSession, dir: String): DataFrame = {
    val src = embSmall(spark, dir)
      .filter(col("vec_id") < 40 && col("vec_id") % 2 === 0)
    val tgt = emb(spark, dir).filter(col("vec_id") % 2 === 1)
    Similarity.marginMine(tgt, src, "vec_id", "embedding", k = 4, nCand = 8)
      .orderBy("q_id")
  }

  val bitextMarginOracle: String = {
    val cm = "CAST(round(CAST(" + duckDot("t_qv", "s_qv") +
      " AS DOUBLE) * 1000000 / (sqrt(CAST(t_n2 AS DOUBLE)) * " +
      "sqrt(CAST(s_n2 AS DOUBLE)))) AS BIGINT)"
    s"""WITH $quantCte,
       |src AS (SELECT id AS q_id, qv AS s_qv, n2 AS s_n2 FROM n
       |  WHERE id < 40 AND id % 2 = 0),
       |tgt AS (SELECT id AS t_id, qv AS t_qv, n2 AS t_n2 FROM n
       |  WHERE id % 2 = 1),
       |pos AS (SELECT * FROM (SELECT q_id, t_id, $cm AS cm
       |    FROM tgt CROSS JOIN src WHERE t_id <> q_id) WHERE cm > 0),
       |cand AS (SELECT q_id, t_id, cm, r FROM (SELECT q_id, t_id, cm,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cm DESC, t_id) AS BIGINT) AS r
       |  FROM pos) WHERE r <= 8),
       |a AS (SELECT q_id, CAST(sum(cm) AS BIGINT) AS a_sum,
       |    CAST(count(*) AS BIGINT) AS cnt_a FROM cand
       |  WHERE r <= 4 GROUP BY q_id),
       |b AS (SELECT t_id, CAST(sum(cm) AS BIGINT) AS b_sum,
       |    CAST(count(*) AS BIGINT) AS cnt_b FROM (SELECT t_id, q_id, cm,
       |    row_number() OVER (PARTITION BY t_id ORDER BY cm DESC, q_id) AS r
       |  FROM pos WHERE t_id IN (SELECT DISTINCT t_id FROM cand)) WHERE r <= 4
       |  GROUP BY t_id),
       |m AS (SELECT c.q_id, c.t_id, c.cm,
       |    (2000000 * c.cm * cnt_a * cnt_b)
       |      // (a_sum * cnt_b + b_sum * cnt_a) AS margin_ppm
       |  FROM cand c JOIN a USING (q_id) JOIN b USING (t_id)
       |  WHERE a_sum + b_sum > 0)
       |SELECT q_id, t_id AS tgt_id, cm AS cos_micro, margin_ppm
       |FROM (SELECT q_id, t_id, cm, margin_ppm,
       |    row_number() OVER (PARTITION BY q_id ORDER BY margin_ppm DESC, t_id) AS rr
       |  FROM m)
       |WHERE rr = 1 ORDER BY q_id""".stripMargin
  }

  /** IVF training: deterministic k-means (k=8, 2 Lloyd iterations,
    * integer-sum centroids — see [[Similarity.kmeansAssign]]).
    */
  def kmeansClusters(spark: SparkSession, dir: String): DataFrame =
    Similarity.kmeansAssign(emb(spark, dir), "vec_id", "embedding", k = 8, iters = 2)
      .orderBy("vec_id")

  val kmeansClustersOracle: String = {
    def assignCte(name: String, centCte: String): String =
      s"""$name AS (
         |  SELECT id, qv, cluster FROM (
         |    SELECT n.id, n.qv, c.cluster,
         |      row_number() OVER (PARTITION BY n.id ORDER BY
         |        ${duckCos(duckDot("n.qv", "c.cent"), "n.n2", "c.cn2")} DESC, c.cluster) AS rk
         |    FROM n CROSS JOIN $centCte c)
         |  WHERE rk = 1)""".stripMargin
    def centCte(name: String, assignCteName: String): String =
      s"""$name AS (
         |  SELECT cluster, cent,
         |    CAST(list_sum(list_transform(range(1, 65), i -> cent[i] * cent[i])) AS BIGINT) AS cn2
         |  FROM (
         |    SELECT cluster, array_agg(CAST(s AS BIGINT) ORDER BY pos) AS cent FROM (
         |      SELECT cluster, i.i AS pos, sum(qv[i.i]) AS s
         |      FROM $assignCteName CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
         |      GROUP BY cluster, i.i)
         |    GROUP BY cluster))""".stripMargin
    s"""WITH $quantCte,
       |cent0 AS (SELECT id AS cluster, qv AS cent, n2 AS cn2 FROM n WHERE id < 8),
       |${assignCte("a1", "cent0")},
       |${centCte("c1", "a1")},
       |${assignCte("a2", "c1")},
       |${centCte("c2", "a2")},
       |${assignCte("afinal", "c2")}
       |SELECT CAST(id AS BIGINT) AS vec_id, CAST(cluster AS BIGINT) AS cluster
       |FROM afinal ORDER BY vec_id""".stripMargin
  }

  /** Prototype pruning ([[Similarity.protoPrune]]): k-means (k=8, 2
    * Lloyd iterations), micro-cosine to the final-assignment centroid,
    * rank within cluster, top-25% most prototypical marked pruned.
    */
  def protoPrune(spark: SparkSession, dir: String): DataFrame =
    Similarity.protoPrune(emb(spark, dir), "vec_id", "embedding",
        k = 8, iters = 2, denom = 4)
      .orderBy("vec_id")

  val protoPruneOracle: String = {
    val marker = "SELECT CAST(id AS BIGINT) AS vec_id"
    val kmeansPart =
      kmeansClustersOracle.substring(0, kmeansClustersOracle.indexOf(marker)).trim
    val cm = "CAST(round(CAST(" + duckDot("nc.qv", "cv") +
      " AS DOUBLE) * 1000000 / (sqrt(CAST(nc.n2 AS DOUBLE)) * " +
      "sqrt(CAST(cn2 AS DOUBLE)))) AS BIGINT)"
    s"""$kmeansPart,
       |nc AS (SELECT n.id, a.cluster, n.qv, n.n2 FROM n JOIN afinal a ON n.id = a.id),
       |comp AS (SELECT cluster, i.i AS pos, sum(qv[i.i]) AS s
       |  FROM nc CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
       |  GROUP BY cluster, i.i),
       |cent AS (SELECT cluster, array_agg(CAST(s AS BIGINT) ORDER BY pos) AS cv FROM comp GROUP BY cluster),
       |centn AS (SELECT cluster, cv,
       |  CAST(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])) AS BIGINT) AS cn2 FROM cent),
       |scored AS (SELECT nc.id, nc.cluster, $cm AS proto_cos
       |  FROM nc JOIN centn USING (cluster)),
       |ranked AS (SELECT id, cluster, proto_cos,
       |    CAST(row_number() OVER (PARTITION BY cluster ORDER BY proto_cos DESC, id) AS BIGINT) AS proto_rank,
       |    CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS csize
       |  FROM scored)
       |SELECT CAST(id AS BIGINT) AS vec_id, CAST(cluster AS BIGINT) AS cluster,
       |  proto_cos, proto_rank,
       |  CAST(CASE WHEN proto_rank * 4 <= csize THEN 1 ELSE 0 END AS BIGINT) AS pruned
       |FROM ranked ORDER BY vec_id""".stripMargin
  }

  /** Full self-trained IVF: cluster with k-means, then probe-and-scan
    * over the trained clusters — no reliance on the given labels.
    */
  def annIvfTrained(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    // the k-means core hands back the SAME persisted quantized corpus
    // with assignments attached — no join back to the raw table, no
    // second quantize pass
    val prepared = Similarity.kmeansPrepared(e, "vec_id", "embedding", k = 8, iters = 2)
    Similarity.ivfTopKPrepared(prepared,
        embSmall(spark, dir).filter(col("vec_id") < 5),
        "vec_id", "embedding", k = 5, nProbe = 2)
      .orderBy("q_id", "rank")
  }

  val annIvfTrainedOracle: String = {
    // k-means CTEs (same as kmeansClustersOracle) feeding an IVF probe:
    // nc = corpus with TRAINED cluster ids, then centroid/probe/scan.
    val marker = "SELECT CAST(id AS BIGINT) AS vec_id"
    val kmeansPart =
      kmeansClustersOracle.substring(0, kmeansClustersOracle.indexOf(marker)).trim
    s"""$kmeansPart,
       |nc AS (SELECT n.id, a.cluster, n.qv, n.n2 FROM n JOIN afinal a ON n.id = a.id),
       |comp AS (SELECT cluster, i.i AS pos, sum(qv[i.i]) AS s
       |  FROM nc CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
       |  GROUP BY cluster, i.i),
       |cent AS (SELECT cluster, array_agg(CAST(s AS BIGINT) ORDER BY pos) AS cv FROM comp GROUP BY cluster),
       |centn AS (SELECT cluster, cv,
       |  CAST(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])) AS BIGINT) AS cn2 FROM cent),
       |qry AS (SELECT id AS q_id, qv AS qq, n2 AS qn2 FROM n WHERE id < 5),
       |probe AS (SELECT q_id, qq, qn2, cluster,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      ${duckCos(duckDot("qq", "cv"), "qn2", "cn2")} DESC, cluster) AS pr
       |  FROM qry CROSS JOIN centn),
       |probed AS (SELECT q_id, qq, qn2, cluster FROM probe WHERE pr <= 2),
       |scored AS (SELECT p.q_id, c.id AS c_id,
       |    ${duckCos(duckDot("c.qv", "p.qq"), "c.n2", "p.qn2")} AS cosine
       |  FROM nc c JOIN probed p ON c.cluster = p.cluster AND c.id <> p.q_id),
       |ranked AS (SELECT q_id, c_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT q_id, rank, c_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** Random-hyperplane LSH top-5 with hamming-1 multi-probe for query
    * vectors vec_id < 10 (the training-free LSH-bucketed ANN scale
    * path; 8 sign bits).
    */
  def annLsh(spark: SparkSession, dir: String): DataFrame =
    Similarity.lshTopK(emb(spark, dir),
        embSmall(spark, dir).filter(col("vec_id") < 10),
        "vec_id", "embedding", k = 5, nBits = 8)
      .orderBy("q_id", "rank")

  val annLshOracle: String = {
    // deterministic ±1 hyperplanes from md5("p:d") parity — the exact
    // matrix Similarity.hyperplanes builds; multi-probe = all candidate
    // buckets within hamming 1 of the query bucket
    val planeHash = graft.functions.PortableHash.duckdbHash60(
      "CAST(p.p AS VARCHAR) || ':' || CAST(d.d AS VARCHAR)")
    s"""WITH $quantCte,
       |pl AS (SELECT p.p AS plane, d.d AS dim,
       |    CASE WHEN ($planeHash) % 2 = 1 THEN 1 ELSE -1 END AS s
       |  FROM (SELECT unnest(range(0, 8)) AS p) p
       |  CROSS JOIN (SELECT unnest(range(0, 64)) AS d) d),
       |planes AS (SELECT plane, array_agg(CAST(s AS BIGINT) ORDER BY dim) AS pv
       |  FROM pl GROUP BY plane),
       |bux AS (SELECT n.id,
       |    CAST(sum(CASE WHEN ${duckDot("n.qv", "pv")} > 0
       |      THEN CAST(1 AS BIGINT) << plane ELSE 0 END) AS BIGINT) AS bucket
       |  FROM n CROSS JOIN planes GROUP BY n.id),
       |qry AS (SELECT n.id AS q_id, n.qv AS qq, n.n2 AS qn2, b.bucket AS qb
       |  FROM n JOIN bux b ON n.id = b.id WHERE n.id < 10),
       |scored AS (SELECT q.q_id, c.id AS c_id,
       |    ${duckCos(duckDot("c.qv", "q.qq"), "c.n2", "q.qn2")} AS cosine
       |  FROM qry q
       |  JOIN (SELECT n.id, n.qv, n.n2, b.bucket FROM n JOIN bux b ON n.id = b.id) c
       |    ON bit_count(xor(q.qb, c.bucket)) <= 1 AND c.id <> q.q_id),
       |ranked AS (SELECT q_id, c_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT q_id, rank, c_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** Embedding-cosine near-dup pairs above 0.4, blocked by label. */
  def embedNearDups(spark: SparkSession, dir: String): DataFrame =
    Similarity.nearDupPairs(emb(spark, dir), "vec_id", "embedding", "label", threshold = 0.4)
      .orderBy("id_a", "id_b")

  val embedNearDupsOracle: String =
    s"""WITH $quantCte,
       |${DuckSql.cappedPairsCtes("cand", "n", Seq("cluster"))},
       |pairs AS (SELECT c.id_a, c.id_b,
       |    ${duckCos(duckDot("a.qv", "b.qv"), "a.n2", "b.n2")} AS cosine
       |  FROM cand c JOIN n a ON a.id = c.id_a JOIN n b ON b.id = c.id_b)
       |SELECT id_a, id_b, cosine FROM pairs WHERE cosine >= 0.4
       |ORDER BY id_a, id_b""".stripMargin

  /** SemDeDup keeper assignment: semantic ε-groups (cosine >= 0.3
    * within a label cluster) collapse to their min-id representative
    * ([[Similarity.semDedup]]).
    */
  def semDedup(spark: SparkSession, dir: String): DataFrame =
    Similarity.semDedup(emb(spark, dir), "vec_id", "embedding", "label",
        threshold = 0.3)
      .orderBy("vec_id")

  val semDedupOracle: String =
    s"""WITH $quantCte,
       |${DuckSql.cappedPairsCtes("cand", "n", Seq("cluster"))},
       |pairs AS (SELECT c.id_a, c.id_b
       |  FROM cand c JOIN n a ON a.id = c.id_a JOIN n b ON b.id = c.id_b
       |  WHERE ${duckCos(duckDot("a.qv", "b.qv"), "a.n2", "b.n2")} >= 0.3),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |${DuckSql.ccLabelCtes("SELECT id FROM n")}
       |SELECT CAST(id AS BIGINT) AS vec_id,
       |  CAST(cluster_id AS BIGINT) AS keeper_id,
       |  CAST(CASE WHEN id <> cluster_id THEN 1 ELSE 0 END AS BIGINT) AS is_dup
       |FROM labels ORDER BY vec_id""".stripMargin

  /** D4 selection (Tirumala et al., "D4: Improving LLM Pretraining via
    * Document De-Duplication and Diversification", 2023): SemDeDup
    * first (drop semantic ε-duplicates), then SSL prototype pruning
    * over the SURVIVORS (drop the most prototypical slice of what
    * remains) — dedup removes redundancy, pruning removes the easy
    * core, and the paper's point is that the two compose. Verdict per
    * vector: `dropped_semdedup` / `dropped_proto` / `kept`.
    *
    * Composes [[Similarity.semDedup]] (threshold 0.3 within label
    * clusters) and [[Similarity.protoPrune]] (k=8, 2 Lloyd rounds,
    * top-25% pruned) — k-means re-runs on the survivor set, so its
    * init is the surviving ids < k (id 0 always survives: min-id
    * keepers). Scale shape is its parts': bucket-bounded pairs, O(log)
    * CC rounds, narrow centroid scoring, one semi-join, one left join.
    * The two stages share ONE quantize pass: the blocked quantized
    * corpus is materialized once and SemDeDup's survivor set is a
    * semi-join over that same frame (no second quantize scan).
    */
  def d4Select(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val prep = Similarity.quantizedClusteredCorpus(
      e, "vec_id", "embedding", "label")
    // feeds the survivor semi-join AND the final verdict join
    val sd = Similarity.semDedupFromQuantized(prep, threshold = 0.3)
      .localCheckpoint(true)
    // re-materialized: the Lloyd loop inside protoPrune reads its
    // input once per iteration, and a semi-join shouldn't re-run then
    val survivors = prep.join(
      sd.filter(col("is_dup") === 0).select(col("vec_id").as("id")),
      Seq("id"), "left_semi")
      .select(col("id"), col("q"), col("n2"))
      .localCheckpoint(true)
    val pp = Similarity.protoPruneFromQuantized(survivors,
      k = 8, iters = 2, denom = 4)
    sd.join(pp.select(col("vec_id"), col("pruned")), Seq("vec_id"), "left")
      .select(col("vec_id"), col("keeper_id"),
        when(col("is_dup") === 1, lit("dropped_semdedup"))
          .when(col("pruned") === 1, lit("dropped_proto"))
          .otherwise(lit("kept")).as("verdict"))
      .orderBy("vec_id")
  }

  /** k-means CTE chain over an arbitrary source CTE (id, qv, n2 — and
    * the chain re-derives clusters), for oracles that cluster a FILTERED
    * vector set; kmeansClustersOracle keeps its standalone text (other
    * oracles substring it).
    */
  private def kmeansCtesOver(src: String): String = {
    def assign(name: String, cents: String): String =
      s"""$name AS (
         |  SELECT id, qv, n2, cluster FROM (
         |    SELECT s.id, s.qv, s.n2, c.cluster,
         |      row_number() OVER (PARTITION BY s.id ORDER BY
         |        ${duckCos(duckDot("s.qv", "c.cent"), "s.n2", "c.cn2")} DESC, c.cluster) AS rk
         |    FROM $src s CROSS JOIN $cents c)
         |  WHERE rk = 1)""".stripMargin
    def cent(name: String, assignName: String): String =
      s"""$name AS (
         |  SELECT cluster, cent,
         |    CAST(list_sum(list_transform(range(1, 65), i -> cent[i] * cent[i])) AS BIGINT) AS cn2
         |  FROM (
         |    SELECT cluster, array_agg(CAST(s AS BIGINT) ORDER BY pos) AS cent FROM (
         |      SELECT cluster, i.i AS pos, sum(qv[i.i]) AS s
         |      FROM $assignName CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
         |      GROUP BY cluster, i.i)
         |    GROUP BY cluster))""".stripMargin
    s"""km_cent0 AS (SELECT id AS cluster, qv AS cent, n2 AS cn2 FROM $src WHERE id < 8),
       |${assign("km_a1", "km_cent0")},
       |${cent("km_c1", "km_a1")},
       |${assign("km_a2", "km_c1")},
       |${cent("km_c2", "km_a2")},
       |${assign("km_afinal", "km_c2")}""".stripMargin
  }

  val d4SelectOracle: String = {
    val protoCm = "CAST(round(CAST(" + duckDot("a.qv", "cv") +
      " AS DOUBLE) * 1000000 / (sqrt(CAST(a.n2 AS DOUBLE)) * " +
      "sqrt(CAST(cn2 AS DOUBLE)))) AS BIGINT)"
    s"""WITH $quantCte,
       |${DuckSql.cappedPairsCtes("cand", "n", Seq("cluster"))},
       |pairs AS (SELECT c.id_a, c.id_b
       |  FROM cand c JOIN n a ON a.id = c.id_a JOIN n b ON b.id = c.id_b
       |  WHERE ${duckCos(duckDot("a.qv", "b.qv"), "a.n2", "b.n2")} >= 0.3),
       |edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
       |  UNION ALL SELECT id_b, id_a FROM pairs),
       |${DuckSql.ccLabelCtes("SELECT id FROM n")},
       |sd AS (SELECT id, CAST(cluster_id AS BIGINT) AS keeper FROM labels),
       |ns AS (SELECT n.id, n.qv, n.n2 FROM n
       |  JOIN sd ON sd.id = n.id AND sd.keeper = n.id),
       |${kmeansCtesOver("ns")},
       |km_comp AS (SELECT cluster, i.i AS pos, sum(qv[i.i]) AS s
       |  FROM km_afinal CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
       |  GROUP BY cluster, i.i),
       |km_cent AS (SELECT cluster, array_agg(CAST(s AS BIGINT) ORDER BY pos) AS cv
       |  FROM km_comp GROUP BY cluster),
       |km_centn AS (SELECT cluster, cv,
       |  CAST(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])) AS BIGINT) AS cn2
       |  FROM km_cent),
       |scored AS (SELECT a.id, a.cluster, $protoCm AS proto_cos
       |  FROM km_afinal a JOIN km_centn USING (cluster)),
       |ranked AS (SELECT id, proto_cos,
       |    CAST(row_number() OVER (PARTITION BY cluster ORDER BY proto_cos DESC, id) AS BIGINT) AS proto_rank,
       |    CAST(count(*) OVER (PARTITION BY cluster) AS BIGINT) AS csize
       |  FROM scored),
       |proto AS (SELECT id,
       |    CASE WHEN proto_rank * 4 <= csize THEN 1 ELSE 0 END AS pruned
       |  FROM ranked)
       |SELECT CAST(sd.id AS BIGINT) AS vec_id, sd.keeper AS keeper_id,
       |  CASE WHEN sd.id <> sd.keeper THEN 'dropped_semdedup'
       |    WHEN proto.pruned = 1 THEN 'dropped_proto'
       |    ELSE 'kept' END AS verdict
       |FROM sd LEFT JOIN proto ON proto.id = sd.id
       |ORDER BY vec_id""".stripMargin
  }

  /** Per-label centroid components: element-wise count/sum/mean of the
    * quantized vectors — the mergeable array aggregation behind cluster
    * summaries and mean-pooling. One posexplode + a single keyed
    * aggregation with map-side partial agg (k×dim result rows) — the
    * same shape [[Similarity]]'s k-means driver collects, exposed as a
    * graded query. Sums are exact integers; the mean is one double
    * division at the end.
    */
  def embedCentroids(spark: SparkSession, dir: String): DataFrame =
    emb(spark, dir)
      .select(col("label").cast(LongType).as("label"),
        Similarity.quantize(col("embedding")).as("q"))
      .select(col("label"), posexplode(col("q")).as(Seq("pos", "v")))
      .groupBy(col("label"), col("pos"))
      .agg(count(lit(1)).cast(LongType).as("n_vecs"),
        sum(col("v")).cast(LongType).as("sum_q"),
        round(sum(col("v")).cast(DoubleType) / count(lit(1)), 6).as("mean_q"))
      .select(col("label"), col("pos").cast(LongType).as("pos"),
        col("n_vecs"), col("sum_q"), col("mean_q"))
      .orderBy("label", "pos")

  /** Int8 affine quantization codes, one row per (vector, dimension) —
    * see [[graft.operators.EmbedQuantize]] for the exact-integer
    * construction and the two-pass scale shape.
    */
  def embedQuantize(spark: SparkSession, dir: String): DataFrame =
    graft.operators.EmbedQuantize
      .int8Codes(emb(spark, dir), "vec_id", "embedding")
      .orderBy("vec_id", "pos")

  val embedQuantizeOracle: String =
    s"""WITH $quantCte,
       |d AS (SELECT id, i - 1 AS pos, qv[i] AS x
       |  FROM q CROSS JOIN unnest(range(1, 65)) AS t(i)),
       |s AS (SELECT pos, min(x) AS mn, max(x) AS mx FROM d GROUP BY pos)
       |SELECT d.id AS vec_id, CAST(d.pos AS BIGINT) AS pos,
       |  CAST(CASE WHEN s.mx > s.mn
       |    THEN (d.x - s.mn) * 255 // (s.mx - s.mn) - 128
       |    ELSE 0 END AS BIGINT) AS code
       |FROM d JOIN s USING (pos) ORDER BY vec_id, pos""".stripMargin

  val embedCentroidsOracle: String =
    s"""WITH $quantCte,
       |e AS (SELECT cluster AS label, i - 1 AS pos, qv[i] AS v
       |  FROM q CROSS JOIN unnest(range(1, 65)) AS t(i))
       |SELECT CAST(label AS BIGINT) AS label, CAST(pos AS BIGINT) AS pos,
       |  CAST(count(*) AS BIGINT) AS n_vecs,
       |  CAST(sum(v) AS BIGINT) AS sum_q,
       |  round(CAST(sum(v) AS DOUBLE) / count(*), 6) AS mean_q
       |FROM e GROUP BY label, pos ORDER BY label, pos""".stripMargin

  /** Matryoshka truncation audit: top-5 recall of prefix-truncated
    * embeddings (dims 4 and 16) against the full-64-dim exact top-5 —
    * the measurement behind "can we store/search at a fraction of the
    * dim and re-rank with the full vector". Per (dim, query) overlap
    * count, exact: truncation-then-quantization equals
    * quantization-then-prefix, so both engines slice the same integer
    * lists. Three corpus scans (full + two truncations) are
    * definitional — each is the standard broadcast-queries brute-force
    * shape; the 50-row full-dim ground truth materializes once.
    */
  def matryoshkaRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val q = embSmall(spark, dir).filter(col("vec_id") < 10)
    def top5(dim: Option[Int]): DataFrame = {
      def cut(df: DataFrame): DataFrame = dim match {
        case Some(d) => df.withColumn("embedding", slice(col("embedding"), 1, d))
        case None => df
      }
      Similarity.bruteForceTopK(cut(e), cut(q), "vec_id", "embedding", k = 5)
        .select(col("q_id"), col("neighbor_id"))
    }
    val full = top5(None).localCheckpoint(true) // ground truth feeds every dim
    val qIds = q.select(col("vec_id").cast(LongType).as("q_id"))
    val perDim = Seq(4, 16).map { d =>
      val overlap = top5(Some(d))
        .join(full, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
      qIds.join(overlap, Seq("q_id"), "left")
        .select(lit(d.toLong).as("dim"), col("q_id"),
          coalesce(col("n_overlap"), lit(0L)).cast(LongType).as("n_overlap"))
    }
    perDim.reduce(_ unionAll _)
      .withColumn("recall_ppm", (col("n_overlap") * 200000L).cast(LongType))
      .orderBy("dim", "q_id")
  }

  val matryoshkaRecallOracle: String = {
    def rankedCte(name: String, dims: Int): String = {
      val dot = s"CAST(list_sum(list_transform(range(1, ${dims + 1}), i -> c.qv[i] * qq.qv[i])) AS BIGINT)"
      val n2 = (a: String) => s"CAST(list_sum(list_transform(range(1, ${dims + 1}), i -> $a.qv[i] * $a.qv[i])) AS BIGINT)"
      val cos = duckCos(dot, n2("c"), n2("qq"))
      s"""${name} AS (SELECT q_id, c_id FROM (
         |  SELECT qq.id AS q_id, c.id AS c_id,
         |    row_number() OVER (PARTITION BY qq.id ORDER BY $cos DESC, c.id) AS rank
         |  FROM q c JOIN q qq ON qq.id < 10 AND c.id <> qq.id)
         |  WHERE rank <= 5)""".stripMargin
    }
    s"""WITH $quantCte,
       |${rankedCte("full5", 64)},
       |${rankedCte("t4", 4)},
       |${rankedCte("t16", 16)},
       |qi AS (SELECT DISTINCT id AS q_id FROM q WHERE id < 10),
       |o4 AS (SELECT t.q_id, count(*) AS n FROM t4 t JOIN full5 f
       |  ON f.q_id = t.q_id AND f.c_id = t.c_id GROUP BY t.q_id),
       |o16 AS (SELECT t.q_id, count(*) AS n FROM t16 t JOIN full5 f
       |  ON f.q_id = t.q_id AND f.c_id = t.c_id GROUP BY t.q_id),
       |u AS (
       |  SELECT CAST(4 AS BIGINT) AS dim, qi.q_id, coalesce(o4.n, 0) AS n_overlap
       |  FROM qi LEFT JOIN o4 ON o4.q_id = qi.q_id
       |  UNION ALL
       |  SELECT CAST(16 AS BIGINT) AS dim, qi.q_id, coalesce(o16.n, 0) AS n_overlap
       |  FROM qi LEFT JOIN o16 ON o16.q_id = qi.q_id)
       |SELECT dim, q_id, CAST(n_overlap AS BIGINT) AS n_overlap,
       |  CAST(n_overlap * 200000 AS BIGINT) AS recall_ppm
       |FROM u ORDER BY dim, q_id""".stripMargin
  }

  // ---- Johnson–Lindenstrauss sign projection -----------------------

  /** JL sign projection 64→16 over the first 50 vectors
    * ([[graft.operators.RandomProjection]]): exact integer projections
    * from the hash-derived ±1 matrix, flattened to (vec_id, k, y).
    */
  def randProject(spark: SparkSession, dir: String): DataFrame =
    graft.operators.RandomProjection.projectRows(
      embSmall(spark, dir).filter(col("vec_id") < 50),
      "vec_id", "embedding", outDim = 16)
      .orderBy("vec_id", "k")

  /** The hash-derived sign matrix + flattened quantized dims, in SQL. */
  private def projCte(corpusFilter: String): String = {
    val h = graft.functions.PortableHash.duckdbHash60(
      "'rp:' || CAST(j AS VARCHAR) || ':' || CAST(k AS VARCHAR)")
    s"""sg AS (SELECT j.j AS j, k.k AS k,
       |    CASE WHEN ($h) % 2 = 0 THEN 1 ELSE -1 END AS s
       |  FROM (SELECT unnest(range(0, 64)) AS j) j
       |  CROSS JOIN (SELECT unnest(range(0, 16)) AS k) k),
       |d AS (SELECT id, i - 1 AS j, qv[i] AS x
       |  FROM q CROSS JOIN unnest(range(1, 65)) AS t(i) $corpusFilter),
       |p AS (SELECT id, k, CAST(sum(s * x) AS BIGINT) AS y
       |  FROM d JOIN sg USING (j) GROUP BY id, k)""".stripMargin
  }

  val randProjectOracle: String =
    s"""WITH $quantCte,
       |${projCte("WHERE id < 50")}
       |SELECT id AS vec_id, CAST(k AS BIGINT) AS k, y
       |FROM p ORDER BY vec_id, k""".stripMargin

  /** JL projection quality audit: top-5 recall in the 16-dim projected
    * space against the exact 64-dim top-5 — the measured answer to
    * "how much recall does 4x index compression cost". Corpus
    * projections are one narrow native pass; both rankings are the
    * standard broadcast-queries brute-force shape.
    */
  def rpRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val qs = embSmall(spark, dir).filter(col("vec_id") < 10)
    val full = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
      .select(col("q_id"), col("neighbor_id"))
    val proj = Similarity.bruteForceTopKInt(
      graft.operators.RandomProjection.projectVecs(e, "vec_id", "embedding", 16),
      graft.operators.RandomProjection.projectVecs(qs, "vec_id", "embedding", 16),
      "vec_id", "yv", k = 5)
      .select(col("q_id"), col("neighbor_id"))
    val qIds = qs.select(col("vec_id").cast(LongType).as("q_id"))
    val overlap = proj.join(full, Seq("q_id", "neighbor_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    qIds.join(overlap, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_overlap"), lit(0L)).cast(LongType).as("n_overlap"))
      .withColumn("recall_ppm", (col("n_overlap") * 200000L).cast(LongType))
      .orderBy("q_id")
  }

  val rpRecallOracle: String = {
    val pdot = "CAST(list_sum(list_transform(range(1, 17), i -> c.yv[i] * qq.yv[i])) AS BIGINT)"
    val pn2 = (a: String) => s"CAST(list_sum(list_transform(range(1, 17), i -> $a.yv[i] * $a.yv[i])) AS BIGINT)"
    val fdot = "CAST(list_sum(list_transform(range(1, 65), i -> c.qv[i] * qq.qv[i])) AS BIGINT)"
    val fn2 = (a: String) => s"CAST(list_sum(list_transform(range(1, 65), i -> $a.qv[i] * $a.qv[i])) AS BIGINT)"
    s"""WITH $quantCte,
       |${projCte("")},
       |pv AS (SELECT id, list(y ORDER BY k) AS yv FROM p GROUP BY id),
       |full5 AS (SELECT q_id, c_id FROM (
       |  SELECT qq.id AS q_id, c.id AS c_id,
       |    row_number() OVER (PARTITION BY qq.id
       |      ORDER BY ${duckCos(fdot, fn2("c"), fn2("qq"))} DESC, c.id) AS rank
       |  FROM q c JOIN q qq ON qq.id < 10 AND c.id <> qq.id)
       |  WHERE rank <= 5),
       |proj5 AS (SELECT q_id, c_id FROM (
       |  SELECT qq.id AS q_id, c.id AS c_id,
       |    row_number() OVER (PARTITION BY qq.id
       |      ORDER BY ${duckCos(pdot, pn2("c"), pn2("qq"))} DESC, c.id) AS rank
       |  FROM pv c JOIN pv qq ON qq.id < 10 AND c.id <> qq.id)
       |  WHERE rank <= 5),
       |qi AS (SELECT DISTINCT id AS q_id FROM q WHERE id < 10),
       |o AS (SELECT t.q_id, count(*) AS n FROM proj5 t JOIN full5 f
       |  ON f.q_id = t.q_id AND f.c_id = t.c_id GROUP BY t.q_id)
       |SELECT qi.q_id, CAST(coalesce(o.n, 0) AS BIGINT) AS n_overlap,
       |  CAST(coalesce(o.n, 0) * 200000 AS BIGINT) AS recall_ppm
       |FROM qi LEFT JOIN o ON o.q_id = qi.q_id ORDER BY qi.q_id""".stripMargin
  }

  // ---- product quantization (PQ; Jégou et al. 2011) ----------------

  /** PQ codes — m=8 subspaces, k=16 entries, 2 Lloyd iterations
    * ([[graft.operators.ProductQuantize]]): each 64-dim vector becomes
    * 8 small codes (8·log2(16) = 4 bytes), the billion-scale ANN
    * compression step. Exact spherical integer k-means per subspace,
    * all subspaces trained in one pass per iteration.
    */
  def pqCodes(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val model = graft.operators.ProductQuantize
      .train(e, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    graft.operators.ProductQuantize.encode(e, "vec_id", "embedding", model)
      .orderBy("vec_id", "sub")
  }

  /** Unrolled per-subspace Lloyd (init = first 16 ids' subvectors; 2
    * iterations; integer-sum centroids; cosine, ties to lowest
    * cluster) — [[SimilarityQueries.kmeansClustersOracle]]'s shape with
    * `sub` as an extra grouping key throughout. `paf` = final codes,
    * `pc2` = final codebooks.
    */
  private val pqCte: String = {
    def subCos(sv: String, cent: String, sn: String, cn: String) = duckCos(
      s"CAST(list_sum(list_transform(range(1, 9), t -> $sv[t] * $cent[t])) AS BIGINT)", sn, cn)
    def assignCte(name: String, centName: String) =
      s"""$name AS (SELECT id, sub, sv, sn2, cluster FROM (
         |  SELECT s.id, s.sub, s.sv, s.sn2, c.cluster,
         |    row_number() OVER (PARTITION BY s.id, s.sub ORDER BY
         |      ${subCos("s.sv", "c.cent", "s.sn2", "c.n2x")} DESC, c.cluster) AS rk
         |  FROM sq s JOIN $centName c ON c.sub = s.sub)
         |  WHERE rk = 1)""".stripMargin
    def centCte(name: String, aName: String) =
      s"""$name AS (SELECT sub, cluster, cent,
         |    CAST(list_sum(list_transform(range(1, 9), t -> cent[t] * cent[t])) AS BIGINT) AS n2x
         |  FROM (SELECT sub, cluster, array_agg(CAST(s2 AS BIGINT) ORDER BY pos) AS cent
         |    FROM (SELECT sub, cluster, p.p AS pos, sum(sv[p.p]) AS s2
         |      FROM $aName CROSS JOIN (SELECT unnest(range(1, 9)) AS p) p
         |      GROUP BY sub, cluster, p.p) t1 GROUP BY sub, cluster) t2)""".stripMargin
    s"""sq AS (SELECT id, s.s AS sub, qv[s.s*8+1 : s.s*8+8] AS sv,
       |    CAST(list_sum(list_transform(range(1, 9), t -> qv[s.s*8+t] * qv[s.s*8+t])) AS BIGINT) AS sn2
       |  FROM q CROSS JOIN (SELECT unnest(range(0, 8)) AS s) s),
       |cent0 AS (SELECT sub, id AS cluster, sv AS cent, sn2 AS n2x FROM sq WHERE id < 16),
       |${assignCte("pa1", "cent0")},
       |${centCte("pc1", "pa1")},
       |${assignCte("pa2", "pc1")},
       |${centCte("pc2", "pa2")},
       |${assignCte("paf", "pc2")}""".stripMargin
  }

  val pqCodesOracle: String =
    s"""WITH $quantCte,
       |$pqCte
       |SELECT CAST(id AS BIGINT) AS vec_id, CAST(sub AS BIGINT) AS sub,
       |  CAST(cluster AS BIGINT) AS code
       |FROM paf ORDER BY vec_id, sub""".stripMargin

  /** PQ quality audit: asymmetric-distance top-5 (exact queries vs
    * reconstructed corpus — `dot(concat(c_i), q) = Σ_i dot(c_i, q_i)`)
    * against the exact 64-dim top-5. The decoded corpus is pure per-row
    * compute; ranking is the standard broadcast-queries shape.
    */
  def pqRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val qs = embSmall(spark, dir).filter(col("vec_id") < 10)
    val model = graft.operators.ProductQuantize
      .train(e, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val dec = graft.operators.ProductQuantize
      .decode(e, "vec_id", "embedding", model)
      .select(col("vec_id"), col("rv").as("v"))
    val qq = qs.select(col("vec_id"),
      graft.expressions.QuantizeVec.quantize_vec(col("embedding")).as("v"))
    val approx = Similarity.bruteForceTopKInt(dec, qq, "vec_id", "v", k = 5)
      .select(col("q_id"), col("neighbor_id"))
    val full = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
      .select(col("q_id"), col("neighbor_id"))
    val qIds = qs.select(col("vec_id").cast(LongType).as("q_id"))
    val overlap = approx.join(full, Seq("q_id", "neighbor_id"), "left_semi")
      .groupBy(col("q_id")).agg(count(lit(1)).as("n_overlap"))
    qIds.join(overlap, Seq("q_id"), "left")
      .select(col("q_id"),
        coalesce(col("n_overlap"), lit(0L)).cast(LongType).as("n_overlap"))
      .withColumn("recall_ppm", (col("n_overlap") * 200000L).cast(LongType))
      .orderBy("q_id")
  }

  val pqRecallOracle: String = {
    val rdot = "CAST(list_sum(list_transform(range(1, 65), i -> c.rv[i] * qq.qv[i])) AS BIGINT)"
    val fdot = "CAST(list_sum(list_transform(range(1, 65), i -> c.qv[i] * qq.qv[i])) AS BIGINT)"
    val fn2 = (a: String) => s"CAST(list_sum(list_transform(range(1, 65), i -> $a.qv[i] * $a.qv[i])) AS BIGINT)"
    s"""WITH $quantCte,
       |$pqCte,
       |rv AS (SELECT a.id, flatten(list(c.cent ORDER BY c.sub)) AS rv
       |  FROM paf a JOIN pc2 c ON c.sub = a.sub AND c.cluster = a.cluster
       |  GROUP BY a.id),
       |rn AS (SELECT id, rv,
       |  CAST(list_sum(list_transform(range(1, 65), i -> rv[i] * rv[i])) AS BIGINT) AS rn2
       |  FROM rv),
       |full5 AS (SELECT q_id, c_id FROM (
       |  SELECT qq.id AS q_id, c.id AS c_id,
       |    row_number() OVER (PARTITION BY qq.id
       |      ORDER BY ${duckCos(fdot, fn2("c"), fn2("qq"))} DESC, c.id) AS rank
       |  FROM q c JOIN q qq ON qq.id < 10 AND c.id <> qq.id)
       |  WHERE rank <= 5),
       |adc5 AS (SELECT q_id, c_id FROM (
       |  SELECT qq.id AS q_id, c.id AS c_id,
       |    row_number() OVER (PARTITION BY qq.id
       |      ORDER BY ${duckCos(rdot, "c.rn2", fn2("qq"))} DESC, c.id) AS rank
       |  FROM rn c JOIN q qq ON qq.id < 10 AND c.id <> qq.id)
       |  WHERE rank <= 5),
       |qi AS (SELECT DISTINCT id AS q_id FROM q WHERE id < 10),
       |o AS (SELECT t.q_id, count(*) AS n FROM adc5 t JOIN full5 f
       |  ON f.q_id = t.q_id AND f.c_id = t.c_id GROUP BY t.q_id)
       |SELECT qi.q_id, CAST(coalesce(o.n, 0) AS BIGINT) AS n_overlap,
       |  CAST(coalesce(o.n, 0) * 200000 AS BIGINT) AS recall_ppm
       |FROM qi LEFT JOIN o ON o.q_id = qi.q_id ORDER BY qi.q_id""".stripMargin
  }

  /** IVF-PQ asymmetric-distance top-5 ([[Similarity.ivfAdcTopK]]): the
    * billion-scale index layout — coarse label-cluster probing for
    * candidates, PQ-reconstructed vectors for scoring. The oracle
    * composes the IVF probe CTEs (raw integer-sum centroids) with the
    * PQ training/reconstruction CTEs — every step exact integer, so
    * the ADC cosines hash-match.
    */
  def annIvfPq(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val qs = embSmall(spark, dir).filter(col("vec_id") >= 10 && col("vec_id") < 20)
    val model = graft.operators.ProductQuantize
      .train(e, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    Similarity.ivfAdcTopK(e, qs, "vec_id", "embedding", "label", model,
        k = 5, nProbe = 2)
      .orderBy("q_id", "rank")
  }

  val annIvfPqOracle: String = {
    val rdot = "CAST(list_sum(list_transform(range(1, 65), i -> c.rv[i] * p.qq[i])) AS BIGINT)"
    s"""WITH $quantCte,
       |$pqCte,
       |rv0 AS (SELECT a.id, flatten(list(c.cent ORDER BY c.sub)) AS rv
       |  FROM paf a JOIN pc2 c ON c.sub = a.sub AND c.cluster = a.cluster
       |  GROUP BY a.id),
       |rvn AS (SELECT r.id, r.rv, n.cluster,
       |  CAST(list_sum(list_transform(range(1, 65), i -> r.rv[i] * r.rv[i])) AS BIGINT) AS rn2
       |  FROM rv0 r JOIN n ON n.id = r.id),
       |comp AS (SELECT cluster, i.i AS pos, sum(qv[i.i]) AS s
       |  FROM q CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
       |  GROUP BY cluster, i.i),
       |cent AS (SELECT cluster, array_agg(CAST(s AS BIGINT) ORDER BY pos) AS cv FROM comp GROUP BY cluster),
       |centn AS (SELECT cluster, cv,
       |  CAST(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])) AS BIGINT) AS cn2 FROM cent),
       |qry AS (SELECT id AS q_id, qv AS qq, n2 AS qn2 FROM n WHERE id >= 10 AND id < 20),
       |probe AS (SELECT q_id, qq, qn2, cluster,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      ${duckCos(duckDot("qq", "cv"), "qn2", "cn2")} DESC, cluster) AS pr
       |  FROM qry CROSS JOIN centn),
       |probed AS (SELECT q_id, qq, qn2, cluster FROM probe WHERE pr <= 2),
       |scored AS (SELECT p.q_id, c.id AS c_id,
       |    ${duckCos(rdot, "c.rn2", "p.qn2")} AS cosine
       |  FROM rvn c JOIN probed p ON c.cluster = p.cluster AND c.id <> p.q_id),
       |ranked AS (SELECT q_id, c_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS BIGINT) AS rank
       |  FROM scored)
       |SELECT q_id, rank, c_id AS neighbor_id, cosine
       |FROM ranked WHERE rank <= 5 ORDER BY q_id, rank""".stripMargin
  }

  /** Measured IVF-PQ recall@5 against brute-force ground truth — the
    * missing member of the recall-metrology family (x_ann_recall pins
    * the IVF half, x_pq_recall the PQ half; this pins the COMPOSED ADC
    * path): the ivfAdcTopK answer joined against the exact top-5 per
    * query, recall in exact ppm. The number that says whether nProbe or
    * m/k needs raising before the billion-scale index layout ships.
    */
  def ivfPqRecall(spark: SparkSession, dir: String): DataFrame = {
    val e = emb(spark, dir)
    val qs = embSmall(spark, dir).filter(col("vec_id") >= 10 && col("vec_id") < 20)
    val exact = Similarity.bruteForceTopK(e, qs, "vec_id", "embedding", k = 5)
      .select(col("q_id"), col("neighbor_id"))
    val model = graft.operators.ProductQuantize
      .train(e, "vec_id", "embedding", m = 8, k = 16, iters = 2)
    val adc = Similarity.ivfAdcTopK(e, qs, "vec_id", "embedding", "label", model,
        k = 5, nProbe = 2)
      .select(col("q_id"), col("neighbor_id"))
    val common = exact.join(adc, Seq("q_id", "neighbor_id"))
      .groupBy("q_id").agg(count(lit(1)).cast(LongType).as("n_common"))
    qs.select(col("vec_id").cast(LongType).as("q_id"))
      .join(common, Seq("q_id"), "left")
      .select(col("q_id"), coalesce(col("n_common"), lit(0L)).as("n_common"))
      .withColumn("recall_ppm", expr("(1000000 * n_common) div 5"))
      .orderBy("q_id")
  }

  val ivfPqRecallOracle: String = {
    val rdot = "CAST(list_sum(list_transform(range(1, 65), i -> c.rv[i] * p.qq[i])) AS BIGINT)"
    s"""WITH $quantCte,
       |ex_scored AS (SELECT qq.id AS q_id, c.id AS c_id,
       |    ${duckCos(duckDot("c.qv", "qq.qv"), "c.n2", "qq.n2")} AS cosine
       |  FROM n c JOIN n qq ON qq.id >= 10 AND qq.id < 20 AND c.id <> qq.id),
       |ex AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
       |  FROM ex_scored) WHERE rank <= 5),
       |$pqCte,
       |rv0 AS (SELECT a.id, flatten(list(c.cent ORDER BY c.sub)) AS rv
       |  FROM paf a JOIN pc2 c ON c.sub = a.sub AND c.cluster = a.cluster
       |  GROUP BY a.id),
       |rvn AS (SELECT r.id, r.rv, n.cluster,
       |  CAST(list_sum(list_transform(range(1, 65), i -> r.rv[i] * r.rv[i])) AS BIGINT) AS rn2
       |  FROM rv0 r JOIN n ON n.id = r.id),
       |comp AS (SELECT cluster, i.i AS pos, sum(qv[i.i]) AS s
       |  FROM q CROSS JOIN (SELECT unnest(range(1, 65)) AS i) i
       |  GROUP BY cluster, i.i),
       |cent AS (SELECT cluster, array_agg(CAST(s AS BIGINT) ORDER BY pos) AS cv FROM comp GROUP BY cluster),
       |centn AS (SELECT cluster, cv,
       |  CAST(list_sum(list_transform(range(1, 65), i -> cv[i] * cv[i])) AS BIGINT) AS cn2 FROM cent),
       |qry AS (SELECT id AS q_id, qv AS qq, n2 AS qn2 FROM n WHERE id >= 10 AND id < 20),
       |probe AS (SELECT q_id, qq, qn2, cluster,
       |    row_number() OVER (PARTITION BY q_id ORDER BY
       |      ${duckCos(duckDot("qq", "cv"), "qn2", "cn2")} DESC, cluster) AS pr
       |  FROM qry CROSS JOIN centn),
       |probed AS (SELECT q_id, qq, qn2, cluster FROM probe WHERE pr <= 2),
       |adc_scored AS (SELECT p.q_id, c.id AS c_id,
       |    ${duckCos(rdot, "c.rn2", "p.qn2")} AS cosine
       |  FROM rvn c JOIN probed p ON c.cluster = p.cluster AND c.id <> p.q_id),
       |adc AS (SELECT q_id, c_id FROM (SELECT q_id, c_id,
       |    row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, c_id) AS rank
       |  FROM adc_scored) WHERE rank <= 5),
       |common AS (SELECT ex.q_id, CAST(count(*) AS BIGINT) AS n_common
       |  FROM ex JOIN adc ON adc.q_id = ex.q_id AND adc.c_id = ex.c_id
       |  GROUP BY ex.q_id),
       |qlist AS (SELECT id AS q_id FROM n WHERE id >= 10 AND id < 20)
       |SELECT qlist.q_id AS q_id, coalesce(n_common, 0) AS n_common,
       |  coalesce(n_common, 0) * 1000000 // 5 AS recall_ppm
       |FROM qlist LEFT JOIN common ON common.q_id = qlist.q_id
       |ORDER BY q_id""".stripMargin
  }

  // ---- cluster topic labeling (c-TF-IDF) ---------------------------

  /** Topic labels for the trained k-means clusters — BERTopic-style
    * c-TF-IDF (Grootendorst 2022): each cluster's documents form one
    * pseudo-document; a term's weight is its cluster tf scaled by
    * inverse cluster frequency `tf · (k·1e6 div n_clusters_with_term)`,
    * integer-exact; top-3 terms label the cluster. The readout a
    * data-mixing pipeline uses to see WHAT each embedding cluster
    * contains before assigning sampling weights. vec_id↔doc_id is the
    * corpus's planted 1:1 linkage ("embedding of document i"). Term
    * tables are vocabulary-bounded, so both aggregations and the join
    * are small keyed shuffles; the top-3 rank rides
    * [[graft.operators.Scale.topKPerGroup]] — the bounded-heap
    * two-phase top-k, so even a term table that outgrows "vocabulary-
    * bounded" (per-cluster n-gram explosions) never serializes a
    * cluster's whole term list onto one window task.
    */
  def clusterTopics(spark: SparkSession, dir: String): DataFrame = {
    val assigned = Similarity
      .kmeansAssign(emb(spark, dir), "vec_id", "embedding", k = 8, iters = 2)
    val docs = DedupQueries.docs(spark, dir)
      .select(col("doc_id").cast(LongType).as("vec_id"), col("text"))
    val tf = docs.join(assigned, Seq("vec_id"))
      .select(col("cluster"),
        explode(graft.operators.Fts.tokens(Seq(col("text")))).as("term"))
      .groupBy("cluster", "term").agg(count(lit(1)).as("tf"))
    val cdf = tf.groupBy("term")
      .agg(count(lit(1)).cast(LongType).as("n_clusters"))
    val scored = tf.join(cdf, Seq("term"))
      .select(col("cluster"), col("term"),
        (col("tf") * expr("(8 * 1000000) div n_clusters")).as("weight"))
    graft.operators.Scale.topKPerGroup(scored, "cluster", "weight", "term", k = 3)
      .select(col("cluster").cast(LongType).as("cluster"), col("rank"),
        col("term"), col("weight").cast(LongType).as("weight"))
      .orderBy("cluster", "rank")
  }

  val clusterTopicsOracle: String = {
    val marker = "SELECT CAST(id AS BIGINT) AS vec_id"
    val kmeansPart =
      kmeansClustersOracle.substring(0, kmeansClustersOracle.indexOf(marker)).trim
    val t = DuckSql.tokens("d.text")
    s"""$kmeansPart,
       |dt AS (SELECT a.cluster, unnest($t) AS term
       |  FROM afinal a JOIN documents d ON CAST(d.doc_id AS BIGINT) = a.id),
       |tf AS (SELECT cluster, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM dt GROUP BY cluster, term),
       |cdf AS (SELECT term, CAST(count(*) AS BIGINT) AS n_clusters
       |  FROM tf GROUP BY term),
       |sc AS (SELECT cluster, term, tf * ((8 * 1000000) // n_clusters) AS weight
       |  FROM tf JOIN cdf USING (term)),
       |r AS (SELECT cluster, term, weight,
       |    row_number() OVER (PARTITION BY cluster ORDER BY weight DESC, term) AS rank
       |  FROM sc)
       |SELECT CAST(cluster AS BIGINT) AS cluster, CAST(rank AS BIGINT) AS rank,
       |  term, CAST(weight AS BIGINT) AS weight
       |FROM r WHERE rank <= 3 ORDER BY cluster, rank""".stripMargin
  }
}

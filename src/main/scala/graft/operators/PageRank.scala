package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Iterative link analysis (extension; SURVEY §2.10) — PageRank over a
  * document reference graph, the standard importance prior a curation
  * pipeline mixes into quality scores when documents cite each other
  * (web crawls, wikis, citation corpora). Brin & Page 1998; computed
  * Pregel-style as K rounds of (join ranks to edges → shuffle
  * contributions by destination → aggregate), the same
  * bounded-iteration DataFrame loop as [[TextDedup.dedupClusters]].
  *
  * EXACT INTEGER arithmetic end to end: ranks live in parts-per-billion
  * (Long), every division is integer `div`, so the fixed-point state
  * after K rounds is bit-identical across engines and cluster sizes —
  * no floating-point drift, which is what makes the DuckDB oracle
  * replay (K unrolled CTEs) hash-exact. The price is ~1e-9 relative
  * quantization per round — noise against PageRank's own convergence
  * tolerance.
  *
  * 100 TB shape: state is one (id, rank) row per vertex; each round is
  * one equi-join (edges × ranks on src) plus one map-side-combined sum
  * keyed by dst — the canonical Pregel round as two shuffles. Lineage
  * is truncated with a lazy localCheckpoint per round (the
  * [[Bpe]]/[[TextDedup.dedupClusters]] idiom), so round K's plan does
  * not re-run rounds 1..K-1.
  */
object PageRank {

  /** K rounds of integer PageRank. `edges` must be (src, dst) with one
    * row per directed edge; `vertices` one row per vertex id. Dangling
    * mass (edges pointing outside `vertices`, or vertices with no
    * out-edges) is dropped, not redistributed — deterministic, and the
    * oracle does the same.
    *
    * rank_0 = SCALE div n; rank_{k+1}(v) =
    *   (tele · base) div 100 + (damp · Σ_{u→v} rank_k(u) div outdeg(u)) div 100
    * with damp + tele = 100 (integer percents).
    */
  val Scale = 1000000000L

  def iterate(
      vertices: DataFrame, edges: DataFrame, iters: Int,
      dampPct: Int = 85): DataFrame = {
    require(iters >= 1 && iters <= 50, "iters in [1, 50]")
    require(dampPct >= 0 && dampPct <= 100, "dampPct in [0, 100]")
    val telePct = 100 - dampPct
    val v = vertices.select(col("id").cast(LongType).as("id"))
    val e = edges.select(col("src").cast(LongType).as("src"),
      col("dst").cast(LongType).as("dst"))
    // out-degrees are part of the loop-invariant edge state: compute
    // once, attach to every edge, materialize (feeds every round)
    val outDeg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val eo = e.join(outDeg, "src").localCheckpoint(true)
    val n = v.count()
    require(n > 0, "empty vertex set")
    val base = Scale / n
    val tele = telePct * base / 100
    var ranks = v.withColumn("r", lit(base)).localCheckpoint(true)
    var k = 0
    while (k < iters) {
      val contrib = eo.join(ranks, eo("src") === ranks("id"))
        .select(col("dst"), expr("r div outdeg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("s"))
      ranks = v.join(contrib, v("id") === contrib("dst"), "left")
        .select(v("id"),
          (lit(tele) + expr(s"($dampPct * coalesce(s, 0L)) div 100"))
            .cast(LongType).as("r"))
        .localCheckpoint(false) // lazy: next round's join materializes it
      k += 1
    }
    ranks.select(col("id"), col("r").as("rank_ppb"))
  }

  /** DuckDB oracle twin: K unrolled rank CTEs over CTEs `v(id)` and
    * `e(src, dst)`; ends in `rank_final(id, rank_ppb)`. `nExpr` is a
    * scalar SQL expression for the vertex count.
    */
  def iterateSql(nExpr: String, iters: Int, dampPct: Int = 85): String = {
    val telePct = 100 - dampPct
    val base = s"($Scale // ($nExpr))"
    val tele = s"(($telePct * $base) // 100)"
    val rounds = (1 to iters).map { k =>
      s"""s$k AS (SELECT dst AS id, sum(r // outdeg) AS s
         |  FROM eo JOIN r${k - 1} ON r${k - 1}.id = eo.src GROUP BY dst),
         |r$k AS (SELECT v.id,
         |    CAST($tele + ($dampPct * coalesce(s, 0)) // 100 AS BIGINT) AS r
         |  FROM v LEFT JOIN s$k ON s$k.id = v.id)""".stripMargin
    }.mkString(",\n")
    s"""od AS (SELECT src, count(*) AS outdeg FROM e GROUP BY src),
       |eo AS (SELECT e.src, e.dst, od.outdeg FROM e JOIN od ON od.src = e.src),
       |r0 AS (SELECT id, CAST($base AS BIGINT) AS r FROM v),
       |$rounds,
       |rank_final AS (SELECT id, r AS rank_ppb FROM r$iters)""".stripMargin
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.CountMin

/** Count-Min sketch: the CMS guarantees (never undercounts; overcount
  * bounded), bit-equality of the mergeable Aggregator with the
  * DataFrame build, and partitioning invariance — the properties that
  * make the sketch usable as a 100 TB frequency oracle.
  */
class CountMinSpec extends SparkSpec {
  import spark.implicits._

  private val depth = 4
  private val width = 64 // small width → guaranteed collisions

  private def termsDf = (1 to 2000).map(i => s"term_${i % 300}").toDF("term")

  private def counts = termsDf.groupBy("term")
    .agg(count(lit(1)).cast("long").as("n"))

  test("CMS never undercounts, and depth=4 min beats any single row") {
    val sk = CountMin.sketch(counts, "term", "n", depth, width)
    val probes = counts.select(col("term"), col("n").as("true_count"))
    val est = CountMin.estimate(sk, probes, "term", depth, width)
      .select("term", "true_count", "cms_estimate")
      .as[(String, Long, Long)].collect()
    assert(est.length === 300)
    // 300 terms into 64 buckets: collisions certain in every row, so at
    // least one probe must overcount — and none may EVER undercount
    assert(est.forall { case (_, t, e) => e >= t })
    assert(est.exists { case (_, t, e) => e > t })
  }

  test("Aggregator cells are bit-identical to the DataFrame sketch, any partitioning") {
    val viaDf = CountMin.sketch(counts, "term", "n", depth, width)
      .select("row", "bucket", "cell_count")
      .as[(Long, Long, Long)].collect()
      .map { case (r, b, c) => (r * width + b) -> c }.toMap
    val flat = (0 until depth * width).map(i => viaDf.getOrElse(i.toLong, 0L))
    for (parts <- Seq(1, 13)) {
      val viaAgg = termsDf.repartition(parts)
        .agg(CountMin.sketchAgg(col("term"), depth, width).as("cells"))
        .select("cells").as[Seq[Long]].head()
      assert(viaAgg === flat, s"parts=$parts")
    }
  }

  test("estimateFromCells agrees with the DataFrame estimate path") {
    val sk = CountMin.sketch(counts, "term", "n", depth, width)
    val viaDf = CountMin.estimate(sk,
        counts.select(col("term"), col("n").as("true_count")), "term", depth, width)
      .select("term", "cms_estimate").as[(String, Long)].collect().toMap
    val cells = termsDf
      .agg(CountMin.sketchAgg(col("term"), depth, width).as("cells"))
      .select("cells").as[Seq[Long]].head()
    for ((term, est) <- viaDf)
      assert(CountMin.estimateFromCells(cells, term, depth, width) === est, term)
  }

  test("groupCols: per-group sketches match independently-built sketches") {
    val df = ((1 to 900).map(i => ("en", s"w${i % 90}")) ++
      (1 to 600).map(i => ("fr", s"w${i % 40}"))).toDF("lang", "term")
    val grouped = df.groupBy("lang", "term").agg(count(lit(1)).cast("long").as("n"))
    val sk = CountMin.sketch(grouped, "term", "n", depth, width, groupCols = Seq("lang"))
    val probes = grouped.select(col("lang"), col("term"), col("n").as("true_count"))
    val est = CountMin.estimate(sk, probes, "term", depth, width, groupCols = Seq("lang"))
      .select("lang", "term", "true_count", "cms_estimate")
      .as[(String, String, Long, Long)].collect()
    // the per-group estimate must equal the estimate from a sketch built
    // over ONLY that group's rows (no cross-language counter bleed)
    for (lang <- Seq("en", "fr")) {
      val solo = grouped.filter(col("lang") === lang)
      val soloSk = CountMin.sketch(solo, "term", "n", depth, width)
      val soloEst = CountMin.estimate(soloSk,
          solo.select(col("term"), col("n").as("true_count")), "term", depth, width)
        .select("term", "cms_estimate").as[(String, Long)].collect().toMap
      est.filter(_._1 == lang).foreach { case (_, t, n, e) =>
        assert(e === soloEst(t), s"$lang/$t")
        assert(e >= n)
      }
    }
  }

  test("merge of disjoint-batch sketches equals the single-pass sketch (100 TB combine path)") {
    val (a, b) = ((1 to 1000).map(i => s"term_${i % 300}"),
      (1001 to 2000).map(i => s"term_${i % 300}"))
    val skA = a.toDF("term").agg(CountMin.sketchAgg(col("term"), depth, width))
      .as[Seq[Long]].head()
    val skB = b.toDF("term").agg(CountMin.sketchAgg(col("term"), depth, width))
      .as[Seq[Long]].head()
    val whole = termsDf.agg(CountMin.sketchAgg(col("term"), depth, width))
      .as[Seq[Long]].head()
    assert(skA.zip(skB).map { case (x, y) => x + y } === whole)
  }
}

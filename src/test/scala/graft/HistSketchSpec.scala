package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.HistSketch

/** The bounded-domain histogram quantile sketch: exactness against a
  * brute-force sort, merge-order independence, clamping, and the
  * batch ≡ stream contract the rest of the sketch family carries.
  */
class HistSketchSpec extends SparkSpec {
  import spark.implicits._

  private val probs = Seq(0.5, 0.9, 0.99)

  /** Brute-force discrete quantile: element at max(0, ceil(n*p)-1). */
  private def bruteQ(vals: Seq[Long], domain: Int, p: Double): Long = {
    val clamped = vals.map(v => math.min(math.max(v, 0L), (domain - 1).toLong)).sorted
    clamped(math.max(0L, math.ceil(clamped.length * p).toLong - 1L).toInt)
  }

  test("exactness vs brute force: randomized groups, clamping both tails") {
    for (seed <- Seq(3L, 11L, 20260814L)) {
      val rnd = new scala.util.Random(seed)
      val rows = (1 to 2000).map { _ =>
        val g = "g" + rnd.nextInt(5)
        // heavy tails on purpose: negatives clamp to 0, big values to domain-1
        val v = rnd.nextInt(4) match {
          case 0 => -rnd.nextInt(10).toLong
          case 1 => 5000L + rnd.nextInt(1000)
          case _ => rnd.nextInt(300).toLong
        }
        (g, v)
      }
      val df = rows.toDF("g", "v")
      val out = HistSketch.groupedQuantiles(df, "g", "v", domain = 4096, probs = probs)
        .orderBy("g").collect()
      val byG = rows.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
      for (r <- out) {
        val g = r.getString(0)
        assert(r.getLong(1) === byG(g).length.toLong)
        assert(r.getLong(2) === bruteQ(byG(g), 4096, 0.5), s"$g median, seed $seed")
        assert(r.getLong(3) === bruteQ(byG(g), 4096, 0.9), s"$g p90, seed $seed")
        assert(r.getLong(4) === bruteQ(byG(g), 4096, 0.99), s"$g p99, seed $seed")
      }
    }
  }

  test("merge-order independence: any partial grouping gives the same summary") {
    val agg = new HistSketch.HistAgg(256, probs)
    val rnd = new scala.util.Random(7L)
    val vals = Seq.fill(500)(rnd.nextInt(400).toLong) // some clamp to 255
    def fold(vs: Seq[Long]) = vs.foldLeft(agg.zero)((s, v) => agg.reduce(s, v))
    val whole = agg.finish(fold(vals))
    // 3 partials merged left-to-right vs right-to-left vs interleaved
    val parts = vals.grouped(170).map(fold).toSeq
    val l2r = agg.finish(parts.reduce(agg.merge))
    val r2l = agg.finish(parts.reverse.reduce(agg.merge))
    val tree = agg.finish(agg.merge(agg.merge(parts(0), parts(2)), parts(1)))
    assert(l2r === whole && r2l === whole && tree === whole)
  }

  test("degenerate shapes: single value, all-equal, empty state") {
    val agg = new HistSketch.HistAgg(64, probs)
    // empty (or all-NULL) group: quantiles are NULL, exactly as SQL's
    // quantile_disc over zero non-NULL values — never a silent 0
    assert(agg.finish(agg.zero) === HistSketch.HistSummary(0L, Seq(None, None, None)))
    val one = agg.finish(agg.reduce(agg.zero, 7L))
    assert(one === HistSketch.HistSummary(1L, Seq(Some(7L), Some(7L), Some(7L))))
    val same = agg.finish((1 to 100).foldLeft(agg.zero)((s, _) => agg.reduce(s, 9L)))
    assert(same === HistSketch.HistSummary(100L, Seq(Some(9L), Some(9L), Some(9L))))
  }

  test("null values are ignored, as in any SQL aggregate") {
    val df = Seq(("a", Some(5L)), ("a", None), ("a", Some(7L)), ("a", None),
      ("b", None), ("b", None)).toDF("g", "v")
    val out = HistSketch.groupedQuantiles(df, "g", "v", 64, Seq(0.5))
      .orderBy("g").collect()
    // n counts non-null rows only; median of {5, 7} is 5 (not of {0,0,5,7})
    assert(out(0).getLong(1) === 2L)
    assert(out(0).getLong(2) === 5L)
    // an ALL-null group yields n=0 and a NULL quantile (quantile_disc
    // over no values), not a fabricated 0
    assert(out(1).getLong(1) === 0L)
    assert(out(1).isNullAt(2))
  }

  test("qName: probability to column suffix") {
    assert(HistSketch.qName(0.5) === "q_5")
    assert(HistSketch.qName(0.9) === "q_9")
    assert(HistSketch.qName(0.99) === "q_99")
    assert(HistSketch.qName(0.999) === "q_999")
  }

  test("streaming histogram sketch (complete mode) equals the batch sketch") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sfDir, "documents").select(col("source"), col("text"))
    val dir = Files.createTempDirectory("graft-hist-stream").toString
    docs.write.mode("overwrite").parquet(dir)
    val wsOf = (df: org.apache.spark.sql.DataFrame) => df.select(col("source"),
      graft.operators.TextStats.wsTokenCount(col("text")).as("ws"))
    val q = wsOf(spark.readStream.schema(docs.schema).parquet(dir))
      .groupBy("source")
      .agg(HistSketch.quantileAgg(col("ws"), 4096, probs).as("h"))
      .select(col("source"), col("h.n").as("n"),
        col("h.qs").getItem(0).as("q_5"),
        col("h.qs").getItem(1).as("q_9"),
        col("h.qs").getItem(2).as("q_99"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("hist_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hist_out").orderBy("source").collect().toSeq
      val batch = HistSketch.groupedQuantiles(wsOf(docs), "source", "ws", 4096, probs)
        .orderBy("source").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }
}

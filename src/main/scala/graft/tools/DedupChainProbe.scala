package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.TextDedup

/** Dev-only: stage-by-stage timing of the minhash→CC chain that ~10
  * graded queries rebuild per run — targets the r18 optimization at
  * facts (which stage owns the 2-6s a CC-family query costs at sf0.1).
  */
object DedupChainProbe {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[chain] $label%-34s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // codegen warm-up: the full query once
    graft.queries.DedupQueries.dedupClusters(spark, dir).count()

    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      val corpus = graft.queries.DedupQueries.corpusNear(spark, dir)
      t("corpusNear scan")(corpus.count())
      val sets = corpus.select(col("doc_id").cast(LongType).as("id"),
        TextDedup.shingleHashes(col("text"), 3).as("sset"))
      t("sets checkpoint")({ val c = sets.localCheckpoint(true); c.count() })
      val setsCp = sets.localCheckpoint(true)
      t("collapse decision agg")({
        // the operator's own canon spelling (shared helper — r18 ADVICE:
        // an inlined copy here silently drifts if the operator changes)
        val canon = TextDedup.collapseCanon(setsCp)
        canon.agg(count(lit(1)), count_distinct(col("__h1"), col("__h2"))).head()
        1L
      })
      val withSig = setsCp.select(col("id"), array_sort(col("sset")).as("sset"))
        .withColumn("sig", TextDedup.minhashSignatureFromHashes(col("sset"), 16))
      t("signatures")(withSig.count())
      val bands = withSig.select(col("id"),
        explode(TextDedup.lshBands(col("sig"), 16, 2)).as("b"))
        .select(col("id"), col("b.band").as("band"), col("b.sig").as("bsig"))
      t("bands")(bands.count())
      t("bucketedPairs+dedup")(TextDedup.bucketedPairs(bands, Seq("band", "bsig"), 256)
        .dropDuplicates("id_a", "id_b").count())
      val pairs = TextDedup.minhashPairsFromSets(setsCp, 16, 2, 0.5)
      t("minhashPairs full")(pairs.count())
      val pairs2 = TextDedup.minhashPairsFromSets(setsCp, 16, 2, 0.5)
      t("dedupClusters on pairs")(
        TextDedup.dedupClusters(corpus, "doc_id", pairs2).count())
      t("query end-to-end")(
        graft.queries.DedupQueries.dedupClusters(spark, dir).count())
    }
    spark.stop()
  }
}

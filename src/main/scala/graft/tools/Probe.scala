package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.operators.{Fts, Similarity}

/** Dev-only micro-profiler: times labeled plan fragments of the slowest
  * bench queries so optimization targets facts, not guesses.
  * Run: sbt 'runMain graft.tools.Probe /root/testdata/sf0.1'
  */
object Probe {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[probe] $label%-40s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    Tables.load(spark, dir, "lineitem").count() // warmup

    // ---- annIvf decomposition
    val e = Tables.loadSpread(spark, dir, "embeddings")
    t("emb scan+spread")(e.count())
    val c = e.select(col("vec_id").cast(LongType).as("c_id"),
      col("label").cast(LongType).as("cluster"),
      Similarity.quantize(col("embedding")).as("c_q"))
      .withColumn("c_n2", Similarity.inorm2(col("c_q")))
    t("quantize+norm")(c.count())
    t("dim head")({ c.select(size(col("c_q"))).head().getInt(0); 1L })
    val dim = 64
    val sums = (0 until dim).map(i =>
      sum(element_at(col("c_q"), i + 1)).cast(LongType).as(s"s$i"))
    t("centroid 64-sum agg")(c.groupBy(col("cluster")).agg(sums.head, sums.tail: _*).count())
    t("ann_ivf full")(graft.queries.SimilarityQueries.annIvf(spark, dir).count())
    t("ann_ivf again")(graft.queries.SimilarityQueries.annIvf(spark, dir).count())
    t("ann_ivf_trained full")(graft.queries.SimilarityQueries.annIvfTrained(spark, dir).count())
    t("kmeans full")(graft.queries.SimilarityQueries.kmeansClusters(spark, dir).count())
    t("embed_neardups full")(graft.queries.SimilarityQueries.embedNearDups(spark, dir).count())

    // ---- other slow queries
    t("minhash_pairs full")(graft.queries.DedupQueries.minhashPairs(spark, dir).count())
    t("simhash_pairs full")(graft.queries.DedupQueries.simhashPairs(spark, dir).count())
    t("fts_term_stats full")(graft.queries.ParityQueries.ftsTermStats(spark, dir).count())
    t("fts_ranked full")(graft.queries.ParityQueries.ftsRanked(spark, dir).count())
    t("canon_float_dict full")(graft.queries.ParityQueries.canonFloatDict(spark, dir).count())
    spark.stop()
  }
}

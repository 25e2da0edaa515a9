package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.Fts

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

    val docs = Tables.load(spark, dir, "documents")
    t("docs scan")(docs.count())
    t("docs spread")(Tables.loadSpread(spark, dir, "documents").count())
    val spread = Tables.loadSpread(spark, dir, "documents")
    t("tokenize only")(spread.select(Fts.tokens(Seq(col("text"))).as("t")).count())
    t("tokenize+explode")(spread.select(explode(Fts.tokens(Seq(col("text")))).as("t")).count())
    t("inverted index")(Fts.invertedIndex(spread.withColumnRenamed("doc_id", "rowid"), Seq("text")).count())
    t("term stats full")(graft.queries.ParityQueries.ftsTermStats(spark, dir).count())
    t("dedup exact full")(graft.queries.DedupQueries.dedupExact(spark, dir).count())
    t("hash60 per doc")(spread.select(graft.functions.PortableHash.hash60(col("text"))).count())
    t("shingle hashes")(spread.select(graft.operators.TextDedup.shingleHashes(col("text")).as("h")).count())
    t("ann_ivf full")(graft.queries.SimilarityQueries.annIvf(spark, dir).count())
    t("ann_topk full")(graft.queries.SimilarityQueries.annTopK(spark, dir).count())
    t("minhash_pairs full")(graft.queries.DedupQueries.minhashPairs(spark, dir).count())
    t("term stats again")(graft.queries.ParityQueries.ftsTermStats(spark, dir).count())
    spark.stop()
  }
}

package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only stage profiler (not part of the driver contract). */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.load(spark, sfDir, "lineitem").count() // session warmup

    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[profile] $name%-40s ${(System.nanoTime() - t0) / 1e9}%.3f s  ($n rows)")
    }

    import org.apache.spark.sql.types.LongType
    // s12 decomposition
    t("load documents")(Tables.load(spark, sfDir, "documents").count())
    t("loadSpread documents")(Tables.loadSpread(spark, sfDir, "documents").count())
    val docs = Tables.loadSpread(spark, sfDir, "documents")
    t("tokens explode")(docs.select(explode(operators.Fts.tokens(Seq(col("text")))).as("t")).count())
    t("invertedIndex")(operators.Fts.invertedIndex(
      docs.withColumnRenamed("doc_id", "rowid"), Seq("text")).count())
    t("invertedIndex+groupBy")(operators.Fts.invertedIndex(
      docs.withColumnRenamed("doc_id", "rowid"), Seq("text"))
      .groupBy(col("term")).agg(count(lit(1)).cast(LongType).as("df")).count())
    t("full s12 x2")(queries.ParityQueries.ftsTermStats(spark, sfDir).count()
      + queries.ParityQueries.ftsTermStats(spark, sfDir).count())
    t("full s12 again")(queries.ParityQueries.ftsTermStats(spark, sfDir).count())

    // dedup clusters decomposition
    val corpus = {
      import spark.implicits._
      val d = Tables.loadSpread(spark, sfDir, "documents")
        .select(col("doc_id").cast("long"), col("text"))
      d.unionAll(d.filter(col("doc_id") % 10 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
    }
    t("minhashPairs")(operators.TextDedup.minhashPairs(
      queriesCorpus(spark, sfDir), "doc_id", "text", 16, 2, 3, 0.5).count())
    t("dedupClusters full")(queries.DedupQueries.dedupClusters(spark, sfDir).count())
    spark.stop()
  }

  private def queriesCorpus(spark: SparkSession, dir: String) = {
    val d = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
    d.unionAll(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }
}

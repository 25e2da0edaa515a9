package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.{Similarity, TextDedup}

object SemProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.loadSpread(spark, dir, "embeddings")
    e.count()
    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[sem] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
    }
    // warm codegen
    Similarity.semDedup(e.limit(50), "vec_id", "embedding", "label", 0.3).count()
    t("pairs")(Similarity.nearDupPairs(e, "vec_id", "embedding", "label", 0.3).count())
    val pairs = Similarity.nearDupPairs(e, "vec_id", "embedding", "label", 0.3)
    t("clusters")(TextDedup.dedupClusters(e, "vec_id", pairs).count())
    t("semdedup-all")(Similarity.semDedup(e, "vec_id", "embedding", "label", 0.3).count())
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.operators.Similarity

/** Dev-only: isolate the quantize/norm checkpoint stage cost of the
  * similarity family (r18: ~9s CPU over ~2-3k vectors in JobProbe).
  */
object QuantProbe {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[q] $label%-36s ${(System.nanoTime() - t0) / 1e9}%7.2fs  rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    (1 to 3).foreach { rep =>
      println(s"--- rep $rep ---")
      val raw = spark.read.parquet(s"$dir/embeddings.parquet")
      t("raw scan")(raw.count())
      val e = Tables.loadSpread(spark, dir, "embeddings")
      t("loadSpread (repartition 32)")(e.count())
      t("quantize only")(e.select(Similarity.quantize(col("embedding")).as("q")).count())
      t("quantize noop-write")({
        e.select(col("vec_id").cast(LongType).as("id"),
          Similarity.quantize(col("embedding")).as("q"))
          .write.format("noop").mode("overwrite").save(); 0L })
      t("quantize+norm")({
        e.select(col("vec_id").cast(LongType).as("id"),
          col("label").cast(LongType).as("cluster"),
          Similarity.quantize(col("embedding")).as("q"))
          .withColumn("n2", Similarity.inorm2(col("q"))).count() })
      t("quantizedClusteredCorpus (cp)")({
        Similarity.quantizedClusteredCorpus(e, "vec_id", "embedding", "label").count() })
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables

/** Dev-only: decomposes the PQ encode cost at sf0.1 — is the
  * m·k literal-centroid assignment codegen'd or interpreted, and where
  * do the PQ queries' seconds go (train vs encode vs decode)?
  * Run: sbt 'runMain graft.tools.PqProbe /root/testdata/sf0.1'
  */
object PqProbe {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[pq] $label%-36s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // surface codegen bailouts loudly
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.INFO)
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.WholeStageCodegenExec",
      org.apache.logging.log4j.Level.INFO)
    val e = Tables.load(spark, dir, "embeddings")
    t("emb scan")(e.count())
    (1 to 2).foreach { rep =>
      println(s"--- rep $rep ---")
      import org.apache.spark.sql.types.LongType
      val q = e.select(col("vec_id").cast(LongType).as("id"),
        graft.expressions.QuantizeVec.quantize_vec(col("embedding")).as("q"))
      t("quantize only (noop)")({
        q.write.format("noop").mode("overwrite").save(); 0L })
      val sl = (0 until 8).foldLeft(
        q.select(col("id") +: (0 until 8).map(i =>
          slice(col("q"), i * 8 + 1, 8).as(s"sv$i")): _*))((d, i) =>
        d.withColumn(s"sn$i", graft.operators.Similarity.inorm2(col(s"sv$i"))))
      t("sliced (noop)")({
        sl.write.format("noop").mode("overwrite").save(); 0L })
      var model: org.apache.spark.sql.DataFrame = null
      t("train call (eager)")({ model = graft.operators.ProductQuantize
        .train(e, "vec_id", "embedding"); 1L })
      t("train (2 iters)")(model.count())
      t("encode")(graft.operators.ProductQuantize
        .encode(e, "vec_id", "embedding", model).count())
      t("decode")(graft.operators.ProductQuantize
        .decode(e, "vec_id", "embedding", model).count())
      t("x_pq_codes e2e")(
        graft.queries.SimilarityQueries.pqCodes(spark, dir).count())
      t("x_pq_recall e2e")(
        graft.queries.SimilarityQueries.pqRecall(spark, dir).count())
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.Tables
import graft.operators.Similarity

/** Dev-only: per-round timing of the dedupClusters star-contraction loop. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val shim = org.apache.spark.sql.graftshim.GraftShim
    val e = Tables.loadSpread(spark, dir, "embeddings")
    val pairs = Similarity.nearDupPairs(e, "vec_id", "embedding", "label", 0.3)
    var cur = shim.localCheckpointNoStats(
      pairs.select(greatest(col("id_a").cast("long"), col("id_b").cast("long")).as("u"),
          least(col("id_a").cast("long"), col("id_b").cast("long")).as("v"))
        .filter(col("u") =!= col("v")).dropDuplicates("u", "v"))
    def sig(d: org.apache.spark.sql.DataFrame) = {
      val r = d.agg(count(lit(1)), sum(xxhash64(col("u"), col("v"))
        .cast(org.apache.spark.sql.types.DecimalType(38, 0)))).head()
      (r.getLong(0), if (r.isNullAt(1)) java.math.BigDecimal.ZERO else r.getDecimal(1))
    }
    def largeStar(d: org.apache.spark.sql.DataFrame) = {
      val sym = d.unionAll(d.select(col("v").as("u"), col("u").as("v")))
      val m = sym.groupBy("u").agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("mv"), col("u")).as("m"))
      sym.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")).dropDuplicates("u", "v")
    }
    def smallStar(d: org.apache.spark.sql.DataFrame) = {
      val m = d.groupBy("u").agg(min(col("v")).as("m"))
      val folded = d.join(m, "u").filter(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
      folded.unionAll(m.select(col("u"), col("m").as("v"))).dropDuplicates("u", "v")
    }
    var iters = 0; var converged = false; var curSig = sig(cur)
    while (!converged && iters < 25) {
      val t0 = System.nanoTime()
      val next = shim.localCheckpointNoStats(smallStar(largeStar(cur)))
      val nextSig = sig(next)
      if (nextSig == curSig)
        converged = next.exceptAll(cur).unionAll(cur.exceptAll(next)).isEmpty
      cur = next; curSig = nextSig; iters += 1
      println(f"[cc] round $iters%2d  edges=${nextSig._1}%6d  ${(System.nanoTime() - t0) / 1e9}%5.2fs conv=$converged")
    }
    spark.stop()
  }
}

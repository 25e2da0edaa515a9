package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables
import graft.operators.TextDedup

/** Dev-only scratch probe: decomposes the minhash pipeline cost.
  * Run: sbt 'runMain graft.tools.Scratch /root/testdata/sf0.1'
  */
object Scratch {
  def t(label: String)(f: => Long): Unit = {
    val t0 = System.nanoTime()
    val n = f
    println(f"[scratch] $label%-36s ${(System.nanoTime() - t0) / 1e9}%6.2fs rows=$n")
  }
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1).count()
    val d = Tables.loadSpread(spark, dir, "documents")
      .select(col("doc_id").cast(LongType).as("id"), col("text"))
    t("scan+spread")(d.count())
    t("tokens")(d.select(TextDedup.tokensCol(col("text")).as("t")).count())
    t("shingles")(d.select(TextDedup.shingles(col("text"), 3).as("s")).count())
    t("shingleHashes (md5)")(d.select(TextDedup.shingleHashes(col("text"), 3).as("h")).count())
    val sets = d.select(col("id"), TextDedup.shingleHashes(col("text"), 3).as("sset"))
    t("sig from hashes")(sets.select(
      TextDedup.minhashSignatureFromHashes(col("sset"), 16).as("sig")).count())
    t("sig x2 (recompute)")(sets.select(
      TextDedup.minhashSignatureFromHashes(col("sset"), 16).as("sig")).count())
    t("full minhashPairs")(TextDedup.minhashPairs(d, "id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.5).count())
    t("clusters (warm pairs codegen)")(
      graft.queries.DedupQueries.dedupClusters(spark, dir).count())
    t("clusters again")(
      graft.queries.DedupQueries.dedupClusters(spark, dir).count())

    // stagewise decomposition of minhashPairs
    val sets2 = d.select(col("id"), TextDedup.shingleHashes(col("text"), 3).as("sset"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("persist sets")(sets2.count())
    val withSig = sets2.withColumn("sig",
      TextDedup.minhashSignatureFromHashes(col("sset"), 16))
    val bands = withSig.select(col("id"),
      explode(TextDedup.lshBands(col("sig"), 16, 2)).as("b"))
      .select(col("id"), col("b.band").as("band"), col("b.sig").as("bsig"))
    t("bands explode")(bands.count())
    val buckets = bands.groupBy(col("band"), col("bsig"))
      .agg(collect_list(col("id")).as("members"))
      .filter(size(col("members")) > 1)
    t("bucket agg")(buckets.count())
    val cand = buckets
      .select(explode(TextDedup.cappedBucketPairs(array_sort(col("members")), 256)).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .dropDuplicates("id_a", "id_b")
    t("cand dedup")(cand.count())
    val joined = cand
      .join(sets2.select(col("id").as("id_a"), col("sset").as("sh_a")), Seq("id_a"))
      .join(sets2.select(col("id").as("id_b"), col("sset").as("sh_b")), Seq("id_b"))
    t("verify joins")(joined.count())
    t("jaccard filter")(joined
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))).cast("double"))
      .withColumn("uni", (size(col("sh_a")) + size(col("sh_b"))).cast("double") - col("inter"))
      .withColumn("jaccard", round(col("inter") / col("uni"), 6))
      .filter(col("jaccard") >= 0.5).count())
    spark.stop()
  }
}

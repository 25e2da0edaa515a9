package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, TextStats}
import graft.sinks.CorpusSink

class CorpusSinkSpec extends SparkSpec {
  import spark.implicits._

  test("curated write: ORC format round-trips with the same hive layout") {
    val dir = Files.createTempDirectory("graft-corpus-orc").toString
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("lang"))
    CorpusSink.writeCurated(docs, dir, Seq("lang"), format = "orc")
    val back = spark.read.orc(dir)
    assert(back.count() === docs.count())
    assert(back.columns.toSet === Set("doc_id", "text", "lang"))
    // predicate pushdown reaches the ORC scan
    val p = back.filter(col("lang") === "en").queryExecution.executedPlan.toString
    assert(back.filter(col("lang") === "en").count() ===
      docs.filter(col("lang") === "en").count())
    assert(p.contains("PartitionFilters") || p.contains("lang"), p)
  }

  test("curated write: hive layout, bounded files per partition, round-trips") {
    val dir = Files.createTempDirectory("graft-corpus-sink").toString
    val docs = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"), col("lang"))
      .withColumn("split",
        Sampling.splitLabel(Sampling.hashBucket(col("text"), 1000), 90, 5))
    CorpusSink.writeCurated(docs, dir, Seq("split", "lang"),
      maxRecordsPerFile = 100L)

    // hive-style directory layout
    val splits = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(splits.forall(_.startsWith("split=")), splits.mkString(","))
    assert(splits.contains("split=train"))

    // file count stays bounded: repartition-on-partition-cols means each
    // (split, lang) leaf is written by few tasks, and maxRecordsPerFile
    // rolls anything larger — NOT tasks × partitions files
    val leafFiles = Files.walk(Paths.get(dir)).iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
    var perLeaf = Map.empty[String, Int]
    leafFiles.forEachRemaining { p =>
      if (p.toString.endsWith(".parquet") && !p.toString.contains("_SUCCESS")) {
        val leaf = p.getParent.toString.stripPrefix(dir)
        perLeaf = perLeaf.updated(leaf, perLeaf.getOrElse(leaf, 0) + 1)
      }
    }
    assert(perLeaf.nonEmpty)
    val total = docs.count()
    perLeaf.foreach { case (leaf, n) =>
      // ceil(rows/100) files + at most 1 task-boundary extra per leaf
      assert(n <= total / 100 + 2, s"$leaf has $n files")
    }

    // partition columns round-trip through the hive layout
    val back = spark.read.parquet(dir)
    assert(back.count() === total)
    val byKey = (df: org.apache.spark.sql.DataFrame) => df
      .select("doc_id", "split", "lang").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSet
    assert(byKey(back.withColumn("split", col("split").cast("string"))
      .withColumn("lang", col("lang").cast("string"))) === byKey(docs))
  }
}

package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.sources.Jsonl

class JsonlSpec extends SparkSpec {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType)))

  test("read: declared schema, bad lines captured instead of killing the job") {
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val f = new java.io.PrintWriter(s"$dir/part-0.jsonl")
    f.println("""{"doc_id": 1, "text": "hello world", "lang": "en"}""")
    f.println("""{"doc_id": 2, "text": "bonjour", "lang": "fr"}""")
    f.println("""{"doc_id": 3, "text": "truncated...""") // malformed
    f.println("""not json at all""")
    f.close()
    val df = Jsonl.read(spark, dir, docSchema)
    val good = Jsonl.goodRows(df).orderBy("doc_id")
      .as[(Long, String, String)].collect().toList
    assert(good === List((1L, "hello world", "en"), (2L, "bonjour", "fr")))
    val bad = Jsonl.corruptLines(df).as[String].collect().toSet
    assert(bad.size === 2)
    assert(bad.exists(_.startsWith("not json")))
  }

  test("round-trip: write then read preserves rows and types") {
    val dir = Files.createTempDirectory("graft-jsonl-rt").toString + "/out"
    val docs = Seq((10L, "alpha beta", "en"), (11L, "gamma", "de"))
      .toDF("doc_id", "text", "lang")
    Jsonl.write(docs, dir)
    val back = Jsonl.goodRows(Jsonl.read(spark, dir, docSchema))
      .orderBy("doc_id").as[(Long, String, String)].collect().toList
    assert(back === List((10L, "alpha beta", "en"), (11L, "gamma", "de")))
  }

  test("read parallelism: line-splittable scan yields multiple input partitions") {
    val dir = Files.createTempDirectory("graft-jsonl-par").toString + "/out"
    val docs = (1L to 5000L).map(i => (i, s"document number $i with some words", "en"))
      .toDF("doc_id", "text", "lang").repartition(8)
    Jsonl.write(docs, dir)
    val n = Jsonl.read(spark, dir, docSchema).rdd.getNumPartitions
    assert(n > 1, s"JSONL scan should split, got $n partition(s)")
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Sampling, TextDedup, TextStats}

/** End-to-end curation chain over real testdata: exact dedup → near-dup
  * clustering → keeper filter → split assignment → pack assignment.
  * What matters here is that the operators COMPOSE: keepers survive,
  * splits partition the surviving corpus, packs stay under budget.
  */
class CurationPipelineSpec extends SparkSpec {

  test("dedup -> keeper filter -> split -> pack composes with consistent invariants") {
    val dir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id").cast("long").as("doc_id"), col("text"))
    // plant exact dups so dedup has work to do
    val corpus = docs.unionAll(
      docs.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 5000L).as("doc_id"), col("text")))
    val total = corpus.count()

    // 1. exact dedup: one keeper per distinct text
    val keepers = TextDedup.exact(corpus, "doc_id", "text")
    val nKeep = keepers.count()
    assert(nKeep < total, "planted dups must collapse")
    assert(keepers.agg(sum("n_copies")).head.getLong(0) === total,
      "copy counts must account for every input row")

    // 2. survivors = corpus restricted to keeper ids
    val survivors = corpus.join(
      keepers.select(col("keep_id").as("doc_id")), Seq("doc_id"), "left_semi")
    assert(survivors.count() === nKeep)

    // 3. near-dup clustering over survivors: every survivor gets a label
    val pairs = TextDedup.minhashPairs(survivors, "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.9)
    val clusters = TextDedup.dedupClusters(survivors, "doc_id", pairs)
    assert(clusters.count() === nKeep, "every survivor labeled")
    assert(clusters.filter(col("cluster_id") > col("doc_id")).count() === 0,
      "cluster label is the component MIN id")

    // 4. split assignment partitions the survivors
    val split = survivors.withColumn("split",
      Sampling.splitLabel(Sampling.hashBucket(col("text"), 1000), 90, 5))
    val bySplit = split.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySplit.values.sum === nKeep, "splits are a partition")
    assert(bySplit.getOrElse("train", 0L) > nKeep / 2, s"train must dominate: $bySplit")

    // 5. pack assignment: cumulative token budget respected per bucket
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("bucket")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val packed = split.filter(col("split") === "train")
      .select(col("doc_id"),
        Sampling.hashBucket(col("text"), 50).as("bucket"),
        TextStats.bpeishTokenCount(col("text")).as("n_tokens"))
      .withColumn("cum", sum(col("n_tokens")).over(w))
      .withColumn("pack_no", expr("(cum - n_tokens) div 2048"))
    // a pack's preceding-docs total never exceeds the budget boundary:
    // (cum - n_tokens) of the FIRST doc in pack k is in [2048k, 2048(k+1))
    val bad = packed
      .withColumn("start_tok", col("cum") - col("n_tokens"))
      .filter(col("start_tok") < col("pack_no") * 2048 ||
        col("start_tok") >= (col("pack_no") + 1) * 2048)
      .count()
    assert(bad === 0L, "pack assignment must respect the 2048-token boundaries")
    // deterministic: same input, same packing
    val again = packed.select("doc_id", "pack_no").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val first = packed.select("doc_id", "pack_no").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(again === first)

    // 6. chunking the training survivors: every chunk traces to a
    // surviving doc, respects the window size, and tail chunks are the
    // only short ones
    val chunks = graft.operators.Chunk.chunkDocs(
      split.filter(col("split") === "train"), "doc_id", "text",
      chunkTokens = 64, stride = 48)
    val trainIds = split.filter(col("split") === "train")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(chunks.select("doc_id").distinct().collect()
      .map(_.getLong(0)).toSet === trainIds, "every train doc chunked, no strays")
    assert(chunks.filter(col("chunk_tokens") > 64).count() === 0)
    val shortNonTail = chunks
      .withColumn("max_no", max(col("chunk_no"))
        .over(Window.partitionBy(col("doc_id"))))
      .filter(col("chunk_tokens") < 64 && col("chunk_no") < col("max_no"))
      .count()
    assert(shortNonTail === 0L, "only the final chunk of a doc may be short")
  }
}

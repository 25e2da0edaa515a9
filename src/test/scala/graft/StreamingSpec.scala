package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.streaming.EventWindows

/** The streaming twin must produce the same windowed aggregates as the
  * batch form (same plan modulo watermark). Exercised with a file source
  * + memory sink driven synchronously (spark_guide.md pattern).
  */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling windows equal the batch result") {
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = Tables.load(spark, sfDir, "events")

    // file streaming source needs a directory of parquet with a fixed schema
    val dir = Files.createTempDirectory("graft-stream").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val streamEvents = spark.readStream
      .schema(batchEvents.schema)
      .parquet(dir)

    val q = EventWindows.tumblingStream(streamEvents, "1 hour", "2 hours")
      .writeStream
      .outputMode("complete")
      .format("memory")
      .queryName("tumbling_out")
      .start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("tumbling_out")
        .orderBy("window_start", "event_type").collect()
      val batch = EventWindows.tumbling(batchEvents, "1 hour")
        .select(col("window_start"), col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type").collect()
      assert(streamed.length === batch.length)
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("streaming FTS5-grammar match screen (unicode61 + full boolean grammar), batch-equal") {
    // the MATCH predicate family is one stateless codegen expression, so
    // it drops into readStream unchanged: an at-ingest relevance screen.
    // The query exercises the round-12 unicode61 path (accented/Cyrillic
    // operands over RAW multilingual text) plus phrases/NOT.
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("text", concat(col("text"),
        when(col("doc_id") % 3 === 0, lit(" Привет мир café"))
          .otherwise(lit(" plain tail"))))
      .select(col("doc_id"), col("text"))
    val dir = Files.createTempDirectory("graft-fts-stream").toString
    docs.write.mode("overwrite").parquet(dir)
    val query = """("привет мир" OR café) NOT zzabsent"""
    val screen = (df: org.apache.spark.sql.DataFrame) =>
      df.filter(graft.operators.Fts.matchQuery(Seq(col("text")), query))
        .select(col("doc_id"))
    val q = screen(spark.readStream.schema(docs.schema).parquet(dir))
      .writeStream.outputMode("append").format("memory")
      .queryName("fts_screen_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("fts_screen_out").orderBy("doc_id").collect()
      val batch = screen(docs).orderBy("doc_id").collect()
      assert(streamed.nonEmpty, "screen degenerate: nothing matched")
      assert(streamed.toSeq === batch.toSeq)
    } finally q.stop()
  }

  test("streaming KMV sketch (complete mode) equals the batch sketch") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sfDir, "documents").select(col("lang"), col("text"))
    val dir = Files.createTempDirectory("graft-kmv-stream").toString
    docs.write.mode("overwrite").parquet(dir)
    val termsOf = (df: org.apache.spark.sql.DataFrame) => df.select(col("lang"),
      explode(graft.operators.Fts.tokens(Seq(col("text")))).as("term"))
    val q = termsOf(spark.readStream.schema(docs.schema).parquet(dir))
      .groupBy("lang")
      .agg(graft.operators.Kmv.sketchAgg(
        graft.operators.Kmv.hash30(col("term")), k = 64).as("s"))
      .select(col("lang"), col("s.k_seen"), col("s.kth_min"), col("s.est_distinct"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("kmv_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("kmv_out")
        .orderBy("lang").collect().toSeq
      val batch = graft.operators.Kmv
        .distinctSketch(termsOf(docs), "lang", "term", k = 64)
        .select("lang", "k_seen", "kth_min", "est_distinct")
        .orderBy("lang").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("watermarked windowed Count-Min sketch equals the batch per-window cells") {
    val sfDir = "/root/testdata/sf0.001"
    val ev = Tables.load(spark, sfDir, "events").select(col("ts"), col("event_type"))
    val dir = Files.createTempDirectory("graft-cms-win").toString
    ev.write.mode("overwrite").parquet(dir)
    // per-window frequency sketches: the state a streaming ingest keeps
    // to answer "how often did term X occur in window W" after the raw
    // events are gone — watermark bounds the open-window state
    val q = spark.readStream.schema(ev.schema).parquet(dir)
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"))
      .agg(graft.operators.CountMin.sketchAgg(col("event_type"), 2, 32).as("cells"))
      .select(col("window.start").as("ws"), col("cells"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_win").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("cms_win").orderBy("ws").collect().toSeq
      val batch = ev
        .groupBy(window(col("ts"), "6 hours"))
        .agg(graft.operators.CountMin.sketchAgg(col("event_type"), 2, 32).as("cells"))
        .select(col("window.start").as("ws"), col("cells"))
        .orderBy("ws").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stream-static enrichment: streaming facts join a static dimension, batch-equal") {
    val sfDir = "/root/testdata/sf0.001"
    val cust = Tables.load(spark, sfDir, "customer")
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"))
    val orders = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
    val dir = Files.createTempDirectory("graft-enrich-stream").toString
    orders.write.mode("overwrite").parquet(dir)
    // static side of a stream-static join is re-readable per micro-batch
    // and broadcast when small — the standard streaming dimension lookup
    val q = spark.readStream.schema(orders.schema).parquet(dir)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("enrich_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("enrich_out").orderBy("c_mktsegment").collect().toSeq
      val batch = orders.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        .orderBy("c_mktsegment").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming Count-Min sketch (complete mode) is bit-equal to the batch sketch") {
    val sfDir = "/root/testdata/sf0.001"
    val docs = Tables.load(spark, sfDir, "documents").select(col("lang"), col("text"))
    val dir = Files.createTempDirectory("graft-cms-stream").toString
    docs.write.mode("overwrite").parquet(dir)
    val termsOf = (df: org.apache.spark.sql.DataFrame) => df.select(col("lang"),
      explode(graft.operators.Fts.tokens(Seq(col("text")))).as("term"))
    val q = termsOf(spark.readStream.schema(docs.schema).parquet(dir))
      .groupBy("lang")
      .agg(graft.operators.CountMin.sketchAgg(col("term"), 4, 64).as("cells"))
      .writeStream.outputMode("complete").format("memory")
      .queryName("cms_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("cms_out")
        .orderBy("lang").collect().toSeq
      // cell sums commute, so the streaming result is IDENTICAL to
      // batch — the property HLL/MG sketches cannot offer
      val batch = termsOf(docs)
        .groupBy("lang")
        .agg(graft.operators.CountMin.sketchAgg(col("term"), 4, 64).as("cells"))
        .orderBy("lang").collect().toSeq
      assert(streamed === batch)
    } finally q.stop()
  }

  test("stateful streaming sessionization closes sessions on gap (flatMapGroupsWithState)") {
    import spark.implicits._
    import graft.streaming.EventWindows.{SessionEvent, SessionOut}
    val micros = (s: String) =>
      java.time.LocalDateTime.parse(s).toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L
    val dir = Files.createTempDirectory("graft-sess").toString
    Seq(
      SessionEvent(100L, 1L, micros("2024-01-01T10:00:00")),
      SessionEvent(100L, 2L, micros("2024-01-01T10:10:00")),
      SessionEvent(100L, 3L, micros("2024-01-01T11:00:00")), // 50-min gap -> closes session 1
      SessionEvent(200L, 4L, micros("2024-01-01T10:05:00"))
    ).toDS().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[SessionEvent]].schema)
      .parquet(dir).as[SessionEvent]
    val q = graft.streaming.EventWindows.sessionizeStream(stream, gapMinutes = 30)
      .writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      q.processAllAvailable()
      // only the CLOSED session is emitted; open sessions stay in state
      val closed = spark.table("sess_out").as[SessionOut].collect()
      assert(closed.length === 1)
      assert(closed.head === SessionOut(100L, 1L, 2L,
        "2024-01-01T10:00:00", "2024-01-01T10:10:00"))
    } finally q.stop()
  }

  test("streaming URL dedup canonicalizes at ingest and keeps the first crawl per page") {
    import spark.implicits._
    import graft.streaming.StreamDedup
    val dir = Files.createTempDirectory("graft-surl").toString
    // three spellings of the SAME page + one distinct page
    Seq((1L, "HTTPS://Host/p/?utm_source=a&id=3"),
        (2L, "https://host/p?id=3&ref=x"),
        (3L, "https://host/q?id=9"))
      .toDF("crawl_id", "url").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamDedup.urlDedupStream(stream, "url")
      .writeStream.outputMode("append").format("memory")
      .queryName("surl_out").start()
    try {
      q.processAllAvailable()
      val kept = spark.table("surl_out")
        .select("crawl_id", "canonical_url").as[(Long, String)].collect().sortBy(_._1)
      assert(kept.map(_._2).toSeq ===
        Seq("https://host/p?id=3", "https://host/q?id=9"))
      // batch 2: a re-crawl of page p in yet another spelling — state
      // keyed on the canonical hash must drop it
      Seq((4L, "https://host/p?utm_b=z&id=3#frag"), (5L, "https://host/r"))
        .toDF("crawl_id", "url").write.mode("append").parquet(dir)
      q.processAllAvailable()
      val all = spark.table("surl_out")
        .select("canonical_url").as[String].collect().sorted
      assert(all.toSeq ===
        Seq("https://host/p?id=3", "https://host/q?id=9", "https://host/r"))
    } finally q.stop()
  }

  test("streaming exact dedup keeps first occurrence per content hash across batches") {
    import spark.implicits._
    import graft.streaming.StreamDedup
    val dir = Files.createTempDirectory("graft-sdedup").toString
    // batch 1: two distinct docs + one in-batch duplicate
    Seq((1L, "alpha beta gamma"), (2L, "delta epsilon"), (3L, "alpha beta gamma"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamDedup.exactDedupStream(stream, "text")
      .writeStream.outputMode("append").format("memory").queryName("sdedup_out").start()
    try {
      q.processAllAvailable()
      val first = spark.table("sdedup_out").select("text").as[String].collect().sorted
      assert(first.toSeq === Seq("alpha beta gamma", "delta epsilon"))
      // batch 2: a cross-batch duplicate and a new doc — state must
      // remember batch 1's hashes
      Seq((4L, "delta epsilon"), (5L, "zeta eta"))
        .toDF("doc_id", "text").write.mode("append").parquet(dir)
      q.processAllAvailable()
      val all = spark.table("sdedup_out").select("text").as[String].collect().sorted
      assert(all.toSeq === Seq("alpha beta gamma", "delta epsilon", "zeta eta"))
      // batch dedup agrees on the same corpus
      val batchKept = graft.operators.TextDedup
        .exact(spark.read.parquet(dir), "doc_id", "text").count()
      assert(batchKept === 3L)
    } finally q.stop()
  }

  test("streaming decontamination flags benchmark-overlapping docs at ingest, batch-equal") {
    import spark.implicits._
    import graft.streaming.StreamDecontam
    // benchmark: one eval doc; its 3-shingles define the taint set
    val bench = Seq((100L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("bench_id", "text")
    val bf = StreamDecontam.benchmarkBloom(bench, "text", expectedShingles = 1000L)
    val dir = Files.createTempDirectory("graft-sdecon").toString
    // doc 1 is a verbatim leak, doc 2 clean, doc 3 a partial overlap
    Seq((1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "completely unrelated content with different words entirely here"),
        (3L, "the quick brown fox sat still"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamDecontam.flagContaminated(stream, "text", bf)
      .writeStream.outputMode("append").format("memory")
      .queryName("sdecon_out").start()
    try {
      q.processAllAvailable()
      // batch 2: another clean doc arrives — stateless, nothing carried
      Seq((4L, "more fresh text nothing shared with any benchmark item"))
        .toDF("doc_id", "text").write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table("sdecon_out")
        .select("doc_id", "contaminated").as[(Long, Long)].collect().toMap
      assert(got(1L) === 1L && got(2L) === 0L && got(4L) === 0L)
      // stream and batch agree row-for-row on the same corpus
      val streamed = spark.table("sdecon_out")
        .select("doc_id", "n_shingles", "n_hits", "hit_ppm", "contaminated")
        .collect().map(_.toSeq).toSet
      val batch = StreamDecontam
        .flagContaminated(spark.read.parquet(dir), "text", bf)
        .select("doc_id", "n_shingles", "n_hits", "hit_ppm", "contaminated")
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming DSIR scoring with a broadcast model is integer-identical to the batch scorer") {
    import spark.implicits._
    import graft.streaming.StreamScore
    // train a model offline on a corpus with marked target docs
    val train = Seq(
      (1L, "star nebula galaxy star comet", "wiki"),
      (2L, "nebula comet star galaxy galaxy", "wiki"),
      (3L, "fish trout salmon fish eel", "web"),
      (4L, "salmon eel trout trout fish", "web"))
      .toDF("doc_id", "text", "source")
    val model = graft.operators.Dsir.weights(train, col("source") === "wiki")
    val m = StreamScore.collectModel(model)
    val dir = Files.createTempDirectory("graft-sscore").toString
    Seq((10L, "star galaxy nebula"), (11L, "fish trout eel"),
        (12L, "star fish"), (13L, ""))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamScore.dsirScore(stream, "text", m)
      .writeStream.outputMode("append").format("memory")
      .queryName("sscore_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sscore_out")
        .select("doc_id", "n_tokens", "score_ppm", "keep")
        .collect().map(_.toSeq).toSet
      // the zero-token doc 13 must be dropped, target-ish doc kept
      assert(!streamed.exists(_.head == 13L))
      // batch scorer (the shuffle-join spelling) agrees value-for-value
      val batch = graft.operators.Dsir
        .applyWeights(spark.read.parquet(dir), model)
        .select(col("doc_id"), col("n_tokens"), col("score_ppm"), col("keep"))
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // and the narrow spelling agrees with itself on a batch DataFrame
      val narrowBatch = StreamScore.dsirScore(spark.read.parquet(dir), "text", m)
        .select("doc_id", "n_tokens", "score_ppm", "keep")
        .collect().map(_.toSeq).toSet
      assert(narrowBatch === batch)
    } finally q.stop()
  }

  test("streaming Moore-Lewis contrast scoring is integer-identical to the batch scorer") {
    import spark.implicits._
    import graft.streaming.StreamScore
    val pool = Seq(
      (1L, "the star shines the star glows", "wiki"),
      (2L, "the star fades", "wiki"),
      (3L, "purple monkey dishwasher", "web"),
      (4L, "the star shines", "web"))
      .toDF("doc_id", "text", "source")
    val inModel = graft.operators.NgramLm.train(pool, col("source") === "wiki")
    val genModel = graft.operators.NgramLm.train(pool, lit(true))
    // the in-line trainer and the frozen-model apply agree on the pool
    val inline = graft.operators.NgramLm
      .contrastScore(pool, col("source") === "wiki")
      .collect().map(_.toSeq).toSet
    val frozen = graft.operators.NgramLm
      .applyContrast(pool, inModel, genModel)
      .collect().map(_.toSeq).toSet
    assert(inline === frozen)
    // stream a new batch against the frozen models
    val dir = Files.createTempDirectory("graft-mlscore").toString
    Seq((10L, "the star shines"), (11L, "purple monkey dishwasher"),
        (12L, "star the glows"), (13L, "one"))
      .toDF("doc_id", "text").write.mode("overwrite").parquet(dir)
    val il = StreamScore.collectBigramLm(inModel)
    val gl = StreamScore.collectBigramLm(genModel)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamScore.lmContrastScore(stream, "text", il, gl)
      .writeStream.outputMode("append").format("memory")
      .queryName("mlscore_out").start()
    try {
      q.processAllAvailable()
      val cols = Seq("doc_id", "n_bigrams", "lm_in_ppm", "lm_gen_ppm", "ml_delta_ppm")
      val streamed = spark.table("mlscore_out")
        .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      // the 1-token doc 13 must be dropped
      assert(!streamed.exists(_.head == 13L))
      val batch = graft.operators.NgramLm
        .applyContrast(spark.read.parquet(dir), inModel, genModel)
        .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // and the narrow spelling agrees with itself on a batch DataFrame
      val narrowBatch = StreamScore
        .lmContrastScore(spark.read.parquet(dir), "text", il, gl)
        .select(cols.head, cols.tail: _*).collect().map(_.toSeq).toSet
      assert(narrowBatch === batch)
    } finally q.stop()
  }

  test("streaming per-source quota admits until exhausted, across batches") {
    import spark.implicits._
    import graft.streaming.StreamQuota
    val dir = Files.createTempDirectory("graft-squota").toString
    // Each drop is written as ONE part-file (coalesce(1)). StreamQuota's
    // contract is deterministic GIVEN arrival order: it sorts by doc_id
    // only WITHIN a micro-batch. A multi-file drop can be split across
    // triggers by the file source (r17 flake: doc 12's part-file listed
    // first -> 12 admitted, 11 rejected — correct per contract, but not
    // the assignment this test asserts). One file per drop = one
    // micro-batch per drop = one deterministic intra-batch sort.
    // batch 1: srcA sends 3 (quota 2 -> one reject), srcB sends 1
    Seq(("srcA", 1L, "a1"), ("srcA", 2L, "a2"), ("srcA", 3L, "a3"),
        ("srcB", 10L, "b1"))
      .toDF("source", "doc_id", "text").coalesce(1)
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamQuota.admit(stream, quota = 2)
      .writeStream.outputMode("append").format("memory")
      .queryName("squota_out").start()
    try {
      q.processAllAvailable()
      // batch 2: srcA is already exhausted; srcB has one slot left
      Seq(("srcA", 4L, "a4"), ("srcB", 11L, "b2"), ("srcB", 12L, "b3"))
        .toDF("source", "doc_id", "text").coalesce(1)
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val got = spark.table("squota_out")
        .select("doc_id", "admitted").as[(Long, Boolean)].collect().toMap
      assert(got === Map(
        1L -> true, 2L -> true, 3L -> false, 4L -> false,
        10L -> true, 11L -> true, 12L -> false))
    } finally q.stop()
  }

  test("streaming incremental ingest twin: two-drop replay emits batch-identical per-doc dispositions") {
    import spark.implicits._
    import graft.streaming.StreamIngest
    import graft.functions.PortableHash
    val dir = "/root/testdata/sf0.001"
    val S = 16
    val corpus = graft.queries.DedupQueries.corpusExact(spark, dir)
    val a = corpus.filter(col("doc_id") < 250)
    val b = corpus.filter(col("doc_id") >= 250)
      .select(col("doc_id").cast("long").as("doc_id"),
        (col("doc_id") % S).cast("long").as("shard"), col("text"),
        PortableHash.hash60(col("text")).as("content_hash"))
      .localCheckpoint(true)
    val aKeep = a
      .groupBy(PortableHash.hash60(col("text")).as("content_hash"), col("text"))
      .agg(min(col("doc_id")).cast("long").as("keep_id"))
    // the batch truth: PipelineQueries' own ledger (stages 1+2 of
    // x_pipeline_incremental, the oracle-graded spelling)
    val batchLedger = graft.queries.PipelineQueries.ingestLedger(b, aKeep)
      .select($"doc_id", $"status").as[(Long, String)].collect().toMap
    // streamed replay: drop B arrives as TWO ascending-id micro-batches
    // (one part-file each — the StreamQuota determinism discipline), so
    // arrival order respects doc_id order and first-arrival == min-id:
    // the contract under which online must equal batch exactly
    val bounds = b.agg(min("doc_id"), max("doc_id")).head()
    val mid = (bounds.getLong(0) + bounds.getLong(1)) / 2
    val sdir = Files.createTempDirectory("graft-singest").toString
    b.filter(col("doc_id") < mid).select("doc_id", "text")
      .coalesce(1).write.mode("overwrite").parquet(sdir)
    val schema = spark.read.parquet(sdir).schema
    val stream = spark.readStream.schema(schema).parquet(sdir)
    val q = StreamIngest.dispositions(stream, "doc_id", "text",
        aKeep.select("content_hash"))
      .writeStream.outputMode("append").format("memory")
      .queryName("singest_out").start()
    try {
      q.processAllAvailable()
      b.filter(col("doc_id") >= mid).select("doc_id", "text")
        .coalesce(1).write.mode("append").parquet(sdir)
      q.processAllAvailable()
      val streamed = spark.table("singest_out")
        .select("doc_id", "status").as[(Long, String)].collect().toMap
      assert(streamed === batchLedger)
      // the fixture must actually exercise all three dispositions and
      // the cross-drop state (a clone in drop 2 of a drop-1 original)
      val byStatus = batchLedger.groupBy(_._2).view.mapValues(_.size).toMap
      assert(byStatus.keySet === Set("dup_history", "accepted", "dup_batch"),
        s"fixture degenerate: $byStatus")
      val hashes = b.select($"doc_id", $"content_hash")
        .as[(Long, Long)].collect().toMap
      val crossDrop = batchLedger.exists { case (id, st) =>
        st == "dup_batch" && id >= mid &&
          batchLedger.exists { case (id2, st2) =>
            st2 == "accepted" && id2 < mid && hashes(id2) == hashes(id) }
      }
      assert(crossDrop, "fixture degenerate: no cross-drop duplicate")
    } finally q.stop()
  }

  test("watermarked streaming dedup drops duplicates within the horizon") {
    import spark.implicits._
    import graft.streaming.StreamDedup
    val dir = Files.createTempDirectory("graft-sdedup-wm").toString
    // batch 1: two distinct docs. (Within ONE micro-batch the surviving
    // copy of a duplicate is partition-order dependent, so the dup
    // arrives in a SECOND batch — state already holds its hash, making
    // the drop deterministic.)
    Seq(
      (1L, "doc alpha", "2024-01-01 10:00:00"),
      (2L, "doc beta", "2024-01-01 10:01:00"))
      .toDF("doc_id", "text", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamDedup.exactDedupStreamWatermarked(stream, "text", "ts", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("sdedup_wm_out").start()
    try {
      q.processAllAvailable()
      // batch 2: a duplicate 2 min later, inside the 1h horizon
      Seq((3L, "doc alpha", "2024-01-01 10:02:00"))
        .toDF("doc_id", "text", "ts_s")
        .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val kept = spark.table("sdedup_wm_out").select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq === Seq(1L, 2L), "in-horizon duplicate must be dropped")
    } finally q.stop()
  }

  test("watermarked streaming URL dedup: canonical-key state bounded to the horizon") {
    import spark.implicits._
    import graft.streaming.StreamDedup
    val dir = Files.createTempDirectory("graft-surl-wm").toString
    // two messy spellings of DIFFERENT pages in batch 1
    Seq(
      (1L, "HTTPS://Host.example/p/1/?utm_source=x", "2024-01-01 10:00:00"),
      (2L, "https://host.example/p/2", "2024-01-01 10:01:00"))
      .toDF("doc_id", "url", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamDedup.urlDedupStreamWatermarked(stream, "url", "ts", "1 hour")
      .writeStream.outputMode("append").format("memory").queryName("surl_wm_out").start()
    try {
      q.processAllAvailable()
      // batch 2: a re-crawl of page 1 under a THIRD spelling, 2 min
      // later — same canonical key, inside the 1h horizon → dropped
      Seq((3L, "https://host.example/p/1#frag", "2024-01-01 10:02:00"))
        .toDF("doc_id", "url", "ts_s")
        .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
        .write.mode("append").parquet(dir)
      q.processAllAvailable()
      val kept = spark.table("surl_wm_out").select("doc_id").as[Long].collect().sorted
      assert(kept.toSeq === Seq(1L, 2L), "in-horizon re-crawl must be dropped")
    } finally q.stop()
  }

  test("streaming span scrub: known-gram windows cut per-row, agrees with the batch twin") {
    import spark.implicits._
    import graft.streaming.StreamDedup
    import graft.operators.{Bloom, TextDedup}
    val priorText = "alpha beta gamma delta epsilon"
    val priorGrams = Seq(Tuple1(priorText)).toDF("text")
      .select(explode(graft.expressions.ShingleHashSeq60
        .shingle_hash_seq60(col("text"), 5)).as("g"))
    val bf = Bloom.buildLong(priorGrams, "g", expectedItems = 100L, fpp = 0.001)
    // no intra-batch duplicates, so the batch incremental twin reduces
    // to exactly the known-gram semantics the stateless stream applies
    val batch = Seq(
      (1L, "alpha beta gamma delta epsilon fresh1 fresh2"), // known run cut
      (2L, "fresh3 fresh4 fresh5 fresh6 fresh7"),           // untouched
      (3L, "one two")                                       // below window
    ).toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-sscrub").toString
    batch.write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val q = StreamDedup.spanScrubStream(stream, "doc_id", "text", bf, n = 5)
      .writeStream.outputMode("append").format("memory")
      .queryName("sscrub_out").start()
    try {
      q.processAllAvailable()
      val got = spark.table("sscrub_out")
        .select("doc_id", "n_tokens", "n_removed", "pruned_text")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
        .sortBy(_._1)
      val want = TextDedup.dupSpanPruneIncremental(batch, "doc_id", "text", priorGrams, n = 5)
        .orderBy("doc_id")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(got === want)
      assert(got.head === ((1L, 7L, 5L, "fresh1 fresh2")))
    } finally q.stop()
    // null text must yield a null row, not an NPE that kills the query
    // (the scrub is a plain projection, so batch mode exercises the
    // same UDF path)
    val nullOut = StreamDedup.spanScrubStream(
        Seq((9L, null: String)).toDF("doc_id", "text"), "doc_id", "text", bf, n = 5)
      .collect()(0)
    assert(nullOut.getLong(0) === 9L)
    assert(nullOut.isNullAt(1) && nullOut.isNullAt(2) && nullOut.isNullAt(3))
  }

  test("streaming as-of join: state holds newest prior right row per key across batches") {
    import spark.implicits._
    import graft.streaming.StreamAsOf
    import graft.streaming.StreamAsOf.{AsOfEvent, AsOfOut}
    val dir = Files.createTempDirectory("graft-sasof").toString
    // batch 1: purchase before any error, an error, a purchase at the
    // SAME instant (strictly-prior: not visible), a later purchase
    Seq(
      AsOfEvent(1L, 5L, 101L, 0, 0.0),
      AsOfEvent(1L, 10L, 201L, 1, 9.5),
      AsOfEvent(1L, 10L, 102L, 0, 0.0),
      AsOfEvent(1L, 15L, 103L, 0, 0.0)
    ).toDS().write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(implicitly[org.apache.spark.sql.Encoder[AsOfEvent]].schema)
      .parquet(dir).as[AsOfEvent]
    val q = StreamAsOf.joinPriorStream(stream)
      .writeStream.outputMode("append").format("memory").queryName("sasof_out").start()
    try {
      q.processAllAvailable()
      // batch 2: newer error then a purchase after it (in-batch order),
      // plus a key with no right rows at all
      Seq(
        AsOfEvent(1L, 20L, 202L, 1, 3.25),
        AsOfEvent(1L, 25L, 104L, 0, 0.0),
        AsOfEvent(2L, 30L, 105L, 0, 0.0)
      ).toDS().write.mode("append").parquet(dir)
      q.processAllAvailable()
      val out = spark.table("sasof_out").as[AsOfOut].collect()
        .map(o => o.event_id -> ((o.right_event_id, o.right_tsMicros, o.right_value)))
        .toMap
      assert(out === Map(
        101L -> ((-1L, -1L, 0.0)),      // nothing prior
        102L -> ((-1L, -1L, 0.0)),      // equal-ts error not visible
        103L -> ((201L, 10L, 9.5)),
        104L -> ((202L, 20L, 3.25)),    // in-batch error visible
        105L -> ((-1L, -1L, 0.0))))     // key with no right rows
      // twin check: the batch operator on the full history agrees
      val all = spark.read.parquet(dir)
      val batch = graft.operators.AsOf.joinPrior(
          all.filter($"side" === 0).select($"key", $"tsMicros".as("ts"), $"event_id"),
          all.filter($"side" === 1).select($"key", $"tsMicros".as("ts"), $"event_id", $"value"),
          "key", "ts", Seq("event_id", "ts", "value"))
        .select($"event_id",
          coalesce($"asof.event_id", lit(-1L)).as("rid"),
          coalesce($"asof.ts", lit(-1L)).as("rts"),
          coalesce($"asof.value", lit(0.0)).as("rv"))
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
      assert(batch === out, "streaming twin must equal the batch as-of join")
    } finally q.stop()
  }

  test("sessionize: gap splits sessions per user") {
    import spark.implicits._
    val events = Seq(
      (1L, 100L, "2024-01-01 10:00:00"),
      (2L, 100L, "2024-01-01 10:10:00"),  // same session (10 min)
      (3L, 100L, "2024-01-01 11:00:00"),  // new session (50 min gap)
      (4L, 200L, "2024-01-01 10:05:00")   // other user
    ).toDF("event_id", "user_id", "ts_s")
      .withColumn("ts", to_timestamp($"ts_s")).drop("ts_s")
    val out = EventWindows.sessionize(events, gapMinutes = 30)
      .orderBy("user_id", "session_no").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((100L, 1L, 2L), (100L, 2L, 1L), (200L, 1L, 1L)))
    assert(out.head.getAs[String]("session_start") === "2024-01-01T10:00:00")
    assert(out.head.getAs[String]("session_end") === "2024-01-01T10:10:00")
  }

  test("streaming dedup state survives a query restart (checkpointed state store)") {
    import spark.implicits._
    import graft.streaming.StreamDedup
    val base = Files.createTempDirectory("graft-sdedup-cp")
    val (in, cp, out) = (s"$base/in", s"$base/cp", s"$base/out")
    Seq((1L, "doc alpha"), (2L, "doc beta")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    def start() = StreamDedup
      .exactDedupStream(spark.readStream.schema(schema).parquet(in), "text")
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp).format("parquet")
      .option("path", out).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart: a NEW query from the same checkpoint; batch 2 re-sends a
    // batch-1 duplicate plus a new doc
    Seq((3L, "doc alpha"), (4L, "doc gamma")).toDF("doc_id", "text")
      .write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val kept = spark.read.parquet(out).select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L, 4L),
      "the restarted query must restore dedup state and drop the batch-1 duplicate")
  }

  test("streaming URL dedup state survives a restart (canonical-hash state store)") {
    import spark.implicits._
    import graft.streaming.StreamDedup
    val base = Files.createTempDirectory("graft-surl-cp")
    val (in, cp, out) = (s"$base/in", s"$base/cp", s"$base/out")
    Seq((1L, "HTTPS://Host/p/?utm_source=a&id=3"), (2L, "https://host/q"))
      .toDF("crawl_id", "url").write.mode("overwrite").parquet(in)
    val schema = spark.read.parquet(in).schema
    def start() = StreamDedup
      .urlDedupStream(spark.readStream.schema(schema).parquet(in), "url")
      .writeStream.outputMode("append")
      .option("checkpointLocation", cp).format("parquet")
      .option("path", out).start()
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    // restart from the same checkpoint; batch 2 re-crawls page p under a
    // different raw spelling — only restored state can catch it
    Seq((3L, "https://HOST/p?id=3&ref=x"), (4L, "https://host/r"))
      .toDF("crawl_id", "url").write.mode("append").parquet(in)
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()
    val kept = spark.read.parquet(out).select("crawl_id").as[Long].collect().sorted
    assert(kept.toSeq === Seq(1L, 2L, 4L),
      "the restarted query must restore canonical-URL state and drop the re-crawl")
  }

  test("stream-stream time-bounded join (watermarked) equals the batch theta join") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val batchEvents = Tables.load(spark, sfDir, "events")
    val dir = Files.createTempDirectory("graft-ssjoin").toString
    batchEvents.write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(batchEvents.schema).parquet(dir)

    def purchases(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("p_id"), col("user_id").as("p_user"), col("ts").as("p_ts"))
    def errors(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("event_type") === "error")
      .select(col("event_id").as("e_id"), col("user_id").as("e_user"), col("ts").as("e_ts"))
    val joinCond = expr(
      "p_user = e_user AND e_ts >= p_ts - interval 1 hour AND e_ts < p_ts")

    // watermarks bound BOTH sides' state: each side buffers only rows
    // inside its horizon, the condition's time band lets Spark evict —
    // the unbounded-state trap of stream-stream joins, solved the way
    // the docs prescribe
    val q = purchases(stream).withWatermark("p_ts", "2 hours")
      .join(errors(stream).withWatermark("e_ts", "2 hours"), joinCond)
      .select("p_id", "e_id")
      .writeStream.outputMode("append").format("memory").queryName("ssjoin_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("ssjoin_out").as[(Long, Long)].collect().toSet
      val batch = purchases(batchEvents).join(errors(batchEvents), joinCond)
        .select("p_id", "e_id").as[(Long, Long)].collect().toSet
      assert(batch.nonEmpty, "fixture must produce at least one in-band pair")
      assert(streamed === batch)
    } finally q.stop()
  }

  test("heavy-hitters sketch aggregates in streaming update mode (mergeable state)") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-shh").toString
    (Seq.fill(50)("hot") ++ (1 to 30).map(i => s"u$i"))
      .toDF("term").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = stream.groupBy()
      .agg(graft.operators.HeavyHitters.sketch(col("term"), 8).as("hh"))
      .writeStream.outputMode("update").format("memory").queryName("shh_out").start()
    try {
      q.processAllAvailable()
      // second batch: more of the heavy item arrives; state must merge
      Seq.fill(40)("hot").toDF("term").write.mode("append").parquet(dir)
      q.processAllAvailable()
      val m = spark.table("shh_out").select(explode(col("hh")))
        .as[(String, Long)].collect().groupBy(_._1).map { case (t, vs) => t -> vs.map(_._2).max }
      val n = 120 // 50 + 30 + 40
      assert(m.contains("hot") && m("hot") >= 90L - n / 9 && m("hot") <= 90L)
    } finally q.stop()
  }

  test("CMS sketch streams per-group in update mode, bit-equal to the batch sketch") {
    import spark.implicits._
    import graft.operators.CountMin
    val dir = Files.createTempDirectory("graft-scms").toString
    val batch1 = (1 to 400).map(i => (s"g${i % 2}", s"t${i % 30}"))
    val batch2 = (1 to 300).map(i => (s"g${i % 2}", s"t${i % 50}"))
    batch1.toDF("g", "term").write.mode("overwrite").parquet(dir)
    val stream = spark.readStream
      .schema(spark.read.parquet(dir).schema).parquet(dir)
    val q = stream.groupBy("g")
      .agg(CountMin.sketchAgg(col("term"), depth = 4, width = 32).as("cells"))
      .writeStream.outputMode("update").format("memory").queryName("scms_out").start()
    try {
      q.processAllAvailable()
      batch2.toDF("g", "term").write.mode("append").parquet(dir)
      q.processAllAvailable()
      // latest update per group must equal the single-pass batch sketch
      // over both batches. "Latest" = the row with the largest total
      // cell mass: counters only grow across updates, and mass is
      // insertion-order-independent (monotonically_increasing_id over a
      // memory sink is NOT — partition layout broke that ordering under
      // a loaded suite run).
      val streamed = spark.sql(
        """SELECT g, max_by(cells, aggregate(cells, 0L, (a, x) -> a + x)) AS cells
          |FROM scms_out GROUP BY g""".stripMargin)
        .as[(String, Seq[Long])].collect().toMap
      val whole = (batch1 ++ batch2).toDF("g", "term").groupBy("g")
        .agg(CountMin.sketchAgg(col("term"), depth = 4, width = 32).as("cells"))
        .as[(String, Seq[Long])].collect().toMap
      assert(streamed === whole)
    } finally q.stop()
  }

  test("streaming near-dup: distinct hits equal the batch LSH candidate pairs") {
    import spark.implicits._
    import graft.streaming.StreamNearDup
    // planted corpus: 1/2 exact clones, 3 a near-dup of 1 (two tokens
    // changed), 4 unrelated
    val docs = Seq(
      (1L, "spark shuffles data across the cluster during wide transformations always"),
      (2L, "spark shuffles data across the cluster during wide transformations always"),
      (3L, "spark shuffles data across the cluster during wide transformations maybe"),
      (4L, "completely different text about cooking pasta with plenty of fresh basil"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-sneardup").toString
    docs.filter($"doc_id" <= 2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = StreamNearDup.nearDupStream(stream, "doc_id", "text", minEstJaccard = 0.0)
      .writeStream.outputMode("append").format("memory").queryName("sneardup_out").start()
    try {
      q.processAllAvailable()
      // second batch: the near-dup and the unrelated doc arrive later —
      // state from batch 1 must still match them
      docs.filter($"doc_id" >= 3).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("sneardup_out")
        .select("id_a", "id_b").distinct().as[(Long, Long)].collect().toSet
      // the ONLINE operator emits member-level pairs (each arrival
      // matches every prior band entry); the batch twin pre-collapses
      // identical contents (r17) and emits star + representative pairs.
      // They must agree after canonicalizing ids to their content
      // representative (here 2 -> 1): same distinct-content pair set.
      val batch = graft.operators.TextDedup
        .minhashPairs(docs, "doc_id", "text", jaccardThreshold = 0.0)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(streamed === Set((1L, 2L), (1L, 3L), (2L, 3L)))
      assert(batch === Set((1L, 2L), (1L, 3L)))
      val rep = Map(2L -> 1L).withDefault(identity)
      def canon(ps: Set[(Long, Long)]) = ps
        .map { case (a, b) => (math.min(rep(a), rep(b)), math.max(rep(a), rep(b))) }
        .filter { case (a, b) => a != b }
      assert(canon(streamed) === canon(batch))
      assert(streamed.contains((1L, 2L)) && streamed.contains((1L, 3L)))
      assert(!streamed.exists(p => p._1 == 4L || p._2 == 4L))
      // exact clones agree on every signature component
      val est12 = spark.table("sneardup_out")
        .filter($"id_a" === 1L && $"id_b" === 2L)
        .select("est_jaccard").as[Double].head()
      assert(est12 === 1.0)
    } finally q.stop()
  }

  test("curation screens (mojibake/code/markdown) run stateless in streaming, batch-equal") {
    import spark.implicits._
    import graft.operators.{CodeDetect, Encoding, Markup}
    // the ingest-time screen: every new doc gets its quarantine and
    // routing signals at arrival — stateless narrow ops, so the
    // streaming result must be row-identical to the batch form
    def screen(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(col("doc_id"),
        Encoding.countMojibake(col("text")).as("n_mojibake"),
        Encoding.countControl(col("text")).as("n_ctrl"),
        CodeDetect.codeCounts(col("text")).getField("n_symbols").as("n_symbols"),
        CodeDetect.codeCounts(col("text")).getField("n_keywords").as("n_keywords"),
        Markup.stripMarkdown(col("text")).as("clean_text"))
    val docs = Seq(
      (1L, "plain prose nothing special at all"),
      (2L, "broken cafÃ© text with mojibake"),
      (3L, "def f(x):\n    return x; let y = [x];"),
      (4L, "# Title\n\nsee [docs](http://x.y) and `code` here"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-sscreen").toString
    docs.filter($"doc_id" <= 2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = screen(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sscreen_out").start()
    try {
      q.processAllAvailable()
      docs.filter($"doc_id" >= 3).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("sscreen_out").collect().map(_.toSeq).toSet
      val batch = screen(spark.read.parquet(dir)).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      val byId = spark.table("sscreen_out")
        .select("doc_id", "n_mojibake", "n_symbols", "clean_text")
        .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
      assert(byId(2L)._2 > 0L) // mojibake caught at ingest
      assert(byId(3L)._3 > 0L) // code symbols caught
      assert(byId(4L)._4 === "Title see docs and here")
    } finally q.stop()
  }

  test("blocklist screen runs stateless in streaming, batch-equal, and matches summary") {
    import spark.implicits._
    import graft.operators.Blocklist
    val phrases = Seq("spam", "bad phrase")
    def screen(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      df.select(col("doc_id"),
        Blocklist.screen(col("text"), phrases).as("s"))
        .select(col("doc_id"), col("s.n_hits").as("n_hits"),
          col("s.n_phrases").as("n_phrases"))
    val docs = Seq(
      (1L, "spam and a bad phrase and more spam"),
      (2L, "clean content"),
      (3L, "bad phrase bad phrase"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-sblock").toString
    docs.filter($"doc_id" <= 2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    val q = screen(stream)
      .writeStream.outputMode("append").format("memory")
      .queryName("sblock_out").start()
    try {
      q.processAllAvailable()
      docs.filter($"doc_id" >= 3).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("sblock_out").collect().map(_.toSeq).toSet
      val batch = screen(spark.read.parquet(dir)).collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // the per-row screen agrees with the join-based batch summary
      val viaSummary = Blocklist.summary(docs, "doc_id", "text", phrases)
        .select("doc_id", "n_hits", "n_phrases")
        .collect().map(_.toSeq).toSet
      assert(batch === viaSummary)
      val byId = spark.table("sblock_out")
        .as[(Long, Long, Long)].collect().map(r => (r._1, (r._2, r._3))).toMap
      assert(byId(1L) === ((3L, 2L)) && byId(2L) === ((0L, 0L)) && byId(3L) === ((2L, 1L)))
    } finally q.stop()
  }

  test("seeded augmentation (dropout + FIM) runs stateless in streaming, batch-equal") {
    import spark.implicits._
    import graft.operators.TextAug
    // augmentation at ingest: same seed must give identical views
    // whether the doc arrives in a batch or on a stream
    def aug(df: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame =
      TextAug.tokenDropout(df, "doc_id", "text", seed = 5L)
        .join(TextAug.fimTransform(df, "doc_id", "text", seed = 3L)
          .select(col("doc_id"), col("fim_text")), Seq("doc_id"))
    val docs = Seq(
      (1L, "alpha bravo charlie delta echo foxtrot golf hotel"),
      (2L, "india juliet kilo lima mike november oscar papa"),
      (3L, "quebec romeo sierra tango uniform victor whiskey xray"))
      .toDF("doc_id", "text")
    val dir = Files.createTempDirectory("graft-saug").toString
    docs.filter($"doc_id" <= 2).write.mode("overwrite").parquet(dir)
    val stream = spark.readStream.schema(docs.schema).parquet(dir)
    // the dropout/FIM selects are narrow; the join of two stateless
    // projections of the SAME stream stays append-safe
    val q = TextAug.tokenDropout(stream, "doc_id", "text", seed = 5L)
      .writeStream.outputMode("append").format("memory")
      .queryName("saug_out").start()
    try {
      q.processAllAvailable()
      docs.filter($"doc_id" >= 3).write.mode("append").parquet(dir)
      q.processAllAvailable()
      val streamed = spark.table("saug_out").collect().map(_.toSeq).toSet
      val batch = TextAug.tokenDropout(spark.read.parquet(dir), "doc_id", "text", seed = 5L)
        .collect().map(_.toSeq).toSet
      assert(streamed === batch)
      // batch composition of both augmented views is deterministic too
      assert(aug(docs).collect().map(_.toSeq).toSet ===
        aug(docs).collect().map(_.toSeq).toSet)
    } finally q.stop()
  }

  test("sliding-window KMV distinct runs in streaming; closed windows equal batch sketches") {
    import spark.implicits._
    import graft.operators.Kmv
    // x_kmv_sliding's streaming form: 3h windows hopping 1h, KmvAgg per
    // window — the mergeable-sketch path; complete-mode results must be
    // bit-equal to batch sketches over the same windowed rows.
    val rows = (0 until 300).map { i =>
      (java.sql.Timestamp.valueOf(f"2024-01-01 ${i % 10}%02d:10:00"), (i * 37 % 50).toLong)
    }
    val dir = Files.createTempDirectory("graft-skmv").toString
    rows.toDF("ts", "user_id").write.mode("overwrite").parquet(dir)
    val schema = rows.toDF("ts", "user_id").schema
    val agg = Kmv.sketchAgg(Kmv.hash30($"user_id"), k = 8).as("sk")
    val stream = spark.readStream.schema(schema).parquet(dir)
      .groupBy(window($"ts", "3 hours", "1 hour"))
      .agg(agg)
    val q = stream.writeStream.outputMode("complete").format("memory")
      .queryName("skmv_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("skmv_out")
        .select($"window.start".cast("long").as("w"), $"sk.est_distinct")
        .as[(Long, Long)].collect().toMap
      val batch = rows.toDF("ts", "user_id")
        .groupBy(window($"ts", "3 hours", "1 hour"))
        .agg(agg)
        .select($"window.start".cast("long").as("w"), $"sk.est_distinct")
        .as[(Long, Long)].collect().toMap
      assert(streamed === batch)
      assert(batch.nonEmpty && batch.values.exists(_ > 0))
    } finally q.stop()
  }
}

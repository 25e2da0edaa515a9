package graft

import graft.queries.{AggQueries, ParityQueries}

/** Physical-plan audits: the properties that matter at 100 TB, asserted
  * on the optimized plans (SURVEY §4; builder-prompt scale checklist).
  * These run on sf0.001 — plan SHAPE, not timing.
  */
class PlanSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  /** Execute, then read the FINAL adaptive plan (pre-execution the AQE
    * plan is not finalized and carries no WholeStageCodegen markers).
    */
  def plan(df: org.apache.spark.sql.DataFrame): String = {
    val qe = df.queryExecution
    df.collect()
    qe.executedPlan.toString
  }

  /** Collect the plan text under every explicit broadcast() hint in the
    * analyzed logical plan. The scale invariant is that user-forced
    * broadcasts cover only true dimensions — AQE may still broadcast a
    * small fact side at runtime (fine), but nothing in the code may FORCE
    * a fact table (orders/lineitem) into a broadcast, because at 100 TB
    * that exceeds the broadcast cap and OOMs the driver.
    */
  def forcedBroadcastSubtrees(df: org.apache.spark.sql.DataFrame): Seq[String] = {
    import org.apache.spark.sql.catalyst.plans.logical.ResolvedHint
    df.queryExecution.analyzed.collect {
      case h: ResolvedHint if h.hints.strategy.isDefined => h.child.toString
    }
  }

  test("q3/q5 star joins broadcast only dimension sides — facts never forced into a broadcast") {
    for (df <- Seq(AggQueries.topRevenueOrders(spark, dir),
                   AggQueries.revenueByNation(spark, dir))) {
      val hinted = forcedBroadcastSubtrees(df)
      assert(hinted.nonEmpty, "dimension sides must carry an explicit broadcast hint")
      for (sub <- hinted) {
        assert(!sub.contains("lineitem.parquet"), "lineitem forced into broadcast:\n" + sub)
        assert(!sub.contains("orders.parquet"), "orders forced into broadcast:\n" + sub)
      }
      // dimension edges still execute as broadcast-hash joins
      val p = plan(df)
      assert(p.contains("BroadcastHashJoin"), p)
    }
  }

  test("q6 pushes filters to the parquet scan and prunes columns") {
    val p = plan(AggQueries.forecastRevenue(spark, dir))
    assert(p.contains("PushedFilters: ["), p)
    assert(p.contains("l_shipdate"), "shipdate range must reach the scan")
    // projection pruning: scan must not read l_orderkey/l_partkey etc.
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_partkey"), readSchema)
    assert(readSchema.contains("l_extendedprice"))
  }

  test("q1 aggregates with map-side partial aggregation") {
    val p = plan(AggQueries.pricingSummary(spark, dir))
    assert("HashAggregate".r.findAllIn(p).length >= 2,
      "expect partial + final HashAggregate:\n" + p)
  }

  test("dictionary encode joins broadcast the dictionary — fact side never shuffles") {
    val p = plan(ParityQueries.encodeOrders(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"))
  }

  test("dictionary build: no single-partition stage — parallel range sort + zipWithIndex") {
    val df = ParityQueries.dictOrderpriority(spark, dir)
    df.collect()
    // id assignment must NOT use a single-partition window; the ranking
    // is a range-partitioned sort + zipWithIndex over distinct values.
    // The physical plan of the dictionary sort (below the RDD boundary)
    // shows up via the logical plan's deserialized scan; assert the
    // final plan has no Window or SinglePartition exchange.
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Window"), "no window expected:\n" + p)
    assert(!p.contains("SinglePartition"), "no single-partition exchange expected:\n" + p)
  }

  test("FTS match predicate stays in whole-stage codegen with a pruned scan") {
    val p = plan(ParityQueries.ftsMatch(spark, dir))
    assert(p.contains("*("), "WSCG markers expected:\n" + p)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("source"), "unused columns must be pruned: " + readSchema)
  }

  test("rolling-hash fingerprints run inside whole-stage codegen (no BatchEvalPython/UDF)") {
    val p = plan(graft.queries.DedupQueries.fingerprints(spark, dir))
    assert(p.contains("*("), "WSCG markers expected:\n" + p)
    assert(!p.toLowerCase.contains("batcheval"), p)
  }

  test("k-means assignment is narrow: no corpus window, crossJoin, or per-iteration shuffle") {
    // the Lloyd loop collects centroids driver-side; the per-row
    // assignment must be literal-centroid argmax — any Window or
    // nested-loop join here would shuffle the full corpus every
    // iteration at 100 TB
    val df = graft.queries.SimilarityQueries.kmeansClusters(spark, dir)
    val p = plan(df)
    assert(!p.contains("Window"), "no window over the corpus expected:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("LSH ANN broadcasts only the probe list; corpus side stays partitioned") {
    val df = graft.queries.SimilarityQueries.annLsh(spark, dir)
    val hinted = forcedBroadcastSubtrees(df)
    assert(hinted.nonEmpty, "probe side must carry the broadcast hint")
    for (sub <- hinted)
      assert(!sub.contains("embeddings.parquet") || sub.contains("vec_id < 10"),
        "only the filtered query side may be broadcast:\n" + sub)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("split assignment is pure narrow compute — no exchange except the output sort") {
    val df = graft.queries.DedupQueries.splitAssign(spark, dir)
    val p = plan(df)
    // exactly the rangepartitioning exchange for the final orderBy; no
    // hash-partitioned (aggregate/join) shuffle anywhere
    assert(!p.contains("hashpartitioning"), "no hash shuffle expected:\n" + p)
  }

  test("pack assignment windows per hash bucket — never a single-partition cumsum") {
    val df = graft.queries.DedupQueries.packAssign(spark, dir)
    val p = plan(df)
    assert(p.contains("Window"), p)
    assert(!p.contains("SinglePartition"),
      "global cumulative sums would serialize the corpus onto one task:\n" + p)
  }

  test("corpus report prunes the scan to the text column only") {
    val df = graft.queries.DedupQueries.corpusReport(spark, dir)
    val p = plan(df)
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(readSchema.contains("text"), readSchema)
    assert(!readSchema.contains("doc_id"), "unused columns must be pruned: " + readSchema)
  }

  test("repetition and chunking are narrow: no hash shuffle, pruned scan") {
    for (df <- Seq(graft.queries.DedupQueries.repetitionReport(spark, dir),
                   graft.queries.DedupQueries.chunkDocs(spark, dir))) {
      val p = plan(df)
      assert(!p.contains("hashpartitioning"),
        "per-row metrics must not shuffle on a key:\n" + p)
      val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
      assert(!readSchema.contains("lang"), "unused columns must be pruned: " + readSchema)
    }
  }

  test("decontamination broadcasts only the benchmark side; corpus stays partitioned") {
    val df = graft.queries.DedupQueries.decontaminate(spark, dir)
    val hinted = forcedBroadcastSubtrees(df)
    assert(hinted.nonEmpty, "benchmark side must carry the broadcast hint")
    // the corpus is the union with planted near-dups — it must never be
    // the broadcast side (at 100 TB the eval set broadcasts, not the corpus)
    for (sub <- hinted)
      assert(!sub.contains("Union"), "corpus union must not be broadcast:\n" + sub)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("plan lint: every graded query is free of scale-killer operators") {
    // BroadcastNestedLoopJoin is allowed ONLY where it is the documented
    // design: (a) brute-force ANN scores every (corpus, query) pair
    // against a broadcast handful of queries — the per-query-FLOPs
    // baseline — and the media-embed bridge reuses that scorer;
    // (b) scalar broadcasts: a 1-ROW aggregate (corpus N, weight totals)
    // cross-joined into a tiny side — constant-size at any corpus scale.
    // Everything else must stay hash/broadcast-hash/sort-merge.
    val bnljByDesign = Set(
      "x_ann_topk", "x_multimodal_embed_topk", // (a) all-pairs scoring
      "x_hard_negatives",                      //     rank-window reuse of (a)
      "x_ann_recall",                          //     ground-truth side reuses (a)
      "x_bitext_margin",                       //     margin miner reuses (a) both directions
      "x_matryoshka_recall",                   //     truncated-dim reuse of (a)
      "x_rp_recall",                           //     projected-space reuse of (a)
      "x_pq_recall",                           //     PQ asymmetric-distance reuse of (a)
      "x_ann_ivfpq_recall",                    //     ground-truth side reuses (a)
      "x_ngram_lm_score",                      // (b) 1-row V scalar into smoothing
      "x_moore_lewis",                         //     two 1-row V scalars (both LMs)
      "x_curriculum_order",                    //     reuses the LM scorer's V scalar
      "x_ccnet_buckets",                       //     reuses the LM scorer's V scalar
      "x_token_budget_plan",                   // (b) 1-row budget-total scalar
      "x_kmv_set_ops",                         // (b) four 1-row sketch scalars
      "x_negative_samples",                    // (b) 1-row corpus-N scalar into offsets
      "x_fts_ranked", "x_temperature_sample",
      "x_passage_rank",                        // chunk-granular reuse of rankedMatch's N scalar
      "x_fts_bm25",                            // (b) 1-row (N, Σdl) stats scalar into idf
      "x_freq_score", "x_embed_quantize",
      "x_mixture_sample",
      "x_tfidf_topk",                          // corpus-N scalar into idf
      "x_collocations",                        // (b) 1-row scalar joins
      "x_dedup_recall",                        // two 1-row count scalars
      "x_keywords",                            // corpus-N scalar into idf
      "x_events_dense_hourly",                 // bounded hour×type axis grid
      "x_events_anomaly",                      // same bounded axis grid
      "x_nb_domain",                           // (b) |labels|-row smoothing grid
      "x_unimax_alloc",                        // (b) |langs|^2 prefix grid + scalars
      "x_doremi_weights",                      //     LM V scalars + |domains|^2 remainder grid
      "x_hist_emd",                            // (b) 1-row totals scalar into bounded 256-bin axis
      "x_shard_skew",                          // 1-row totals scalar
      "x_ppjoin_skew_report",                  // three 1-row summary scalars
      "x_mix_drift")                           // two 1-row snapshot-total scalars
    val failures = scala.collection.mutable.ArrayBuffer.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      val df = fn(spark, dir)
      val p = plan(df).split("== Initial Plan ==").head
      if (p.contains("CartesianProduct"))
        failures += s"$name: CartesianProduct"
      if (p.contains("BroadcastNestedLoopJoin") && !bnljByDesign(name))
        failures += s"$name: BroadcastNestedLoopJoin"
      // a window over SinglePartition serializes the corpus onto one task
      if (p.linesIterator.exists(l => l.contains("Window") && l.contains("SinglePartition")))
        failures += s"$name: single-partition Window"
      // the production guardrail must also be quiet on every graded
      // query (scalar cross joins are bounded-side and pass by design).
      // boundedSampleWindow: the guard flags low-cardinality windows
      // over checkpointed inputs it cannot prove bounded (LogicalRDD
      // has no maxRows); these queries window a <= k-rows-per-group
      // SAMPLE (KMV bottom-k, k=256), not the corpus — bounded by
      // construction, justified here per the PlanGuard.docGrain
      // contract.
      val boundedSampleWindow = Set("x_approx_length_quantiles")
      graft.plans.PlanGuard.findings(df.queryExecution.optimizedPlan)
        .filterNot(_ => bnljByDesign(name))
        .filterNot(f => boundedSampleWindow(name) &&
          f.contains("low-cardinality Window"))
        .foreach(f => failures += s"$name (guard): $f")
    }
    assert(failures.isEmpty, "scale-killer plans:\n" + failures.mkString("\n"))
  }

  test("dup ngram mass: the corpus-scale gram explode is computed once (exchange reuse)") {
    val df = graft.queries.DedupQueries.dupNgramMass(spark, dir)
    // AQE's toString appends the pre-adaptive "Initial Plan" section,
    // which textually duplicates subtrees reuse later collapses — only
    // the final plan reflects what executes
    val p = plan(df).split("== Initial Plan ==").head
    // both consumers of the (doc, gram) table — gram totals and the
    // totals join — must read ONE shuffle of the explode subtree
    // (ReusedExchange), not re-run the corpus-wide kernel pass; the
    // lens pass scans the corpus separately but never shingles
    val kernelPasses = "generate explode\\(shinglehashseq".r
      .findAllIn(p.toLowerCase).size
    assert(kernelPasses === 1,
      s"gram kernel must run exactly once, found $kernelPasses:\n" + p)
    assert(p.contains("ReusedExchange"),
      "perDoc shuffle must be reused by both consumers:\n" + p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("JL projection and PQ encode are shuffle-free narrow transforms") {
    import org.apache.spark.sql.functions.col
    // projection: per-row native compute — no Exchange anywhere
    val proj = graft.operators.RandomProjection.projectVecs(
      graft.Tables.load(spark, dir, "embeddings"), "vec_id", "embedding", 16)
    assert(!plan(proj).contains("Exchange"),
      "sign projection must not shuffle the corpus:\n" + plan(proj))
    // PQ encode against a trained model: literal-centroid assignment,
    // corpus never moves (the flattened (vec_id, sub, code) output is
    // generate + project over the scan)
    val e = graft.Tables.load(spark, dir, "embeddings")
    val model = graft.operators.ProductQuantize.train(e, "vec_id", "embedding",
      m = 2, k = 4, iters = 1, dim = 64)
    val enc = graft.operators.ProductQuantize.encode(e, "vec_id", "embedding", model)
    assert(!plan(enc).contains("Exchange"),
      "PQ encode must not shuffle the corpus:\n" + plan(enc))
  }

  test("blocklist matching broadcast-joins the phrase table; corpus side stays partitioned") {
    import org.apache.spark.sql.functions.col
    val df = graft.queries.CurationQueries.blocklist(spark, dir)
    val hinted = forcedBroadcastSubtrees(df)
    assert(hinted.nonEmpty, "the phrase tables must carry broadcast hints")
    for (sub <- hinted)
      assert(sub.contains("LocalRelation") || sub.contains("phrase"),
        "only the phrase table may be broadcast:\n" + sub)
    assert(plan(df).contains("BroadcastHashJoin"), plan(df))
  }

  test("CMS probe broadcast-joins the constant-size sketch; corpus side stays partitioned") {
    val df = graft.queries.CorpusQueries.cmsFreq(spark, dir)
    val hinted = forcedBroadcastSubtrees(df)
    assert(hinted.nonEmpty, "the sketch side must carry the broadcast hint")
    // the sketch subtree is the depth×width aggregate — never the raw
    // probe/corpus scan
    for (sub <- hinted)
      assert(sub.contains("cell_count"), "only the sketch may be broadcast:\n" + sub)
    val p = plan(df)
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("as-of join is one hash exchange — no range join, no nested loop") {
    import org.apache.spark.sql.functions.col
    val ev = graft.Tables.load(spark, dir, "events")
    val out = graft.operators.AsOf.joinPrior(
      ev.filter(col("event_type") === "purchase").select("event_id", "user_id", "ts"),
      ev.filter(col("event_type") === "error").select("user_id", "ts", "value"),
      "user_id", "ts", Seq("value"))
    // AQE's toString appends the "== Initial Plan ==" section — count
    // exchanges only in the final plan
    val p = plan(out).split("== Initial Plan ==").head
    assert(!p.contains("BroadcastNestedLoopJoin"), "theta range join is the scale-killer:\n" + p)
    assert(!p.contains("CartesianProduct"), p)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
    assert(exchanges === 1, s"expected exactly 1 key shuffle, got $exchanges:\n$p")
  }

  test("bloom membership probe is native might_contain — no ScalaUDF anywhere in the plan") {
    val df = graft.queries.CorpusQueries.bloomMembership(spark, dir)
    val p = plan(df)
    assert(!p.contains("ScalaUDF"),
      "the bloom probe must be Catalyst's BloomFilterMightContain, not a UDF:\n" + p)
    assert(p.contains("might_contain"), "expected the native probe in the plan:\n" + p)
  }

  test("URL canonicalization stays in whole-stage codegen — no UDF, no fallback") {
    val df = graft.queries.CorpusQueries.urlDedup(spark, dir)
    val p = plan(df)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"),
      "canonicalization must be a codegen'd regex chain:\n" + p)
    // AQE plan text marks whole-stage-codegen subtrees "*(n)"
    assert(p.contains("*(") || p.contains("WholeStageCodegen"), p)
  }

  test("interleave schedule: both windows are partitioned — no global rank window") {
    val df = graft.queries.CorpusQueries.interleavePlan(spark, dir)
    val p = plan(df)
    assert(p.contains("Window"), p)
    // the only SinglePartition stage allowed is the bounded (<= 2^bucketBits
    // row) offsets prefix sum inside globalRankBy; the corpus-sized windows
    // must never be single-partition. The offsets subtree is recognizable
    // by its count aggregate over __bucket.
    val windowLines = p.linesIterator.filter(_.contains("Window")).toSeq
    val globalCorpusWindow = windowLines.exists(l =>
      l.contains("SinglePartition") && l.contains("src_rank"))
    assert(!globalCorpusWindow, "corpus rank window must partition:\n" + p)
  }

  test("SFT pipeline: per-conv compute is HOF-narrow; the one window packs per bucket") {
    // The production entry truncates lineage at localCheckpoint, so its
    // plan only shows the pack window. Assert the PRE-checkpoint conv
    // stage separately: the gate + token accounting must be narrow
    // per-row HOF compute — no UDF, no window, no shuffle of its own.
    val pc = plan(graft.queries.CurationQueries.sftConv(spark, dir))
    assert(!pc.contains("BatchEvalPython") && !pc.contains("ScalaUDF"),
      "per-conv compute must stay HOF-narrow:\n" + pc)
    // loadSpread's round-robin spread of the small test file is the one
    // allowed Exchange; no KEYED shuffle and no window may appear
    assert(!pc.contains("Window") && !pc.contains("hashpartitioning") &&
      !pc.contains("rangepartitioning"),
      "per-conv compute must not key-shuffle or window:\n" + pc)
    val df = graft.queries.CurationQueries.sftPipeline(spark, dir)
    val p = plan(df)
    assert(!p.contains("SinglePartition"),
      "pack cumsum must partition by hash bucket:\n" + p)
    assert(!p.contains("BatchEvalPython") && !p.contains("ScalaUDF"), p)
  }
}

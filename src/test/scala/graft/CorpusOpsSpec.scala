package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bloom, EmbedQuantize, ParaDedup, RangeJoin, Shuffle}

/** Round-6 extension operators: range join bucketing semantics,
  * deterministic global shuffle order, Bloom-prefiltered membership.
  */
class CorpusOpsSpec extends SparkSpec {
  import spark.implicits._

  // ---------------- RangeJoin ----------------

  test("pointInInterval: inclusive start, exclusive end, bucket-crossing intervals") {
    val points = Seq(
      (1L, 0L), (2L, 999L), (3L, 1000L), (4L, 5500L), (5L, 9999L),
      (6L, 10000L), (7L, 12345L)
    ).toDF("pid", "ts_ms")
    // bucketMs=1000 so the [1000, 10000) interval spans 9 buckets
    val intervals = Seq(
      (10L, 1000L, 10000L),  // matches 3,4,5 (not 2: starts at 1000; not 6: end exclusive)
      (20L, 0L, 1L),         // single-point interval: matches only ts=0
      (30L, 12345L, 12346L), // matches exactly point 7
      (40L, 7L, 7L)          // empty interval: matches nothing
    ).toDF("wid", "start_ms", "end_ms")
    val got = RangeJoin
      .pointInInterval(points, intervals, "ts_ms", "start_ms", "end_ms", bucketMs = 1000L)
      .select("wid", "pid").as[(Long, Long)].collect().toSet
    assert(got === Set((10L, 3L), (10L, 4L), (10L, 5L), (20L, 1L), (30L, 7L)))
  }

  test("pointInInterval: overlapping intervals each match; no duplicate pairs") {
    val points = Seq((1L, 500L)).toDF("pid", "ts_ms")
    val intervals = Seq((10L, 0L, 1000L), (20L, 400L, 600L), (30L, 501L, 700L))
      .toDF("wid", "start_ms", "end_ms")
    val got = RangeJoin
      .pointInInterval(points, intervals, "ts_ms", "start_ms", "end_ms", bucketMs = 100L)
      .select("wid", "pid").as[(Long, Long)].collect().toList.sorted
    // one row per containing interval, exactly once despite multi-bucket explode
    assert(got === List((10L, 1L), (20L, 1L)))
  }

  test("pointInInterval agrees with the naive theta join on a seeded stream") {
    val rnd = new scala.util.Random(42)
    val points = Seq.tabulate(300)(i => (i.toLong, rnd.nextInt(100000).toLong))
      .toDF("pid", "ts_ms")
    val intervals = Seq.tabulate(40) { i =>
      val s = rnd.nextInt(100000).toLong
      (i.toLong, s, s + rnd.nextInt(5000).toLong)
    }.toDF("wid", "start_ms", "end_ms")
    val bucketed = RangeJoin
      .pointInInterval(points, intervals, "ts_ms", "start_ms", "end_ms", bucketMs = 777L)
      .select("wid", "pid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
        $"ts_ms" >= $"start_ms" && $"ts_ms" < $"end_ms")
      .select("wid", "pid").as[(Long, Long)].collect().toSet
    assert(bucketed === naive)
  }

  test("intervalOverlap agrees with the naive theta join, one row per pair") {
    val rnd = new scala.util.Random(7)
    val ls = Seq.tabulate(60) { i =>
      val s = rnd.nextInt(50000).toLong; (i.toLong, s, s + 1 + rnd.nextInt(8000).toLong)
    }.toDF("lid", "l_start", "l_end")
    val rs = Seq.tabulate(40) { i =>
      val s = rnd.nextInt(50000).toLong; (i.toLong, s, s + 1 + rnd.nextInt(8000).toLong)
    }.toDF("rid", "r_start", "r_end")
    val bucketed = RangeJoin
      .intervalOverlap(ls, rs, "l_start", "l_end", "r_start", "r_end", bucketMs = 777L)
      .select("lid", "rid").as[(Long, Long)].collect().toList
    val naive = ls.join(rs, $"l_start" < $"r_end" && $"r_start" < $"l_end")
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(bucketed.toSet === naive)
    assert(bucketed.length === bucketed.toSet.size,
      "each overlapping pair must be emitted exactly once (first-bucket rule)")
  }

  test("intervalOverlap: touching intervals (end == start) do not match; empty intervals never match") {
    val ls = Seq((1L, 0L, 1000L), (2L, 5L, 5L)).toDF("lid", "l_start", "l_end")
    val rs = Seq((10L, 1000L, 2000L), (20L, 999L, 1001L)).toDF("rid", "r_start", "r_end")
    val got = RangeJoin
      .intervalOverlap(ls, rs, "l_start", "l_end", "r_start", "r_end", bucketMs = 100L)
      .select("lid", "rid").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 20L))) // [0,1000) meets [999,1001); not [1000,2000)
  }

  // ---------------- Shuffle.globalOrderIndex ----------------

  test("globalOrderIndex matches the single-partition window rank") {
    val df = (1L to 1000L).toDF("id")
    val got = Shuffle.globalOrderIndex(df, "id", seed = 7L, tieBreak = "id")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    // naive: rank of the same hash in a global sort
    val naive = df
      .withColumn("h", graft.functions.PortableHash.hash60Seeded(lit(7L), col("id")))
      .orderBy("h", "id").select("id").as[Long].collect()
      .zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
    assert(got === naive)
    // positions are a permutation of 1..n
    assert(got.values.toSet === (1L to 1000L).toSet)
  }

  test("positionalNegatives: exactly k distinct non-self negatives per query, seeded, partition-invariant") {
    val df = (1L to 500L).toDF("id")
    val out = graft.operators.Sampling
      .positionalNegatives(df, "id", isQuery = _ % 100 === 0, k = 4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byQ = out.groupBy(_._1)
    assert(byQ.keySet === Set(100L, 200L, 300L, 400L, 500L))
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L, 4L)) // ranks 1..k
      assert(rows.map(_._3).distinct.length === 4)                // negatives distinct
      assert(!rows.exists(_._3 == q))                             // never the query itself
    }
    // deterministic under repartitioning; seed changes the draw
    val again = graft.operators.Sampling
      .positionalNegatives(df.repartition(7), "id", isQuery = _ % 100 === 0, k = 4, seed = 7L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sorted.toSeq === again.sorted.toSeq)
    val other = graft.operators.Sampling
      .positionalNegatives(df, "id", isQuery = _ % 100 === 0, k = 4, seed = 8L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.sorted.toSeq !== other.sorted.toSeq)
  }

  test("prioritySample: weight-proportional draw, deterministic, loud on zero weight") {
    // 500 light rows (w=1) + 500 heavy rows (w=100): the heavy half
    // must dominate a k=100 sample (E[heavy] ≈ 99)
    val df = (1L to 1000L).map(i => (i, if (i > 500) 100L else 1L))
      .toDF("id", "w")
    val s = graft.operators.Sampling.prioritySample(df, "w", "id", k = 100)
    val picked = s.select("id").as[Long].collect()
    assert(picked.length === 100)
    val heavy = picked.count(_ > 500)
    assert(heavy > 80, s"heavy rows should dominate, got $heavy/100")
    // deterministic under repartitioning
    val again = graft.operators.Sampling
      .prioritySample(df.repartition(9), "w", "id", k = 100)
      .select("id", "sample_rank").collect().map(_.toSeq).toSet
    assert(again === s.select("id", "sample_rank").collect().map(_.toSeq).toSet)
    // zero weight fails loudly, never silently dominates
    val err = intercept[Exception] {
      graft.operators.Sampling.prioritySample(
        Seq((1L, 0L), (2L, 5L)).toDF("id", "w"), "w", "id", k = 1).collect()
    }
    assert(err.getMessage.contains("non-positive weight"))
  }

  test("positionalNegatives matches a driver-side reference model across random sizes (seeded)") {
    def h60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val rnd = new scala.util.Random(42)
    for (_ <- 1 to 3) {
      val n = 20 + rnd.nextInt(180)
      val k = 1 + rnd.nextInt(6)
      val seed = 1L + rnd.nextInt(100)
      val ids = (1L to n.toLong)
      val order = ids.sortBy(id => (h60(s"$seed:$id"), id))
      val pos = order.zipWithIndex.map { case (id, i) => id -> (i + 1L) }.toMap
      val byPos = order.zipWithIndex.map { case (id, i) => (i + 1L) -> id }.toMap
      val stride = n.toLong / (k + 1)
      val expected = (for {
        q <- ids if q % 10 == 0
        i <- 1 to k
        np = ((pos(q) - 1 + i * stride) % n) + 1
        nid = byPos(np) if nid != q
      } yield (q, i.toLong, nid)).sorted
      val got = graft.operators.Sampling
        .positionalNegatives(ids.toDF("id"), "id", _ % 10 === 0, k, seed)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted
      assert(got.toSeq === expected.toSeq, s"n=$n k=$k seed=$seed")
    }
  }

  test("globalOrderIndex is seed-sensitive and partitioning-invariant") {
    val df = (1L to 200L).toDF("id")
    val a = Shuffle.globalOrderIndex(df, "id", seed = 1L, tieBreak = "id")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val b = Shuffle.globalOrderIndex(df.repartition(7), "id", seed = 1L, tieBreak = "id")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    val c = Shuffle.globalOrderIndex(df, "id", seed = 2L, tieBreak = "id")
      .select("id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(a === b)      // same seed: identical order however the input is split
    assert(a !== c)      // different seed: different permutation
  }

  test("globalOrderIndex plan has no single-partition global window") {
    val df = (1L to 100L).toDF("id")
    val out = Shuffle.globalOrderIndex(df, "id", seed = 7L, tieBreak = "id")
    val windows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    // the only unpartitioned window runs over the ≤2^bucketBits bucket
    // counts, never over the data itself: every data-side window is
    // partitioned by bucket
    val dataWindows = windows.filter(_.partitionSpec.nonEmpty)
    val globalWindows = windows.filter(_.partitionSpec.isEmpty)
    assert(dataWindows.nonEmpty)
    assert(globalWindows.forall(
      _.child.maxRows.forall(_ <= (1L << 12))) || globalWindows.isEmpty)
  }

  test("pointInInterval: negative epoch times bucket correctly (floor, not truncate)") {
    val points = Seq((1L, -1500L), (2L, -1000L), (3L, -1L), (4L, 0L)).toDF("pid", "ts_ms")
    val intervals = Seq((10L, -1500L, -999L), (20L, -500L, 1L)).toDF("wid", "start_ms", "end_ms")
    val got = RangeJoin
      .pointInInterval(points, intervals, "ts_ms", "start_ms", "end_ms", bucketMs = 1000L)
      .select("wid", "pid").as[(Long, Long)].collect().toSet
    val naive = points.join(intervals,
        $"ts_ms" >= $"start_ms" && $"ts_ms" < $"end_ms")
      .select("wid", "pid").as[(Long, Long)].collect().toSet
    assert(got === naive)
    assert(got === Set((10L, 1L), (10L, 2L), (20L, 3L), (20L, 4L)))
  }

  test("Bloom.membership with an empty set keeps nothing") {
    val corpus = (1L to 100L).map(i => (i, i)).toDF("id", "key")
    val empty = Seq.empty[Long].toDF("k")
    assert(Bloom.membership(corpus, "key", empty, "k").count() === 0L)
  }

  // ---------------- Sampling.mixtureSample ----------------

  test("mixtureSample: weight-0 source is excluded entirely") {
    import graft.operators.Sampling
    val docs = ((1 to 100).map(i => (i.toLong, "keep", s"d $i")) ++
      (1 to 100).map(i => (i.toLong + 1000, "drop", s"e $i")))
      .toDF("doc_id", "source", "text")
    val kept = Sampling.mixtureSample(docs, "source", "text",
        src => when(src === "keep", 1L).otherwise(0L),
        budgetNum = 1, budgetDen = 2)
      .select("source").distinct().as[String].collect().toSet
    assert(kept === Set("keep"))
  }

  test("mixtureSample: rates follow target weights; over-weighted tiny source caps at keep-all") {
    import graft.operators.Sampling
    // source A: 4000 docs weight 1; source B: 40 docs weight 20 ->
    // budget 1/2 of 4040 = 2020; z = 21; target_B = 2020*20/21 = 1923 >
    // 40 -> keep rate caps at 100% for B
    val docs = ((1 to 4000).map(i => (i.toLong, "A", s"doc a $i")) ++
      (1 to 40).map(i => (i.toLong + 10000, "B", s"doc b $i")))
      .toDF("doc_id", "source", "text")
    val kept = Sampling.mixtureSample(docs, "source", "text",
        src => when(src === "A", 1L).otherwise(20L),
        budgetNum = 1, budgetDen = 2)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(kept("B") === 40L, "capped source must keep every doc")
    // A targets 2020*1/21 ≈ 96 docs of 4000 ≈ 2.4% -> keep_buckets 240/10000
    assert(kept("A") > 40L && kept("A") < 200L,
      s"source A should keep ~96 docs, kept ${kept("A")}")
  }

  test("unimaxAlloc: capped prefix, exact budget conservation, remainder to first uncapped") {
    import graft.operators.Sampling
    // caps (x2): a=20, b=40, c=200; budget = (130*3) div 2 = 195
    // j=1 (a): 20*3 + 0 = 60 <= 195  -> capped
    // j=2 (b): 40*2 + 20 = 100 <= 195 -> capped
    // j=3 (c): 200*1 + 60 = 260 > 195 -> uncapped, gets 195-60 = 135
    val perGroup = Seq(("a", 5L, 10L), ("b", 9L, 20L), ("c", 50L, 100L))
      .toDF("lang", "n_docs", "n_tokens")
    val out = Sampling.unimaxAlloc(perGroup, "lang", epochCap = 2,
        budgetNum = 3L, budgetDen = 2L)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("alloc_tok"), r.getAs[Long]("capped"),
         r.getAs[Long]("epochs_ppm"))).toMap
    assert(out("a") === ((20L, 1L, 2000000L)))
    assert(out("b") === ((40L, 1L, 2000000L)))
    assert(out("c") === ((135L, 0L, 1350000L)))
    assert(out.values.map(_._1).sum === 195L, "allocations sum to the budget")
    // remainder distribution: two uncapped groups with equal caps split
    // an odd remainder deterministically (first in sort order gets +1)
    val perG2 = Seq(("x", 1L, 100L), ("y", 1L, 100L), ("z", 1L, 1L))
      .toDF("lang", "n_docs", "n_tokens")
    // budget = (201*3) div 2 = 301; z capped at 2; remaining 299 over
    // x,y -> 149 each, remainder 1 -> x gets 150
    val out2 = Sampling.unimaxAlloc(perG2, "lang", epochCap = 2,
        budgetNum = 3L, budgetDen = 2L)
      .collect().map(r => r.getAs[String]("lang") -> r.getAs[Long]("alloc_tok")).toMap
    assert(out2("z") === 2L)
    assert(out2("x") === 150L && out2("y") === 149L, s"got $out2")
    assert(out2.values.sum === 301L)
  }

  test("unimaxAlloc: zero-token group allocates zero with epochs_ppm 0, never NULL") {
    import graft.operators.Sampling
    val perGroup = Seq(("a", 3L, 0L), ("b", 9L, 20L))
      .toDF("lang", "n_docs", "n_tokens")
    val out = Sampling.unimaxAlloc(perGroup, "lang", epochCap = 2,
        budgetNum = 1L, budgetDen = 1L)
      .collect().map(r => r.getAs[String]("lang") ->
        (r.getAs[Long]("alloc_tok"), r.getAs[Any]("epochs_ppm"))).toMap
    // cap = 0 -> capped at 0 tokens; the guarded division yields 0L,
    // not NULL (DuckDB's // would error on the unguarded spelling)
    assert(out("a") === ((0L, 0L)))
    assert(out("b")._1 === 20L)
  }

  test("doremiWeights: weights sum to exactly 1e6 and lift the excess-likelihood domain above its share") {
    val rows = graft.queries.CorpusQueries
      .doremiWeights(spark, "/root/testdata/sf0.001").collect()
    val bySrc = rows.map(r => r.getAs[String]("source") ->
      (r.getAs[Long]("n_bigrams"), r.getAs[Long]("excess_ppm"),
       r.getAs[Long]("weight_ppm"))).toMap
    assert(rows.map(_.getAs[Long]("weight_ppm")).sum === 1000000L,
      "largest-remainder normalization must conserve the ppm budget exactly")
    assert(rows.forall(_.getAs[Long]("weight_ppm") >= 0L))
    // src0 is the in-domain slice: its documents score highest under
    // their own reference LM, so its excess (and weight vs token share)
    // must dominate
    val tokTot = rows.map(_.getAs[Long]("n_bigrams")).sum
    val (nb0, ex0, w0) = bySrc("src0")
    assert(ex0 === rows.map(_.getAs[Long]("excess_ppm")).max,
      s"in-domain source must carry the max excess: $bySrc")
    assert(w0 > (1000000L * nb0) / tokTot,
      s"src0 weight $w0 must exceed its raw token share: $bySrc")
  }

  test("ngramNovelty: monotone first-seen semantics — doc 0 is all-novel, totals match distinct grams") {
    val rows = graft.queries.CorpusQueries
      .ngramNovelty(spark, "/root/testdata/sf0.001").collect()
    val first = rows.minBy(_.getAs[Long]("doc_id"))
    assert(first.getAs[Long]("novelty_ppm") === 1000000L,
      "the first document's grams are all first appearances")
    assert(rows.forall(r =>
      r.getAs[Long]("n_novel") <= r.getAs[Long]("n_grams")))
    // every distinct corpus gram is novel in exactly one doc
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val distinctGrams = docs.select(explode(graft.operators.TextDedup
        .shingleHashes(col("text"), 3)).as("g"))
      .distinct().count()
    assert(rows.map(_.getAs[Long]("n_novel")).sum === distinctGrams,
      "sum of per-doc novel grams must equal the corpus distinct-gram count")
  }

  test("ngramNoveltyIncr: only the new batch is scored and new-gram ratios stay in range") {
    val rows = graft.queries.CorpusQueries
      .ngramNoveltyIncr(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Long]("doc_id") >= 250L),
      "only the new batch is scored")
    assert(rows.forall(r => r.getAs[Long]("n_new") <= r.getAs[Long]("n_grams")))
    // incremental vs full-history consistency: a batch doc's n_new can
    // never EXCEED its full-corpus first-seen novel count restricted to
    // history grams... the cheap invariant that holds by construction:
    // new_ppm in [0, 1e6]
    assert(rows.forall(r => {
      val p = r.getAs[Long]("new_ppm"); p >= 0L && p <= 1000000L
    }))
  }

  test("rendezvousShards: k->k+1 moves documents ONLY to the new shard, at roughly 1/(k+1) rate") {
    val rows = graft.queries.CorpusQueries
      .rendezvousShards(spark, "/root/testdata/sf0.001").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("shard_old") >= 0 &&
      r.getAs[Long]("shard_old") < 4))
    assert(rows.forall(r => r.getAs[Long]("shard_new") >= 0 &&
      r.getAs[Long]("shard_new") < 5))
    // the HRW property that justifies the operator: a doc whose argmax
    // changed can only have been beaten by the NEW shard's hash —
    // old-shard relative order is untouched
    val movers = rows.filter(_.getAs[Long]("moved") == 1L)
    assert(movers.forall(_.getAs[Long]("shard_new") === 4L),
      "growing k must move docs only to the new shard")
    // move rate ~ 1/5 of the corpus (uniform hashes); generous bounds
    val rate = movers.length.toDouble / rows.length
    assert(rate > 0.10 && rate < 0.35, s"move rate $rate")
    // unmoved docs keep their exact old assignment
    assert(rows.filter(_.getAs[Long]("moved") == 0L)
      .forall(r => r.getAs[Long]("shard_old") === r.getAs[Long]("shard_new")))
  }

  test("unimaxAlloc invariants hold across a deterministic fixture sweep") {
    import graft.operators.Sampling
    // 6 fixtures from a fixed LCG: group counts 2..7, sizes 1..1000
    var seed = 42L
    def next(bound: Long): Long = { seed = (seed * 6364136223846793005L + 1442695040888963407L) & Long.MaxValue; seed % bound }
    for (caseIdx <- 1 to 6) {
      val nGroups = (2 + next(6)).toInt
      val rows = (0 until nGroups).map(i => (s"g$i", 1L + next(50), 1L + next(1000)))
      val perGroup = rows.toDF("lang", "n_docs", "n_tokens")
      val epochCap = (1 + next(3)).toInt
      val out = Sampling.unimaxAlloc(perGroup, "lang", epochCap,
          budgetNum = 3L, budgetDen = 2L)
        .collect().map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_tokens"),
          r.getAs[Long]("cap_tok"), r.getAs[Long]("alloc_tok"), r.getAs[Long]("capped")))
      val total = rows.map(_._3).sum
      val budget = total * 3 / 2
      val capSum = out.map(_._3).sum
      // conservation: allocations sum to min(B, sum of caps)
      assert(out.map(_._4).sum === math.min(budget, capSum),
        s"case $caseIdx: $out budget=$budget")
      // never exceed the cap; capped groups get exactly their cap
      for ((g, _, cap, alloc, capped) <- out) {
        assert(alloc <= cap, s"case $caseIdx $g: alloc $alloc > cap $cap")
        if (capped == 1L) assert(alloc === cap, s"case $caseIdx $g")
      }
      // the capped set is a prefix of the cap-ascending order
      val sorted = out.sortBy(r => (r._3, r._1))
      val flags = sorted.map(_._5)
      assert(!flags.sliding(2).exists(p => p.length == 2 && p(0) == 0L && p(1) == 1L),
        s"case $caseIdx: capped set not a prefix: $sorted")
    }
  }

  test("Normalize.clean: NFC composes, whitespace collapses, case folds") {
    import graft.operators.Normalize
    val decomposed = "Cafe\u0301  \t X "  // e + combining acute (2 codepoints)
    val got = Seq(decomposed, "  a  b  ", "E\u0301")
      .toDF("t").select(Normalize.clean(col("t"))).as[String].collect().toList
    assert(got === List("caf\u00e9 x", "a b", "\u00e9"))
    assert(got.head.length === 6) // composes to single-codepoint \u00e9
  }

  test("charTrigrams: multiplicity kept, short strings yield none") {
    import graft.operators.TextStats
    val got = Seq("abcab", "ab", "", "xyz")
      .toDF("t").select(TextStats.charTrigrams(col("t")).as("g"))
      .as[Seq[String]].collect().toList
    assert(got === List(Seq("abc", "bca", "cab"), Seq(), Seq(), Seq("xyz")))
  }

  test("LSH index round-trips through parquet; incremental pairs match direct computation") {
    import graft.operators.TextDedup
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely unrelated text about databases and shuffles here"))
      .toDF("doc_id", "text")
    val batch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog today"), // near-dup of 1
      (11L, "nothing like anything seen before in this tiny corpus"))
      .toDF("doc_id", "text")
    val direct = TextDedup.minhashPairsIncremental(batch, existing, "doc_id", "text")
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("graft-lshidx").toString + "/idx"
    TextDedup.lshIndex(existing, "doc_id", "text").write.partitionBy("band").parquet(dir)
    val viaDisk = TextDedup
      .minhashPairsAgainstIndex(batch, spark.read.parquet(dir), "doc_id", "text")
      .select("new_id", "old_id").as[(Long, Long)].collect().toSet
    assert(viaDisk === direct)
    assert(direct.contains((10L, 1L)), "the planted near-dup must be found")
  }

  // ---------------- HeavyHitters (Misra-Gries) ----------------

  test("Misra-Gries: true heavy hitters survive with bounded undercount; state <= k") {
    import graft.operators.HeavyHitters
    val k = 8
    // skewed stream: 'hot' x 400, 'warm' x 150, 1000 singletons; n = 1550
    val items = (Seq.fill(400)("hot") ++ Seq.fill(150)("warm") ++
      (1 to 1000).map(i => s"u$i"))
    val df = scala.util.Random.shuffle(items).toDF("term").repartition(7)
    val m = df.agg(HeavyHitters.sketch(col("term"), k).as("hh"))
      .select(explode(col("hh"))).as[(String, Long)].collect().toMap
    val n = items.length
    assert(m.size <= k, s"summary must hold <= $k counters, got ${m.size}")
    // guarantee: count > n/(k+1) => present, estimate >= true - n/(k+1)
    assert(m.contains("hot") && m("hot") >= 400L - n / (k + 1) && m("hot") <= 400L)
    assert(m.getOrElse("warm", 0L) <= 150L)
  }

  test("Misra-Gries: merge keeps the bound under any partitioning") {
    import graft.operators.HeavyHitters
    val k = 4
    val items = Seq.fill(300)("dominant") ++ (1 to 200).map(i => s"noise$i")
    for (parts <- Seq(1, 3, 13)) {
      val m = items.toDF("term").repartition(parts)
        .agg(HeavyHitters.sketch(col("term"), k).as("hh"))
        .select(explode(col("hh"))).as[(String, Long)].collect().toMap
      val slack = items.length / (k + 1)
      assert(m.contains("dominant"),
        s"dominant (300 of ${items.length} > n/(k+1)=$slack) must survive at $parts partitions")
      assert(m("dominant") >= 300L - slack && m("dominant") <= 300L)
    }
  }

  // ---------------- approx quantiles bound ----------------

  test("approx length quantiles track the exact percentiles") {
    val dir = "/root/testdata/sf0.001"
    val approx = graft.queries.CorpusQueries
      .approxLengthQuantiles(spark, dir)
      .select("lang", "p50_tokens").as[(String, Long)].collect().toMap
    val exact = graft.queries.DedupQueries.lengthQuantiles(spark, dir)
      .select("lang", "p50_tokens").as[(String, Double)].collect().toMap
    exact.foreach { case (lang, p50) =>
      assert(math.abs(approx(lang) - p50) <= math.max(2.0, p50 * 0.05),
        s"$lang: approx p50 ${approx(lang)} vs exact $p50")
    }
  }

  // ---------------- Bloom ----------------

  test("Bloom.membership returns the exact member set (no false positives)") {
    val corpus = (1L to 5000L).map(i => (i, i % 100)).toDF("id", "key")
    val set = Seq(3L, 7L, 999L).toDF("k")  // 999 matches nothing (keys are 0..99)
    val got = Bloom.membership(corpus, "key", set, "k",
        expectedItems = 100L, fpp = 0.01)
      .select("id").as[Long].collect().toSet
    val expected = (1L to 5000L).filter(i => i % 100 == 3 || i % 100 == 7).toSet
    assert(got === expected)
  }

  // ---------------- ParaDedup ----------------

  test("dedupBlocks: repeated blocks keep only their global first occurrence") {
    // 4-token blocks; doc 1 and doc 3 share their first block, doc 2 is
    // an exact clone of doc 1, doc 4 is unique.
    val docs = Seq(
      (1L, "a b c d e f g h"),      // blocks: [a b c d] [e f g h]
      (2L, "a b c d e f g h"),      // exact clone -> nothing survives
      (3L, "a b c d x y z w"),      // first block repeats doc 1's
      (4L, "p q r s")               // unique single block
    ).toDF("doc_id", "text")
    val got = ParaDedup.dedupBlocks(docs, "doc_id", "text", blockTokens = 4)
      .select("doc_id", "n_blocks", "n_kept", "clean_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toList
    assert(got === List(
      (1L, 2L, 2L, "a b c d e f g h"),
      (2L, 2L, 0L, ""),
      (3L, 2L, 1L, "x y z w"),
      (4L, 1L, 1L, "p q r s")))
  }

  test("dedupBlocks: within-doc repeats collapse; order preserved across gaps") {
    val docs = Seq((7L, "a a a a b b b b a a a a c c c c")).toDF("doc_id", "text")
    val got = ParaDedup.dedupBlocks(docs, "doc_id", "text", blockTokens = 4)
      .select("n_blocks", "n_kept", "clean_text")
      .as[(Long, Long, String)].head()
    assert(got === ((4L, 3L, "a a a a b b b b c c c c")))
  }

  // ---------------- EmbedQuantize ----------------

  test("int8Codes: affine codes span [-128, 127], constant dims code to 0") {
    val vecs = Seq(
      (1L, Array(0.0f, 5.0f, 1.0f)),
      (2L, Array(1.0f, 5.0f, 2.0f)),
      (3L, Array(2.0f, 5.0f, 3.0f))
    ).toDF("vec_id", "embedding")
    val got = EmbedQuantize.int8Codes(vecs, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect().toSet
    // dim 0: range [0,2000] -> codes -128, -1 (1000*255 div 2000 = 127), 127
    // dim 1: constant -> 0; dim 2: same spread as dim 0
    assert(got === Set(
      (1L, 0L, -128L), (1L, 1L, 0L), (1L, 2L, -128L),
      (2L, 0L, -1L), (2L, 1L, 0L), (2L, 2L, -1L),
      (3L, 0L, 127L), (3L, 1L, 0L), (3L, 2L, 127L)))
  }

  test("int8Codes plan: encode pass is narrow (scales broadcast, no per-vector shuffle)") {
    val vecs = Seq((1L, Array(0.0f, 1.0f)), (2L, Array(1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val p = EmbedQuantize.int8Codes(vecs, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastExchange"),
      s"scales must broadcast, got:\n$p")
  }

  test("Bloom filter round-trips through disk (cross-run blocklist artifact)") {
    val bf = Bloom.buildLong(Seq(11L, 22L, 33L).toDF("k"), "k",
      expectedItems = 100L, fpp = 0.01)
    val path = java.nio.file.Files.createTempDirectory("graft-bloom")
      .resolve("blocklist.bloom").toString
    Bloom.save(bf, path)
    val back = Bloom.load(path)
    assert(Seq(11L, 22L, 33L).forall(back.mightContainLong))
    assert(back.bitSize() === bf.bitSize())
    val corpus = (1L to 50L).map(i => (i, i)).toDF("id", "key")
    val kept = corpus.filter(Bloom.mightContainLong(back, col("key")))
      .join(Seq(11L, 22L, 33L).toDF("key"), Seq("key"), "left_semi")
      .select("id").as[Long].collect().toSet
    assert(kept === Set(11L, 22L, 33L))
  }

  test("chunking round-trip: stride == chunkTokens reassembles the tokenized text") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select($"doc_id".cast("long").as("doc_id"), $"text")
    val reassembled = graft.operators.Chunk
      .chunkDocs(docs, "doc_id", "text", chunkTokens = 64, stride = 64)
      .groupBy("doc_id")
      .agg(concat_ws(" ",
        array_compact(transform(
          array_sort(collect_list(struct($"chunk_no", $"chunk_text"))),
          s => when(s("chunk_text") =!= "", s("chunk_text"))))).as("rebuilt"))
    val original = docs.select($"doc_id",
      concat_ws(" ", graft.operators.Fts.tokens(Seq($"text"))).as("toks"))
    val mismatches = reassembled.join(original, "doc_id")
      .filter($"rebuilt" =!= $"toks").count()
    assert(mismatches === 0L)
  }

  test("Bloom prefilter prunes: non-members mostly rejected before the join") {
    val bf = Bloom.buildLong(Seq(1L, 2L, 3L).toDF("k"), "k",
      expectedItems = 1000L, fpp = 0.001)
    assert(bf.mightContainLong(1L) && bf.mightContainLong(2L) && bf.mightContainLong(3L))
    val falsePos = (1000L to 11000L).count(bf.mightContainLong)
    assert(falsePos < 100, s"bloom at fpp=0.001 should prune ~all of 10k non-members, kept $falsePos")
  }

  // ---------------- Dsir ----------------

  test("Dsir.score: disjoint vocabularies separate cleanly; mixed doc scores between") {
    // target talks about stars, raw about fish; one mixed doc half-half
    val docs = Seq(
      (1L, "star nebula galaxy star comet", "wiki"),
      (2L, "nebula comet star galaxy galaxy", "wiki"),
      (3L, "fish trout salmon fish eel", "web"),
      (4L, "salmon eel trout trout fish", "web"),
      (5L, "star galaxy fish trout", "web")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.Dsir.score(docs, col("source") === "wiki")
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3))).toMap
    // target-exclusive terms weigh 1e6*(t+1)/(t+2); star/galaxy leak into
    // the mixed doc 5, pulling pure-target docs to ~0.7e6 (doc 1 exact:
    // (2*666666 + 750000 + 666666 + 750000) div 5 = 699999)
    assert(out(1L)._1 > 650000L && out(2L)._1 > 650000L)
    assert(out(3L)._1 < 300000L && out(4L)._1 < 300000L)
    assert(out(5L)._1 > out(3L)._1 && out(5L)._1 < out(1L)._1)
    assert(out(1L)._2 === 1L && out(3L)._2 === 0L)
  }

  test("Dsir weights: parquet round-trip; applyWeights reproduces score; unseen buckets neutral") {
    val docs = Seq(
      (1L, "star nebula galaxy star comet", "wiki"),
      (2L, "nebula comet star galaxy galaxy", "wiki"),
      (3L, "fish trout salmon fish eel", "web"),
      (4L, "salmon eel trout trout fish", "web"),
      (5L, "star galaxy fish trout", "web")
    ).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("dsir-model").toString
    graft.operators.Dsir.weights(docs, col("source") === "wiki")
      .write.mode("overwrite").parquet(s"$dir/w.parquet")
    val model = spark.read.parquet(s"$dir/w.parquet")
    val applied = graft.operators.Dsir.applyWeights(docs, model)
      .collect().map(_.toSeq).toSeq
    val scored = graft.operators.Dsir.score(docs, col("source") === "wiki")
      .collect().map(_.toSeq).toSeq
    assert(applied === scored)
    // a batch of entirely novel vocabulary sits at the neutral prior
    val novel = Seq((9L, "zzz yyy xxx", "new")).toDF("doc_id", "text", "source")
    val out = graft.operators.Dsir.applyWeights(novel, model).collect()
    assert(out.length === 1 && out(0).getLong(2) === 500000L && out(0).getLong(3) === 1L)
  }

  test("Dsir.score: zero-token docs drop; scores invariant to corpus partitioning") {
    val docs = Seq(
      (1L, "alpha beta gamma", "t"), (2L, "", "r"), (3L, "alpha delta", "r"))
      .toDF("doc_id", "text", "source")
    val a = graft.operators.Dsir.score(docs, col("source") === "t").collect()
    val b = graft.operators.Dsir.score(docs.repartition(7), col("source") === "t")
      .collect()
    assert(a.map(_.getLong(0)).toSeq === Seq(1L, 3L)) // doc 2 has no tokens
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  test("Profile.table: exact per-column cells including nulls and bounds") {
    val df = Seq(
      (1L, "alpha", Some(10L)), (2L, "bb", None), (3L, "alpha", Some(30L)))
      .toDF("id", "name", "score")
      .select($"id", $"name", $"score".cast("long").as("score"))
    val out = graft.operators.Profile.table(df, Seq("id", "name", "score"))
      .collect().map(r => r.getString(0) -> r.toSeq.tail).toMap
    assert(out("id") === Seq(3L, 0L, 3L, 1L, 3L, null, null))
    assert(out("name") === Seq(3L, 0L, 2L, null, null, 2L, 5L))
    assert(out("score") === Seq(3L, 1L, 2L, 10L, 30L, null, null))
  }

  test("readabilityCounts: hand-computed Flesch inputs; empty text total") {
    val df = Seq((1L, "the cat sat. it ran!"), (2L, "")).toDF("doc_id", "text")
      .select($"doc_id", graft.operators.TextStats.readabilityCounts($"text").as("r"))
      .select($"doc_id", $"r.n_words", $"r.n_sentences", $"r.n_syllables")
      .withColumn("flesch_e3",
        expr("206835 - (1015 * n_words) div n_sentences - (84600 * n_syllables) div n_words"))
    val out = df.collect().map(r => r.getLong(0) ->
      (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // doc 1: 5 words, 2 sentences, 5 vowel-group syllables
    //   206835 - (1015*5) div 2 - (84600*5) div 5 = 206835 - 2537 - 84600
    assert(out(1L) === ((5L, 2L, 5L, 119698L)))
    // empty text: floors make the score total (w=1, s=1, sy=0)
    assert(out(2L) === ((1L, 1L, 0L, 205820L)))
  }

  // ---------------- NgramLm ----------------

  test("NgramLm.score: fluent in-domain text scores above garbled; exact integer values") {
    val docs = Seq(
      (1L, "the star shines the star glows", "wiki"),
      (2L, "the star fades", "wiki"),
      (3L, "purple monkey dishwasher", "web"),
      (4L, "the star shines", "web")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.NgramLm.score(docs, col("source") === "wiki")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // model: c2(the,star)=3 c2(star,shines)=1 c2(shines,the)=1
    //        c2(star,glows)=1 c2(star,fades)=1; c1(the)=3 c1(star)=3
    //        c1(shines)=1; V=5
    // doc4 = ((1e6*4 div 8) + (1e6*2 div 8)) div 2 = 375000
    // doc3 = both contexts unseen -> 1e6 div 5 = 200000
    // doc1 = (2*500000 + 250000 + 333333 + 250000) div 5 = 366666
    assert(out(4L) === ((2L, 375000L)))
    assert(out(3L) === ((2L, 200000L)))
    assert(out(1L) === ((5L, 366666L)))
    assert(out(4L)._2 > out(3L)._2)
  }

  test("NgramLm.contrastScore: Moore-Lewis delta separates domain fit from fluency") {
    val docs = Seq(
      (1L, "the star shines the star glows", "wiki"),
      (2L, "the star fades", "wiki"),
      (3L, "purple monkey dishwasher", "web"),
      (4L, "the star shines", "web"),
      (5L, "purple monkey dishwasher purple monkey dishwasher", "web")
    ).toDF("doc_id", "text", "source")
    val out = graft.operators.NgramLm
      .contrastScore(docs, col("source") === "wiki")
      .collect().map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("lm_in_ppm"), r.getAs[Long]("lm_gen_ppm"),
         r.getAs[Long]("ml_delta_ppm"))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    for ((id, (in, gen, d)) <- out) assert(d === in - gen, s"doc $id")
    // in-domain phrasing: the in-LM should like doc 4 at least as much
    // relative to the general LM than the off-domain docs 3/5
    assert(out(4L)._3 > out(3L)._3, s"4=${out(4L)} 3=${out(3L)}")
    assert(out(4L)._3 > out(5L)._3, s"4=${out(4L)} 5=${out(5L)}")
    // off-domain text repeated in the pool: general LM likes it, the
    // in-domain LM does not -> strictly negative delta
    assert(out(5L)._3 < 0L, s"5=${out(5L)}")
  }

  test("NgramLm: model parquet round-trip; applyModel reproduces score; empty model neutral") {
    val docs = Seq(
      (1L, "the star shines the star glows", "wiki"),
      (2L, "the star fades", "wiki"),
      (3L, "purple monkey dishwasher", "web"),
      (4L, "the star shines", "web")
    ).toDF("doc_id", "text", "source")
    val dir = java.nio.file.Files.createTempDirectory("lm-model").toString
    graft.operators.NgramLm.train(docs, col("source") === "wiki")
      .write.mode("overwrite").parquet(s"$dir/m.parquet")
    val model = spark.read.parquet(s"$dir/m.parquet")
    val applied = graft.operators.NgramLm.applyModel(docs, model)
      .collect().map(_.toSeq).toSeq
    val scored = graft.operators.NgramLm.score(docs, col("source") === "wiki")
      .collect().map(_.toSeq).toSeq
    assert(applied === scored)
    // empty model: every doc sits at the neutral 1e6 (V floor = 1)
    val none = graft.operators.NgramLm.score(docs, lit(false)).collect()
    assert(none.forall(_.getLong(2) === 1000000L))
  }

  test("model mergeability: train-per-drop + merge equals train-on-union, exactly") {
    val dropA = Seq(
      (1L, "the star shines the star glows", "wiki"),
      (3L, "purple monkey dishwasher", "web")).toDF("doc_id", "text", "source")
    val dropB = Seq(
      (2L, "the star fades", "wiki"),
      (4L, "the star shines", "web")).toDF("doc_id", "text", "source")
    val union = dropA.unionAll(dropB)
    val isT = col("source") === "wiki"
    // NgramLm: count tables add
    val lmMerged = graft.operators.NgramLm.mergeModels(Seq(
        graft.operators.NgramLm.train(dropA, isT),
        graft.operators.NgramLm.train(dropB, isT)))
      .collect().map(_.toSeq).toSet
    val lmWhole = graft.operators.NgramLm.train(union, isT)
      .collect().map(_.toSeq).toSet
    assert(lmMerged === lmWhole)
    // DSIR: bucket counts add; collapsed weights match the direct model
    val dsirMerged = graft.operators.Dsir.weightsFromCounts(
        graft.operators.Dsir.mergeCounts(Seq(
          graft.operators.Dsir.counts(dropA, isT),
          graft.operators.Dsir.counts(dropB, isT))))
      .collect().map(_.toSeq).toSet
    val dsirWhole = graft.operators.Dsir.weights(union, isT)
      .collect().map(_.toSeq).toSet
    assert(dsirMerged === dsirWhole)
  }

  test("NgramLm.score: sub-bigram docs drop; invariant to corpus partitioning") {
    val docs = Seq(
      (1L, "alpha beta gamma", "t"), (2L, "solo", "r"), (3L, "", "r"),
      (4L, "alpha beta", "r")).toDF("doc_id", "text", "source")
    val a = graft.operators.NgramLm.score(docs, col("source") === "t").collect()
    val b = graft.operators.NgramLm.score(docs.repartition(7), col("source") === "t")
      .collect()
    assert(a.map(_.getLong(0)).toSeq === Seq(1L, 4L)) // docs 2,3 have < 2 tokens
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
  }

  // ---------------- NaiveBayes ----------------

  test("NaiveBayes.classify: hand-computed smoothed scores, OOV floor, tie-break") {
    val train = Seq(
      (1L, "the star shines", "wiki"),
      (2L, "purple monkey dishwasher the", "web")).toDF("doc_id", "text", "source")
    val model = graft.operators.NaiveBayes.train(train, col("source"))
    val test = Seq(
      (10L, "the star"),        // wiki: (222222+222222)/2; web: (200000+100000)/2
      (11L, "monkey dishwasher"), // wiki: OOV floor 111111; web: 200000
      (12L, "zzz qqq"),         // all-OOV: wiki 111111 beats web 100000
      (13L, "")                 // zero tokens -> no prediction row
    ).toDF("doc_id", "text")
    // C(wiki)=3, C(web)=4, V=6 -> divisors 9 and 10
    val out = graft.operators.NaiveBayes.classify(test, model)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(out === Map(
      10L -> (("wiki", 222222L, 72222L)),
      11L -> (("web", 200000L, 88889L)),
      12L -> (("wiki", 111111L, 11111L))))
    // exact score tie -> deterministic label-ascending argmax, margin 0
    val sym = Seq((1L, "x", "b"), (2L, "x", "a")).toDF("doc_id", "text", "source")
    val tied = graft.operators.NaiveBayes
      .classify(Seq((9L, "x")).toDF("doc_id", "text"),
        graft.operators.NaiveBayes.train(sym, col("source")))
      .collect()
    assert(tied.map(r => (r.getString(1), r.getLong(2), r.getLong(3))).toSeq ===
      Seq(("a", 1000000L, 0L)))
  }

  test("NaiveBayes: merge equals train-on-union; parquet round-trip; split consistency") {
    val dropA = Seq(
      (1L, "the star shines", "wiki"),
      (3L, "purple monkey dishwasher the", "web")).toDF("doc_id", "text", "source")
    val dropB = Seq(
      (2L, "the star fades fades", "wiki"),
      (4L, "monkey sees monkey does", "web")).toDF("doc_id", "text", "source")
    val union = dropA.unionAll(dropB)
    val merged = graft.operators.NaiveBayes.mergeModels(Seq(
        graft.operators.NaiveBayes.train(dropA, col("source")),
        graft.operators.NaiveBayes.train(dropB, col("source"))))
      .collect().map(_.toSeq).toSet
    val whole = graft.operators.NaiveBayes.train(union, col("source"))
    assert(merged === whole.collect().map(_.toSeq).toSet)
    // model is a plain parquet table; reload classifies identically, and
    // classifySplit (one-pass train+apply) agrees with the two-call path
    val dir = java.nio.file.Files.createTempDirectory("nb-model").toString
    whole.write.mode("overwrite").parquet(s"$dir/m.parquet")
    val reloaded = spark.read.parquet(s"$dir/m.parquet")
    val viaModel = graft.operators.NaiveBayes.classify(union, reloaded)
      .collect().map(_.toSeq).toSet
    val viaSplit = graft.operators.NaiveBayes.classifySplit(union, col("source"))
      .collect().map(_.toSeq).toSet
    assert(viaModel === viaSplit)
    // partitioning invariance
    val viaSplit7 = graft.operators.NaiveBayes
      .classifySplit(union.repartition(7), col("source"))
      .collect().map(_.toSeq).toSet
    assert(viaSplit7 === viaSplit)
  }

  test("wfqInterleave honors weights exactly: 4:1 sources give a 20:5 prefix") {
    import spark.implicits._
    // weight(srcK) = K%4+1 — src3 -> 4, src0 -> 1; 50 docs each.
    // WFQ virtual times: src3 at 250000·r, src0 at 1000000·r, so any
    // vtime horizon holds exactly 4 src3 docs per src0 doc.
    val d = ((1L to 50L).map(i => (i, "src3")) ++
        (101L to 150L).map(i => (i, "src0")))
      .toDF("doc_id", "source")
    val out = graft.operators.Sampling.wfqInterleave(
        d, "source", "doc_id",
        src => org.apache.spark.sql.functions.substring(src, 4, 10)
          .cast("long") % 4 + 1)
      .select($"stream_pos", $"source").as[(Long, String)]
      .collect().sortBy(_._1)
    val first25 = out.take(25).map(_._2)
    assert(first25.count(_ == "src3") === 20)
    assert(first25.count(_ == "src0") === 5)
    // positions are a permutation of 1..100
    assert(out.map(_._1).toSeq === (1L to 100L))
    // determinism across partitioning
    val out7 = graft.operators.Sampling.wfqInterleave(
        d.repartition(7), "source", "doc_id",
        src => org.apache.spark.sql.functions.substring(src, 4, 10)
          .cast("long") % 4 + 1)
      .select($"stream_pos", $"doc_id").as[(Long, Long)].collect().sortBy(_._1)
    val base = graft.operators.Sampling.wfqInterleave(
        d, "source", "doc_id",
        src => org.apache.spark.sql.functions.substring(src, 4, 10)
          .cast("long") % 4 + 1)
      .select($"stream_pos", $"doc_id").as[(Long, Long)].collect().sortBy(_._1)
    assert(out7.toSeq === base.toSeq)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.TextDedup

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "quick brown fox jumps over the lazy dog today"), // near dup
    (4L, "completely different content about spark engines"),
    (5L, "short doc")
  ).toDF("doc_id", "text")

  test("shingles: w-grams; short docs collapse to one shingle") {
    val sh = docs.filter($"doc_id" === 1).select(TextDedup.shingles($"text", 3)).head.getSeq[String](0)
    assert(sh.head === "the quick brown")
    assert(sh.last === "the lazy dog")
    assert(sh.length === 7) // 9 tokens -> 7 shingles
    val short = docs.filter($"doc_id" === 5).select(TextDedup.shingles($"text", 3)).head.getSeq[String](0)
    assert(short === Seq("short doc"))
  }

  test("exact dedup groups identical texts, keeps min id") {
    val out = TextDedup.exact(docs, "doc_id", "text").collect()
    assert(out.length === 4)
    val dupRow = out.find(_.getAs[Long]("n_copies") === 2L).get
    assert(dupRow.getAs[Long]("keep_id") === 1L)
  }

  test("minhash: identical docs identical signatures; near-dups mostly agree") {
    val sigs = docs.select($"doc_id",
      TextDedup.minhashSignature($"text", 16).as("sig")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(sigs(1L) === sigs(2L))
    val agree = sigs(1L).zip(sigs(3L)).count { case (a, b) => a == b }
    assert(agree > 4, s"near-dups should share several minhashes, got $agree/16")
    val agreeFar = sigs(1L).zip(sigs(4L)).count { case (a, b) => a == b }
    assert(agreeFar < agree)
  }

  test("minhashPairs finds the exact and near pair, not the distinct docs") {
    val pairs = TextDedup.minhashPairs(docs, "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.3).collect()
    val pairSet = pairs.map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains((1L, 2L)))
    val exact = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L).get
    assert(exact.getAs[Double]("jaccard") === 1.0)
    assert(!pairSet.exists { case (a, b) => Set(a, b).contains(4L) })
  }

  test("collapseIdenticalSetsTagged: identity fast path flags false; duplicates flag true with same members/reps") {
    // all-distinct corpus -> identity members, canonical sorted reps, flag false
    val distinctSets = docs.filter($"doc_id" =!= 2L)
      .select($"doc_id".cast("long").as("id"),
        TextDedup.shingleHashes($"text", 3).as("sset"))
      .localCheckpoint(true)
    val (mI, rI, cI) = TextDedup.collapseIdenticalSetsTagged(distinctSets)
    assert(!cI, "nothing collapses on an all-distinct corpus")
    assert(mI.collect().forall(r => r.getLong(0) === r.getLong(1)),
      "identity members map every id to itself")
    assert(rI.count() === 4)
    // duplicated corpus -> flag true, copies fold onto the min-id rep
    val dupSets = docs
      .select($"doc_id".cast("long").as("id"),
        TextDedup.shingleHashes($"text", 3).as("sset"))
      .localCheckpoint(true)
    val (mD, rD, cD) = TextDedup.collapseIdenticalSetsTagged(dupSets)
    assert(cD, "the exact dup pair (1,2) must collapse")
    val members = mD.collect().map(r => r.getLong(1) -> r.getLong(0)).toMap
    assert(members(1L) === 1L && members(2L) === 1L,
      "both copies map to the min-id representative")
    assert(rD.count() === 4, "one rep per distinct content")
    assert(rD.filter($"id" === 2L).count() === 0, "the shadowed copy is not a rep")
    // reps' sset is the sorted canonical array on BOTH paths
    assert(rI.collect().forall(r => { val s = r.getSeq[Long](1); s === s.sorted }))
    assert(rD.collect().forall(r => { val s = r.getSeq[Long](1); s === s.sorted }))
  }

  test("contractLocal preserves connectivity at any partitioning; dedupClusters labels unchanged") {
    // a deep chain (0-1-2-...-9), a star (100 with 101..104), a 2-clique
    // (200,201) and duplicate edges — contracted per partition, the
    // global min-label components must come out identical at 1, 3 and
    // 8 partitions (components split across partitions are the case
    // the global rounds must still reconcile)
    val edges = ((0L to 8L).map(i => (i + 1, i)) ++
      (101L to 104L).map(m => (m, 100L)) ++
      Seq((201L, 200L), (201L, 200L), (5L, 4L))).toDF("u", "v")
    val nodes = ((0L to 9L) ++ (100L to 104L) ++ Seq(200L, 201L, 999L))
      .toDF("doc_id") // 999 = singleton, no edges
    val expected = ((0L to 9L).map(_ -> 0L) ++
      (100L to 104L).map(_ -> 100L) ++
      Seq(200L -> 200L, 201L -> 200L, 999L -> 999L)).toMap
    for (parts <- Seq(1, 3, 8)) {
      val e = edges.repartition(parts)
      val contracted = TextDedup.contractLocal(e).collect()
      // star edges are canonical (member > local min) and deduped per task
      assert(contracted.forall(r => r.getLong(0) > r.getLong(1)))
      val labels = TextDedup.dedupClusters(nodes,
          "doc_id", e.select($"u".as("id_a"), $"v".as("id_b")))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(labels === expected, s"parts=$parts")
    }
  }

  test("b-bit jaccard: identical contents collapse out; estimates stay in range") {
    val sets = docs.select($"doc_id".cast("long").as("id"),
      TextDedup.shingleHashes($"text", 3).as("sset"))
    val out = TextDedup.bbitJaccardPairs(sets).collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        (r.getAs[Long]("match_bits"), r.getAs[Long]("j_bbit_ppm"),
         r.getAs[Long]("j_exact_ppm"), r.getAs[Long]("err_ppm"))).toMap
    // the exact-dup pair carries zero estimator information (err = 0 by
    // construction) — the identical-set pre-collapse removes it from
    // the readout; doc 2's content is represented by doc 1
    assert(!out.contains((1L, 2L)))
    assert(!out.keySet.exists { case (a, b) => a == 2L || b == 2L })
    for (((a, b), (mb, est, ex, err)) <- out) {
      assert(mb >= 0L && mb <= 60L, s"($a,$b) match_bits $mb")
      assert(est >= 0L && est <= 1000000L, s"($a,$b) estimate $est")
      assert(err === math.abs(est - ex), s"($a,$b)")
    }
    // a 1-bit estimate over 60 perms has ~6.5% sd at J~0.5: the near-dup
    // pair's error must stay well inside the distinguishable band
    val (_, est13, ex13, err13) = out((1L, 3L))
    assert(ex13 > 400000L && ex13 < 900000L, s"exact $ex13")
    assert(err13 < 350000L, s"estimate $est13 vs exact $ex13")
  }

  test("native shingle/minhash/token-hash expressions match the HOF spellings") {
    // the native kernels replace the CodegenFallback HOF trees — pin
    // byte-exact parity on awkward inputs: punctuation runs, unicode,
    // case, short docs (< w tokens), single token, digits
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "Hello, WORLD!!  multiple   spaces &\tsymbols #42",
      "café zürich naïve — ünïcödé text łódź",
      "short doc",
      "x",
      "",
      "123 456 789 123 456 789",
      "a-b-c d.e.f g_h_i",
      "repeated repeated repeated repeated"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")

    val both = texts.select(
      $"id",
      TextDedup.shingleHashes($"text", 3).as("native_sh"),
      TextDedup.shingleHashesHof($"text", 3).as("hof_sh"),
      graft.expressions.TokenHash60.token_hash60($"text").as("native_tok"),
      transform(TextDedup.tokensCol($"text"),
        t => graft.functions.PortableHash.hash60(t)).as("hof_tok"))
      .withColumn("native_sig", TextDedup.minhashSignatureFromHashes($"native_sh", 16))
      .withColumn("hof_sig", TextDedup.minhashSignatureFromHashesHof($"hof_sh", 16))
      .collect()
    both.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"shingle hashes differ for id ${r.getLong(0)}")
      assert(r.getSeq[Long](3) === r.getSeq[Long](4), s"token hashes differ for id ${r.getLong(0)}")
      assert(r.getSeq[Long](5) === r.getSeq[Long](6), s"signatures differ for id ${r.getLong(0)}")
    }

    // the POSITIONAL kernel (ordered, non-distinct) against its HOF
    // spelling on the same awkward inputs
    texts.select($"id",
        graft.expressions.ShingleHashSeq60.shingle_hash_seq60($"text", 3).as("native_seq"),
        transform(TextDedup.shingles($"text", 3),
          s => graft.functions.PortableHash.hash60(s)).as("hof_seq"))
      .collect()
      .foreach { r =>
        assert(r.getSeq[Long](1) === r.getSeq[Long](2),
          s"positional shingle hashes differ for id ${r.getLong(0)}")
      }
  }

  test("native capped pair expansion emits the same pair set as the HOF spelling") {
    import org.apache.spark.sql.Row
    for (n <- Seq(2, 5, 63, 64, 65, 129, 300); cap = 64) {
      val members = (0 until n).map(i => (i * 7 + 3).toLong) // sorted, arbitrary ids
      val df = Seq(Tuple1(members)).toDF("members")
      def pairSet(c: org.apache.spark.sql.Column): Set[(Long, Long)] =
        df.select(explode(c).as("p")).select("p.id_a", "p.id_b").collect()
          .map(r => (r.getLong(0), r.getLong(1))).toSet
      val native = pairSet(TextDedup.cappedBucketPairsLong(col("members"), cap))
      val hof = pairSet(TextDedup.cappedBucketPairs(col("members"), cap))
      assert(native === hof, s"pair sets differ at n=$n")
      assert(native.forall { case (a, b) => a < b })
    }
  }

  test("pathological corpus: bucket cap bounds pairs at O(n·cap), keeps connectivity") {
    // n identical documents land in ONE LSH bucket for every band; the
    // uncapped expansion would emit n(n-1)/2 pairs from a single task.
    // The cap must bound the output while keeping every doc reachable
    // from the keeper (min id) so dedup clustering still collapses all n.
    val n = 300
    val cap = 64
    val degenerate = (0 until n).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog repeatedly"))
      .toDF("doc_id", "text")

    def checkPairs(pairs: Array[(Long, Long)], opName: String): Unit = {
      val allPairs = n.toLong * (n - 1) / 2
      assert(pairs.nonEmpty, s"$opName emitted no pairs")
      assert(pairs.length <= n * cap,
        s"$opName emitted ${pairs.length} pairs — more than the O(n·cap) bound ${n * cap}")
      assert(pairs.length < allPairs / 2,
        s"$opName emitted ${pairs.length} pairs — not meaningfully below n²/2 = $allPairs")
      // union-find connectivity: every doc must reach doc 0
      val parent = Array.tabulate(n)(identity)
      def find(x: Int): Int = { var r = x; while (parent(r) != r) r = parent(r); parent(x) = r; r }
      pairs.foreach { case (a, b) => parent(find(a.toInt)) = find(b.toInt) }
      val roots = (0 until n).map(find).toSet
      assert(roots.size === 1,
        s"$opName pairs split the corpus into ${roots.size} components — keeper unreachable")
    }

    val mh = TextDedup.minhashPairs(degenerate, "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.5, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    checkPairs(mh, "minhashPairs")

    val sh = TextDedup.simhashPairs(degenerate, "doc_id", "text",
      maxHamming = 3, maxBucket = cap)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    checkPairs(sh, "simhashPairs")
  }

  test("exactIncremental: batch-internal dups collapse, existing hashes drop out") {
    import spark.implicits._
    val existingDocs = Seq((1L, "old doc one"), (2L, "old doc two")).toDF("doc_id", "text")
    val existing = TextDedup.exact(existingDocs, "doc_id", "text").select("content_hash")
    val batch = Seq(
      (10L, "old doc one"),      // already known -> dropped
      (11L, "fresh doc"),        // new
      (12L, "fresh doc"),        // in-batch dup of 11
      (13L, "another fresh doc") // new
    ).toDF("doc_id", "text")
    val out = TextDedup.exactIncremental(batch, "doc_id", "text", existing)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(out === Map(11L -> 2L, 13L -> 1L))
  }

  test("dedupClusters: components labeled with min id; chains need multiple rounds") {
    import spark.implicits._
    // components: {1,2,3} via chain 1-2-3, {5,6}, singleton 4;
    // plus a long chain 10-11-12-13-14-15 forcing several propagation rounds
    val nodes = (Seq(1L, 2L, 3L, 4L, 5L, 6L) ++ (10L to 15L)).toDF("doc_id")
    val pairs = (Seq((1L, 2L), (2L, 3L), (5L, 6L)) ++
      (10L until 15L).map(i => (i + 1, i))) // reversed order: propagation must flow both ways
      .toDF("id_a", "id_b")
    val out = TextDedup.dedupClusters(nodes, "doc_id", pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L, 5L -> 5L, 6L -> 5L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L, 14L -> 10L, 15L -> 10L))
  }

  test("keepBest: one keeper per cluster — highest quality wins, ties to lowest id, null quality last") {
    import spark.implicits._
    val labels = Seq( // clusters {1,2,3}, {5,6}, singleton 4
      (1L, 1L), (2L, 1L), (3L, 1L), (4L, 4L), (5L, 5L), (6L, 5L))
      .toDF("doc_id", "cluster_id")
    // doc 3 missing from the score table; docs 5 and 6 tie on quality
    val quality = Seq((1L, 10L), (2L, 30L), (4L, 7L), (5L, 9L), (6L, 9L))
      .toDF("doc_id", "quality")
    val out = TextDedup.keepBest(labels, quality).collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)), r.getLong(3))).toMap
    assert(out(2L)._2 === 1L && out(1L)._2 === 0L && out(3L)._2 === 0L)
    assert(out(3L)._1 === None) // unscored member surfaces null, never keeps
    assert(out(4L)._2 === 1L)   // singleton keeps itself
    assert(out(5L)._2 === 1L && out(6L)._2 === 0L) // tie -> lowest id
    // exactly one keeper per cluster
    val keepersPerCluster = TextDedup.keepBest(labels, quality)
      .groupBy("cluster_id").agg(sum("keep").as("k")).collect()
      .map(_.getLong(1)).toSet
    assert(keepersPerCluster === Set(1L))
  }

  test("minhashPairsIncremental: cross-side pairs only, batch-internal dups ignored") {
    import spark.implicits._
    val existing = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and runs away fast tonight"),
      (2L, "completely different original content with many unique words in this one here")
    ).toDF("doc_id", "text")
    val batch = Seq(
      // near-copy of existing doc 1 (one word changed)
      (10L, "the quick brown fox jumps over the lazy cat and runs away fast tonight"),
      // identical to the OTHER batch doc 12 — must NOT be reported
      (11L, "entirely novel text sequence nothing like the corpus at all whatsoever"),
      (12L, "entirely novel text sequence nothing like the corpus at all whatsoever")
    ).toDF("doc_id", "text")
    val out = TextDedup.minhashPairsIncremental(batch, existing, "doc_id", "text",
        jaccardThreshold = 0.3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq === Seq((10L, 1L)), out.mkString(","))
  }

  test("contaminationCheck flags near-copies of benchmark docs, not self or distinct") {
    import spark.implicits._
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),  // IS bench 1: self-excluded
      (2L, "quick brown fox jumps over the lazy dog today"), // near-copy: contaminated
      (3L, "completely different words entirely unrelated content here")
    ).toDF("doc_id", "text")
    val bench = corpus.filter($"doc_id" === 1)
    val out = TextDedup.contaminationCheck(corpus, "doc_id", "text",
        bench, "doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    // bench doc has 7 3-shingles; doc 2 shares 6 of them
    assert(out.toSeq === Seq((2L, 1L, 6L, 0.857143)))
  }

  test("contaminationSpans: longest consecutive run, scattered hits stay short") {
    import spark.implicits._
    val bench = Seq((1L, "a b c d e f")).toDF("doc_id", "text") // shingles: abc bcd cde def
    val corpus = Seq(
      // shingles: xxa xab [abc bcd cde] dey eyz yzw -> one run of 3 at pos 2..4
      (10L, "x x a b c d e y z w"),
      // shingles: [abc] bcq cqq qqq qqc qcd [cde] -> two scattered runs of 1
      (11L, "a b c q q q q c d e"),
      (12L, "m n o p q r")                        // no overlap: absent from output
    ).toDF("doc_id", "text")
    val out = TextDedup.contaminationSpans(corpus, "doc_id", "text", bench, "text")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .sortBy(_._1)
    assert(out.toSeq === Seq(
      (10L, 8L, 3L, 375000L, 3L),
      (11L, 8L, 2L, 250000L, 1L)))
  }

  test("dedupClusters: star contraction converges a diameter-200 path within default iters") {
    import spark.implicits._
    // the degenerate-corpus shape: cap-chain links form one long path.
    // Neighbor-only propagation needs 200 rounds (old impls threw at
    // 25); large-star/small-star contraction needs O(log n).
    val n = 200L
    val nodes = (0L to n).toDF("doc_id")
    val pairs = (0L until n).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val out = TextDedup.dedupClusters(nodes, "doc_id", pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out.size === (n + 1).toInt)
    assert(out.values.forall(_ === 0L), "every chain node must reach the min label 0")
  }

  test("dedupClusters: hitting the iteration cap fails loudly, not silently wrong") {
    import spark.implicits._
    // a long path SPLIT ACROSS PARTITIONS: the r19 local contraction
    // solves whatever lands in one task, so the fixture must leave
    // genuinely cross-partition structure for the global rounds — a
    // 100-edge chain round-robined over 8 partitions still needs
    // several star rounds, and maxIters=1 must throw
    val nodes = (20L to 120L).toDF("doc_id")
    val pairs = (20L until 120L).map(i => (i, i + 1))
      .toDF("id_a", "id_b")
    // AQE coalesces the contraction's tiny shuffle to ONE partition,
    // where union-find solves any graph outright — disable coalescing
    // so the chain genuinely spans tasks, as it would at scale
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    try {
      val err = intercept[IllegalStateException] {
        TextDedup.dedupClusters(nodes, "doc_id", pairs, maxIters = 1)
      }
      assert(err.getMessage.contains("did not converge"))
      // the same graph converges under the default cap
      val out = TextDedup.dedupClusters(nodes, "doc_id", pairs)
        .collect().map(r => r.getLong(1)).toSet
      assert(out === Set(20L))
    } finally
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
  }

  test("ppjoin is exact: equals brute-force ground truth and covers every LSH pair") {
    import spark.implicits._
    val corpus = graft.queries.DedupQueries
      .corpusNear(spark, "/root/testdata/sf0.001")
    val pp = graft.operators.SetJoin.ppjoinPairs(corpus, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    // ground truth: brute-force all-pairs exact Jaccard on the same sets
    // (fine at spec scale; the operator exists so this never runs at 100 TB)
    val sets = corpus.select($"doc_id",
        array_sort(TextDedup.shingleHashes($"text")).as("s"))
      .as[(Long, Seq[Long])].collect()
    val truth = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      uni = sa.size + sb.size - inter
      if inter * 2 >= uni
    } yield (ia, ib)).toSet
    assert(pp === truth)
    // recall 1.0 vs the probabilistic family: every LSH pair at the same
    // threshold is also found by the exact join
    val lsh = TextDedup.minhashPairs(corpus, "doc_id", "text",
        numPerms = 16, r = 2, jaccardThreshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(pp), s"LSH found pairs the exact join missed: ${lsh -- pp}")
  }

  test("ppjoin skew guard: exact clones collapse — output still equals brute force") {
    import spark.implicits._
    // corpusExact contains byte-identical clones of every 5th doc — the
    // degenerate input for prefix filtering. The pre-collapse path must
    // reproduce brute-force ground truth exactly (within-group J=1
    // pairs AND cross-group expansion through the membership table).
    val corpus = graft.queries.DedupQueries
      .corpusExact(spark, "/root/testdata/sf0.001")
    val pp = graft.operators.SetJoin.ppjoinPairs(corpus, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val sets = corpus.select($"doc_id",
        array_sort(TextDedup.shingleHashes($"text")).as("s"))
      .as[(Long, Seq[Long])].collect()
    val truth = (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = sa.toSet.intersect(sb.toSet).size
      uni = sa.size + sb.size - inter
      if inter * 2 >= uni
    } yield (ia, ib)).toSet
    assert(pp === truth)
  }

  test("ppjoin skew guard: 1000 identical docs cost O(n) candidates, not n^2") {
    import spark.implicits._
    // 20 tokens; `near` differs only in the last -> high overlap (>= 1/2),
    // `far` shares nothing. Before the exact-dedup pre-collapse this
    // corpus expanded ~ p * C(1000,2) prefix candidates; collapsed it is
    // one group + 2 singletons, and all pair fan-out is final output.
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    val near = (1 to 19).map(i => s"tok$i").mkString(" ") + " other"
    val far = "nothing here matches the duplicated corpus at all frankly"
    val corpus = ((1L to 1000L).map(i => (i, base)) ++
      Seq((2001L, near), (2002L, far))).toDF("doc_id", "text")
    val pp = graft.operators.SetJoin.ppjoinPairs(corpus, "doc_id", "text")
    val byKind = pp.withColumn("kind",
        when($"id_b" <= 1000L, "within")
          .when($"id_b" === 2001L, "cross")
          .otherwise("far"))
      .groupBy("kind").agg(count(lit(1)).as("n"), min("jaccard").as("jmin"),
        max("jaccard").as("jmax"))
      .collect().map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2), r.getDouble(3)))).toMap
    // all C(1000,2) identical pairs at exactly 1.0
    assert(byKind("within") === ((1000L * 999L / 2L, 1.0, 1.0)))
    // near-dup: J = 15/21 >= 1/2, one pair per clone, all equal
    val (nCross, jCrossMin, jCrossMax) = byKind("cross")
    assert(nCross === 1000L)
    assert(jCrossMin === jCrossMax)
    assert(jCrossMin > 0.5 && jCrossMin < 1.0)
    // the unrelated doc pairs with nothing
    assert(!byKind.contains("far"))
  }

  test("prefix skew report: collapse zeroes identical-corpus candidates; near-identical fan-out is visible") {
    import spark.implicits._
    val base = (1 to 20).map(i => s"tok$i").mkString(" ")
    // 1000 byte-identical docs + one unrelated: the pre-collapse turns
    // the degenerate corpus into 2 representatives sharing NO prefix
    // token — candidate volume is zero, all pair mass is direct output
    val ident = ((1L to 1000L).map(i => (i, base)) :+
      (2001L, "totally unrelated words appear in this one"))
      .toDF("doc_id", "text")
    val r1 = graft.operators.SetJoin
      .prefixSkewReport(ident, "doc_id", "text").collect()(0)
    assert(r1.getAs[Long]("n_docs") === 1001L)
    assert(r1.getAs[Long]("n_reps") === 2L)
    assert(r1.getAs[Long]("within_pairs") === 1000L * 999L / 2L)
    assert(r1.getAs[Long]("cand_pairs") === 0L)
    // the case the collapse CANNOT absorb: 100 near-identical docs (a
    // shared 20-token core, unique tail) — the core's shingles land in
    // every prefix at df=100, and the report makes the ~C(100,2)-per-
    // token fan-out visible before a cluster burns on it
    val near = (1L to 100L).map(i => (i, s"$base uniq$i"))
      .toDF("doc_id", "text")
    val r2 = graft.operators.SetJoin
      .prefixSkewReport(near, "doc_id", "text").collect()(0)
    assert(r2.getAs[Long]("n_reps") === 100L)
    assert(r2.getAs[Long]("within_pairs") === 0L)
    assert(r2.getAs[Long]("max_token_df") === 100L)
    assert(r2.getAs[Long]("cand_pairs") >= 100L * 99L / 2L)
  }

  test("dup ngram mass: shared windows counted with multiplicity, short docs have zero windows") {
    import spark.implicits._
    // n=5 windows. doc1 and doc2 share the 5-token run "a b c d e" at
    // different positions; doc3 repeats its OWN window twice; doc4 is
    // 4 tokens — below the window, so zero grams (NOT the whole-doc
    // fallback); doc5 is unique.
    val docs = Seq(
      (1L, "a b c d e tail1 tail2"),          // 3 windows, 1 shared
      (2L, "head1 head2 a b c d e"),          // 3 windows, 1 shared
      (3L, "x y z w v x y z w v"),            // 6 windows; "x y z w v" twice
      (4L, "too short for five"),             // 0 windows
      (5L, "p q r s t u")                     // 2 windows, unique
    ).toDF("doc_id", "text")
    val got = TextDedup.dupNgramMass(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    assert(got === Array(
      (1L, 7L, 3L, 1L, 333333L),
      (2L, 7L, 3L, 1L, 333333L),
      // doc3's duplicated window occurs at positions 1 and 6; windows
      // 2..5 straddle the seam and are unique -> 2 of 6 duplicated
      (3L, 10L, 6L, 2L, 333333L),
      (4L, 4L, 0L, 0L, -1L),
      (5L, 6L, 2L, 0L, 0L)))
  }

  test("dup span prune: first occurrence survives, later copies are cut mid-page") {
    import spark.implicits._
    // the shared 5-token run "a b c d e" appears in doc1 (keeper: min
    // (doc, pos)) and doc2 (removable); doc3 repeats its own window —
    // position 1 is the keeper, position 6's copy is removed; doc4 is
    // an exact clone of doc1 — every window duplicated, prunes to
    // nothing; doc5 is unique and untouched.
    val docs = Seq(
      (1L, "a b c d e tail1 tail2"),
      (2L, "head1 head2 a b c d e"),
      (3L, "x y z w v x y z w v"),
      (4L, "a b c d e tail1 tail2"),
      (5L, "p q r s t u"),
      (6L, ""),                      // zero tokens — must not crash the
      (7L, "!!! ... ???")            // rebuild (sequence(1,0) trap)
    ).toDF("doc_id", "text")
    val got = TextDedup.dupSpanPrune(docs, "doc_id", "text", n = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      // all of doc1's windows are duplicated by the clone doc4, but
      // doc1 holds every keeper -> untouched
      (1L, 7L, 0L, "a b c d e tail1 tail2"),
      // doc2's window [3..7] loses to doc1's [1..5] -> tokens 3..7 cut
      (2L, 7L, 5L, "head1 head2"),
      // doc3: occurrence at pos 6 loses to its own pos 1 -> 6..10 cut
      (3L, 10L, 5L, "x y z w v"),
      // the clone: every one of its 3 windows loses to doc1 -> empty
      (4L, 7L, 7L, ""),
      (5L, 6L, 0L, "p q r s t u"),
      (6L, 0L, 0L, ""),
      (7L, 0L, 0L, "")))
  }

  test("incremental span prune: known grams always cut, batch-new grams keep batch-first") {
    import spark.implicits._
    // prior state: the grams of "a b c d e" (one 5-gram)
    val prior = Seq(Tuple1("a b c d e")).toDF("text")
      .select(explode(graft.expressions.ShingleHashSeq60
        .shingle_hash_seq60(col("text"), 5)).as("g"))
    val batch = Seq(
      // contains the KNOWN run -> cut even though it's this batch's
      // first occurrence (the prior corpus holds the keeper)
      (10L, "a b c d e new1 new2"),
      // batch-new duplicated run "m n o p q": doc11 keeps, doc12 cut
      (11L, "m n o p q tail"),
      (12L, "lead m n o p q"),
      (13L, "all fresh tokens here now")
    ).toDF("doc_id", "text")
    val got = TextDedup.dupSpanPruneIncremental(batch, "doc_id", "text", prior, n = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(got === Array(
      (10L, 7L, 5L, "new1 new2"),
      (11L, 6L, 0L, "m n o p q tail"),
      (12L, 6L, 5L, "lead"),
      (13L, 5L, 0L, "all fresh tokens here now")))
  }

  test("ppjoin equals brute force on seeded random corpora with duplicate groups") {
    import spark.implicits._
    val vocab = Vector("alpha", "beta", "gamma", "delta", "epsilon",
      "zeta", "eta", "theta")
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new scala.util.Random(seed)
      val texts = (1 to 30).map { _ =>
        val len = 4 + rnd.nextInt(8)
        (1 to len).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
      }
      // clone a third of the docs -> duplicate groups exercise the
      // pre-collapse path; the tiny vocabulary forces shared shingles
      val all = texts ++ texts.take(10)
      val corpus = all.zipWithIndex
        .map { case (t, i) => ((i + 1).toLong, t) }.toDF("doc_id", "text")
      val pp = graft.operators.SetJoin.ppjoinPairs(corpus, "doc_id", "text")
        .select("id_a", "id_b", "jaccard")
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, j) => (a, b) -> j }.toMap
      val sets = corpus.select($"doc_id", TextDedup.shingleHashes($"text").as("s"))
        .as[(Long, Seq[Long])].collect()
      val truth = (for {
        (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
        inter = sa.toSet.intersect(sb.toSet).size
        uni = sa.size + sb.size - inter
        if inter * 2 >= uni
      } yield (ia, ib) ->
        BigDecimal(inter.toDouble / uni).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble).toMap
      assert(pp.keySet === truth.keySet, s"seed=$seed")
      truth.foreach { case (k, j) =>
        assert(math.abs(pp(k) - j) < 1e-9, s"seed=$seed pair=$k") }
    }
  }

  test("ppjoin edges: empty corpus, single doc, and empty-text twins") {
    import spark.implicits._
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(graft.operators.SetJoin.ppjoinPairs(empty, "doc_id", "text").count() === 0L)
    val single = Seq((1L, "just one document here")).toDF("doc_id", "text")
    assert(graft.operators.SetJoin.ppjoinPairs(single, "doc_id", "text").count() === 0L)
    // two empty-text docs: the kernel hashes "" into a 1-element set, so
    // they are identical sets and pair at J=1 — same as the pre-collapse
    // implementation, where they shared their single prefix token
    val blanks = Seq((1L, ""), (2L, ""), (3L, "distinct real content words")).toDF("doc_id", "text")
    val got = graft.operators.SetJoin.ppjoinPairs(blanks, "doc_id", "text")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(got === Set((1L, 2L)))
  }

  test("simhash: equal for identical docs, close for near-dups (hamming)") {
    val sims = TextDedup.withSimhash(docs, "text").select($"doc_id", $"sim").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sims(1L) === sims(2L))
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(sims(1L), sims(3L)) < hamming(sims(1L), sims(4L)))
  }

  test("simhashPairs returns the identical pair at hamming 0") {
    val pairs = TextDedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3).collect()
    val p12 = pairs.find(r => r.getLong(0) == 1L && r.getLong(1) == 2L)
    assert(p12.isDefined)
    assert(p12.get.getAs[Long]("hamming") === 0L)
  }

  test("containmentPairs: quote inside a long doc is full containment despite tiny Jaccard") {
    import spark.implicits._
    val quote = (1 to 12).map(i => s"q$i").mkString(" ") // 12 tokens -> 10 3-shingles
    val filler = (1 to 200).map(i => s"f$i").mkString(" ")
    val cdocs = Seq(
      (1L, s"$filler $quote"), // long doc embedding the quote
      (2L, quote),             // the quoted doc itself
      (3L, "entirely unrelated content with its own words here")
    ).toDF("doc_id", "text")
    val out = graft.operators.SetJoin
      .containmentPairs(cdocs, "doc_id", "text", w = 3, tNum = 9, tDen = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    assert(out.length === 1)
    val (a, b, contA, contB) = out.head
    assert((a, b) === ((1L, 2L)))
    assert(contB === 1000000L, "the quote's shingles are fully contained")
    assert(contA < 100000L, "the long doc is barely contained in the quote")
    // Jaccard would never have paired them at any usual threshold
    val j = graft.operators.SetJoin
      .ppjoinPairs(cdocs, "doc_id", "text", w = 3, tNum = 1, tDen = 2)
    assert(j.count() === 0L)
  }

  test("rangeOrderIndex: ranks equal a driver-side lexicographic sort, any partitioning") {
    import spark.implicits._
    import graft.operators.Shuffle
    val rows = Seq("pear", "apple", "banana", "apple pie", "cherry", "apricot", "date",
      "elderberry", "fig", "grape", "apple", "kiwi")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }
    val expect = rows.sortBy(r => (r._2, r._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1).toLong }.toMap
    for (parts <- Seq(1, 3, 7)) {
      val df = rows.toDF("id", "k").repartition(parts)
      val got = Shuffle.rangeOrderIndex(df, Seq("k", "id"), "pos", numParts = 4)
        .select("id", "pos").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got === expect, s"input partitions = $parts")
    }
  }

  test("snmPairs: token-level edits land in the neighborhood; candidates stay O(n*window)") {
    import spark.implicits._
    val base = "alpha bravo charlie delta echo foxtrot golf hotel india juliet"
    val cdocs = Seq(
      (1L, base),
      (2L, "bravo " + base),                      // prepend: bag-of-words key nearly equal
      (3L, "zulu yankee xray whiskey victor uniform tango sierra"),
      (4L, base.replace("echo", "echo2"))          // one-token substitution
    ).toDF("doc_id", "text")
    val pairs = graft.operators.SetJoin
      .snmPairs(cdocs, "doc_id", "text", w = 3, window = 3, tNum = 1, tDen = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.contains((1L, 2L)), s"prepend variant missed: ${pairs.toSeq}")
    assert(pairs.contains((1L, 4L)), s"substitution variant missed: ${pairs.toSeq}")
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L), "unrelated doc must not pair")
  }

  test("CDC chunking: boundaries re-align after a prefix edit (chunks shared); partition exact") {
    import spark.implicits._
    import graft.operators.CdcChunk
    val base = (1 to 200).map(i => s"tok$i").mkString(" ")
    val cdocs = Seq(
      (1L, base),
      (2L, "inserted " + base) // one-token prefix insertion
    ).toDF("doc_id", "text")
    val ch = CdcChunk.chunks(cdocs, "doc_id", "text", mod = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // chunks partition each doc's tokens exactly
    val byDoc = ch.groupBy(_._1)
    assert(byDoc(1L).map(_._3).sum === 200L)
    assert(byDoc(2L).map(_._3).sum === 201L)
    for ((_, rows) <- byDoc)
      assert(rows.map(_._2).sorted.toSeq === (0L until rows.length).toSeq, "chunk ids contiguous")
    // after the first boundary the hash stream re-aligns: all but the
    // first chunk of doc 2 appear identically in doc 1
    val h1 = byDoc(1L).map(_._4).toSet
    val shared = byDoc(2L).count(c => h1.contains(c._4))
    assert(shared >= byDoc(2L).length - 1, s"only $shared chunks re-aligned")
    // fixed-stride chunking would share NONE after the shift: verify the
    // contrast — chunk contents differ at every stride-16 offset
    val dup = CdcChunk.dupReport(cdocs, "doc_id", "text", mod = 16)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(dup(1L) > 800000L && dup(2L) > 800000L, s"dup ppm low: $dup")
  }

  test("containmentPairs: below-threshold overlap excluded") {
    import spark.implicits._
    val base = (1 to 20).map(i => s"w$i").mkString(" ")
    val cdocs = Seq(
      (1L, base),
      (2L, (1 to 10).map(i => s"w$i").mkString(" ") + " x y z a b c d e f g")
    ).toDF("doc_id", "text")
    // doc2 shares 8 of its 18 3-shingles -> containment < 0.5 both ways
    val out = graft.operators.SetJoin
      .containmentPairs(cdocs, "doc_id", "text", w = 3, tNum = 4, tDen = 5)
    assert(out.count() === 0L)
  }
}

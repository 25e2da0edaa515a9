package graft

import org.apache.spark.sql.functions._

import graft.operators.Scale

/** Scale-technique proofs: bucketed joins must drop the shuffle,
  * salted joins must equal their unsalted twins.
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed co-located join runs with no exchange on either side") {
    val facts = (1L to 1000L).map(i => (i % 50, i, i * 2)).toDF("key", "a", "b")
    val dims = (0L until 50L).map(i => (i, s"dim_$i")).toDF("key", "name")
    Scale.writeBucketed(facts, "graft_bucketed_facts", Seq("key"), 8)
    Scale.writeBucketed(dims, "graft_bucketed_dims", Seq("key"), 8)
    try {
      val f = Scale.readTable(spark, "graft_bucketed_facts")
      val d = Scale.readTable(spark, "graft_bucketed_dims")
      // disable broadcast so the join would OTHERWISE be a shuffle join
      val joined = f.hint("merge").join(d.hint("merge"), "key")
      joined.collect()
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        "bucketed join must not shuffle either side:\n" + plan)
      assert(joined.count() === 1000L)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_facts")
      spark.sql("DROP TABLE IF EXISTS graft_bucketed_dims")
    }
  }

  test("bucketedPairs: bounded member rows, identical pair set to the unbounded spelling") {
    import graft.operators.TextDedup
    // Three buckets: one degenerate (n=100, forces a group split at
    // groupSize=cap*slicesPerGroup=16), one normal (n=5), one singleton.
    val rows = ((1L to 100L).map(i => ("hot", i * 3)) ++
        (1L to 5L).map(i => ("warm", i * 11)) ++
        Seq(("lone", 999L)))
      .toDF("bkey", "id")
    val cap = 8
    val slicesPerGroup = 2

    // the giant-cluster guard: no collect_list row past the bound
    val maxMembers = TextDedup.boundedMembers(rows, Seq("bkey"), cap * slicesPerGroup)
      .select(max(size($"members"))).as[Int].head()
    assert(maxMembers <= cap * slicesPerGroup,
      s"member array of $maxMembers exceeds bound ${cap * slicesPerGroup}")

    // byte-identical pair multiset vs the reference one-row-per-bucket
    // spelling (which the oracle SQL replicates)
    def pairSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val bounded = pairSet(
      TextDedup.bucketedPairs(rows, Seq("bkey"), cap, slicesPerGroup))
    val reference = pairSet(rows.groupBy($"bkey")
      .agg(collect_list($"id").as("members"))
      .filter(size($"members") > 1)
      .select(explode(
        TextDedup.cappedBucketPairsLong(array_sort($"members"), cap)).as("p"))
      .select($"p.id_a", $"p.id_b"))
    assert(bounded === reference)
    assert(bounded.forall { case (a, b) => a < b })

    // connectivity inside the degenerate bucket survives the split:
    // every hot-bucket member reaches the bucket head through pairs
    val hotIds = (1L to 100L).map(_ * 3)
    val parent = scala.collection.mutable.Map(hotIds.map(i => i -> i): _*)
    def find(x: Long): Long = { var r = x; while (parent(r) != r) r = parent(r); parent(x) = r; r }
    bounded.foreach { case (a, b) =>
      if (parent.contains(a) && parent.contains(b)) parent(find(a)) = find(b) }
    assert(hotIds.map(find).toSet.size === 1, "group split broke bucket connectivity")
  }

  test("bucketedPairs adds no second shuffle: group agg reuses the window partitioning") {
    import graft.operators.TextDedup
    val rows = (1L to 200L).map(i => (i % 4, i)).toDF("bkey", "id")
    val df = TextDedup.bucketedPairs(rows.select($"bkey", $"id"), Seq("bkey"), 8)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // one exchange for the window/groupBy lineage (hashpartitioning on
    // bkey) — an exchange mentioning __grp would mean the group agg
    // re-shuffled what the window already clustered
    val exchanges = plan.linesIterator.filter(_.contains("Exchange hashpartitioning")).toSeq
    assert(exchanges.nonEmpty)
    assert(!exchanges.exists(_.contains("__grp")),
      "group agg introduced its own exchange on (keys, __grp):\n" + plan)
  }

  test("ppjoin identical-set collapse is array-free: flat membership, same groups") {
    import org.apache.spark.sql.types.ArrayType
    // degenerate corpus: 500 byte-identical sets + a handful of others —
    // the shape whose former `collect_list(id)` put 500 ids in one row
    val sets = ((1L to 500L).map(i => (i, Seq(10L, 20L, 30L))) ++
        Seq((900L, Seq(10L, 20L)), (901L, Seq(40L, 50L, 60L)), (902L, Seq.empty[Long])))
      .toDF("id", "sset")
    val (members, mat, _, collapsed) = graft.operators.SetJoin
      .collapsedPrefixBuildFromSets(sets.localCheckpoint(true), 1L, 2L)
    assert(collapsed, "the 500-copy corpus must take the collapsed path")
    // the giant-cluster guard: no member row carries an array — the
    // collapse derives flat (rid, id, n0) rows
    assert(!members.schema.fields.exists(_.dataType.isInstanceOf[ArrayType]),
      s"membership rows must be flat, got ${members.schema.simpleString}")
    // bound proof for the rid computation itself: Spark plans
    // `groupBy(sset0).agg(min(id))` with a PARTIAL aggregate before the
    // exchange even on an array-typed key — the 500 identical sets
    // combine to one row per input partition BEFORE the shuffle, where
    // the former `min(id) OVER (PARTITION BY sset0)` window shipped all
    // 500 rows to one task
    val ridPlan = sets.select($"id", array_sort($"sset").as("sset0"))
      .groupBy("sset0").agg(min($"id").as("rid"))
      .queryExecution.executedPlan.toString
    assert(ridPlan.contains("partial_min"),
      s"rid aggregate must map-side combine:\n$ridPlan")
    assert(!ridPlan.contains("Window"),
      s"rid must not be a window min:\n$ridPlan")
    val rows = members.collect()
    assert(rows.length === 503)
    // representative = min id of each identical group
    assert(rows.filter(_.getAs[Long]("id") <= 500L)
      .forall(_.getAs[Long]("rid") === 1L))
    assert(rows.count(r => r.getAs[Long]("id") === r.getAs[Long]("rid")) === 4)
    // empty set keeps n0 = 0 (the within-pair J=1 emission must skip it)
    assert(rows.find(_.getAs[Long]("id") === 902L).get.getAs[Long]("n0") === 0L)
    // one representative row per distinct NON-EMPTY set feeds the
    // prefix index (an empty set shares no prefix token, never pairs)
    assert(mat.count() === 3)
  }

  test("identical-set collapse: minhash clusters equal the naive uncollapsed clustering") {
    import graft.operators.TextDedup
    // corpus with a planted identical GROUP (5 copies of one text),
    // a near-dup pair, and distinct singletons
    val texts = Seq(
      1L -> "the quick brown fox jumps over the lazy dog tonight",
      3L -> "the quick brown fox jumps over the lazy dog tonight",
      5L -> "the quick brown fox jumps over the lazy dog tonight",
      7L -> "the quick brown fox jumps over the lazy dog tonight",
      9L -> "the quick brown fox jumps over the lazy dog tonight",
      2L -> "quick brown fox jumps over the lazy dog tonight",      // near-dup of the group
      4L -> "completely different content about spark and parquet files",
      6L -> "another unrelated document mentioning hash joins and shuffles")
    val docs = texts.toDF("doc_id", "text")
    val pairs = TextDedup.minhashPairs(docs, "doc_id", "text",
      numPerms = 16, r = 2, jaccardThreshold = 0.5)
    val got = pairs.collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // star pairs: every copy hangs off the min-id representative at J=1
    for (m <- Seq(3L, 5L, 7L, 9L))
      assert(got.contains((1L, m, 1.0)), s"missing star pair (1,$m): ${got.toSeq}")
    // the cross-content near-dup is found at REP level only
    assert(got.exists { case (a, b, j) => a == 1L && b == 2L && j < 1.0 })
    assert(!got.exists { case (a, b, _) => Set(a, b).intersect(Set(4L, 6L)).nonEmpty })
    // connectivity equivalence: clusters over the collapsed pairs equal
    // clusters over the NAIVE uncollapsed spelling (all member pairs)
    val naive = {
      val sets = docs.select($"doc_id".cast("long").as("id"),
        TextDedup.shingleHashes($"text", 3).as("sset"))
      val a = sets.select($"id".as("id_a"), $"sset".as("sa"))
      val b = sets.select($"id".as("id_b"), $"sset".as("sb"))
      a.join(b, $"id_a" < $"id_b")
        .withColumn("inter", size(array_intersect($"sa", $"sb")).cast("double"))
        .withColumn("uni", (size($"sa") + size($"sb")).cast("double") - $"inter")
        .filter($"inter" / $"uni" >= 0.5)
        .select($"id_a", $"id_b")
    }
    val cNew = TextDedup.dedupClusters(docs, "doc_id",
        pairs.select($"id_a", $"id_b")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cNaive = TextDedup.dedupClusters(docs, "doc_id", naive).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cNew === cNaive, "collapsed pairs must cluster identically to all-pairs")
    assert(cNew(9L) === 1L && cNew(2L) === 1L && cNew(4L) === 4L)
  }

  test("capped containment/winnow pair outputs equal the naive uncapped all-pairs ground truth") {
    // Oracle-independence defense (r17 ADVICE): the graded oracles
    // REPLAY the engine's capped-bucket + identical-set-collapse
    // spelling, so a shared bug there would hash-match on both sides.
    // This pins the capped spelling against the naive uncapped
    // ALL-PAIRS specification computed with plain Scala set ops — no
    // bucketing, no caps, no collapse — at PAIR level (after expanding
    // the rep+star contract back to member pairs).
    import graft.operators.{SetJoin, TextDedup, Winnow}
    val T = "the quick brown fox jumps over the lazy dog tonight again " +
      "and again while the patient cat watches from the warm windowsill nearby"
    val L = "alpha beta gamma delta epsilon zeta eta theta iota kappa " +
      "lambda mu nu xi omicron pi rho sigma tau upsilon phi chi psi omega"
    val Sq = "delta epsilon zeta eta theta iota kappa lambda mu nu xi omicron"
    val texts = Seq(
      1L -> T, 4L -> T, 6L -> T, 9L -> T, // identical group
      2L -> L, 3L -> Sq,                  // containment (Sq quoted in L)
      5L -> "totally unrelated words about spark catalyst optimizer internals engine",
      7L -> "another document holding completely different vocabulary items here")
    val docs = texts.toDF("doc_id", "text")
    val byText = texts.groupBy(_._2).values
      .map(g => g.map(_._1).min -> g.map(_._1).sorted).toMap // rid -> members
    val groupOf: Map[Long, Seq[Long]] =
      byText.flatMap { case (rid, ms) => ms.map(_ -> ms) }
    def orient(x: Long, y: Long, rest: Seq[Long]): (Long, Long, Seq[Long]) =
      if (x < y) (x, y, rest)
      else (y, x, rest match { case Seq(n, ca, cb) => Seq(n, cb, ca); case o => o })
    // expand engine output (rep pairs + identity stars) to member pairs
    def expand(rows: Seq[(Long, Long, Seq[Long])]): Set[(Long, Long, Seq[Long])] =
      rows.flatMap { case (a, b, rest) =>
        for (x <- groupOf(a); y <- groupOf(b) if x != y) yield orient(x, y, rest)
      }.toSet
    // — containment —
    val sets: Map[Long, Set[Long]] = docs
      .select($"doc_id", TextDedup.shingleHashes($"text", 8).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toSet).toMap
    val naiveCont = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a < b
      n = (sa & sb).size.toLong
      ca = n * 1000000L / sa.size; cb = n * 1000000L / sb.size
      if math.max(ca, cb) >= 800000L
    } yield (a, b, Seq(n, ca, cb))).toSet
    val engineCont = expand(SetJoin.containmentPairs(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1),
        Seq(r.getLong(2), r.getLong(3), r.getLong(4)))).toSeq)
    assert(engineCont === naiveCont,
      "containment pairs diverge from the naive all-pairs spelling")
    assert(naiveCont.exists { case (a, b, _) => Set(a, b) == Set(2L, 3L) },
      "fixture degenerate: no cross-content containment pair")
    // — winnow shared fingerprints —
    val fps: Map[Long, Set[Long]] = Winnow
      .fingerprints(docs, "doc_id", "text", 8, 4)
      .select($"doc_id", $"fp").distinct()
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val naiveWin = (for {
      (a, fa) <- fps.toSeq; (b, fb) <- fps.toSeq if a < b
      sh = (fa & fb).size.toLong if sh >= 2L
    } yield (a, b, Seq(sh))).toSet
    val engineWin = expand(Winnow
      .sharedPairs(docs, "doc_id", "text", 8, 4, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1), Seq(r.getLong(2)))).toSeq)
    assert(engineWin === naiveWin,
      "winnow shared pairs diverge from the naive all-pairs spelling")
    assert(naiveWin.exists { case (a, b, _) => a == 1L && groupOf(1L).contains(b) },
      "fixture degenerate: no identical-group winnow pair")
    // — cap engaged: connectivity (clusters) still equals naive —
    val cappedPairs = SetJoin.containmentPairs(docs, "doc_id", "text",
        maxBucket = 2)
      .select($"id_a", $"id_b")
    val cCapped = TextDedup.dedupClusters(docs, "doc_id", cappedPairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val naivePairsDf = naiveCont.toSeq.map { case (a, b, _) => (a, b) }
      .toDF("id_a", "id_b")
    val cNaive = TextDedup.dedupClusters(docs, "doc_id", naivePairsDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(cCapped === cNaive,
      "capped containment pairs must cluster identically to all-pairs")
  }

  test("bucketedPairs lowCardKeys path emits the identical pair multiset at any partitioning") {
    // the cluster-blocked (groupedRank) membership build must be a pure
    // physical rewrite of the window spelling — same groups, same slice
    // boundaries, same chain links — including a skewed dominant
    // cluster and a singleton cluster
    val rows = ((1L to 400L).map(i => (i % 3, i)) ++ Seq((99L, 900L)))
      .toDF("cluster", "id")
    for (parts <- Seq(1, 7)) {
      val r = rows.repartition(parts)
      def pairs(lowCard: Boolean) = graft.operators.TextDedup
        .bucketedPairs(r, Seq("cluster"), cap = 16, slicesPerGroup = 4,
          lowCardKeys = lowCard)
        .collect().map(x => (x.getLong(0), x.getLong(1))).sorted.toSeq
      assert(pairs(lowCard = true) === pairs(lowCard = false),
        s"parts=$parts: groupedRank membership must equal the window spelling")
    }
  }

  test("salted join equals the plain join and spreads the hot key across salts") {
    // extreme skew: 90% of left rows share key 7
    val left = (1L to 1000L)
      .map(i => (if (i <= 900) 7L else i % 20, i))
      .toDF("key", "row_id")
    val right = (0L until 20L).map(i => (i, s"r_$i")).toDF("key", "payload")
    val plain = left.join(right, Seq("key"))
      .select("key", "row_id", "payload").collect().map(_.toSeq).toSet
    val salted = Scale.saltedJoin(left, right, "key", "row_id", salts = 8)
      .select("key", "row_id", "payload").collect().map(_.toSeq).toSet
    assert(salted === plain)
    // the hot key's rows really do carry several distinct salts
    val saltSpread = left.filter($"key" === 7L)
      .withColumn("__salt", pmod(hash($"row_id"), lit(8)))
      .select("__salt").distinct().count()
    assert(saltSpread > 4, s"expected hot key spread over >4 salts, got $saltSpread")
  }

  test("groupedRank / groupedRunningSum equal the naive per-group window at any partitioning") {
    import graft.operators.Shuffle
    // skewed groups (one dominant), duplicate order-keys broken by id —
    // the contract's required total order
    val rnd = new scala.util.Random(13)
    val rows = (1L to 4000L).map { id =>
      // NULL group every 97th row: the window ranks the NULL group like
      // any other, so the decomposition's offsets join must be
      // null-safe or those rows silently vanish
      val g = if (id % 97 == 0) null
        else if (id % 10 < 7) "big" else s"g${id % 10}"
      (g, rnd.nextInt(40).toLong, id, rnd.nextInt(100).toLong)
    }
    val df = rows.toDF("grp", "key", "id", "v").repartition(11)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"key", $"id")
    val wantRank = df.withColumn("r", row_number().over(w).cast("long"))
      .select("grp", "key", "id", "v", "r").collect().map(_.toSeq).toSet
    val wantCum = df.withColumn("c", sum($"v").over(
        w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)).cast("long"))
      .select("grp", "key", "id", "v", "c").collect().map(_.toSeq).toSet
    // the decomposition must be a function of the total order ALONE —
    // where the sampled range bounds fall (numParts) never changes it
    for (parts <- Seq(1, 3, 16)) {
      val gotRank = Shuffle.groupedRank(df, Seq("grp"), Seq("key", "id"), "r", parts)
        .select("grp", "key", "id", "v", "r").collect().map(_.toSeq).toSet
      assert(gotRank === wantRank, s"groupedRank diverges at numParts=$parts")
      val gotCum = Shuffle.groupedRunningSum(
          df, Seq("grp"), Seq("key", "id"), $"v", "c", parts)
        .select("grp", "key", "id", "v", "c").collect().map(_.toSeq).toSet
      assert(gotCum === wantCum, s"groupedRunningSum diverges at numParts=$parts")
    }
  }

  test("topKPerGroup equals the plain window top-k, including ties and null scores") {
    val rnd = new scala.util.Random(7)
    val rows = (1L to 5000L).map { id =>
      (id % 37, if (id % 211 == 0) null else java.lang.Long.valueOf(rnd.nextInt(50).toLong), id)
    }
    val df = rows.toDF("grp", "score", "id").repartition(16)
    val got = Scale.topKPerGroup(df, "grp", "score", "id", k = 3)
      .select("grp", "score", "id", "rank")
      .collect().map(_.toSeq).toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"grp").orderBy($"score".desc_nulls_last, $"id".asc_nulls_last)
    val want = df.withColumn("rank", row_number().over(w).cast("long"))
      .filter($"rank" <= 3).select("grp", "score", "id", "rank")
      .collect().map(_.toSeq).toSet
    assert(got === want)
  }

  test("topKPerGroup phase 1 bounds the shuffle: a hot group arrives pre-pruned") {
    // one group holding ALL 40k rows across 16 partitions
    val df = (1L to 40000L).map(i => (0L, i % 1000, i)).toDF("grp", "score", "id")
      .repartition(16)
    val pruned = Scale.partitionTopK(df, "grp", "score", "id", k = 5)
    val n = pruned.count()
    assert(n <= 16L * 5, s"phase 1 must emit <= partitions*k rows for one group, got $n")
    // and the exact answer still comes out the other end
    val top = Scale.topKPerGroup(df, "grp", "score", "id", k = 5)
      .select("id").as[Long].collect().sorted.toSeq
    // score = i % 1000, best score 999 at ids 999, 1999, ..; top-5 by
    // (score desc, id asc) = the five smallest ids with score 999
    assert(top === Seq(999L, 1999L, 2999L, 3999L, 4999L))
  }

  test("topKPerGroup with k >= group size returns whole groups, ranked") {
    val df = Seq((1L, 10L, 1L), (1L, 20L, 2L), (2L, 5L, 3L)).toDF("grp", "score", "id")
    val out = Scale.topKPerGroup(df, "grp", "score", "id", k = 10)
      .select("grp", "id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(out === Seq((1L, 1L, 2L), (1L, 2L, 1L), (2L, 3L, 1L)))
  }
}

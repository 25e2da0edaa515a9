package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val vectors = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.99f, 0.1f, 0.0f), 0),   // near 0
    (2L, Array(0.0f, 1.0f, 0.0f), 1),
    (3L, Array(0.0f, 0.95f, 0.3f), 1),   // near 2
    (4L, Array(0.0f, 0.0f, 1.0f), 2),
    (5L, Array(-1.0f, 0.0f, 0.0f), 0)    // opposite of 0
  ).toDF("vec_id", "embedding", "label")

  test("brute-force top-k ranks by cosine with id tie-break") {
    val out = Similarity.bruteForceTopK(vectors, vectors.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 3).orderBy("rank").collect()
    assert(out.length === 3)
    assert(out.head.getAs[Long]("neighbor_id") === 1L) // closest
    assert(out.head.getAs[Double]("cosine") > 0.99)
    val cosines = out.map(_.getAs[Double]("cosine")).toSeq
    assert(cosines === cosines.sorted.reverse, "ranked by descending cosine")
    assert(!out.map(_.getAs[Long]("neighbor_id")).contains(0L), "self excluded")
  }

  test("LSH top-k: candidates limited to hamming<=1 buckets, ranked by cosine") {
    // brute force on this corpus puts 1 first for query 0; sign-LSH with
    // multi-probe must agree whenever 1 lands within hamming 1 of 0's
    // bucket — with near-identical vectors their sign patterns match on
    // nearly every plane, so the pair is found
    val out = Similarity.lshTopK(vectors, vectors.filter($"vec_id" === 0),
      "vec_id", "embedding", k = 3, nBits = 4).collect()
    assert(out.forall(_.getAs[Long]("q_id") == 0L))
    assert(!out.map(_.getAs[Long]("neighbor_id")).contains(0L), "self excluded")
    val cosines = out.map(_.getAs[Double]("cosine")).toSeq
    assert(cosines === cosines.sorted.reverse, "ranked by descending cosine")
    if (out.nonEmpty)
      assert(out.head.getAs[Long]("neighbor_id") === 1L,
        "nearest same-bucket vector ranks first")
    // hyperplane matrix is deterministic
    val p1 = Similarity.hyperplanes(4, 3)
    val p2 = Similarity.hyperplanes(4, 3)
    assert(p1 === p2)
    assert(p1.flatten.forall(v => v == 1L || v == -1L))
  }

  test("native quantize matches the HOF round(x*1000) spelling incl. ties and negatives") {
    val rng = new scala.util.Random(42)
    val tricky = Seq(
      Array(0.0005f, -0.0005f, 0.0015f, -0.0015f), // rounding ties at the scale boundary
      Array(0.9999995f, -0.9999995f, 1.0000005f, -1.0f),
      Array(0.0f, -0.0f, Float.MinPositiveValue, -Float.MinPositiveValue)) ++
      (0 until 50).map(_ => Array.fill(64)(rng.nextFloat() * 2 - 1))
    val df = tricky.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "emb")
    val rows = df.select($"id",
      Similarity.quantize($"emb").as("native"),
      graft.operators.Similarity.quantizeHof($"emb").as("hof")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Long](1) === r.getSeq[Long](2), s"quantize differs for id ${r.getLong(0)}")
    }
  }

  test("quantize degrades NaN/Inf like round+cast; null elements fail loudly") {
    // NaN→0, ±Inf→Long.Max/MinValue — the double→long cast semantics the
    // HOF twin (round + cast) has; one bad component must not kill the job
    // (under ANSI mode the HOF twin THROWS on these — the native kernel
    // is deliberately total instead, per the legacy-cast degradation)
    val df = Seq((1L, Array(Double.NaN, Double.PositiveInfinity,
      Double.NegativeInfinity, 1.5))).toDF("id", "emb")
    val r = df.select(Similarity.quantize($"emb").as("native")).head
    assert(r.getSeq[Long](0) === Seq(0L, Long.MaxValue, Long.MinValue, 1500L))
    // output declares containsNull=false, so a null element is an error,
    // not a silent 0
    val withNull = Seq((1L, Array[java.lang.Double](0.5, null)))
      .toDF("id", "emb")
    val err = intercept[Exception] {
      withNull.select(Similarity.quantize($"emb")).collect()
    }
    assert(err.getMessage.contains("null element") ||
      Option(err.getCause).exists(_.getMessage.contains("null element")))
  }

  test("lshTopK with an empty query side returns an empty, well-typed result") {
    val out = Similarity.lshTopK(vectors, vectors.filter($"vec_id" === -1),
      "vec_id", "embedding", k = 3, nBits = 4)
    assert(out.collect().isEmpty)
    assert(out.columns.toSeq === Seq("q_id", "rank", "neighbor_id", "cosine"))
  }

  test("cosine is symmetric, bounded, and exact-integer deterministic") {
    val pairs = Similarity.nearDupPairs(vectors, "vec_id", "embedding", "label", threshold = -1.0)
      .collect()
    pairs.foreach { r =>
      val c = r.getAs[Double]("cosine")
      assert(c >= -1.000001 && c <= 1.000001)
    }
    val p01 = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 1L).get
    assert(p01.getAs[Double]("cosine") > 0.99)
    val p05 = pairs.find(r => r.getLong(0) == 0L && r.getLong(1) == 5L).get
    assert(p05.getAs[Double]("cosine") < -0.99)
  }

  test("IVF probes nearest clusters and finds in-cluster neighbors") {
    val out = Similarity.ivfTopK(vectors, vectors.filter($"vec_id" === 0),
      "vec_id", "embedding", "label", k = 2, nProbe = 1).orderBy("rank").collect()
    // probe 1 cluster (label 0) -> neighbors only from {1, 5}
    assert(out.map(_.getAs[Long]("neighbor_id")).toSet.subsetOf(Set(1L, 5L)))
    assert(out.head.getAs[Long]("neighbor_id") === 1L)
  }

  test("IntVecDot matches the HOF spelling") {
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L))).toDF("a", "b")
    val native = df.select(graft.expressions.IntVecDot.int_vec_dot($"a", $"b")).head.getLong(0)
    val hof = df.select(aggregate(zip_with($"a", $"b", (x, y) => x * y), lit(0L), (s, v) => s + v))
      .head.getLong(0)
    assert(native === 32L)
    assert(native === hof)
  }

  test("centroid model round-trips through parquet; assignment matches in-session training") {
    import graft.operators.Similarity
    val rnd = new scala.util.Random(11)
    val vecs = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f + (i % 3) * 2f)))
      .toDF("vec_id", "embedding")
    val trained = Similarity.kmeansAssign(vecs, "vec_id", "embedding", k = 3, iters = 4)
      .as[(Long, Long)].collect().toMap
    val dir = java.nio.file.Files.createTempDirectory("graft-cents").toString + "/model"
    Similarity.trainCentroids(vecs, "vec_id", "embedding", k = 3, iters = 4)
      .write.parquet(dir)
    val loaded = Similarity
      .assignFromCentroids(vecs, "vec_id", "embedding", spark.read.parquet(dir))
      .as[(Long, Long)].collect().toMap
    assert(loaded === trained,
      "assignment from the persisted model must equal in-session k-means output")
  }

  // ---- JL sign projection ------------------------------------------

  test("sign projection: matrix is hash-derived and the kernel matches a manual dot") {
    import graft.expressions.{MinHashKernel, SignProjectKernel}
    val mat = SignProjectKernel.matrix(3, 4)
    for (k <- 0 until 4; j <- 0 until 3) {
      val expect = if (MinHashKernel.hash60(s"rp:$j:$k") % 2 == 0) 1L else -1L
      assert(mat(k)(j) === expect)
    }
    val out = graft.operators.RandomProjection
      .projectVecs(vectors.filter($"vec_id" === 0), "vec_id", "embedding",
        outDim = 4, inDim = 3)
      .collect()(0).getSeq[Long](1)
    // vec 0 quantizes to (1000, 0, 0) — projection = 1000 * sign(0, k)
    assert(out === (0 until 4).map(k => 1000L * mat(k)(0)))
  }

  test("sign projection: opposite vectors project to opposite points (linearity)") {
    val p = graft.operators.RandomProjection
      .projectVecs(vectors, "vec_id", "embedding", outDim = 8, inDim = 3)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(p(5L) === p(0L).map(-_)) // vec 5 = -vec 0
    assert(p(0L).length === 8)
  }

  test("bruteForceTopKInt on pre-quantized vectors equals bruteForceTopK on floats") {
    import graft.expressions.QuantizeVec
    val qv = vectors.select($"vec_id", QuantizeVec.quantize_vec($"embedding").as("qv"))
    val viaInt = Similarity.bruteForceTopKInt(qv, qv.filter($"vec_id" < 2),
      "vec_id", "qv", k = 3).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val viaFloat = Similarity.bruteForceTopK(vectors, vectors.filter($"vec_id" < 2),
      "vec_id", "embedding", k = 3).collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(viaInt.sortBy(t => (t._1, t._2)) === viaFloat.sortBy(t => (t._1, t._2)))
  }

  test("short vectors project their prefix (missing dims contribute zero)") {
    val two = Seq((0L, Array(0.5f, -0.5f))).toDF("vec_id", "embedding")
    val out = graft.operators.RandomProjection
      .projectVecs(two, "vec_id", "embedding", outDim = 4, inDim = 3)
      .collect()(0).getSeq[Long](1)
    val mat = graft.expressions.SignProjectKernel.matrix(3, 4)
    assert(out === (0 until 4).map(k => 500L * mat(k)(0) - 500L * mat(k)(1)))
  }

  // ---- product quantization ----------------------------------------

  import graft.operators.ProductQuantize

  lazy val pqVectors = {
    // 6 vectors of dim 4 = 2 subspaces x 2 dims; two tight groups per
    // subspace so k=2 training separates them
    Seq(
      (0L, Array(1.0f, 0.1f, 0.0f, 1.0f)),
      (1L, Array(0.0f, 1.0f, 1.0f, 0.1f)),
      (2L, Array(0.9f, 0.2f, 0.1f, 0.9f)),   // near 0 in both subspaces
      (3L, Array(0.1f, 0.9f, 0.9f, 0.2f)),   // near 1 in both subspaces
      (4L, Array(1.0f, 0.0f, 0.95f, 0.0f)),  // sub0 near 0, sub1 near 1
      // no two subvectors parallel: spherical codebooks merge parallel
      // subvectors by design (cosine can't tell them apart)
      (5L, Array(0.05f, 1.0f, 0.05f, 0.95f)) // sub0 near 1, sub1 near 0
    ).toDF("vec_id", "embedding")
  }

  test("PQ codes: m rows per vector, codes are cluster ids, groups split as planted") {
    val model = ProductQuantize.train(pqVectors, "vec_id", "embedding",
      m = 2, k = 2, iters = 2, dim = 4)
    val codes = ProductQuantize.encode(pqVectors, "vec_id", "embedding", model, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(codes.length === 12) // 6 vectors x 2 subspaces
    val bySub = codes.groupBy(_._2).view.mapValues(_.map(c => c._1 -> c._3).toMap).toMap
    // subspace 0: {0,2,4} together, {1,3,5} together
    assert(bySub(0L)(0L) === bySub(0L)(2L) && bySub(0L)(2L) === bySub(0L)(4L))
    assert(bySub(0L)(1L) === bySub(0L)(3L) && bySub(0L)(3L) === bySub(0L)(5L))
    assert(bySub(0L)(0L) !== bySub(0L)(1L))
    // subspace 1: {0,2,5} together, {1,3,4} together
    assert(bySub(1L)(0L) === bySub(1L)(2L) && bySub(1L)(2L) === bySub(1L)(5L))
    assert(bySub(1L)(1L) === bySub(1L)(3L) && bySub(1L)(3L) === bySub(1L)(4L))
    assert(bySub(1L)(0L) !== bySub(1L)(1L))
  }

  test("PQ decode reconstructs each vector as its codebook entries, concatenated") {
    val model = ProductQuantize.train(pqVectors, "vec_id", "embedding",
      m = 2, k = 2, iters = 2, dim = 4)
    val cents = model.collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getSeq[Long](2)).toMap
    val codes = ProductQuantize.encode(pqVectors, "vec_id", "embedding", model, dim = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val dec = ProductQuantize.decode(pqVectors, "vec_id", "embedding", model, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (id <- 0L to 5L)
      assert(dec(id) === cents((0L, codes((id, 0L)))) ++ cents((1L, codes((id, 1L)))))
  }

  test("PQ model round-trips through parquet; encode from the loaded model is identical") {
    val model = ProductQuantize.train(pqVectors, "vec_id", "embedding",
      m = 2, k = 2, iters = 2, dim = 4)
    val dir = java.nio.file.Files.createTempDirectory("graft-pq-model").toString
    model.write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    def codes(m: org.apache.spark.sql.DataFrame) =
      ProductQuantize.encode(pqVectors, "vec_id", "embedding", m, dim = 4)
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    assert(codes(model) === codes(loaded),
      "codes from the persisted model must equal in-session codes")
  }

  test("PQ with k = n vectors is lossless: every vector is its own codebook entry") {
    val model = ProductQuantize.train(pqVectors, "vec_id", "embedding",
      m = 2, k = 6, iters = 1, dim = 4)
    val dec = ProductQuantize.decode(pqVectors, "vec_id", "embedding", model, dim = 4)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val qv = pqVectors.select($"vec_id",
      graft.expressions.QuantizeVec.quantize_vec($"embedding"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    for (id <- 0L to 5L) assert(dec(id) === qv(id), s"vec $id not lossless")
  }

  test("prototype pruning: most-central examples rank first and are pruned") {
    // two tight clusters seeded by ids 0/1 (k=2 init takes id<k);
    // ids 2,3 sit ON the axes, 4,5 off-axis — after one Lloyd round the
    // centroids are the member means, so the on-axis points are most
    // prototypical
    val vecs = Seq(
      (0L, Array(1.0f, 0.05f, 0.0f)),
      (1L, Array(0.05f, 1.0f, 0.0f)),
      (2L, Array(1.0f, 0.0f, 0.0f)),
      (3L, Array(0.0f, 1.0f, 0.0f)),
      (4L, Array(0.9f, 0.3f, 0.3f)),
      (5L, Array(0.3f, 0.9f, 0.3f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.protoPrune(vecs, "vec_id", "embedding",
        k = 2, iters = 1, denom = 3)
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Long]("cluster"), r.getAs[Long]("proto_rank"),
         r.getAs[Long]("pruned"))).toMap
    assert(out.size === 6, "every vector scored")
    // each cluster has 3 members; denom=3 prunes exactly rank 1
    val byCluster = out.values.groupBy(_._1)
    assert(byCluster.size === 2)
    for ((cl, rows) <- byCluster) {
      assert(rows.map(_._2).toSeq.sorted === Seq(1L, 2L, 3L), s"cluster $cl ranks")
      assert(rows.count(_._3 == 1L) === 1, s"cluster $cl prunes exactly one")
    }
    // the off-axis members are never the pruned prototypes
    assert(out(4L)._3 === 0L)
    assert(out(5L)._3 === 0L)
  }

  test("margin mining: one best target per source, true pairs beat their neighborhood") {
    // two sources on orthogonal axes, each with one aligned target; two
    // off-axis distractors shared by both neighborhoods
    val src = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (10L, Array(0.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val tgt = Seq(
      (1L, Array(0.99f, 0.1f, 0.0f)),  // pair of 0
      (3L, Array(0.1f, 0.99f, 0.0f)),  // pair of 10
      (5L, Array(0.5f, 0.5f, 0.0f)),   // equidistant distractor
      (7L, Array(0.4f, 0.45f, 0.8f))   // weaker distractor
    ).toDF("vec_id", "embedding")
    val out = Similarity.marginMine(tgt, src, "vec_id", "embedding",
        k = 2, nCand = 3)
      .collect().map(r => r.getAs[Long]("q_id") ->
        (r.getAs[Long]("tgt_id"), r.getAs[Long]("cos_micro"),
         r.getAs[Long]("margin_ppm"))).toMap
    assert(out.keySet === Set(0L, 10L), "one row per source")
    assert(out(0L)._1 === 1L, "source 0 mines its aligned target")
    assert(out(10L)._1 === 3L, "source 10 mines its aligned target")
    // a true pair's cosine exceeds its neighborhood average -> margin > 1
    assert(out(0L)._3 > 1000000L, s"margin(0,1) = ${out(0L)._3}")
    assert(out(10L)._3 > 1000000L, s"margin(10,3) = ${out(10L)._3}")
    // micro-cosine of the 0-1 pair: dot/(|a||b|) ~ 0.99499 in ppm
    assert(out(0L)._2 > 990000L && out(0L)._2 < 1000000L)
    intercept[IllegalArgumentException] {
      Similarity.marginMine(tgt, src, "vec_id", "embedding", k = 4, nCand = 2)
    }
  }

  test("margin mining scales by ACTUAL neighbor counts, not k (sparse neighborhoods)") {
    // one source, one target, k=4 — each side's neighborhood holds ONE
    // vector, so the denominator must divide by 1, not k: the margin of
    // a pair that IS its whole neighborhood is exactly 1.0 (1e6 ppm).
    // The old `(2e6·k·cm) div (a_sum+b_sum)` shape yielded k×1e6 here.
    val src = Seq((0L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val tgt = Seq((1L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Similarity.marginMine(tgt, src, "vec_id", "embedding",
        k = 4, nCand = 4)
      .collect()
    assert(out.length === 1)
    assert(out(0).getAs[Long]("cos_micro") === 1000000L)
    assert(out(0).getAs[Long]("margin_ppm") === 1000000L,
      s"cos == neighborhood avg must give margin exactly 1e6 ppm, got ${out(0)}")
  }

  test("nearest_centroids equals the struct-greatest spelling: ties, zero norms, probe order") {
    import graft.expressions.NearestCentroids.nearest_centroids
    // random vectors + a zero vector; centroids include a zero centroid
    // (NaN cosine path) and an exact duplicate pair (tie -> lowest id)
    val rnd = new scala.util.Random(42)
    val dim = 8
    def rv(): Seq[Long] = Seq.fill(dim)((rnd.nextInt(2001) - 1000).toLong)
    // no zero norms in the parity fixture: under ANSI the struct
    // spelling THROWS on a 0 divisor (so graded inputs never carry
    // them); the native expression's NaN passthrough is pinned below
    val rows = (0L until 200L).map(i => (i, rv()))
    val df = rows.toDF("id", "q")
      .withColumn("n2", Similarity.inorm2($"q"))
      .localCheckpoint(true)
    val dupBase = rv()
    val cents: Seq[(Long, Seq[Long], Long)] =
      ((0L until 13L).map(c => (c, rv())) ++
        Seq((13L, dupBase), (14L, dupBase))) // exact tie pair
        .map { case (c, v) => (c, v, v.map(x => x * x).sum) }
    // argmax parity
    val native = df.withColumn("cluster",
        element_at(nearest_centroids($"q", $"n2", cents, 1), 1))
      .select($"id", $"cluster").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val structs = Similarity.assignNearestStructs(df, cents)
      .select($"id", $"cluster").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(native === structs)
    // full probe-order parity vs the sort_array spelling (nProbe = 5)
    val scoreArr = array(cents.map { case (cluster, cent, n2) =>
      struct(Similarity.cosine(Similarity.idot($"q", typedLit(cent)), $"n2", lit(n2)).as("cos"),
        lit(-cluster).as("neg"), lit(cluster).as("cluster"))
    }: _*)
    val old2 = df.withColumn("s", scoreArr)
      .withColumn("probe", expr("transform(slice(sort_array(s, false), 1, 5), x -> x.cluster)"))
      .select($"id", $"probe").collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val nat2 = df.withColumn("probe", nearest_centroids($"q", $"n2", cents, 5))
      .select($"id", $"probe").collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(nat2 === old2)
    // the tie pair resolves to the lower id everywhere it wins
    assert(!native.values.exists(_ == 14L))
    // zero-norm inputs: the native expression does not throw (NaN/Inf
    // cosine ranks by Spark's double order); result stays well-formed
    val zdf = Seq((0L, Seq.fill(dim)(0L))).toDF("id", "q")
      .withColumn("n2", Similarity.inorm2($"q"))
    val z = zdf.select(nearest_centroids($"q", $"n2", cents, 3)).head.getSeq[Long](0)
    assert(z.length === 3)
  }
}

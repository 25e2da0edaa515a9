package graft

import graft.queries.AggQueries

/** x_approx_distinct_parts runs on the deterministic KMV sketch
  * (k=1024). The sketch itself is oracle-checked hash-exact; this spec
  * asserts the STATISTICAL contract against the exact distinct counts:
  * under-filled groups are exact, filled groups estimate within the
  * ~1/sqrt(k-2) error budget (5% is generous for k=1024).
  */
class ApproxDistinctSpec extends SparkSpec {

  test("KMV approx distinct within 5% of exact per group (exact when under-filled)") {
    val dir = "/root/testdata/sf0.001"
    val exact = AggQueries.distinctParts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = AggQueries.approxDistinctParts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      if (n < 1024) assert(a === n, s"group $k under-filled: must be exact, got $a vs $n")
      else assert(math.abs(a - n).toDouble / n < 0.05, s"group $k: exact=$n approx=$a")
    }
  }

  test("KMV set-ops: exact when under-filled; union/intersection estimates within 25% when filled") {
    import spark.implicits._
    // under-filled: 40 + 40 values with 20 shared — the sketch holds
    // everything, so every estimate must be EXACT
    val smallA = (1L to 40L).map(i => s"v$i").toDF("v")
    val smallB = (21L to 60L).map(i => s"v$i").toDF("v")
    val s = graft.operators.Kmv.setOpsSketch(smallA, smallB, "v", k = 64).collect()(0)
    assert(s.getLong(0) === 40L && s.getLong(1) === 40L) // est_a, est_b
    assert(s.getLong(2) === 60L)                          // est_union
    assert(s.getLong(4) === 20L && s.getLong(5) === 20L)  // est_inter, exact audit
    // filled: 4000 + 4000 with 2000 shared — k=256 (σ ≈ 1/√k ≈ 6%, so
    // 25% is a ~4σ bound; k=64's single-draw σ ≈ 12.5% flaked at 47%)
    val bigA = (1L to 4000L).map(i => s"w$i").toDF("v")
    val bigB = (2001L to 6000L).map(i => s"w$i").toDF("v")
    val e = graft.operators.Kmv.setOpsSketch(bigA, bigB, "v", k = 256).collect()(0)
    assert(e.getLong(5) === 2000L) // the exact audit join is exact
    for ((got, want) <- Seq(e.getLong(0) -> 4000L, e.getLong(1) -> 4000L,
        e.getLong(2) -> 6000L, e.getLong(4) -> 2000L))
      assert(math.abs(got - want).toDouble / want < 0.25, s"got $got want ~$want")
    // deterministic: same inputs, same sketch, repartitioned or not
    val e2 = graft.operators.Kmv
      .setOpsSketch(bigA.repartition(13), bigB.repartition(7), "v", k = 256)
      .collect()(0)
    assert(e.toSeq === e2.toSeq)
  }

  test("sliding KMV merge equals a direct per-window sketch (exact mergeability)") {
    // x_kmv_sliding merges per-hour bottom-k sketches into 3-hour
    // windows; mergeability must be EXACT — the merged (k_seen,
    // kth_min, est) per window equals distinctSketch run directly on
    // the window's raw rows.
    val dir = "/root/testdata/sf0.001"
    import org.apache.spark.sql.functions._
    val merged = graft.queries.EventQueries.kmvSliding(spark, dir)
      .select("win", "k_seen", "kth_min", "est_distinct")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val raw = graft.Tables.load(spark, dir, "events")
      .select(expr("CAST(ts AS BIGINT) div 3600").as("hr"), col("user_id"))
      .select(explode(sequence(col("hr") - 2, col("hr"))).as("win"), col("user_id"))
    val direct = graft.operators.Kmv.distinctSketch(raw, "win", "user_id", k = 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(merged === direct)
    // the estimate path is actually exercised (some window overflows k)
    assert(merged.values.exists(_._1 === 8L), "no window filled the sketch")
  }
}

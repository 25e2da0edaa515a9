package graft

import graft.operators.AsOf

class AsOfSpec extends SparkSpec {
  import spark.implicits._

  test("joinPrior: latest strictly-prior right row per key; nulls when none") {
    val left = Seq(
      (1L, 5L, "a"),   // before any right row
      (1L, 10L, "b"),  // equal ts: strictly-prior means NOT visible
      (1L, 15L, "c"),  // after first right row
      (1L, 25L, "d"),  // after both; must pick the LATEST prior
      (2L, 50L, "e")   // key with no right rows at all
    ).toDF("user_id", "ts", "tag")
    val right = Seq(
      (1L, 10L, 100.0), (1L, 20L, 200.0),
      (3L, 1L, 999.0)  // other key: must never leak across keys
    ).toDF("user_id", "ts", "value")

    val out = AsOf.joinPrior(left, right, "user_id", "ts", Seq("ts", "value"))
      .select($"tag", $"asof.ts".as("rts"), $"asof.value".as("rv"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap
    assert(out("a") === None)
    assert(out("b") === None)
    assert(out("c") === Some((10L, 100.0)))
    assert(out("d") === Some((20L, 200.0)))
    assert(out("e") === None)
  }

  test("joinPrior matches a naive reference on seeded random event streams") {
    val rng = new scala.util.Random(1234)
    // globally unique timestamps (determinism contract: unique tsCol)
    val allTs = rng.shuffle((0 until 600).toList)
    val lefts = (0 until 300).map(i =>
      (rng.nextInt(8).toLong, allTs(i).toLong, 10000L + i))
    val rights = (300 until 600).map(i =>
      (rng.nextInt(8).toLong, allTs(i).toLong, 20000L + i, rng.nextInt(1000) / 4.0))
    val lDf = lefts.toDF("k", "ts", "event_id")
    val rDf = rights.toDF("k", "ts", "event_id", "value")

    val got = AsOf.joinPrior(lDf, rDf, "k", "ts", Seq("event_id", "value"))
      .select($"event_id", $"asof.event_id".as("rid"), $"asof.value".as("rv"))
      .collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap

    val expected = lefts.map { case (k, ts, id) =>
      val prior = rights.filter(r => r._1 == k && r._2 < ts)
      id -> (if (prior.isEmpty) None
             else Some(prior.maxBy(_._2)).map(r => (r._3, r._4)))
    }.toMap
    assert(got === expected)
    // sanity: the generated streams exercise both branches
    assert(expected.values.exists(_.isDefined) && expected.values.exists(_.isEmpty))
  }

  test("joinNearest: closest match either direction, ties backward, tolerance-gated") {
    val left = Seq(
      (1L, 10L, "a"),  // back@8 (d2) vs fwd@13 (d3) -> back
      (1L, 11L, "b"),  // back@8 (d3) vs fwd@13 (d2) -> fwd
      (1L, 8L, "c"),   // exact instant -> delta 0 (backward)
      (1L, 100L, "d"), // nearest is 13, delta 87 > tol 50 -> null
      (2L, 5L, "e")    // no right rows for key
    ).toDF("user_id", "t", "tag")
    val right = Seq((1L, 8L, 80.0), (1L, 13L, 130.0)).toDF("user_id", "t", "value")
    val out = AsOf.joinNearest(left, right, "user_id", "t", Seq("value"),
        tolerance = 50L)
      .select($"tag", $"nearest.t".as("rt"), $"nearest.p.value".as("rv"))
      .collect()
      .map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getDouble(2)))))
      .toMap
    assert(out("a") === Some((8L, 80.0)))
    assert(out("b") === Some((13L, 130.0)))
    assert(out("c") === Some((8L, 80.0)))
    assert(out("d") === None)
    assert(out("e") === None)
  }

  test("joinNearest: equidistant |delta| prefers the backward match") {
    val left = Seq((1L, 10L, "mid")).toDF("k", "t", "tag")
    val right = Seq((1L, 7L, 1.0), (1L, 13L, 2.0)).toDF("k", "t", "value")
    val out = AsOf.joinNearest(left, right, "k", "t", Seq("value"), 100L)
      .select($"nearest.t", $"nearest.p.value").as[(Long, Double)].head()
    assert(out === ((7L, 1.0)))
  }

  test("joinPrior preserves every left column and row count") {
    val left = Seq((1L, 2L, "x", 9), (1L, 3L, "y", 8)).toDF("k", "ts", "s", "n")
    val right = Seq((1L, 1L, 7.0)).toDF("k", "ts", "v")
    val out = AsOf.joinPrior(left, right, "k", "ts", Seq("v"))
    assert(out.columns.toSeq === Seq("k", "ts", "s", "n", "asof"))
    assert(out.count() === 2)
  }
}

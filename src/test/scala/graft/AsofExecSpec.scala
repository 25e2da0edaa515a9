package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.operators.AsOf
import graft.plans.AsofJoinExec

/** The custom-physical-operator as-of join
  * ([[graft.plans.AsofJoin]] / [[AsofJoinExec]]) — pinned against the
  * composed union+window form ([[AsOf.joinPrior]]), whose semantics are
  * themselves oracle-graded (x_events_asof) and spec-pinned (AsOfSpec).
  */
class AsofExecSpec extends SparkSpec {
  import spark.implicits._

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  test("equivalence with joinPrior: randomized corpora, long keys") {
    for (seed <- Seq(1L, 7L, 20260814L)) {
      val rnd = new scala.util.Random(seed)
      val nL = 300 + rnd.nextInt(300)
      val nR = 200 + rnd.nextInt(400)
      val left = (1 to nL).map { i =>
        (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(500).toLong)
      }.toDF("id", "k", "ts")
      // unique (k, ts) on the right: the tie-at-same-instant case is
      // explicitly nondeterministic in BOTH forms (documented contract)
      val right = (1 to nR).map { j =>
        (rnd.nextInt(25).toLong, rnd.nextInt(500).toLong, s"p$j", j * 1.5)
      }.distinct.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .toDF("k", "ts", "tag", "v")
      val composed = AsOf.joinPrior(left, right, "k", "ts", Seq("tag", "v"))
      val merged = AsOf.joinPriorMerge(left, right, "k", "ts", Seq("tag", "v"))
      assert(merged.columns.toSeq === composed.columns.toSeq)
      assert(sortedRows(merged) === sortedRows(composed), s"seed $seed diverged")
    }
  }

  test("equivalence with joinPrior: string keys and timestamp times") {
    val rnd = new scala.util.Random(99L)
    val left = (1 to 400).map { i =>
      (i.toLong, "u" + rnd.nextInt(15), rnd.nextInt(100000).toLong)
    }.toDF("id", "k", "tus").withColumn("ts", timestamp_micros(col("tus"))).drop("tus")
    val right = (1 to 300).map { j =>
      ("u" + rnd.nextInt(18), rnd.nextInt(100000).toLong, j.toLong)
    }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      .toDF("k", "tus", "rid").withColumn("ts", timestamp_micros(col("tus"))).drop("tus")
    val composed = AsOf.joinPrior(left, right, "k", "ts", Seq("rid"))
    val merged = AsOf.joinPriorMerge(left, right, "k", "ts", Seq("rid"))
    assert(sortedRows(merged) === sortedRows(composed))
  }

  test("plan shape: AsofJoinExec node, no union/window, narrow exchanges") {
    val left = Seq((1L, 1L, 10L)).toDF("id", "k", "ts")
    val right = Seq((1L, 5L, "x")).toDF("k", "ts", "tag")
    val df = AsOf.joinPriorMerge(left, right, "k", "ts", Seq("tag"))
    df.count() // finalize AQE
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window"), "custom exec must not fall back to a window")
    assert(!plan.contains("Union"), "custom exec must not fall back to a union")
    // exactly the two key exchanges EnsureRequirements placed (the
    // union+window form shuffles the combined null-padded schema once;
    // here each side exchanges only its own columns)
    assert("Exchange".r.findAllIn(plan).size === 2, plan)
  }

  test("strictness: same-instant right row visible only when strict = false") {
    val left = Seq((1L, 7L, 100L)).toDF("id", "k", "ts")
    val right = Seq((7L, 100L, "at"), (7L, 50L, "before")).toDF("k", "ts", "tag")
    val strictRow = AsOf.joinPriorMerge(left, right, "k", "ts", Seq("tag"))
      .select($"asof.tag").as[String].collect()
    assert(strictRow.toSeq === Seq("before"))
    val lax = AsOf.joinPriorMerge(left, right, "k", "ts", Seq("tag"), strict = false)
      .select($"asof.tag").as[String].collect()
    assert(lax.toSeq === Seq("at"))
  }

  test("null semantics: null keys/times never match; no-match is a NULL struct") {
    val left = Seq(
      (1L, Some(1L), Some(100L)), // normal: matches
      (2L, None, Some(100L)),     // null key: no match
      (3L, Some(1L), None),       // null time: no match
      (4L, Some(9L), Some(100L))  // key with no right rows
    ).toDF("id", "k", "ts")
    val right = Seq(
      (Some(1L), Some(10L), "ok"),
      (Some(1L), None, "null-ts"),  // ignored
      (None, Some(5L), "null-key")  // ignored
    ).toDF("k", "ts", "tag")
    val out = AsOf.joinPriorMerge(left, right, "k", "ts", Seq("tag"))
      .select($"id", $"asof".isNull.as("miss"), $"asof.tag".as("tag"))
      .orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(1))).toSeq ===
      Seq((1L, false), (2L, true), (3L, true), (4L, true)))
    assert(out.head.getString(2) === "ok")
  }

  test("edges: empty right, empty left, left-only partitions") {
    val left = Seq((1L, 1L, 10L), (2L, 2L, 20L)).toDF("id", "k", "ts")
    val right = Seq((1L, 1L, "x")).toDF("k", "ts", "tag")
    val emptyR = right.filter(lit(false))
    assert(AsOf.joinPriorMerge(left, emptyR, "k", "ts", Seq("tag"))
      .filter($"asof".isNotNull).count() === 0)
    assert(AsOf.joinPriorMerge(left, emptyR, "k", "ts", Seq("tag")).count() === 2)
    val emptyL = left.filter(lit(false))
    assert(AsOf.joinPriorMerge(emptyL, right, "k", "ts", Seq("tag")).count() === 0)
    // key 2 has no right rows at all (its shuffle partition may hold
    // only left rows)
    val out = AsOf.joinPriorMerge(left, right, "k", "ts", Seq("tag"))
      .select($"id", $"asof.tag").orderBy("id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out(0).getString(1) === "x")
    assert(out(1).isNullAt(1))
  }

  test("self-join safety: both sides from the same source DataFrame") {
    val ev = Seq(
      (1L, 1L, 10L, "a"), (2L, 1L, 20L, "b"), (3L, 1L, 30L, "c")
    ).toDF("id", "k", "ts", "tag")
    val out = AsOf.joinPriorMerge(ev, ev, "k", "ts", Seq("id", "tag"))
      .select($"id", $"asof.id".as("prior_id")).orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSeq ===
      Seq((1L, -1L), (2L, 1L), (3L, 2L)))
  }

  // ---- NEAREST mode -------------------------------------------------

  test("equivalence with joinNearest: randomized corpora across tolerances") {
    for ((seed, tol) <- Seq((1L, 0L), (7L, 15L), (20260815L, 60L), (42L, 100000L))) {
      val rnd = new scala.util.Random(seed)
      val left = (1 to (300 + rnd.nextInt(300))).map { i =>
        (i.toLong, rnd.nextInt(20).toLong, rnd.nextInt(500).toLong)
      }.toDF("id", "k", "tus")
      // unique (k, tus): the determinism contract of BOTH forms
      val right = (1 to (200 + rnd.nextInt(400))).map { j =>
        (rnd.nextInt(25).toLong, rnd.nextInt(500).toLong, j.toLong, j * 1.5)
      }.groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
        .toDF("k", "tus", "rid", "v")
      val composed = AsOf.joinNearest(left, right, "k", "tus", Seq("rid", "v"), tol)
      val merged = AsOf.joinNearestMerge(left, right, "k", "tus", Seq("rid", "v"), tol)
      assert(merged.columns.toSeq === composed.columns.toSeq)
      // same shape up to nullability (the composed form's union path
      // marks the payload struct nullable; the exec knows it is not)
      assert(merged.schema("nearest").dataType.simpleString ===
        composed.schema("nearest").dataType.simpleString,
        s"seed $seed: nearest struct shape diverged")
      assert(sortedRows(merged) === sortedRows(composed), s"seed $seed tol $tol diverged")
    }
  }

  test("nearest: backward preferred on |delta| ties; tolerance excludes both sides") {
    val left = Seq((1L, 7L, 100L)).toDF("id", "k", "tus")
    val right = Seq((7L, 90L, "back"), (7L, 110L, "fwd")).toDF("k", "tus", "tag")
    def pick(tol: Long) =
      AsOf.joinNearestMerge(left, right, "k", "tus", Seq("tag"), tol)
        .select($"nearest.p.tag").collect().head
    assert(pick(10L).getString(0) === "back")   // tie: backward wins
    assert(pick(1000L).getString(0) === "back")
    val miss = AsOf.joinNearestMerge(left, right, "k", "tus", Seq("tag"), 5L)
      .select($"nearest".isNull).collect().head.getBoolean(0)
    assert(miss, "nothing within tolerance must be a NULL struct")
    // forward-only match
    val fwdOnly = AsOf.joinNearestMerge(left,
        right.filter($"tag" === "fwd"), "k", "tus", Seq("tag"), 10L)
      .select($"nearest.p.tag", $"nearest.t").collect().head
    assert(fwdOnly.getString(0) === "fwd" && fwdOnly.getLong(1) === 110L)
    // a delta-0 instant matches even at tolerance 0
    val at = AsOf.joinNearestMerge(left,
        Seq((7L, 100L, "at")).toDF("k", "tus", "tag"), "k", "tus", Seq("tag"), 0L)
      .select($"nearest.p.tag").collect().head
    assert(at.getString(0) === "at")
  }

  test("nearest: plan shape is the custom exec, no union/window; negative tolerance rejected") {
    val left = Seq((1L, 1L, 10L)).toDF("id", "k", "tus")
    val right = Seq((1L, 5L, "x")).toDF("k", "tus", "tag")
    val df = AsOf.joinNearestMerge(left, right, "k", "tus", Seq("tag"), 100L)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin"), plan)
    assert(!plan.contains("Window") && !plan.contains("Union"), plan)
    intercept[IllegalArgumentException] {
      AsOf.joinNearestMerge(left, right, "k", "tus", Seq("tag"), -1L)
    }
  }
}

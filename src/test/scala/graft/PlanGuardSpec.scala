package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.plans.{PlanGuard, PlanGuardRule}

/** Plan guardrails: scale-killer shapes detected at optimization time
  * (warn / strict via spark.graft.guard), engine's own bounded plans
  * stay silent.
  */
class PlanGuardSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def docs = Tables.load(spark, dir, "documents")

  test("global window over an unbounded scan is flagged") {
    val bad = docs.withColumn("rn",
      row_number().over(Window.orderBy(col("doc_id"))))
    val found = PlanGuard.findings(bad.queryExecution.optimizedPlan)
    assert(found.exists(_.contains("single-partition Window")))
  }

  test("low-cardinality window over doc-grain rows is flagged; scale-safe spellings stay silent") {
    // the seeded bad shape: rank every document of a language in ONE
    // window partition — correct on a sample, one multi-TB task at 100x
    val bad = docs.withColumn("rn", row_number().over(
      Window.partitionBy(col("lang")).orderBy(col("doc_id"))))
    val found = PlanGuard.findings(bad.queryExecution.optimizedPlan)
    assert(found.exists(_.contains("low-cardinality Window partition (lang)")), found)
    // same cumsum shape, partitioned by source
    val badCum = docs.withColumn("cum", sum(col("n_chars")).over(
      Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    assert(PlanGuard.findings(badCum.queryExecution.optimizedPlan)
      .exists(_.contains("low-cardinality Window partition (source)")))
    // the scale-safe replacements: range-decomposed grouped rank/cumsum
    val goodRank = graft.operators.Shuffle.groupedRank(
      docs.select(col("doc_id"), col("lang")), Seq("lang"), Seq("doc_id"), "rn")
    assert(PlanGuard.findings(goodRank.queryExecution.optimizedPlan) === Nil)
    val goodCum = graft.operators.Shuffle.groupedRunningSum(
      docs.select(col("doc_id"), col("lang"), col("n_chars")),
      Seq("lang"), Seq("doc_id"), col("n_chars"), "cum")
    assert(PlanGuard.findings(goodCum.queryExecution.optimizedPlan) === Nil)
    // group-grain inputs stay silent: a window over an aggregate is not
    // document-grain (its size is the group count, not the corpus)
    val agg = docs.groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("n").desc, col("source"))))
    assert(PlanGuard.findings(agg.queryExecution.optimizedPlan) === Nil)
    // high-cardinality partition keys stay silent
    val perDoc = docs.select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("t"))))
    assert(PlanGuard.findings(perDoc.queryExecution.optimizedPlan) === Nil)
  }

  test("unbounded collect_list over doc-grain rows is flagged; bounded spellings stay silent") {
    // the seeded bad shape (the r15 SetJoin finding class): bucket
    // membership as one array per key — a hot bucket (a million-copy
    // boilerplate doc in one LSH band) is a multi-GB unspillable row
    val bad = docs
      .select((col("doc_id") % 7).as("bucket"), col("doc_id"))
      .groupBy(col("bucket"))
      .agg(collect_list(col("doc_id")).as("members"))
    assert(PlanGuard.findings(bad.queryExecution.optimizedPlan)
      .exists(_.contains("unbounded collect_list")),
      PlanGuard.findings(bad.queryExecution.optimizedPlan))
    // collect_set is the same shape
    val badSet = docs
      .select(col("lang"), col("doc_id"))
      .groupBy(col("lang"))
      .agg(collect_set(col("doc_id")).as("members"))
    assert(PlanGuard.findings(badSet.queryExecution.optimizedPlan)
      .exists(_.contains("unbounded collect_list/collect_set")))
    // quiet 1: grouping by a per-row identity column — the array is
    // bounded by per-row content (the lines of one document)
    val perDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy(col("doc_id"))
      .agg(collect_list(col("t")).as("toks"))
    assert(PlanGuard.findings(perDoc.queryExecution.optimizedPlan) === Nil)
    // STILL flagged: the post-agg slice spelling. Spark evaluates the
    // slice in the result projection AFTER the aggregate — the agg
    // buffer materializes the full per-key array first, so
    // slice(collect_list(x), 1, k) has the same hot-key OOM as the
    // bare collect (the r17 ADVICE finding; the rule used to quiet it)
    val sliced = docs
      .select((col("doc_id") % 7).as("bucket"), col("doc_id"))
      .groupBy(col("bucket"))
      .agg(slice(sort_array(collect_list(col("doc_id"))), 1, 16).as("head"))
    assert(PlanGuard.findings(sliced.queryExecution.optimizedPlan)
      .exists(_.contains("unbounded collect_list")),
      PlanGuard.findings(sliced.queryExecution.optimizedPlan))
    // STILL flagged: grouping by a FUNCTION of a row id. doc_id % 16 is
    // a bucketing — each group is corpus-sized (N/16) — so referencing
    // a row-id column must not silence (the r17 ADVICE false negative)
    val sharded = docs
      .select(col("doc_id"), col("text"))
      .groupBy(pmod(col("doc_id"), lit(16)).as("shard"))
      .agg(collect_list(col("doc_id")).as("members"))
    assert(PlanGuard.findings(sharded.queryExecution.optimizedPlan)
      .exists(_.contains("unbounded collect_list")),
      PlanGuard.findings(sharded.queryExecution.optimizedPlan))
    // quiet: an ALIAS/CAST of a bare row-id attribute is still the
    // identity key (same value space, renamed)
    val aliased = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .groupBy(col("doc_id").cast("string").as("k"))
      .agg(collect_list(col("t")).as("toks"))
    assert(PlanGuard.findings(aliased.queryExecution.optimizedPlan) === Nil)
    // quiet 3: the engine's own giant-cluster guard — boundedMembers
    // splits each key's run into capped slices via a rank, so its
    // collect sits under a Window (prior structure, not doc-grain)
    val safe = graft.operators.TextDedup.boundedMembers(
      docs.select((col("doc_id") % 7).as("bucket"),
        col("doc_id").cast("long").as("id")),
      Seq("bucket"), groupSize = 64)
    assert(PlanGuard.findings(safe.queryExecution.optimizedPlan) === Nil)
    // quiet 4: group-grain child — a collect over an aggregate's output
    // is group-count-sized, not corpus-sized
    val overAgg = docs.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      .groupBy(lit(1).as("one"))
      .agg(collect_list(struct(col("lang"), col("n"))).as("rows"))
    assert(PlanGuard.findings(overAgg.queryExecution.optimizedPlan) === Nil)
  }

  test("k-means cluster windows are caught: the old protoPrune spelling flags, the groupedRank spelling is quiet") {
    import org.apache.spark.sql.SaveMode
    import org.apache.spark.sql.SaveMode
    // the round-15 bug shape: `cluster` is a k-means id (<= k values by
    // construction), so ranking a corpus-grain frame inside a
    // cluster-partitioned window puts ~N/k rows in ONE task's sort
    val assigned = docs.select(col("doc_id"),
      (col("doc_id") % 8).cast("long").as("cluster"), col("n_chars"))
    val bad = assigned.withColumn("proto_rank", row_number().over(
      Window.partitionBy(col("cluster"))
        .orderBy(col("n_chars").desc, col("doc_id"))))
    assert(PlanGuard.findings(bad.queryExecution.optimizedPlan)
      .exists(_.contains("low-cardinality Window partition (cluster)")))
    val badSize = assigned.withColumn("csize",
      count(lit(1)).over(Window.partitionBy(col("cluster"))))
    assert(PlanGuard.findings(badSize.queryExecution.optimizedPlan)
      .exists(_.contains("low-cardinality Window partition (cluster)")))
    // the fixed spelling: range-decomposed rank + broadcast counts
    val good = graft.operators.Shuffle.groupedRank(
      assigned.withColumn("__nk", -col("n_chars")),
      Seq("cluster"), Seq("__nk", "doc_id"), "proto_rank")
      .join(broadcast(assigned.groupBy("cluster")
        .agg(count(lit(1)).as("csize"))), Seq("cluster"))
    assert(PlanGuard.findings(good.queryExecution.optimizedPlan) === Nil)
  }

  test("protoPrune's plan carries no per-cluster corpus window (narrow proof)") {
    import spark.implicits._
    val vecs = (0L until 48L).map(i =>
      (i, Array.tabulate(4)(d => ((i * 13 + d * 7) % 17).toFloat / 17f)))
      .toDF("vec_id", "embedding")
    val out = graft.operators.Similarity.protoPrune(
      vecs, "vec_id", "embedding", k = 4, iters = 1, denom = 4)
    // guard-quiet on the optimized plan...
    assert(PlanGuard.findings(out.queryExecution.optimizedPlan) === Nil)
    // ...and structurally: any window partitioned by `cluster` alone
    // must sit over GROUP-GRAIN rows (an aggregate beneath — the
    // groupedRank offsets table, <= numParts + k rows), never over the
    // corpus itself (the old spelling's per-cluster single-task sort)
    val badClusterWindows = out.queryExecution.optimizedPlan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.nonEmpty &&
            w.partitionSpec.flatMap(_.references.map(_.name)).distinct == Seq("cluster") &&
            w.child.collectFirst {
              case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
            }.isEmpty =>
        w
    }
    assert(badClusterWindows.isEmpty,
      s"protoPrune must not rank the corpus inside a cluster-partitioned window: $badClusterWindows")
  }

  test("Shuffle.globalOrderIndex passes: its offsets window is provably bounded") {
    val out = graft.operators.Shuffle
      .globalOrderIndex(docs.select(col("doc_id")), "doc_id", 7L, "doc_id")
    assert(PlanGuard.findings(out.queryExecution.optimizedPlan) === Nil)
  }

  test("cross join flags only when both sides are unbounded") {
    val both = docs.crossJoin(docs.select(col("doc_id").as("d2")))
    assert(PlanGuard.findings(both.queryExecution.optimizedPlan)
      .exists(_.contains("cross join")))
    // 1-row scalar broadcast (global aggregate): bounded side -> silent
    val scalar = docs.crossJoin(docs.agg(count(lit(1)).as("n")))
    assert(PlanGuard.findings(scalar.queryExecution.optimizedPlan) === Nil)
  }

  test("theta-only join flags; adding an equi-key conjunct silences it") {
    val l = docs.select(col("doc_id").as("l_id"), col("n_chars").as("l_n"))
    val r = docs.select(col("doc_id").as("r_id"), col("n_chars").as("r_n"))
    val theta = l.join(r, col("l_n") < col("r_n"))
    assert(PlanGuard.findings(theta.queryExecution.optimizedPlan)
      .exists(_.contains("theta-only join")))
    val equi = l.join(r, col("l_id") === col("r_id") && col("l_n") < col("r_n"))
    assert(PlanGuard.findings(equi.queryExecution.optimizedPlan) === Nil)
  }

  test("live-session registration wires the guard into the optimizer (strict throws on execution path)") {
    GraftExtensions.register(spark)
    GraftExtensions.register(spark) // idempotent: no duplicate rule
    assert(spark.experimental.extraOptimizations
      .count(_.isInstanceOf[graft.plans.PlanGuardRule]) === 1)
    spark.conf.set("spark.graft.guard", "strict")
    try {
      val bad = docs.withColumn("rn",
        row_number().over(Window.orderBy(col("doc_id"))))
      val e = intercept[Exception] { bad.collect() }
      def scaleKiller(t: Throwable): Boolean = t != null &&
        (t.isInstanceOf[PlanGuard.ScaleKillerException] || scaleKiller(t.getCause))
      assert(scaleKiller(e), s"expected ScaleKillerException in cause chain, got $e")
    } finally spark.conf.set("spark.graft.guard", "warn")
  }

  test("strict mode throws, warn mode passes the plan through unchanged") {
    val bad = docs.withColumn("rn",
      row_number().over(Window.orderBy(col("doc_id"))))
      .queryExecution.optimizedPlan
    val rule = PlanGuardRule(spark)
    spark.conf.set("spark.graft.guard", "strict")
    try {
      intercept[PlanGuard.ScaleKillerException] { rule(bad) }
    } finally spark.conf.set("spark.graft.guard", "warn")
    assert(rule(bad) eq bad) // warn: inspect-only, same plan object back
  }
}

package graft

/** The harness property round 2 was missing: EVERY graded query in
  * [[SparkEntry.queries]] must execute end-to-end at sf0.001 inside
  * `sbt test`. A query that throws (like round 2's s1_rowid_scan, whose
  * failure Verify/Bench silently swallowed) now turns the build red
  * instead of silently vanishing from CORRECTNESS_r{N}.json.
  */
class SparkEntrySpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"graded query $name executes at sf0.001") {
      val n = fn(spark, dir).count() // must not throw
      assert(n >= 0)
    }
  }

  test("every oracle key has a matching query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracleSql entries without a query: $orphans")
  }

  test("every query has an oracle (or is a documented rows-only check)") {
    // sketch queries produce engine-specific estimates — deliberately
    // oracle-free, each bounded against its exact twin by a spec
    // (ApproxDistinctSpec, CorpusOpsSpec).
    val rowsOnly = Set("x_approx_distinct_parts",
      "x_approx_length_quantiles", "x_heavy_hitters_sketch")
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- rowsOnly
    assert(missing.isEmpty, s"queries without an oracle: $missing")
  }
}

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

  test("every query has an oracle") {
    // since round 8 even the sketch queries are oracle-checked: KMV and
    // CMS arithmetic is deterministic portable hashing, replayed in SQL
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without an oracle: $missing")
  }
}

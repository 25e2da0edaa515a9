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
}

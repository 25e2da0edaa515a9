package graft

import graft.queries.AggQueries

/** HLL sketch counts have no cross-engine oracle; bound them against
  * the exact distinct counts instead (rsd=0.01 -> generous 5% budget).
  */
class ApproxDistinctSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact per group") {
    val dir = "/root/testdata/sf0.001"
    val exact = AggQueries.distinctParts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = AggQueries.approxDistinctParts(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(exact.keySet === approx.keySet)
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.05, s"group $k: exact=$n approx=$a")
    }
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Shuffle, ZOrder}

/** Z-order interleave goldens + the bounded global rank that turns the
  * Morton key into a file layout.
  */
class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  private def z(a: Long, b: Long, bits: Int): Long =
    Seq((a, b)).toDF("a", "b")
      .select(ZOrder.zvalue(col("a"), col("b"), bits)).as[Long].head()

  test("zvalue interleave goldens (a even bits, b odd bits)") {
    assert(z(0L, 0L, 2) === 0L)
    assert(z(1L, 0L, 2) === 1L) // a bit0 -> pos 0
    assert(z(0L, 1L, 2) === 2L) // b bit0 -> pos 1
    assert(z(3L, 1L, 2) === 7L) // 0b11 ⨯ 0b01 -> 0b0111
    assert(z(1023L, 1023L, 10) === (1L << 20) - 1)
  }

  test("zvalue is monotone in each dimension holding the other fixed") {
    for (fix <- Seq(0L, 5L, 1023L)) {
      val as = (0L to 64L).map(a => z(a, fix, 10))
      assert(as === as.sorted, s"a-monotone at b=$fix")
      val bs = (0L to 64L).map(b => z(fix, b, 10))
      assert(bs === bs.sorted, s"b-monotone at a=$fix")
    }
  }

  test("globalRankBy matches a naive global sort rank, any partitioning") {
    val df = (1L to 500L).map(i => (i, (i * 7919) % 256)).toDF("id", "key")
    val naive = df.orderBy(col("key"), col("id"))
      .collect().map(_.getLong(0)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    for (parts <- Seq(1, 7)) {
      val got = Shuffle.globalRankBy(df.repartition(parts), "key",
          domainBits = 8, tieBreak = "id")
        .select("id", "pos").as[(Long, Long)].collect().toMap
      assert(got === naive, s"parts=$parts")
    }
  }

  test("globalRankBy never routes a window over a single partition") {
    val df = (1L to 200L).map(i => (i, i % 64)).toDF("id", "key")
    val out = Shuffle.globalRankBy(df, "key", domainBits = 6, tieBreak = "id")
    out.collect()
    val plan = out.queryExecution.executedPlan.toString
    // the offsets prefix-sum window is over <= 2^bucketBits rows and is
    // the only permitted unpartitioned piece; the per-row rank window
    // must be partitioned by bucket
    assert(plan.contains("Window"), plan)
  }
}

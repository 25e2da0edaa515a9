package graft

import org.apache.spark.sql.functions._

import graft.operators.PageRank

/** Integer PageRank goldens on tiny graphs — every value hand-computed
  * from the ppb recurrence, so the arithmetic contract (floor division,
  * teleport term, dangling-mass drop) is pinned exactly.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(
      vs: Seq[Long], es: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    PageRank.iterate(vs.toDF("id"), es.toDF("src", "dst"), iters)
      .as[(Long, Long)].collect().toMap

  test("3-cycle: symmetric ranks, 1 ppb rounding decay per round") {
    // n=3: base = 333333333, tele = (15 * base) div 100 = 49999999
    // r1 = tele + (85 * 333333333) div 100 = 49999999 + 283333333
    val r1 = ranks(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L), (3L, 1L)), 1)
    assert(r1 === Map(1L -> 333333332L, 2L -> 333333332L, 3L -> 333333332L))
    val r2 = ranks(Seq(1L, 2L, 3L), Seq((1L, 2L), (2L, 3L), (3L, 1L)), 2)
    // one more ppb lost: tele + (85 * 333333332) div 100 = 333333331
    assert(r2.values.toSet === Set(333333331L))
  }

  test("star: hub collects both contributions, leaves get teleport only") {
    // 2->1, 3->1; node 1 dangling (its mass drops, not redistributed)
    val r1 = ranks(Seq(1L, 2L, 3L), Seq((2L, 1L), (3L, 1L)), 1)
    // hub: 49999999 + (85 * 666666666) div 100 = 49999999 + 566666666
    assert(r1(1L) === 616666665L)
    assert(r1(2L) === 49999999L && r1(3L) === 49999999L)
  }

  test("out-degree split: contributions are rank div outdeg") {
    // 1 -> 2 and 1 -> 3 (outdeg 2); 2,3 dangling
    val r1 = ranks(Seq(1L, 2L, 3L), Seq((1L, 2L), (1L, 3L)), 1)
    // each leaf: tele + (85 * (333333333 div 2)) div 100
    //          = 49999999 + (85 * 166666666) div 100 = 49999999 + 141666666
    assert(r1(2L) === 191666665L && r1(3L) === 191666665L)
    assert(r1(1L) === 49999999L)
  }

  test("mass conservation within rounding on a regular graph") {
    // 2-out-regular over 10 nodes: total rank stays within iters*n ppb of SCALE
    val vs = (0L until 10L)
    val es = vs.flatMap(d => Seq((d, (d * 7 + 1) % 10), (d, (d * 13 + 3) % 10)))
    val r = ranks(vs, es, 5)
    val total = r.values.sum
    assert(total <= PageRank.Scale)
    assert(total >= PageRank.Scale - 5 * 10 * 60) // floor losses only
  }
}

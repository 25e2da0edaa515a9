package graft

import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._

import graft.expressions.MinHashKernel
import graft.operators.Winnow

/** Winnowing fingerprint selection (SIGMOD'03 / MOSS) — the O(P) deque
  * kernel pinned against a brute-force per-window reference (the
  * oracle's spelling), the paper's coverage guarantee, and the operator
  * plumbing.
  */
class WinnowSpec extends SparkSpec {

  /** Brute force: for every window, the rightmost minimum; distinct
    * selected positions — exactly the oracle SQL's formulation.
    */
  private def bruteWinnow(h: Array[Long], w: Int): Seq[Long] = {
    val p = h.length
    if (p == 0) return Seq.empty
    val we = math.min(w, p)
    val sel = scala.collection.mutable.LinkedHashSet.empty[Int]
    for (s <- 0 to p - we) {
      val window = (s until s + we)
      val m = window.map(h).min
      sel += window.filter(i => h(i) == m).max // rightmost min
    }
    sel.toSeq.sorted.map(i => (i + 1).toLong)
  }

  private def kernel(h: Array[Long], w: Int): Seq[Long] = {
    val out = MinHashKernel.winnowPositions(new GenericArrayData(h), w)
    (0 until out.numElements()).map(out.getLong)
  }

  test("kernel equals brute-force per-window rightmost-min on random arrays (incl. ties)") {
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 200) {
      val n = rnd.nextInt(30)
      // small value range on purpose: forces frequent ties
      val h = Array.fill(n)(rnd.nextInt(6).toLong)
      val w = 2 + rnd.nextInt(5)
      assert(kernel(h, w) === bruteWinnow(h, w), s"trial=$trial h=${h.toSeq} w=$w")
    }
  }

  test("kernel edge cases: empty, shorter than window, all-equal hashes") {
    assert(kernel(Array.empty[Long], 4) === Seq.empty)
    // p < w: one window over everything, rightmost min selected
    assert(kernel(Array(7L, 3L, 3L), 4) === Seq(3L))
    // all equal: rightmost of each window; first full window picks pos w,
    // then each slide re-selects — every position from w on is selected
    assert(kernel(Array(5L, 5L, 5L, 5L, 5L), 3) === Seq(3L, 4L, 5L))
  }

  test("coverage guarantee: a shared k+w-1 token run yields a shared fingerprint") {
    import spark.implicits._
    val run = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo" // 11 tokens = k+w-1
    val docs = Seq(
      (1L, s"one two three $run four five six seven eight nine ten eleven twelve"),
      (2L, s"totally different words everywhere $run unrelated closing words here also")
    ).toDF("doc_id", "text")
    val fps = Winnow.fingerprints(docs, "doc_id", "text", k = 8, w = 4)
    val byDoc = fps.collect().groupBy(_.getLong(0)).map { case (d, rs) =>
      d -> rs.map(_.getLong(2)).toSet
    }
    assert((byDoc(1L) intersect byDoc(2L)).nonEmpty)
  }

  test("sharedPairs finds the planted overlap and skips unrelated docs") {
    import spark.implicits._
    val overlap = (1 to 30).map(i => s"shared$i").mkString(" ")
    val docs = Seq(
      (1L, s"prefix words one $overlap suffix words one"),
      (2L, s"other prefix text $overlap completely different tail"),
      (3L, "nothing in common with the others at all in this document text")
    ).toDF("doc_id", "text")
    val pairs = Winnow.sharedPairs(docs, "doc_id", "text", k = 8, w = 4, minShared = 2L)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq === Seq((1L, 2L)))
  }

  test("fingerprint rows carry the hash at the selected shingle position") {
    import spark.implicits._
    val docs = Seq((1L, "a b c d e f g h i j k l m")).toDF("doc_id", "text")
    val viaOp = Winnow.fingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .orderBy("pos").collect().map(r => (r.getLong(1), r.getLong(2)))
    val hs = docs.select(
      graft.expressions.ShingleHashSeq60.shingle_hash_seq60(col("text"), 3))
      .collect()(0).getSeq[Long](0)
    for ((pos, fp) <- viaOp) assert(fp === hs(pos.toInt - 1))
    assert(viaOp.map(_._1) === bruteWinnow(hs.toArray, 4).toArray)
  }
}

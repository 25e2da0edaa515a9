package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.tools.MakeSf1

/** The sf1 synthesizer's honesty contract (pure helpers — no Spark):
  * per-copy mutation must DESTROY cross-copy similarity (so the 10x
  * corpus is 10x distinct documents, not 10 near-copies — round-12's
  * suffix-only variant inflated true near-dup pair counts 401x) while
  * PRESERVING within-copy similarity structure (so each copy's planted
  * dup density is the real sf0.1 density).
  */
class MakeSf1Spec extends AnyFunSuite {

  private def tokens(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").filterNot(_.isEmpty).toSeq

  private def shingles(s: String, w: Int = 3): Set[Seq[String]] = {
    val t = tokens(s)
    if (t.length < w) Set(t) else t.sliding(w).map(_.toSeq).toSet
  }

  private def jaccard(a: Set[Seq[String]], b: Set[Seq[String]]): Double =
    if (a.isEmpty && b.isEmpty) 1.0
    else (a intersect b).size.toDouble / (a union b).size

  private val base =
    "the quick brown fox jumps over the lazy dog while the " +
      "observer notes that quick reflexes beat slow deliberation " +
      "in nearly every contest of speed and agility ever recorded"
  // a planted near-dup: one word substituted, one inserted
  private val nearDup =
    "the quick brown fox leaps over the lazy dog while the careful " +
      "observer notes that quick reflexes beat slow deliberation " +
      "in nearly every contest of speed and agility ever recorded"

  test("copy 0 is verbatim; rename is deterministic and whitespace-preserving") {
    assert(MakeSf1.mutateText(base, 0) === base)
    assert(MakeSf1.mutateText(null, 3) === null)
    val m1 = MakeSf1.mutateText(base, 3)
    assert(m1 === MakeSf1.mutateText(base, 3))
    // every word carries the copy suffix; token count unchanged
    val toks = tokens(m1)
    assert(toks.length === tokens(base).length)
    assert(toks.forall(_.endsWith("q3z")))
    val weird = "a\tb\n\n  c   d\r\ne "
    val mw = MakeSf1.mutateText(weird, 5)
    // stripping the appended 'q5z' suffixes restores the original bytes
    assert(mw.replace("q5z", "") === weird)
  }

  test("within-copy Jaccard is EXACTLY preserved; cross-copy vocabulary is disjoint") {
    val j0 = jaccard(shingles(base), shingles(nearDup))
    assert(j0 > 0.5, s"fixture should be a near-dup pair, j=$j0")
    for (i <- 1 to 9) {
      val ji = jaccard(shingles(MakeSf1.mutateText(base, i)),
        shingles(MakeSf1.mutateText(nearDup, i)))
      // a vocabulary bijection maps shingle sets bijectively: the
      // within-copy Jaccard of any document pair is exactly sf0.1's
      assert(ji === j0, s"copy $i within-copy j=$ji vs base $j0")
    }
    for (i <- 1 to 9; j <- 0 until i) {
      val jx = jaccard(shingles(MakeSf1.mutateText(base, i)),
        shingles(MakeSf1.mutateText(base, j)))
      assert(jx === 0.0, s"copies $i,$j of the SAME doc share shingles: j=$jx")
      assert(tokens(MakeSf1.mutateText(base, i)).toSet
        .intersect(tokens(MakeSf1.mutateText(base, j)).toSet).isEmpty)
    }
  }

  test("signed permutation is a deterministic isometry with identity at copy 0") {
    val dim = 64
    val rng = new scala.util.Random(7)
    val a = Array.fill(dim)(rng.nextFloat() - 0.5f)
    val b = Array.fill(dim)(rng.nextFloat() - 0.5f)
    def dot(x: Array[Float], y: Array[Float]): Double =
      x.zip(y).map { case (p, q) => p.toDouble * q }.sum
    val (i0, s0) = MakeSf1.signedPerm(dim, 0)
    assert(MakeSf1.applySignedPerm(a.toSeq, i0, s0).toSeq === a.toSeq)
    for (c <- 1 to 9) {
      val (idx, sgn) = MakeSf1.signedPerm(dim, c)
      val (idx2, sgn2) = MakeSf1.signedPerm(dim, c)
      assert(idx.toSeq === idx2.toSeq && sgn.toSeq === sgn2.toSeq)
      assert(idx.sorted.toSeq === (0 until dim))
      val pa = MakeSf1.applySignedPerm(a.toSeq, idx, sgn)
      val pb = MakeSf1.applySignedPerm(b.toSeq, idx, sgn)
      // isometry: all inner products (hence cosines, L2) preserved
      assert(math.abs(dot(pa, pb) - dot(a, b)) < 1e-4)
      assert(math.abs(dot(pa, pa) - dot(a, a)) < 1e-4)
      // but the image is decorrelated from the original: |cos| well
      // below any dup threshold (expected ~1/sqrt(64))
      val cos = dot(a, MakeSf1.applySignedPerm(a.toSeq, idx, sgn)) /
        math.sqrt(dot(a, a) * dot(a, a))
      assert(math.abs(cos) < 0.5, s"copy $c image too correlated: $cos")
    }
    // distinct copies use distinct permutations
    val perms = (1 to 9).map(c => MakeSf1.signedPerm(dim, c)._1.toSeq).toSet
    assert(perms.size === 9)
  }
}

package graft

import org.apache.spark.sql.functions._

import graft.operators.{Fts, SpanCorrupt, TextAug}

/** T5 span corruption + seeded augmentation invariants. The mask is
  * hash-drawn, so tests assert STRUCTURAL invariants (reconstruction,
  * numbering, determinism) rather than pinned strings.
  */
class SpanCorruptSpec extends SparkSpec {
  import spark.implicits._

  private val Sentinel = "<extra_id_(\\d+)>".r

  lazy val corpus = (1L to 40L)
    .map(i => (i, s"alpha bravo charlie delta echo foxtrot golf hotel india juliet " +
      s"kilo lima mike november oscar papa quebec romeo sierra tango doc$i"))
    .toDF("doc_id", "text")

  test("span corruption: input + target splice back to the original token stream") {
    val out = SpanCorrupt.corrupt(corpus, "doc_id", "text", seed = 11L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getString(4)))
    val original = corpus
      .select(col("doc_id"), Fts.tokens(Seq(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    var sawSpan = false
    for ((id, nSpans, nCorrupted, input, target) <- out) {
      // parse target: "<extra_id_0> tok tok <extra_id_1> tok ..." -> span k -> tokens
      val spans = scala.collection.mutable.Map.empty[Int, Vector[String]]
      var cur = -1
      for (t <- target.split(" ").filter(_.nonEmpty)) t match {
        case Sentinel(k) => cur = k.toInt; spans(cur) = Vector.empty
        case tok => spans(cur) = spans(cur) :+ tok
      }
      assert(spans.keySet === (0 until nSpans.toInt).toSet, s"doc $id sentinel numbering")
      assert(spans.values.map(_.size).sum === nCorrupted, s"doc $id corrupted count")
      // splice spans back into the input at their sentinels
      val rebuilt = input.split(" ").filter(_.nonEmpty).flatMap {
        case Sentinel(k) => spans(k.toInt)
        case tok => Vector(tok)
      }.toSeq
      assert(rebuilt === original(id), s"doc $id reconstruction")
      if (nSpans > 0) sawSpan = true
    }
    assert(sawSpan, "mask rate 3/20 over 40 x 21 tokens must corrupt something")
  }

  test("span corruption: deterministic per seed, redrawn across seeds") {
    def run(seed: Long) = SpanCorrupt.corrupt(corpus, "doc_id", "text", seed)
      .collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    assert(run(11L) === run(11L))
    assert(run(11L) !== run(12L))
  }

  test("token dropout: subsequence preserved, counts consistent, seed-deterministic") {
    val out = TextAug.tokenDropout(corpus, "doc_id", "text", seed = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val original = corpus
      .select(col("doc_id"), Fts.tokens(Seq(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    var dropped = 0L
    for ((id, nTokens, nKept, aug) <- out) {
      val kept = aug.split(" ").filter(_.nonEmpty).toSeq
      assert(nTokens === original(id).size && nKept === kept.size)
      // kept must be a subsequence of the original token stream
      val it = original(id).iterator
      assert(kept.forall(t => it.contains(t)), s"doc $id not a subsequence")
      dropped += nTokens - nKept
    }
    val total = out.map(_._2).sum
    assert(dropped > 0 && dropped < total / 5, s"~10% drop expected, got $dropped/$total")
    val again = TextAug.tokenDropout(corpus, "doc_id", "text", seed = 5L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq === again.toSeq)
  }

  test("highlight marks every match, whole document") {
    val docs = Seq((1L, "a Fox and a dog and a fox")).toDF("id", "txt")
    val got = docs.select(Fts.highlight(Seq(col("txt")), "fox dog"))
      .collect()(0).getString(0)
    assert(got === "a <b>fox</b> and a <b>dog</b> and a <b>fox</b>")
  }

  test("FIM: PSM parts partition the token stream in order; seed-deterministic") {
    val out = TextAug.fimTransform(corpus, "doc_id", "text", seed = 3L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
    val original = corpus
      .select(col("doc_id"), Fts.tokens(Seq(col("text"))).as("t"))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val cuts = scala.collection.mutable.Set.empty[(Long, Long)]
    for ((id, np, nm, ns, fim) <- out) {
      assert(np + nm + ns === original(id).size, s"doc $id parts must partition")
      val body = fim.split(" ").filter(_.nonEmpty).toSeq
      assert(body.head === "<PRE>")
      val pre = body.slice(1, 1 + np.toInt)
      val sufAt = 1 + np.toInt
      assert(body(sufAt) === "<SUF>")
      val suf = body.slice(sufAt + 1, sufAt + 1 + ns.toInt)
      val midAt = sufAt + 1 + ns.toInt
      assert(body(midAt) === "<MID>")
      val mid = body.drop(midAt + 1)
      assert(pre ++ mid ++ suf === original(id), s"doc $id reorder must invert")
      cuts += ((np, nm))
    }
    assert(cuts.size > 5, "cut points must vary across documents")
    val again = TextAug.fimTransform(corpus, "doc_id", "text", seed = 3L)
      .collect().map(r => (r.getLong(0), r.getString(4))).toMap
    assert(out.map(r => (r._1, r._5)).toMap === again)
  }

  test("semantic chunks: planted topic shift opens a boundary; cohesive text does not") {
    import graft.operators.SemanticChunk
    val topicA = "alpha beta gamma delta " * 4    // 16 tokens = 2 segments, same vocab
    val topicB = "zulu yankee xray whiskey " * 2  // 8 tokens = 1 segment, disjoint vocab
    val docs = Seq((1L, topicA + topicB)).toDF("doc_id", "text")
    val segs = SemanticChunk.chunks(docs, "doc_id", "text",
      segTokens = 8, dims = 16, minCohesion = 0.2)
      .orderBy("seg_no").collect()
      .map(r => (r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(segs.length === 3)
    assert(segs(0) === ((0L, -1.0, 0L)))
    assert(segs(1)._2 === 1.0 && segs(1)._3 === 0L, "identical vocab stays one chunk")
    assert(segs(2)._2 < 0.2 && segs(2)._3 === 1L, "topic shift opens chunk 1")
  }
}

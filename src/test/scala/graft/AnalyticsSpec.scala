package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Kmv
import graft.queries.AnalyticsQueries

/** Round-6 analytics extensions: KMV sketch guarantees, script
  * detection, collocation lift, edit-distance verification.
  */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  /** Mini documents table on disk, same schema as the testdata corpus. */
  private lazy val miniDir: String = {
    val dir = Files.createTempDirectory("graft-analytics").toString
    val rows = Seq(
      (0L, "the quick brown fox jumps over the lazy dog", "en", "src0"),
      (1L, "the quick brown fox naps under the old tree", "en", "src0"),
      (2L, "machine learning on big data with spark engines", "en", "src1"),
      (3L, "der schnelle braune fuchs springt", "de", "src1"),
      (4L, "le renard brun rapide saute", "fr", "src2"),
      (5L, "el zorro marron rapido salta", "es", "src2")
    ).toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
    rows.coalesce(1).write.mode("overwrite")
      .parquet(s"$dir/documents.parquet")
    dir
  }

  // ---------------- Kmv ----------------

  test("KMV: under-filled group reports the EXACT distinct count") {
    val df = Seq(("a", "x"), ("a", "y"), ("a", "x"), ("b", "z"))
      .toDF("g", "v")
    val got = Kmv.distinctSketch(df, "g", "v", k = 64)
      .select("g", "k_seen", "est_distinct")
      .as[(String, Long, Long)].collect()
      .map { case (g, k, e) => g -> ((k, e)) }.toMap
    assert(got("a") === ((2L, 2L)))
    assert(got("b") === ((1L, 1L)))
  }

  test("KMV: saturated sketch estimates within 35% of truth") {
    val n = 5000
    val df = (1 to n).map(i => ("g", s"value_$i")).toDF("g", "v")
    val Array((kSeen, est)) = Kmv.distinctSketch(df, "g", "v", k = 64)
      .select("k_seen", "est_distinct").as[(Long, Long)].collect()
    assert(kSeen === 64L)
    // (k-1)/sqrt variance: 1/sqrt(63) ~ 12.6%; 35% is a 3-sigma-ish bound
    assert(math.abs(est - n).toDouble / n < 0.35, s"est=$est truth=$n")
  }

  test("KMV: partitioning-invariant (deterministic bottom-k)") {
    val df = (1 to 2000).map(i => ("g", s"tok$i")).toDF("g", "v")
    val a = Kmv.distinctSketch(df.repartition(1), "g", "v", k = 32)
      .select("kth_min", "est_distinct").as[(Long, Long)].collect().head
    val b = Kmv.distinctSketch(df.repartition(13), "g", "v", k = 32)
      .select("kth_min", "est_distinct").as[(Long, Long)].collect().head
    assert(a === b)
  }

  test("bottomKByHash: two-stage rank equals one global rank, any partitioning") {
    val df = (1L to 3000L).map(i => (s"g${i % 3}", i, Kmv.HashDomain - (i * 7919L % Kmv.HashDomain)))
      .toDF("g", "id", "h")
    // single-window reference (fanout=1 degenerates to one global rank)
    val ref = Kmv.bottomKByHash(df.repartition(1), "g", "h", "id", k = 50, fanout = 1)
      .select("g", "id", "sample_rk").as[(String, Long, Int)].collect().toSet
    val got = Kmv.bottomKByHash(df.repartition(11), "g", "h", "id", k = 50, fanout = 8)
      .select("g", "id", "sample_rk").as[(String, Long, Int)].collect().toSet
    assert(got === ref)
    assert(got.groupBy(_._1).forall(_._2.size == 50))
  }

  test("bottomKByHash: under-filled group keeps every row, ranks dense") {
    val df = Seq(("a", 1L, 5L), ("a", 2L, 3L), ("b", 9L, 1L)).toDF("g", "id", "h")
    val got = Kmv.bottomKByHash(df, "g", "h", "id", k = 10)
      .select("g", "id", "sample_rk").as[(String, Long, Int)].collect().toSet
    assert(got === Set(("a", 2L, 1), ("a", 1L, 2), ("b", 9L, 1)))
  }

  test("KMV Aggregator: bit-identical to the window-based sketch (mergeable path)") {
    val terms = graft.queries.AnalyticsQueries
      .kmvDistinct(spark, "/root/testdata/sf0.001") // forces same corpus shape
    val raw = Tables.load(spark, "/root/testdata/sf0.001", "documents")
      .select(col("lang"), explode(graft.operators.Fts.tokens(Seq(col("text")))).as("term"))
    val viaWindow = Kmv.distinctSketch(raw, "lang", "term", k = 64)
      .select("lang", "k_seen", "kth_min", "est_distinct")
      .as[(String, Long, Long, Long)].collect().toSet
    val viaAgg = raw.repartition(7)
      .groupBy("lang")
      .agg(Kmv.sketchAgg(Kmv.hash30(col("term")), k = 64).as("s"))
      .select(col("lang"), col("s.k_seen"), col("s.kth_min"), col("s.est_distinct"))
      .as[(String, Long, Long, Long)].collect().toSet
    assert(viaAgg === viaWindow)
    assert(terms.count() > 0)
  }

  // ---------------- scriptMix ----------------

  test("scriptMix: planted Cyrillic/CJK suffixes detected; dominant tie-break order") {
    val rows = AnalyticsQueries.scriptMix(spark, miniDir)
      .select("doc_id", "n_cyrillic", "n_cjk", "dominant")
      .as[(Long, Long, Long, String)].collect()
      .map { case (id, cy, cj, d) => id -> ((cy, cj, d)) }.toMap
    // doc 0: +" Привет мир" -> 9 Cyrillic letters, but Latin text dominates
    assert(rows(0L) === ((9L, 0L, "latin")))
    // doc 1: +" 你好世界" -> 4 CJK chars
    assert(rows(1L) === ((0L, 4L, "latin")))
    // doc 2: ASCII suffix only
    assert(rows(2L) === ((0L, 0L, "latin")))
  }

  test("scriptMix: dominant flips when non-Latin outweighs Latin") {
    // direct expression-level check through a crafted corpus
    val dir = Files.createTempDirectory("graft-cyr").toString
    Seq((3L, "Проверка связи и ещё текст", "ru", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val Array((dom, cyr, lat)) = AnalyticsQueries.scriptMix(spark, dir)
      .select("dominant", "n_cyrillic", "n_latin")
      .as[(String, Long, Long)].collect()
    assert(cyr > lat)
    assert(dom === "cyrillic")
  }

  // ---------------- collocations ----------------

  test("collocations: repeated adjacent pair ranks above cross-products of common words") {
    // "quick brown" occurs in docs 0,1 -> pair_cnt 2 < 5 threshold on the
    // mini corpus, so run the operator pieces with threshold via a
    // replicated corpus: 5 copies lifts pair counts over the gate
    val dir = Files.createTempDirectory("graft-coll").toString
    val base = (0 until 5).flatMap(rep => Seq(
      (rep * 10L, "alpha beta gamma delta", "en", "src0"),
      (rep * 10L + 1L, "alpha beta epsilon zeta", "en", "src0")))
    base.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length($"text").cast("long"))
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = AnalyticsQueries.collocations(spark, dir)
      .select("bigram", "pair_cnt", "lift_e6")
      .as[(String, Long, Long)].collect()
    val byBigram = rows.map(r => r._1 -> r).toMap
    // "alpha beta" has pair 10, c1=c2=10; "beta gamma" pair 5 with c1=10,c2=5
    assert(byBigram("alpha beta")._2 === 10L)
    assert(byBigram("beta gamma")._2 === 5L)
    // exact scaled-integer lift: T=40, TB=30;
    // s1 = 1600 div (c1·c2), s2 = pair·10⁶ div 30, lift = s1·s2 div 10⁶
    assert(byBigram("alpha beta")._3 === 5L) // 16 * 333333 div 1e6
    assert(byBigram("beta gamma")._3 === 5L) // 32 * 166666 div 1e6 (same true lift)
    // output sorted by lift desc then bigram
    assert(rows.map(r => (-r._3, r._1)).toSeq === rows.map(r => (-r._3, r._1)).toSeq.sorted)
  }

  // ---------------- Bpe ----------------

  test("BPE: hand-computed merge sequence and greedy fold on a 3-word table") {
    val words = Seq(("aaab", 3L), ("aab", 2L), ("ab", 1L)).toDF("word", "cnt")
    val (merges, state) = graft.operators.Bpe.train(words, rounds = 3)
    // r1: (a,a) 8 beats (a,b) 6; r2: (a,b) 4 beats (aa,a) 3; r3: (aa,ab) 3
    assert(merges.map(m => (m.round, m.lsym, m.rsym, m.pairCnt)) ===
      Seq((1, "a", "a", 8L), (2, "a", "b", 4L), (3, "aa", "ab", 3L)))
    val syms = state.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(syms("aaab") === Seq("aaab"))
    assert(syms("aab") === Seq("aa", "b"))
    assert(syms("ab") === Seq("ab"))
  }

  test("BPE: segmentation always concatenates back to the word; symbols nonempty") {
    // seeded pseudo-vocab with repeats so merges actually fire
    val rnd = new scala.util.Random(7)
    val vocab = Seq.tabulate(200) { i =>
      val len = 2 + rnd.nextInt(8)
      val w = Seq.fill(len)(('a' + rnd.nextInt(4)).toChar).mkString
      (w, 1L + rnd.nextInt(20))
    }.distinct
    val (merges, state) = graft.operators.Bpe.train(
      vocab.toDF("word", "cnt"), rounds = 6)
    assert(merges.nonEmpty)
    val rows = state.select("word", "syms").as[(String, Seq[String])].collect()
    rows.foreach { case (word, syms) =>
      assert(syms.mkString("") === word, s"lossy segmentation of $word: $syms")
      assert(syms.forall(_.nonEmpty))
    }
    // determinism: retraining yields the identical merge table
    val (merges2, _) = graft.operators.Bpe.train(
      vocab.toDF("word", "cnt").repartition(5), rounds = 6)
    assert(merges2 === merges)
  }

  test("BPE: merge table round-trips through parquet and re-applies identically") {
    val words = Seq(("aaab", 3L), ("aab", 2L), ("ab", 1L), ("ba", 4L)).toDF("word", "cnt")
    val (merges, state) = graft.operators.Bpe.train(words, rounds = 3)
    val path = Files.createTempDirectory("graft-bpe").resolve("merges").toString
    graft.operators.Bpe.saveMerges(spark, merges, path)
    val loaded = graft.operators.Bpe.loadMerges(spark, path)
    assert(loaded === merges)
    // applying the loaded merges to the SAME vocab reproduces training state
    val reapplied = graft.operators.Bpe.applyMerges(words, loaded)
      .select("word", "syms").as[(String, Seq[String])].collect().toMap
    val trained = state.select("word", "syms")
      .as[(String, Seq[String])].collect().toMap
    assert(reapplied === trained)
    // and segments UNSEEN words with the learned merges
    val novel = graft.operators.Bpe.applyMerges(
        Seq(("aabb", 1L)).toDF("word", "cnt"), loaded)
      .select("syms").as[Seq[String]].collect().head
    // merges: (a,a), (a,b), (aa,ab): "aabb" -> [aa,b,b] -> no (a,b) adjacency
    assert(novel === Seq("aa", "b", "b"))
  }

  test("BPE: training stops early when no pairs remain") {
    val words = Seq(("ab", 1L)).toDF("word", "cnt")
    val (merges, state) = graft.operators.Bpe.train(words, rounds = 10)
    assert(merges.map(m => (m.lsym, m.rsym, m.pairCnt)) === Seq(("a", "b", 1L)))
    assert(state.select("syms").as[Seq[String]].collect().head === Seq("ab"))
  }

  // ---------------- editVerify ----------------

  test("editVerify: near-identical prefix pairs carry high prefix_sim_ppm") {
    // the planted near-dups (first two tokens dropped) over the real
    // sf0.001 corpus: every surviving pair must stay above 50% prefix
    // similarity and the columns must satisfy the ppm identity
    val rows = AnalyticsQueries.editVerify(spark, "/root/testdata/sf0.001")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (a, b, lev, ppm) =>
      assert(a < b)
      assert(lev >= 0L && ppm >= 0L && ppm <= 1000000L)
    }
    // at least one planted pair (id + 1000000) present with sim >= 50%
    assert(rows.exists { case (a, b, _, ppm) => b - a == 1000000L && ppm >= 500000L })
  }

  // ---------------- corrStats / pivot ----------------

  test("histEmd: dense 256-bin axis, ppm masses bounded, contributions are |cum diff| and the cumulative closes near zero") {
    val rows = AnalyticsQueries.histEmd(spark, "/root/testdata/sf0.001")
      .collect()
    assert(rows.length === 256, "dense clamped axis: exactly 256 bins")
    assert(rows.map(_.getAs[Long]("bin")).toSeq === (0L until 256L).toSeq)
    // each side's ppm masses are sane: nonnegative, sum <= 1e6 (floor div)
    val pSum = rows.map(_.getAs[Long]("p_ppm")).sum
    val qSum = rows.map(_.getAs[Long]("q_ppm")).sum
    assert(rows.forall(r => r.getAs[Long]("p_ppm") >= 0 && r.getAs[Long]("q_ppm") >= 0))
    assert(pSum <= 1000000L && pSum > 900000L, s"p mass $pSum")
    assert(qSum <= 1000000L && qSum > 900000L, s"q mass $qSum")
    // emd contribution is |cum diff| per bin; the sources genuinely differ
    assert(rows.forall(r =>
      r.getAs[Long]("emd_contrib_ppm") === math.abs(r.getAs[Long]("cum_diff_ppm"))))
    // last cumulative = total mass imbalance from floor division only
    assert(math.abs(rows.last.getAs[Long]("cum_diff_ppm")) < 512,
      "distributions both (nearly) sum to 1e6, so cum diff must return to ~0")
  }

  test("corrStats: chars and token counts are strongly positively correlated") {
    val rows = AnalyticsQueries.corrStats(spark, "/root/testdata/sf0.001")
      .select("lang", "corr_e6").as[(String, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, c) =>
      assert(c > 500000L, s"$lang corr_e6=$c — expected > 0.5")
      assert(c <= 1000000L)
    }
  }

  test("pivotSources: per-source lang counts sum to the source total") {
    val df = AnalyticsQueries.pivotSources(spark, "/root/testdata/sf0.001")
    val bad = df.filter(
      col("n_de") + col("n_en") + col("n_es") + col("n_fr") + col("n_zh")
        =!= col("n_total")).count()
    assert(bad === 0L)
    assert(df.count() === 20L)
  }
}

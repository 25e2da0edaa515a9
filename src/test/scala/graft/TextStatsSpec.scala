package graft

import org.apache.spark.sql.functions._

import graft.expressions.RollingHash
import graft.operators.{Sampling, TextStats}

class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("langId: stopword argmax with 'und' fallback and alphabetical ties") {
    val df = Seq(
      (1L, "the cat and the dog of the house"),   // en
      (2L, "der hund und die katze ist nicht"),   // de
      (3L, "le chat et les chiens pour dans"),    // fr
      (4L, "el gato y los perros que por"),       // es
      (5L, "zzz qqq xxx")                         // none -> und
    ).toDF("id", "text")
    val out = df.select($"id", TextStats.langId($"text").as("lang")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out === Map(1L -> "en", 2L -> "de", 3L -> "fr", 4L -> "es", 5L -> "und"))
  }

  test("quality: exact count arithmetic") {
    val df = Seq((1L, "the quick fox!!")).toDF("id", "text")
    val q = df.select(TextStats.quality($"text").as("q")).select("q.*").head
    assert(q.getAs[Long]("n_chars") === 15L)
    assert(q.getAs[Long]("n_tokens") === 3L)
    // alnum = 11 ("thequickfox"), spaces = 2, punct = 2
    assert(q.getAs[Double]("punct_ratio") === 2.0 / 15.0)
    assert(q.getAs[Double]("mean_token_len") === 11.0 / 3.0)
    assert(q.getAs[Double]("stopword_ratio") === 1.0 / 3.0)
  }

  test("token counts: whitespace vs BPE-ish") {
    val df = Seq((1L, "Hello world42, it's 3.14!")).toDF("id", "text")
    val r = df.select(
      TextStats.wsTokenCount($"text").as("ws"),
      TextStats.bpeishTokenCount($"text").as("bpe")).head
    assert(r.getAs[Long]("ws") === 4L)
    // hello | world | 42 | , | it | ' | s | 3 | . | 14 | !
    assert(r.getAs[Long]("bpe") === 11L)
  }

  test("native stopword-hit count matches the HOF isin spelling with multiplicity") {
    import graft.operators.Fts
    val texts = Seq(
      "the cat and the dog and the bird",  // 'the' x3, 'and' x2
      "DER Hund IST nicht der Gleiche",
      "no stop words here whatsoever",
      "",
      "le la les et est"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    for (words <- TextStats.stopwords.values.toSeq :+
        TextStats.stopwords.values.flatten.toSeq.distinct) {
      val rows = texts.select($"id",
        graft.expressions.StopwordHits.stopword_hits($"text", words).as("native"),
        TextStats.hitCountHof(Fts.tokens(Seq($"text")), words).cast("long").as("hof"))
        .collect()
      rows.foreach(r => assert(r.getLong(1) === r.getLong(2),
        s"hit counts differ for id ${r.getLong(0)} words=$words"))
    }
  }

  test("split assignment: deterministic, content-keyed, respects percentages") {
    import graft.operators.Sampling
    val df = (0 until 500).map(i => (i.toLong, s"document number $i with some text"))
      .toDF("id", "text")
    val out = df.select($"id",
      Sampling.hashBucket($"text", 1000).as("bucket"),
      Sampling.splitLabel(Sampling.hashBucket($"text", 1000), 90, 5).as("split"))
      .collect()
    assert(out.forall(r => { val b = r.getLong(1); b >= 0 && b < 1000 }))
    val bySplit = out.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    assert(bySplit.keySet.subsetOf(Set("train", "validation", "test")))
    assert(bySplit("train") > 400, s"~90% expected train, got $bySplit")
    // deterministic: same content -> same split, independent of id
    val again = df.orderBy($"id".desc).select(
      Sampling.splitLabel(Sampling.hashBucket($"text", 1000), 90, 5)).collect()
      .map(_.getString(0))
    assert(again.sorted.toSeq === out.map(_.getString(2)).sorted.toSeq)
    // sample predicate keeps roughly pct%
    val kept = df.filter(Sampling.samplePredicate($"text", 10)).count()
    assert(kept > 20 && kept < 90, s"~10% of 500 expected, got $kept")
  }

  test("redaction scrubs emails and urls, counts with multiplicity") {
    import graft.operators.Redact
    val df = Seq(
      (1L, "write to a.b+c@mail.example.org or see https://x.org/y?z=1 now"),
      (2L, "two mails: a@b.co b@c.io"),
      (3L, "no pii here")
    ).toDF("id", "text")
    val out = df.select($"id",
      Redact.countEmails($"text").as("ne"),
      Redact.countUrls($"text").as("nu"),
      Redact.scrub($"text").as("clean")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    assert(out(1L)._1 === 1L)
    assert(out(1L)._2 === 1L)
    assert(out(1L)._3 === "write to <EMAIL> or see <URL> now")
    assert(out(2L) === ((2L, 0L, "two mails: <EMAIL> <EMAIL>")))
    assert(out(3L) === ((0L, 0L, "no pii here")))
  }

  test("stratified sampling keeps ceil(pct%) of each stratum, best-score-first") {
    val df = Seq(
      // stratum "en": 5 rows -> ceil(5*0.4)=2 kept, the two best scores
      (1L, "en", 0.9), (2L, "en", 0.7), (3L, "en", 0.5), (4L, "en", 0.3), (5L, "en", 0.1),
      // stratum "de": 2 rows -> ceil(2*0.4)=1 kept; tie broken by id
      (6L, "de", 0.6), (7L, "de", 0.6)
    ).toDF("id", "lang", "score")
    val out = Sampling.stratifiedTopPct(df, "lang", "id", "score", 40)
      .select($"id", $"stratum_rank").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 2L, 6L -> 1L))
  }

  test("stratified sampling: NULL stratum is its own stratum; NULL score raises") {
    // NULL stratum (failed language-ID) must be RANKED, not silently
    // dropped by the count join — the null-safe <=> join keeps it
    val withNull = Seq(
      (1L, Some("en"), Some(0.9)), (2L, Some("en"), Some(0.1)),
      (3L, None, Some(0.8)), (4L, None, Some(0.6)), (5L, None, Some(0.2))
    ).toDF("id", "lang", "score")
    val kept = Sampling.stratifiedTopPct(withNull, "lang", "id", "score", 40)
      .select($"id").as[Long].collect().toSet
    // en: ceil(2*0.4)=1 -> id 1; NULL: ceil(3*0.4)=2 -> ids 3, 4
    assert(kept === Set(1L, 3L, 4L))
    // a NULL score would otherwise sort first (= stratum best) — loud
    val nullScore = Seq((1L, "en", Some(0.9)), (2L, "en", None: Option[Double]))
      .toDF("id", "lang", "score")
    val e = intercept[Exception] {
      Sampling.stratifiedTopPct(nullScore, "lang", "id", "score", 40).collect()
    }
    assert(e.getMessage != null)
    // ... and the diagnostic survives even when the offending row's ID
    // is ALSO NULL (plain concat would null the whole message and
    // raise_error would fire with a null text)
    val nullBoth = Seq(
      (Some(1L), "en", Some(0.9)),
      (None: Option[Long], "en", None: Option[Double])
    ).toDF("id", "lang", "score")
    val e2 = intercept[Exception] {
      Sampling.stratifiedTopPct(nullBoth, "lang", "id", "score", 40).collect()
    }
    assert(exceptionChain(e2).exists(t => Option(t.getMessage)
      .exists(m => m.contains("stratifiedTopPct") && m.contains("NULL"))))
  }

  test("chunking: strided windows, short tail, single chunk for short/empty docs") {
    import graft.operators.Chunk
    val df = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11"), // 11 toks: starts 0,3,6,9
      (2L, "a b"),                                 // <= chunk size: one chunk
      (3L, "")                                     // empty: one empty chunk
    ).toDF("doc_id", "text")
    val out = Chunk.chunkDocs(df, "doc_id", "text", chunkTokens = 4, stride = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getString(2), r.getLong(3)))).toMap
    assert(out((1L, 0L)) === (("t1 t2 t3 t4", 4L)))
    assert(out((1L, 1L)) === (("t4 t5 t6 t7", 4L)))
    assert(out((1L, 2L)) === (("t7 t8 t9 t10", 4L)))
    assert(out((1L, 3L)) === (("t10 t11", 2L)))
    assert(out((2L, 0L)) === (("a b", 2L)))
    assert(out((3L, 0L)) === (("", 0L)))
    assert(out.size === 6)
  }

  test("repetition metrics: exact dup-ngram fractions and token diversity") {
    val df = Seq(
      (1L, "a b a b a"),   // 5 toks / 2 distinct; 2-grams 4/2 dup; 3-grams 3/2
      (2L, "x y z"),       // all unique; single 3-gram
      (3L, "")             // empty: ratio 1.0, degenerate shingle unique
    ).toDF("id", "text")
    val out = df.select($"id", TextStats.repetition($"text").as("r"))
      .select($"id", $"r.n_tokens", $"r.distinct_token_ratio",
        $"r.dup_2gram_frac", $"r.dup_3gram_frac").collect()
      .map(r => r.getLong(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))).toMap
    assert(out(1L) === ((5L, 0.4, 0.5, 0.333333)))
    assert(out(2L) === ((3L, 1.0, 0.0, 0.0)))
    assert(out(3L) === ((0L, 1.0, 0.0, 0.0)))
  }

  test("url redaction stops at any whitespace, not just spaces") {
    import graft.operators.Redact
    val df = Seq(
      (1L, "see https://x.org/a\nnext line stays"),
      (2L, "tabbed https://y.io/b\tafter")
    ).toDF("id", "text")
    val out = df.select($"id",
      Redact.countUrls($"text").as("nu"),
      Redact.scrub($"text").as("clean")).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) === ((1L, "see <URL>\nnext line stays")))
    assert(out(2L) === ((1L, "tabbed <URL>\tafter")))
  }

  test("rolling hash: codegen matches interpreted compute, order-sensitive") {
    val df = Seq((1L, "abc"), (2L, "cba"), (3L, "")).toDF("id", "text")
    val out = df.select($"id", RollingHash.rolling_hash($"text").as("h")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out(1L) === RollingHash.compute("abc"))
    assert(out(1L) === ((('a' * 31L + 'b') * 31L + 'c') % 1000000007L))
    assert(out(1L) !== out(2L))
    assert(out(3L) === 0L)
  }
}

package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.{Extract, Fts}
import graft.operators.Extract.Source
import graft.sources.CsvLoader

/** S10–S13 goldens — MATCH semantics (implicit AND, case-insensitive,
  * cross-column), extracted-column reconstruction before indexing, and
  * the inverted-index path
  * (`tests/test_csvs_to_sqlite.py:167-188, 200-229, 263-281`).
  */
class FtsSpec extends SparkSpec {

  lazy val election = CsvLoader.load(spark, tempCsv("test.csv", Fixtures.CSV))
  val ftsCols = Seq("office", "party", "candidate")

  test("match 'president gloria': implicit AND across columns, case-insensitive (golden :176-188)") {
    val hits = election
      .filter(Fts.matches(ftsCols.map(col), "president gloria"))
      .select("county", "precinct", "office", "party", "candidate")
    assert(hits.collect().toSeq === Seq(
      Row("Yolo", 100001, "President", "PAF", "Gloria Estela La Riva")))
  }

  test("extracted columns are indexed through reconstruction joins (golden :200-229)") {
    val dicts = Seq("office", "party", "candidate").map { c =>
      c -> Extract.buildDictionary(Seq(Source(election, c)))
    }.toMap
    val encoded = dicts.foldLeft(election) { case (df, (c, d)) => Extract.encode(df, c, d) }
    // the reference LEFT JOINs each lookup to index ORIGINAL strings (utils.py:400-432)
    val reconstructed = dicts.foldLeft(encoded) { case (df, (c, d)) =>
      Extract.reconstruct(df, c, d)
    }
    val hits = reconstructed
      .filter(Fts.matches(ftsCols.map(col), "paf gloria"))
      .select("county", "precinct", "office", "party", "candidate")
    assert(hits.collect().toSeq === Seq(
      Row("Yolo", 100001, "President", "PAF", "Gloria Estela La Riva")))
  }

  test("multi-alias shared dictionary + match (golden :263-281)") {
    val films = CsvLoader.load(spark, tempCsv("test.csv", Fixtures.CSV_MULTI))
    val hits = films
      .filter(Fts.matches(Seq(col("film"), col("actor_1"), col("actor_2")), "kruger"))
      .orderBy("rowid").select("film", "actor_1", "actor_2")
    assert(hits.collect().toSeq === Seq(
      Row("National Treasure", "Nicolas Cage", "Diane Kruger"),
      Row("Troy", "Diane Kruger", "Orlando Bloom")))
  }

  test("no match when any term is absent (implicit AND)") {
    val hits = election.filter(Fts.matches(ftsCols.map(col), "president kruger"))
    assert(hits.count() === 0)
  }

  test("inverted index + matchRowids agrees with the predicate path") {
    val idx = Fts.invertedIndex(election, ftsCols)
    val viaIndex = Fts.matchRowids(idx, "president gloria").collect().map(_.getLong(0)).toSet
    val viaPred = election.filter(Fts.matches(ftsCols.map(col), "president gloria"))
      .select("rowid").collect().map(_.getLong(0)).toSet
    assert(viaIndex === viaPred)
    assert(viaIndex === Set(2L))
  }

  test("validateFtsColumns raises on missing column (golden :191-197)") {
    intercept[IllegalArgumentException] {
      Fts.validateFtsColumns(Map("test" -> election), Seq("badcolumn"))
    }
    Fts.validateFtsColumns(Map("test" -> election), Seq("office")) // no throw
  }

  test("trigram search: index+verify rows equal the brute contains() scan on fuzzed needles") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val docs = Tables.loadSpread(spark, "/root/testdata/sf0.001", "documents")
      .withColumnRenamed("doc_id", "rowid")
    val idx = graft.operators.Trigram.index(docs).localCheckpoint(true)
    val texts = docs.select("text").as[String].collect()
    val rnd = new scala.util.Random(20260815L)
    // corpus-drawn substrings (often spanning token boundaries, mixed
    // case via the raw slice) + absent needles + punctuation-bearing
    val needles = (1 to 25).map { _ =>
      val t = texts(rnd.nextInt(texts.length))
      val start = rnd.nextInt(math.max(1, t.length - 12))
      t.substring(start, math.min(t.length, start + 3 + rnd.nextInt(9)))
    }.filter(_.trim.length >= 3) ++ Seq("ZZQX-not-there", "Vector HASH", "r ha")
    for (n <- needles) {
      val viaIndex = graft.operators.Trigram.search(docs, idx, n)
        .select("rowid").as[Long].collect().toSet
      val brute = docs.filter(contains(lower(col("text")), lit(n.toLowerCase)))
        .select("rowid").as[Long].collect().toSet
      assert(viaIndex === brute, s"trigram search diverges from contains() for needle <$n>")
    }
    intercept[IllegalArgumentException] {
      graft.operators.Trigram.search(docs, idx, "ab")
    }
  }

  test("fts version probe: FTS5->FTS4->FTS3 cascade, real-binary probe, loud no-FTS error (utils.py:362-371)") {
    // the cascade itself, with every support profile the reference
    // distinguishes
    assert(Fts.probeFtsVersion(_ => true) === "FTS5")
    assert(Fts.probeFtsVersion(v => v != "FTS5") === "FTS4")
    assert(Fts.probeFtsVersion(v => v == "FTS3") === "FTS3")
    val e = intercept[IllegalStateException] { Fts.probeFtsVersion(_ => false) }
    assert(e.getMessage.contains("does not support any variant of FTS"))
    // against the real binary on this box (miniconda sqlite ships
    // FTS5); with no binary the probe degrades to the same constant
    assert(Fts.bestFtsVersion === "FTS5")
    // error classification: ONLY "no such module" drives the cascade;
    // an unrelated sqlite3 failure must surface, not degrade the DDL
    assert(Fts.moduleMissing(new IllegalStateException(
      "sqlite3 failed (rc=1): Error: no such module: fts5")))
    assert(!Fts.moduleMissing(new IllegalStateException(
      "sqlite3 failed (rc=137): killed")))
    assert(!Fts.moduleMissing(new IllegalStateException()))
  }

  // --- FTS5 phrase / boolean query syntax (sqlite.org/fts5.html) ---

  lazy val phraseDocs = {
    import spark.implicits._
    Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "quick the brown fox"),      // terms present, order broken
      (3L, "Quick Brown fox runs"),     // phrase at start, mixed case
      (4L, "a fox quick brown"),        // phrase at end... no: "quick brown" at end
      (5L, "slow red dog")
    ).toDF("id", "txt")
  }

  test("phrase: adjacency and order required, case-insensitive") {
    val hits = phraseDocs.filter(Fts.phrase(Seq(col("txt")), "quick brown"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hits === Set(1L, 3L, 4L)) // 2 has both terms but not adjacent
  }

  test("phrase: single-term phrase equals term match; punctuation tokenizes away") {
    val viaPhrase = phraseDocs.filter(Fts.phrase(Seq(col("txt")), "fox"))
      .select("id").collect().map(_.getLong(0)).toSet
    val viaMatch = phraseDocs.filter(Fts.matches(Seq(col("txt")), "fox"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(viaPhrase === viaMatch)
    // "quick-brown" tokenizes to two adjacent terms, same as the phrase
    val hyphen = phraseDocs.filter(Fts.phrase(Seq(col("txt")), "quick-brown"))
      .select("id").collect().map(_.getLong(0)).toSet
    assert(hyphen === Set(1L, 3L, 4L))
  }

  test("matchQuery: OR / NOT / parens / phrase with FTS5 precedence (NOT > AND > OR)") {
    def ids(q: String): Set[Long] =
      phraseDocs.filter(Fts.matchQuery(Seq(col("txt")), q))
        .select("id").collect().map(_.getLong(0)).toSet
    assert(ids("\"quick brown\" OR dog") === Set(1L, 3L, 4L, 5L))
    assert(ids("fox NOT jumps") === Set(2L, 3L, 4L))
    assert(ids("quick brown") === Set(1L, 2L, 3L, 4L))            // implicit AND
    assert(ids("quick AND brown") === ids("quick brown"))          // explicit AND
    // juxtaposition binds TIGHTER than NOT (real FTS5, fuzz-caught):
    // fox NOT jumps brown = fox NOT (jumps brown); doc 1 is the only
    // jumps-doc and has brown, so it is excluded either way here...
    assert(ids("fox NOT jumps brown") === Set(2L, 3L, 4L))
    // ...and this case discriminates: jumps+runs co-occur nowhere, so
    // NOT (jumps runs) excludes nothing — atoms-first reading would
    // instead give (fox NOT jumps) AND runs = {3}
    assert(ids("fox NOT jumps runs") === Set(1L, 2L, 3L, 4L))
    // parens override: fox NOT (jumps brown) still excludes only doc 1
    assert(ids("fox NOT (jumps brown)") === Set(2L, 3L, 4L))
    assert(ids("(dog OR jumps) AND runs") === Set.empty)
    // juxtaposing a parenthesized group is a syntax error in real FTS5
    // ('(a) b' errors) — reproduced loudly, was a silent implicit AND
    intercept[IllegalArgumentException](ids("(dog OR jumps) runs"))
    intercept[IllegalArgumentException](ids("runs (dog OR jumps)"))
    intercept[IllegalArgumentException](ids("\"unterminated phrase"))
    intercept[IllegalArgumentException](ids("(missing close"))
  }

  test("nearMinGap: intervening-token counts, multiple occurrences, absent terms") {
    import spark.implicits._
    val docs = Seq(
      (1L, "fox dog"),                // adjacent: gap 0
      (2L, "fox a b dog"),            // gap 2
      (3L, "dog z z z z fox z dog"),  // best pair is fox..dog on the right: gap 1
      (4L, "fox only here"),          // dog absent -> null
      (5L, "nothing at all")
    ).toDF("id", "txt")
    val got = docs.select($"id",
        graft.operators.Fts.nearMinGap(Seq($"txt"), "fox", "dog").as("g"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(0L), 2L -> Some(2L), 3L -> Some(1L), 4L -> None, 5L -> None))
  }

  test("bm25Match: hand-computed fixed-point scores on a tiny corpus") {
    import spark.implicits._
    // 3 docs; N=3; dl = 3, 4, 2; Σdl = 9; avgdl_s = (9 div 3)*1e6 = 3e6
    val docs = Seq(
      (1L, "fox fox den"),       // fox tf=2, den tf=1, dl=3
      (2L, "fox runs very far"), // fox tf=1, dl=4
      (3L, "red dog")            // tf=0
    ).toDF("rowid", "txt")
    // "fox": df=2 of N=3 -> p=3 <= q=5 -> FTS5's non-positive-idf
    // branch: idf2 = EpsIdf = 1549
    // doc1: ratio_s = 3e12 div 3e6 = 1e6;
    //   sat = 2*44e12 div (2e7 + 3e6 + 9e6) = 88e12 div 3.2e7 = 2750000
    // doc2: ratio_s = 4e12 div 3e6 = 1333333;
    //   sat = 44e12 div (1e7 + 3e6 + 11999997) = 1760000
    val fox = Fts.bm25Match(docs, Seq("txt"), "fox")
      .orderBy("rowid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(fox === Array((1L, 1549L * 2750000, 1L), (2L, 1549L * 1760000, 1L)))
    // "den": df=1 -> p=5, q=3 -> idf2 = ilog2Fixed(5,3); true value
    // log2(5/3)*2^30 = 791310781.3; the integer recurrence lands
    // exactly on 791310781 (pinned — the oracle must replay this bit)
    assert(Fts.ilog2Fixed(5L, 3L) === 791310781L)
    val den = Fts.bm25Match(docs, Seq("txt"), "den")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc1: tf=1, dl=3: sat = 44e12 div (1e7 + 3e6 + 9e6) = 2000000
    assert(den === Array((1L, 791310781L * 2000000, 1L)))
  }

  test("snippet: best window by distinct hits, ties earliest, matches marked") {
    import spark.implicits._
    val docs = Seq(
      // window 4: [x x fox x] has 1 distinct hit; [fox x dog cat] later has 3 — later wins
      (1L, "x x fox x x fox x dog cat x"),
      // two windows tie at 1 hit -> earliest ("fox a b c") wins
      (2L, "fox a b c d e f g h dog"),
      // shorter than the window: whole doc, all matches marked
      (3L, "dog fox")
    ).toDF("id", "txt")
    val got = docs.select(col("id"),
        graft.operators.Fts.snippet(Seq(col("txt")), "fox dog cat", window = 4).as("s"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "<b>fox</b> x <b>dog</b> <b>cat</b>")
    assert(got(2L) === "<b>fox</b> a b c")
    assert(got(3L) === "<b>dog</b> <b>fox</b>")
  }

  test("nearMinGap phrases: span rule, overlap goes negative, absent phrase is NULL") {
    import spark.implicits._
    val docs = Seq(
      (1L, "a b x x x c"),    // "a b" span [1,2], c at 6 -> gap 3
      (2L, "c x x a b"),      // c at 1, "a b" span [4,5] -> gap 2
      (3L, "a b"),            // phrase present, c absent -> NULL
      (4L, "a b c")           // adjacent -> gap 0
    ).toDF("id", "txt")
    val got = docs.select($"id",
        graft.operators.Fts.nearMinGap(Seq($"txt"), "a b", "c").as("g"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got === Map(1L -> Some(3L), 2L -> Some(2L), 3L -> None, 4L -> Some(0L)))
    // overlapping spans: phrase "a b" vs token b -> negative gap, so
    // any NEAR(N >= 0) accepts
    val overlap = docs.filter($"id" === 3L).select(
      graft.operators.Fts.nearMinGap(Seq($"txt"), "a b", "b").as("g"))
      .collect()(0).getLong(0)
    assert(overlap < 0L)
    // grammar: default N=10 and explicit N parse and filter
    val viaGrammar = docs.filter(
        graft.operators.Fts.matchQuery(Seq($"txt"), "NEAR(\"a b\" c, 2)"))
      .select("id").as[Long].collect().sorted
    assert(viaGrammar.toSeq === Seq(2L, 4L))
    // NOT over NEAR: an absent phrase is NO-MATCH (false), so the NOT
    // keeps the row — a bare NULL would eat it in three-valued logic
    val notNear = docs.filter(
        graft.operators.Fts.matchQuery(Seq($"txt"), "a NOT NEAR(a zzz, 5)"))
      .select("id").as[Long].collect().sorted
    assert(notNear.toSeq === Seq(1L, 2L, 3L, 4L))
    // the N comma is load-bearing (FTS5): without it a trailing number
    // is a THIRD phrase — "NEAR(a b 5)" needs the literal token 5
    // within the default N=10 clump, so no doc here matches
    val threePhrase = docs.filter(
        graft.operators.Fts.matchQuery(Seq($"txt"), "NEAR(a b 5)"))
      .select("id").as[Long].collect()
    assert(threePhrase.isEmpty)
    // the no-space comma spelling reads N, exactly as real FTS5:
    // NEAR(a c,2) on doc 2 ("a b c": gap 1) matches, doc 1 (gap 3) not
    val noSpace = docs.filter(
        graft.operators.Fts.matchQuery(Seq($"txt"), "NEAR(a c,2)"))
      .select("id").as[Long].collect().sorted
    assert(noSpace.toSeq === Seq(2L, 4L))
    // a numeric token WITH no comma and only two args is a phrase:
    // "NEAR(a 7)" needs the literal token 7 in the doc
    val numPhrase = docs.filter(
        graft.operators.Fts.matchQuery(Seq($"txt"), "NEAR(a 7)"))
      .select("id").as[Long].collect()
    assert(numPhrase.isEmpty)
  }

  test("bm25Match: rarer terms outscore common ones at equal tf (idf monotonicity)") {
    import spark.implicits._
    val docs = (1L to 20L).map { i =>
      val rare = if (i == 1) " zebra" else ""
      (i, s"common words here$rare")
    }.toDF("rowid", "txt")
    val score = (t: String) => Fts.bm25Match(docs, Seq("txt"), t)
      .filter(col("rowid") === 1L).collect()(0).getLong(1)
    assert(score("zebra") > score("common"))
  }
}

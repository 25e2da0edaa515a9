package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.functions.TrigramTok
import graft.operators.FtsTrigram
import graft.sinks.SqliteCli

/** FTS5 `tokenize='trigram'` MATCH parity against the sqlite3 binary —
  * same probe-first methodology as the unicode61/porter suites: the
  * binary defines the semantics, this suite pins directed probes and
  * fuzzes verdict parity (row sets equal, or both engines error).
  */
class FtsTrigramSpec extends SparkSpec {
  import spark.implicits._

  private def dbFile(): String =
    Files.createTempDirectory("graft-trigramdb").resolve("t.db").toString

  /** Raw multilingual corpus with punctuation, case, accents, CJK,
    * astral chars — planted INTO a real trigram FTS5 table and the
    * same rows as a DataFrame.
    */
  private lazy val corpus: Seq[(Long, String)] = Seq(
    1L -> "Hello World",
    2L -> "hellobc",
    3L -> "the quick-brown FOX jumps",
    4L -> "café au lait — crème brûlée",
    5L -> "Müller naïve 你好世界",
    6L -> "xy*zw punct: a+b (c)",
    7L -> "Привет мир",
    8L -> "ab",
    9L -> "",
    10L -> "AbCdEf xxabcdxx",
    11L -> "line one\nline two\ttabbed",
    12L -> "\ud801\udc00eseret \ud801\udc28text", // 𐐀 folds to 𐐨
    13L -> "Ⓐircled token")

  private def trigramDb(): String = {
    val f = dbFile()
    val script = new StringBuilder(
      "CREATE VIRTUAL TABLE d USING fts5(body, tokenize='trigram');\nBEGIN;\n")
    corpus.foreach { case (id, body) =>
      script ++= s"INSERT INTO d(rowid, body) VALUES ($id, '${body.replace("'", "''")}');\n"
    }
    script ++= "COMMIT;\n"
    SqliteCli.query(f, script.toString)
    f
  }

  test("tokenize: per-string token parity with the binary's fts5vocab") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val f = dbFile()
    val script = new StringBuilder(
      "CREATE VIRTUAL TABLE d USING fts5(body, tokenize='trigram');\n" +
      "CREATE VIRTUAL TABLE v USING fts5vocab(d, 'instance');\nBEGIN;\n")
    corpus.foreach { case (id, body) =>
      script ++= s"INSERT INTO d(rowid, body) VALUES ($id, '${body.replace("'", "''")}');\n"
    }
    // hex(term): trigram tokens may CONTAIN tabs and newlines (stream
    // chars, not separators) — raw terms would be mangled by the
    // tabs-mode text protocol
    script ++= "COMMIT;\nSELECT doc, offset, hex(cast(term AS BLOB)) FROM v ORDER BY doc, offset;\n"
    val real = SqliteCli.query(f, script.toString)
      .collect { case Seq(Some(doc), Some(off), Some(hex)) =>
        (doc.toLong, off.toInt, new String(
          hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8")) }
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    corpus.foreach { case (id, body) =>
      val mine = TrigramTok.tokenize(body).toSeq
      val got = real.getOrElse(id, Seq.empty)
      assert(mine === got, s"token stream diverges for doc $id <$body>")
    }
  }

  test("directed MATCH probes: every probed rule, row-set parity") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val f = trigramDb()
    val docs = corpus.toDF("doc_id", "text")
    val queries = Seq(
      "hello",                 // case fold both sides
      "Hello",
      "ello wor",              // juxtaposed barewords: implicit AND
      "\"ello wor\"",          // quoted: substring incl. the space
      "ab", "\"ab\"",          // <3 cps: no tokens, no rows, no error
      "hello ab",              // short term DROPS from juxtaposition
      "hello AND ab",          // …but is match-nothing under AND
      "hello OR ab",
      "hello NOT ab",
      "abc AND hello",
      "abcd OR hello",
      "abcd NOT xxab",
      "CAFÉ", "afé", "cafe",   // fold keeps diacritics: 'cafe' misses
      "\"quick-brown\"",       // punctuation is a literal stream char
      "\"é a\"",
      "abc*", "abcd*", "ab*",  // star inert; short+star still empty
      "\"abc\"*", "\"ello\" *",
      "^hel", "^ell", "^ab",   // anchor = folded startsWith
      "^\"ello\"",
      "^hel + lo",             // anchored chain, short unit drops
      "hel + lo",              // '+' concat, [hel] alone
      "hel + llo",             // [hel,llo]: inconsistent overlap — ∅
      "\"hell\" + \"llo\"",    // [hel,ell,llo]: substring "hello"
      "hel + lobc",
      "NEAR(qui fox)",         // gap 11 > default 10
      "NEAR(qui fox, 11)",
      "NEAR(qui fox, 10)",
      "NEAR(abc ef, 1)",       // short arg drops: ≡ NEAR(abc)
      "NEAR(ab cd, 1)",        // all-short: match nothing
      "NEAR(the fox, 20)",
      "llo AND (wor OR fox)",
      "hello \"\"",            // empty phrase drops from juxtaposition
      "\"\" AND hello",
      "привет", "ПРИВЕТ",      // Cyrillic fold
      "你好",
      "\ud801\udc28ese",       // astral fold: query 𐐨 matches doc 𐐀
      "ⓐirc",                  // Ⓐ folds (non-alnum fold unicode61 lacks)
      "\"y*z\"",               // '*' inside quotes is a literal char
      "\"ne\none\"",           // newline inside a phrase: literal
      "mül* AND naï*")
    val script = queries.zipWithIndex.map { case (q, i) =>
      s"SELECT 'q$i', rowid FROM d WHERE d MATCH '${q.replace("'", "''")}' ORDER BY rowid;"
    }.mkString("\n")
    val real: Map[Int, Set[Long]] = SqliteCli.query(f, script)
      .collect { case Seq(Some(tag), Some(rid)) => (tag.drop(1).toInt, rid.toLong) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty)
    queries.zipWithIndex.foreach { case (q, i) =>
      val mine = docs
        .filter(FtsTrigram.matchQuery(Seq(col("text")), q))
        .select($"doc_id").as[Long].collect().toSet
      assert(mine === real(i), s"row set diverges from real FTS5 trigram for <$q>")
    }
    assert(real.values.count(_.nonEmpty) > queries.length / 3,
      "corpus degenerate: most probes hit nothing")
  }

  test("column filters and error cases: verdicts match the binary") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val f = dbFile()
    SqliteCli.query(f,
      "CREATE VIRTUAL TABLE d USING fts5(a, b, tokenize='trigram');\n" +
      "INSERT INTO d(rowid, a, b) VALUES (1, 'Hello World', 'xy*zw'), " +
      "(2, 'hellobc', 'other text'), (3, 'abc def', 'ghi jkl');\n")
    val docs = Seq((1L, "Hello World", "xy*zw"), (2L, "hellobc", "other text"),
      (3L, "abc def", "ghi jkl")).toDF("id", "a", "b")
    val cases = Seq(
      "a : ello", "b:ello", "{a b}:ello", "-a:\"y*z\"", "a:(ello OR abc)",
      "b:\"y*z\"", "-b:hello", "{a}:^hel", "a:NEAR(abc def, 4)")
    val script = cases.zipWithIndex.map { case (q, i) =>
      s"SELECT 'q$i', rowid FROM d WHERE d MATCH '${q.replace("'", "''")}' ORDER BY rowid;"
    }.mkString("\n")
    val real: Map[Int, Set[Long]] = SqliteCli.query(f, script)
      .collect { case Seq(Some(tag), Some(rid)) => (tag.drop(1).toInt, rid.toLong) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty)
    cases.zipWithIndex.foreach { case (q, i) =>
      val mine = docs
        .filter(FtsTrigram.matchQueryNamed(Seq("a" -> $"a", "b" -> $"b"), q))
        .select($"id").as[Long].collect().toSet
      assert(mine === real(i), s"row set diverges for <$q>")
    }
    // error parity: the binary rejects these; so must the parser (loud,
    // never a silent wrong answer)
    val errors = Seq("quick-brown", "xyz:ello", "ello* *", "(ello) world",
      "NOT ab", "abc AND NOT def", "AND hello", "NEAR()", "a:")
    errors.foreach { q =>
      val binaryErrs =
        try { SqliteCli.query(f, s"SELECT rowid FROM d WHERE d MATCH '${q.replace("'", "''")}';"); false }
        catch { case _: IllegalStateException => true }
      val mineErrs =
        try { FtsTrigram.matchQueryNamed(Seq("a" -> $"a", "b" -> $"b"), q); false }
        catch { case _: IllegalArgumentException => true }
      assert(binaryErrs, s"probe assumption broken: binary accepts <$q>")
      assert(mineErrs, s"binary rejects <$q> but the parser accepted it")
    }
  }

  test("property: 150 random grammar queries — verdict parity with real FTS5 trigram") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val f = trigramDb()
    val docs = corpus.toDF("doc_id", "text")
    val rnd = new scala.util.Random(20260815L)
    val texts = corpus.map(_._2).filter(_.length >= 3)
    // substring windows of REAL corpus text (any chars — spaces and
    // punctuation are stream chars for trigram), occasionally case-
    // flipped or absent
    // char-index slicing can halve a surrogate pair (doc 12 is astral)
    // — drop lone surrogates so the query string stays valid UTF-8
    def dropLoneSurrogates(s: String): String = {
      val sb = new StringBuilder
      var i = 0
      while (i < s.length) {
        val c = s.charAt(i)
        if (Character.isHighSurrogate(c) && i + 1 < s.length &&
            Character.isLowSurrogate(s.charAt(i + 1))) {
          sb.append(c).append(s.charAt(i + 1)); i += 2
        } else {
          if (!Character.isSurrogate(c)) sb.append(c)
          i += 1
        }
      }
      sb.toString
    }
    def window(): String = {
      val t = texts(rnd.nextInt(texts.length))
      val len = 3 + rnd.nextInt(5)
      val s = dropLoneSurrogates(if (t.length <= len) t else {
        val st = rnd.nextInt(t.length - len); t.substring(st, st + len)
      })
      val cased = if (rnd.nextInt(3) == 0) s.toUpperCase else s
      if (rnd.nextInt(7) == 0) "zq" + cased else cased
    }
    def bareword(): String = {
      // barewords must be legal FTS5 words — strip to bareword chars
      val w = window().filter(operators.Fts.isBarewordChar)
      if (w.length < 2) "zzq" + rnd.nextInt(9) else w
    }
    def atom(): String = rnd.nextInt(8) match {
      case 0 => "\"" + window().replace("\"", "") + "\""
      case 1 => bareword() + "*"
      case 2 => "^" + bareword()
      case 3 => s"NEAR(${bareword()} ${bareword()}, ${rnd.nextInt(14)})"
      case 4 => "\"" + window().replace("\"", "") + "\" + " + bareword()
      case _ => bareword()
    }
    def expr(depth: Int): String =
      if (depth == 0) atom()
      else rnd.nextInt(5) match {
        case 0 => s"(${expr(depth - 1)}) OR (${expr(depth - 1)})"
        case 1 => s"(${expr(depth - 1)}) AND (${expr(depth - 1)})"
        case 2 => s"(${expr(depth - 1)}) NOT (${expr(depth - 1)})"
        case 3 => s"${atom()} ${atom()}"
        case _ => atom()
      }
    val queries = Seq.fill(150)(expr(1 + rnd.nextInt(2)))
    val script = queries.zipWithIndex.map { case (q, i) =>
      s"SELECT 'q$i', rowid FROM d WHERE d MATCH '${q.replace("'", "''")}' ORDER BY rowid;"
    }.mkString("\n")
    val real: Map[Int, Set[Long]] = SqliteCli.query(f, script)
      .collect { case Seq(Some(tag), Some(rid)) => (tag.drop(1).toInt, rid.toLong) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty)
    queries.zipWithIndex.grouped(32).foreach { batch =>
      val preds = batch.map { case (q, i) =>
        FtsTrigram.matchQuery(Seq(col("text")), q).as(s"q$i")
      }
      val rows = docs.select(col("doc_id").as("id") +: preds: _*).collect()
      batch.foreach { case (q, i) =>
        val mine = rows.filter { r =>
          val idx = r.fieldIndex(s"q$i"); !r.isNullAt(idx) && r.getBoolean(idx)
        }.map(_.getLong(0)).toSet
        assert(mine === real(i), s"row set diverges from real FTS5 trigram for <$q>")
      }
    }
    assert(queries.count(_.exists(_ > 0x7F)) > 15,
      "generator degenerate: almost no non-ASCII queries")
  }

  test("matchRowidsViaIndex ≡ matchQuery on every directed probe query") {
    val docs = corpus.toDF("doc_id", "text")
      .withColumn(operators.Rowid.ColName, col("doc_id"))
    val idx = FtsTrigram.index(docs).localCheckpoint(true)
    // every shape: leaves, booleans, anchors, NEAR, chains, negation-
    // only (no pruning possible), empties
    val queries = Seq(
      "hello", "\"ello wor\"", "abc AND hello", "abcd OR hello",
      "abcd NOT xxab", "llo AND (wor OR fox)", "^hel", "NEAR(qui fox, 11)",
      "\"hell\" + \"llo\"", "hello ab", "\"\" AND hello", "ab",
      "(abcd OR hello) NOT \"ello wor\"", "привет OR 你好")
    queries.foreach { q =>
      val viaIdx = FtsTrigram.matchRowidsViaIndex(docs, idx, q)
        .select(col(operators.Rowid.ColName)).as[Long].collect().toSet
      val viaPred = docs.filter(FtsTrigram.matchQuery(Seq($"text"), q))
        .select($"doc_id").as[Long].collect().toSet
      assert(viaIdx === viaPred, s"index path diverges from predicate for <$q>")
    }
  }

  test("index path prunes: candidate semi-join present, no corpus-wide verify for positive queries") {
    val docs = corpus.toDF("doc_id", "text")
      .withColumn(operators.Rowid.ColName, col("doc_id"))
    val idx = FtsTrigram.index(docs)
    val plan = FtsTrigram.matchRowidsViaIndex(docs, idx, "hello AND wor")
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("LeftSemi"),
      "positive boolean query must prune through the posting-list semi-join:\n" + plan)
  }

  test("tokenizer options: case_sensitive 1 and remove_diacritics 1 — row-set parity; the illegal combo errors") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val docs = corpus.toDF("doc_id", "text")
    val queries = Seq(
      "Hello", "hello", "\"Hello W\"", "WORLD", "café", "cafe", "CAFE",
      "Müller", "muller", "naïve", "naive", "^Hel", "^hel",
      "NEAR(qui FOX, 12)", "ⓐirc", "Ⓐirc", "привет", "Привет")
    for ((opt, cs, rd) <- Seq(("case_sensitive 1", true, false),
        ("remove_diacritics 1", false, true))) {
      val f = dbFile()
      val script = new StringBuilder(
        s"CREATE VIRTUAL TABLE d USING fts5(body, tokenize='trigram $opt');\nBEGIN;\n")
      corpus.foreach { case (id, body) =>
        script ++= s"INSERT INTO d(rowid, body) VALUES ($id, '${body.replace("'", "''")}');\n"
      }
      script ++= "COMMIT;\n"
      script ++= queries.zipWithIndex.map { case (q, i) =>
        s"SELECT 'q$i', rowid FROM d WHERE d MATCH '${q.replace("'", "''")}' ORDER BY rowid;"
      }.mkString("\n")
      val real: Map[Int, Set[Long]] = SqliteCli.query(f, script.toString)
        .collect { case Seq(Some(tag), Some(rid)) => (tag.drop(1).toInt, rid.toLong) }
        .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
        .withDefaultValue(Set.empty)
      queries.zipWithIndex.foreach { case (q, i) =>
        val mine = docs.filter(FtsTrigram.matchQueryOpts(Seq($"text"), q,
            caseSensitive = cs, removeDiacritics = rd))
          .select($"doc_id").as[Long].collect().toSet
        assert(mine === real(i), s"row set diverges under '$opt' for <$q>")
      }
    }
    // the binary rejects the combined options in its tokenizer
    // constructor (probed) — so does the API, loudly
    intercept[IllegalArgumentException] {
      FtsTrigram.matchQueryOpts(Seq($"text"), "hello",
        caseSensitive = true, removeDiacritics = true)
    }
  }

  test("rd1 mode: removed combining marks shift stream positions, as the binary") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    // 'e' + U+0301 combining acute: rd1 REMOVES the mark — "abécd"
    // folds to "abecd" (5 cps) and '"becd"' is a substring; under the
    // default fold the mark occupies a position and '"becd"' is NOT
    val markedText = "abe\u0301cd"
    val marked = Seq((1L, markedText), (2L, "xbecdy")).toDF("doc_id", "text")
    def hits(q: String, rd: Boolean): Set[Long] =
      marked.filter(FtsTrigram.matchQueryOpts(Seq($"text"), q, removeDiacritics = rd))
        .select($"doc_id").as[Long].collect().toSet
    assert(hits("\"becd\"", rd = true) === Set(1L, 2L))
    assert(hits("\"becd\"", rd = false) === Set(2L))
    // binary agrees on both
    val f = dbFile()
    SqliteCli.query(f,
      "CREATE VIRTUAL TABLE d0 USING fts5(b, tokenize='trigram');\n" +
      "CREATE VIRTUAL TABLE d1 USING fts5(b, tokenize='trigram remove_diacritics 1');\n" +
      s"INSERT INTO d0(rowid,b) VALUES (1,'$markedText'),(2,'xbecdy');\n" +
      s"INSERT INTO d1(rowid,b) VALUES (1,'$markedText'),(2,'xbecdy');\n")
    def binHits(t: String): Set[Long] = SqliteCli.query(f,
        s"SELECT rowid FROM $t WHERE $t MATCH '\"becd\"';")
      .collect { case Seq(Some(r)) => r.toLong }.toSet
    assert(binHits("d1") === Set(1L, 2L))
    assert(binHits("d0") === Set(2L))
  }

  test("globSearch: row-set parity with the binary's GLOB, index prunes only") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val f = trigramDb()
    val docs = corpus.toDF("doc_id", "text")
      .withColumn(operators.Rowid.ColName, col("doc_id"))
    val idx = operators.Trigram.index(docs).localCheckpoint(true)
    val patterns = Seq(
      "Hello*",              // case-sensitive prefix
      "hello*",              // lowercase misses 'Hello World'
      "*World", "*world",
      "*quick?brown*",       // ? one char
      "the*fox*",
      "*ab*",                // no 3-char literal run: full-scan verify
      "*[Hh]ello*",          // class breaks the run
      "xy[*]zw*",            // literal '*' via class
      "*llo*w*",
      "hellobc",             // exact whole-string
      "*naïve*",             // non-ASCII literal
      "*line*two*",          // '*' must cross the newline (dotall)
      "*[0-9]*")
    val script = patterns.zipWithIndex.map { case (p, i) =>
      s"SELECT 'q$i', rowid FROM d WHERE body GLOB '${p.replace("'", "''")}' ORDER BY rowid;"
    }.mkString("\n")
    val real: Map[Int, Set[Long]] = SqliteCli.query(f, script)
      .collect { case Seq(Some(tag), Some(rid)) => (tag.drop(1).toInt, rid.toLong) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty)
    patterns.zipWithIndex.foreach { case (p, i) =>
      val mine = operators.Trigram.globSearch(docs, idx, p)
        .select($"doc_id").as[Long].collect().toSet
      assert(mine === real(i), s"GLOB row set diverges from sqlite3 for <$p>")
    }
    assert(real.values.count(_.nonEmpty) >= 8, "corpus degenerate for GLOB probes")
  }

  test("highlightRaw: rendered text parity with the binary's highlight()") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val hlRows = corpus ++ Seq(
      20L -> "Hello",      // overlap coalescing probes
      21L -> "aaaa",
      22L -> "abcdef",
      23L -> "overlap lapover")
    val f = dbFile()
    val script = new StringBuilder(
      "CREATE VIRTUAL TABLE d USING fts5(body, tokenize='trigram');\nBEGIN;\n")
    hlRows.foreach { case (id, body) =>
      script ++= s"INSERT INTO d(rowid, body) VALUES ($id, '${body.replace("'", "''")}');\n"
    }
    script ++= "COMMIT;\n"
    SqliteCli.query(f, script.toString)
    val docs = hlRows.toDF("doc_id", "text")
    val queries = Seq(
      "ello",              // two instances, case-folded
      "ell OR llo",        // overlapping ranges merge
      "abc OR def",        // TOUCHING ranges merge
      "aaa",               // self-overlapping occurrences merge
      "ello OR worl",
      "\"lo wo\"",         // phrase with space
      "^hel",              // anchored: offset 0 only
      "hello NOT zebra",   // NOT side never marks
      "lap",               // adjacent instances in one doc
      "CAFÉ OR naïve")     // non-ASCII fold both sides
    // hex() the rendered text — corpus rows contain tabs/newlines
    val script2 = queries.zipWithIndex.map { case (q, i) =>
      s"SELECT 'q$i', rowid, hex(cast(highlight(d, 0, '[', ']') AS BLOB)) " +
        s"FROM d WHERE d MATCH '${q.replace("'", "''")}' ORDER BY rowid;"
    }.mkString("\n")
    val real: Map[(Int, Long), String] = SqliteCli.query(f, script2)
      .collect { case Seq(Some(tag), Some(rid), Some(hex)) =>
        (tag.drop(1).toInt, rid.toLong) -> new String(
          hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray, "UTF-8") }
      .toMap
    queries.zipWithIndex.foreach { case (q, i) =>
      val mine = docs
        .filter(FtsTrigram.matchQuery(Seq($"text"), q))
        .select($"doc_id", FtsTrigram.highlightRaw($"text", q, "[", "]").as("h"))
        .collect().map(r => (r.getLong(0), r.getString(1))).toMap
      val want = real.collect { case ((qi, rid), h) if qi == i => rid -> h }
      assert(mine === want, s"highlight rendering diverges for <$q>")
    }
    // unsupported shapes are loud, never silently wrong
    intercept[IllegalArgumentException] {
      FtsTrigram.highlightRaw($"text", "NEAR(abc def)")
    }
    intercept[IllegalArgumentException] {
      FtsTrigram.highlightRaw($"text", "\"hell\" + \"llo\"")
    }
  }

  test("likeSearch: row-set parity with the binary's LIKE incl. ASCII-only folding") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val likeRows = corpus ++ Seq(14L -> "CAFÉ SHOUTY", 15L -> "abc_def", 16L -> "100% sure")
    val f = dbFile()
    val script = new StringBuilder("CREATE TABLE p(body);\nBEGIN;\n")
    likeRows.foreach { case (id, body) =>
      script ++= s"INSERT INTO p(rowid, body) VALUES ($id, '${body.replace("'", "''")}');\n"
    }
    script ++= "COMMIT;\n"
    SqliteCli.query(f, script.toString)
    val docs = likeRows.toDF("doc_id", "text")
      .withColumn(operators.Rowid.ColName, col("doc_id"))
    val idx = operators.Trigram.index(docs).localCheckpoint(true)
    val patterns = Seq(
      "hello%",               // ASCII case folds: hits 'Hello World' too
      "%WORLD",
      "%café%",               // É/é non-ASCII: CAFÉ must NOT match (probed)
      "%quick_brown%",        // _ one char
      "%ello%w%",
      "hellobc",
      "%naïve%",              // exact non-ASCII literal
      "%ab%")                 // no 3-char run: full-scan verify
    val script2 = patterns.zipWithIndex.map { case (p, i) =>
      s"SELECT 'q$i', rowid FROM p WHERE body LIKE '${p.replace("'", "''")}' ORDER BY rowid;"
    }.mkString("\n")
    val real: Map[Int, Set[Long]] = SqliteCli.query(f, script2)
      .collect { case Seq(Some(tag), Some(rid)) => (tag.drop(1).toInt, rid.toLong) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      .withDefaultValue(Set.empty)
    patterns.zipWithIndex.foreach { case (p, i) =>
      val mine = operators.Trigram.likeSearch(docs, idx, p)
        .select($"doc_id").as[Long].collect().toSet
      assert(mine === real(i), s"LIKE row set diverges from sqlite3 for <$p>")
    }
    // ESCAPE: literal underscore / percent
    val escCases = Seq("abc\\_def" -> Set(15L), "100\\% s%" -> Set(16L))
    escCases.foreach { case (p, want) =>
      val bin = SqliteCli.query(f,
          s"SELECT rowid FROM p WHERE body LIKE '${p.replace("'", "''")}' ESCAPE '\\';")
        .collect { case Seq(Some(r)) => r.toLong }.toSet
      assert(bin === want, s"probe assumption broken for <$p>")
      val mine = operators.Trigram.likeSearch(docs, idx, p, escape = Some('\\'))
        .select($"doc_id").as[Long].collect().toSet
      assert(mine === want, s"ESCAPE LIKE diverges for <$p>")
    }
  }

  test("MATCH substring ≡ Trigram.search index path on shared needles") {
    // the index-accelerated LIKE path and the MATCH predicate answer
    // the same substring question — equal row sets on every needle
    val docs = corpus.toDF("doc_id", "text")
      .withColumn(operators.Rowid.ColName, col("doc_id"))
    val idx = operators.Trigram.index(docs)
    Seq("ello", "abcd", "quick-brown", "你好世").foreach { needle =>
      val viaIndex = operators.Trigram
        .search(docs, idx, needle).select($"doc_id").as[Long].collect().toSet
      val viaMatch = docs
        .filter(FtsTrigram.matchQuery(Seq($"text"), "\"" + needle + "\""))
        .select($"doc_id").as[Long].collect().toSet
      // Trigram.search folds with SQL lower(); FtsTrigram folds with the
      // probed fts5 fold — identical on these needles by construction
      assert(viaMatch === viaIndex, s"index path diverges for <$needle>")
    }
  }
}

package graft

import java.nio.file.Files

import graft.functions.Unicode61
import graft.sinks.SqliteCli

import org.apache.spark.sql.functions._

/** FTS5 `unicode61` tokenizer fidelity ([[graft.functions.Unicode61]]).
  *
  * The reference gets its tokenizer by delegating FTS to SQLite
  * (`/root/reference/csvs_to_sqlite/utils.py:374-438`); the tables in
  * Unicode61Data were probed per-codepoint from the real
  * implementation (scripts/probe_unicode61.py). This suite re-proves
  * them at test time against two INDEPENDENT implementations:
  *
  *   - the sqlite3 *binary* (3.51.2), via fts5vocab instance tables
  *     over random multi-script strings — the strings are raw text
  *     (accents, combining marks, CJK, astral, emoji), NOT the
  *     pre-tokenized ASCII the old tokenizer required
  *   - DuckDB's `strip_accents(lower())` + `[^\p{L}\p{N}]+` split (the
  *     [[graft.queries.DuckSql.tokensUnicode]] oracle fragment), pinned
  *     char-by-char over the SAFE ALPHABET that unicode-planting graded
  *     queries must draw from — so a new planted char outside the safe
  *     set fails HERE, not as an opaque oracle hash mismatch
  */
class Unicode61Spec extends SparkSpec {

  private def asciiTokens(s: String): Seq[String] =
    s.toLowerCase.split("[^a-z0-9]+").filter(_.nonEmpty).toSeq

  test("fold pins: case fold, diacritic fold, self-folds, elision, separators") {
    assert(Unicode61.foldCp('A') === 'a'.toInt)
    assert(Unicode61.foldCp('z') === 'z'.toInt)
    assert(Unicode61.foldCp('7') === '7'.toInt)
    assert(Unicode61.foldCp('É') === 'e'.toInt) // diacritic removal folds THROUGH case
    assert(Unicode61.foldCp('ü') === 'u'.toInt)
    assert(Unicode61.foldCp('ß') === 'ß'.toInt) // NOT decomposed to ss
    assert(Unicode61.foldCp('Æ') === 'æ'.toInt) // case only; ligature kept
    assert(Unicode61.foldCp('Ø') === 'ø'.toInt)
    assert(Unicode61.foldCp('Я') === 'я'.toInt)
    assert(Unicode61.foldCp('й') === 'й'.toInt) // breve NOT stripped on Cyrillic
    assert(Unicode61.foldCp('ς') === 'σ'.toInt) // final sigma case-folds
    assert(Unicode61.foldCp(0x4F60) === 0x4F60) // 你 kept verbatim
    assert(Unicode61.foldCp(0x0663) === 0x0663) // ٣ Arabic-Indic digit is a token char
    assert(Unicode61.foldCp(0xFF21) === 0xFF41) // Ａ fullwidth folds to ａ (not ASCII a)
    assert(Unicode61.foldCp(0x0301) === -2) // combining acute: elided, token unbroken
    assert(Unicode61.foldCp(' ') === -1)
    assert(Unicode61.foldCp('·') === -1) // middle dot separates
    assert(Unicode61.foldCp('_') === -1) // '_' is bareword syntax, NOT a token char
    assert(Unicode61.foldCp(0x1F600) === -1) // emoji separates
  }

  test("tokenize pins: multilingual text the old ASCII tokenizer silently dropped") {
    assert(Unicode61.tokenize("Müller café ÇA").toSeq === Seq("muller", "cafe", "ca"))
    assert(Unicode61.tokenize("Привет, мир!").toSeq === Seq("привет", "мир"))
    assert(Unicode61.tokenize("你好，世界").toSeq === Seq("你好", "世界")) // CJK not segmented
    assert(Unicode61.tokenize("éf").toSeq === Seq("ef")) // combining mark elided mid-token
    assert(Unicode61.tokenize("á").toSeq === Seq("a"))
    assert(Unicode61.tokenize("́̈").toSeq === Seq.empty) // marks alone: no token
    assert(Unicode61.tokenize("  ·—!? ").toSeq === Seq.empty)
    assert(Unicode61.tokenize("").toSeq === Seq.empty)
    assert(Unicode61.hasToken("·é·"))
    assert(!Unicode61.hasToken(" ·— ́"))
  }

  test("property: on ASCII text unicode61 IS lower + split [^a-z0-9]+ (oracle-stability invariant)") {
    // this identity is why switching Fts.tokens to unicode61 left every
    // ASCII-corpus graded oracle byte-stable
    val rnd = new scala.util.Random(20260815L)
    val pool = (' ' to '~').toArray
    for (_ <- 1 to 500) {
      val s = Array.fill(rnd.nextInt(60))(pool(rnd.nextInt(pool.length))).mkString
      assert(Unicode61.tokenize(s).toSeq === asciiTokens(s), s"on ASCII input <$s>")
    }
  }

  test("parity: 400 random multi-script strings tokenize exactly as the REAL FTS5 unicode61 (sqlite3 binary)") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    // raw multi-script text: accented Latin, combining marks, Greek,
    // Cyrillic (incl. й/ё), CJK, fullwidth, Arabic-Indic digits, astral
    // math letters, emoji, and plenty of separators. No ' (SQL quoting)
    // and no tab/newline (the CLI's tabs-mode output framing).
    val pool: IndexedSeq[String] =
      ("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789".map(_.toString) ++
        " .,-–—·!?()[]/&%$#@^*+=".map(_.toString) ++
        "éÉüÜñÑåÅßæÆøØçÇðÐþÞīĪłŁſ".map(_.toString) ++
        "̧́̈".map(_.toString) ++ // combining acute/diaeresis/cedilla
        "αβγδλσςάέΩΆ".map(_.toString) ++
        "ПриветмирЙйЁёЖщЪьЫ".map(_.toString) ++
        "你好世界日本語中文汉字".map(_.toString) ++
        "٣٤٥".map(_.toString) ++
        "ＡＢｚ５".map(_.toString) ++
        Seq(new String(Character.toChars(0x1D400)), // 𝐀 math bold A
          new String(Character.toChars(0x10400)),   // Deseret (astral fold pair)
          new String(Character.toChars(0x1F600)))   // 😀
        ).toIndexedSeq
    val rnd = new scala.util.Random(20260815L)
    val strings = (1 to 400).map { _ =>
      (0 until (1 + rnd.nextInt(40))).map(_ => pool(rnd.nextInt(pool.length))).mkString
    }
    val db = Files.createTempDirectory("graft-u61").resolve("u61.db").toString
    val script = new StringBuilder(
      "CREATE VIRTUAL TABLE t USING fts5(x);\n" +
        "CREATE VIRTUAL TABLE v USING fts5vocab(t,'instance');\nBEGIN;\n")
    strings.zipWithIndex.foreach { case (s, i) =>
      script ++= s"INSERT INTO t(rowid, x) VALUES ($i, '$s');\n"
    }
    script ++= "COMMIT;\nSELECT doc, \"offset\", term FROM v ORDER BY doc, \"offset\";\n"
    val real: Map[Int, Seq[String]] = SqliteCli.query(db, script.toString)
      .collect { case Seq(Some(doc), Some(_), Some(term)) => (doc.toInt, term) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      .withDefaultValue(Seq.empty)
    strings.zipWithIndex.foreach { case (s, i) =>
      assert(Unicode61.tokenize(s).toSeq === real(i),
        s"tokenization diverges from the sqlite3 binary on <$s>")
    }
    // generator sanity: the corpus must actually exercise non-ASCII tokens
    assert(strings.count(_.exists(_ > 0x7F)) > 300, "generator degenerate: mostly ASCII")
  }

  test("DuckDB twin: tokensUnicode agrees with unicode61 char-by-char over the pinned SAFE ALPHABET") {
    // THE planted-text contract: graded queries that plant non-ASCII
    // text may only use chars from this alphabet — where DuckDB's
    // strip_accents(lower()) + [^\p{L}\p{N}]+ split provably equals
    // unicode61. Known-excluded (probed divergences, see
    // DuckSql.tokensUnicode): accented Greek + final sigma, accented
    // Cyrillic (й ё ѐ ў …), µ, ſ.
    val safe: String =
      ('a' to 'z').mkString + ('A' to 'Z').mkString + ('0' to '9').mkString +
        "àáâãäåçèéêëìíîïñòóôõöùúûüýÿÀÁÂÃÄÅÇÈÉÊËÌÍÎÏÑÒÓÔÕÖÙÚÛÜÝßæÆøØðÐþÞ" +
        "āăąćčďēėęěğīİıłńňōőœřśšťūůűźżžĀĂĄĆČĒĘĚĞĪŁŃŇŌŐŒŘŚŠŤŪŮŰŹŻŽ" +
        "αβγδεζηθικλμνξοπρστυφχψω" +
        ('а' to 'я').filter(_ != 'й').mkString + ('А' to 'Я').filter(_ != 'Й').mkString +
        "你好世界日本語中文汉字" + "٣٤٥" +
        " .,-!?()"
    val py =
      """import sys, duckdb
        |con = duckdb.connect()
        |for line in sys.stdin.buffer.read().decode('utf-8').splitlines():
        |    toks = con.execute(
        |        "SELECT list_filter(string_split_regex(strip_accents(lower(?)),"
        |        " '[^\\p{L}\\p{N}]+'), t -> t <> '')", [line]).fetchone()[0]
        |    sys.stdout.buffer.write((chr(9).join(toks) + chr(10)).encode('utf-8'))
        |""".stripMargin
    val pyf = Files.createTempFile("graft-u61-duck", ".py")
    Files.writeString(pyf, py)
    // per-char probes (a<c>b catches join-vs-separator) plus mixed words
    val probes = safe.map(ch => s"a${ch}b") ++
      Seq("Café MÜLLER Привет 你好 naïve ÆØÐÞß crème-brûlée 42٣")
    val pb = new ProcessBuilder("python3", pyf.toString)
    val proc = pb.start()
    proc.getOutputStream.write(probes.mkString("\n").getBytes("UTF-8"))
    proc.getOutputStream.close()
    val out = new String(proc.getInputStream.readAllBytes(), "UTF-8")
    val err = new String(proc.getErrorStream.readAllBytes(), "UTF-8")
    assume(proc.waitFor() == 0 && err.isEmpty, s"python3+duckdb unavailable: $err")
    val duckTokens = out.split("\n", -1).map(_.split("\t").filter(_.nonEmpty).toSeq)
    probes.zipWithIndex.foreach { case (p, i) =>
      assert(Unicode61.tokenize(p).toSeq === duckTokens(i),
        s"DuckDB tokensUnicode diverges from unicode61 on safe-alphabet probe <$p>")
    }
  }

  test("u61_tokens expression: codegen column equals the Scala tokenizer; NULL in, NULL out") {
    import spark.implicits._
    val rows = Seq(
      Some("Müller café — Привет 你好"),
      Some("éf plain ASCII 42"),
      Some("·—!?"),
      Some(""),
      None)
    val df = rows.toDF("s")
      .select(col("s"), graft.expressions.Unicode61Tokens.u61_tokens(col("s")).as("t"))
    val got = df.collect().map(r => (Option(r.getString(0)), Option(r.getSeq[String](1))))
    rows.zip(got).foreach { case (in, (s, t)) =>
      assert(s === in)
      assert(t === in.map(v => Unicode61.tokenize(v).toSeq))
    }
    // stays codegen: the plan must not fall back for this expression
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), "u61_tokens must not lower to a Scala UDF")
  }
}

package graft

import java.nio.file.Files

import graft.functions.AsciiTok
import graft.sinks.SqliteCli

import org.scalatest.funsuite.AnyFunSuite

/** FTS5 `ascii` tokenizer fidelity ([[AsciiTok]]) — closed-form rule
  * set, re-probed per-ASCII-codepoint and fuzzed against the sqlite3
  * binary with the same methodology as the unicode61 suites.
  */
class AsciiTokSpec extends AnyFunSuite {

  test("pins: ASCII-only case fold, every non-ASCII char is a token char") {
    // probed: 'Müller' → 'müller' (M case-folds, ü already lowercase)
    // but 'MÜLLER' → 'mÜller' (Ü is non-ASCII: kept VERBATIM, unfolded)
    assert(AsciiTok.tokenize("Müller MÜLLER abc-DEF").toSeq ===
      Seq("müller", "mÜller", "abc", "def"))
    assert(AsciiTok.tokenize("ёж 漢字 café").toSeq === Seq("ёж", "漢字", "café"))
    // even combining marks and typographic punctuation are ≥0x80 →
    // token chars under ascii (NOT elided, NOT separators)
    assert(AsciiTok.tokenize("éf a–b").toSeq === Seq("éf", "a–b"))
    assert(AsciiTok.tokenize("!?.,()[] \t\n").toSeq === Seq.empty)
  }

  test("per-codepoint: the whole ASCII block classifies exactly as the binary") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    // probe a<c>b for every printable ASCII cp: separator iff tokens
    // are {a,b}; token char iff single token a<fold(c)>b
    val cps = (0x20 to 0x7E)
    val db = Files.createTempDirectory("graft-ascii").resolve("a.db").toString
    val script = new StringBuilder(
      "CREATE VIRTUAL TABLE t USING fts5(x, tokenize='ascii');\n" +
        "CREATE VIRTUAL TABLE v USING fts5vocab(t,'instance');\nBEGIN;\n")
    cps.foreach { cp =>
      // apostrophe included via SQL quote-doubling ('a''b') — the full
      // printable block is binary-verified, no codepoint skipped
      val litC = if (cp == '\'') "''" else cp.toChar.toString
      script ++= s"INSERT INTO t(rowid, x) VALUES ($cp, 'a${litC}b');\n"
    }
    script ++= "COMMIT;\nSELECT doc, \"offset\", term FROM v ORDER BY doc, \"offset\";\n"
    val real: Map[Int, Seq[String]] = SqliteCli.query(db, script.toString)
      .collect { case Seq(Some(doc), Some(_), Some(term)) => (doc.toInt, term) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
      .withDefaultValue(Seq.empty)
    cps.foreach { cp =>
      assert(AsciiTok.tokenize(s"a${cp.toChar}b").toSeq === real(cp),
        f"ascii tokenizer diverges on U+$cp%04X '${cp.toChar}'")
    }
  }

  test("parity: 300 random multi-script strings tokenize exactly as FTS5 'ascii'") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val pool: IndexedSeq[String] =
      ("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789".map(_.toString) ++
        " .,-–—·!?()[]/&%$#@^*+=".map(_.toString) ++
        "éÉüÜñÑåÅßæÆøØçÇðÐþÞīĪłŁſ".map(_.toString) ++
        "̧́̈".map(_.toString) ++
        "αβγδλσςάέΩΆ".map(_.toString) ++
        "ПриветмирЙйЁёЖщЪьЫ".map(_.toString) ++
        "你好世界日本語中文汉字".map(_.toString) ++
        "٣٤٥".map(_.toString) ++
        "ＡＢｚ５".map(_.toString) ++
        Seq(new String(Character.toChars(0x1D400)),
          new String(Character.toChars(0x10400)),
          new String(Character.toChars(0x1F600)))).toIndexedSeq
    val rnd = new scala.util.Random(20260815L)
    val strings = (1 to 300).map { _ =>
      (0 until (1 + rnd.nextInt(40))).map(_ => pool(rnd.nextInt(pool.length))).mkString
    }
    val db = Files.createTempDirectory("graft-asciif").resolve("a.db").toString
    val script = new StringBuilder(
      "CREATE VIRTUAL TABLE t USING fts5(x, tokenize='ascii');\n" +
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
      assert(AsciiTok.tokenize(s).toSeq === real(i),
        s"ascii tokenization diverges from the sqlite3 binary on <$s>")
    }
    assert(strings.count(_.exists(_ > 0x7F)) > 200, "generator degenerate")
  }
}

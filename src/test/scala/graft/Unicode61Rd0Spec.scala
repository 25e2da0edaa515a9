package graft

import java.nio.file.Files

import graft.functions.Unicode61Rd0
import graft.sinks.SqliteCli

import org.scalatest.funsuite.AnyFunSuite

/** `unicode61 remove_diacritics 0` fidelity ([[Unicode61Rd0]]) —
  * the accent-preserving option, fuzzed against the sqlite3 binary
  * with the same methodology as Unicode61Spec's rd=1 suite.
  */
class Unicode61Rd0Spec extends AnyFunSuite {

  test("pins: pure case folds, accents preserved, marks kept inside tokens only") {
    assert(Unicode61Rd0.tokenize("Café MÜLLER naïve").toSeq === Seq("café", "müller", "naïve"))
    assert(Unicode61Rd0.tokenize("ŁÓDŹ Привет ß").toSeq === Seq("łódź", "привет", "ß"))
    assert(Unicode61Rd0.tokenize("áb").toSeq === Seq("áb")) // mark kept, token unbroken
    assert(Unicode61Rd0.tokenize("́ab").toSeq === Seq("ab")) // leading mark skipped
    assert(Unicode61Rd0.tokenize("x ́y").toSeq === Seq("x", "y")) // post-separator mark skipped
    assert(Unicode61Rd0.tokenize("·—!?").toSeq === Seq.empty)
    // ASCII identity still holds (no diacritics to differ on)
    assert(Unicode61Rd0.tokenize("The Quick-42 fox_es").toSeq ===
      graft.functions.Unicode61.tokenize("The Quick-42 fox_es").toSeq)
  }

  test("parity: 300 random multi-script strings tokenize exactly as FTS5 'unicode61 remove_diacritics 0'") {
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
    val db = Files.createTempDirectory("graft-u61rd0").resolve("u.db").toString
    val script = new StringBuilder(
      "CREATE VIRTUAL TABLE t USING fts5(x, tokenize='unicode61 remove_diacritics 0');\n" +
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
      assert(Unicode61Rd0.tokenize(s).toSeq === real(i),
        s"rd=0 tokenization diverges from the sqlite3 binary on <$s>")
    }
    assert(strings.count(_.exists(_ > 0x7F)) > 200, "generator degenerate")
  }
}

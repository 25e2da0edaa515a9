package graft

import java.nio.file.Files

import graft.functions.{Unicode61, Unicode61Rd2}
import graft.sinks.SqliteCli

import org.scalatest.funsuite.AnyFunSuite

/** `unicode61 remove_diacritics 2` fidelity ([[Unicode61Rd2]]) — the
  * full-diacritic-removal option, fuzzed against the sqlite3 binary
  * with the same methodology as the rd=1 / rd=0 suites.
  */
class Unicode61Rd2Spec extends AnyFunSuite {

  test("pins: multi-diacritic codepoints fully unaccent; rd=1 behavior kept elsewhere") {
    // the probed rd=1/rd=2 delta: diaeresis+macron 'ǖ', diaeresis+
    // macron 'ǟ', cedilla+acute 'ḉ' fold to bare letters only under rd=2
    assert(Unicode61Rd2.tokenize("Ǖǖ ǟ ḉ").toSeq === Seq("uu", "a", "c"))
    assert(Unicode61.tokenize("Ǖǖ ǟ ḉ").toSeq === Seq("ǖǖ", "ǟ", "ḉ"))
    // single-diacritic and plain folds are identical to rd=1
    assert(Unicode61Rd2.tokenize("Café MÜLLER Привет ß").toSeq ===
      Unicode61.tokenize("Café MÜLLER Привет ß").toSeq)
    // combining-mark elision identical to rd=1 (probed: zero join diff)
    assert(Unicode61Rd2.tokenize("éf").toSeq === Seq("ef"))
    assert(Unicode61Rd2.tokenize("·—!?").toSeq === Seq.empty)
    assert(Unicode61Rd2.tokenize("The Quick-42 fox_es").toSeq ===
      Unicode61.tokenize("The Quick-42 fox_es").toSeq)
  }

  test("parity: 300 random multi-script strings tokenize exactly as FTS5 'unicode61 remove_diacritics 2'") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val pool: IndexedSeq[String] =
      ("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789".map(_.toString) ++
        " .,-–—·!?()[]/&%$#@^*+=".map(_.toString) ++
        "éÉüÜñÑåÅßæÆøØçÇðÐþÞīĪłŁſ".map(_.toString) ++
        "ǕǖǗǘǙǚǛǜǞǟǬǭǻȫȭȱḉḕ".map(_.toString) ++ // the rd=2 delta class
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
    val db = Files.createTempDirectory("graft-u61rd2").resolve("u.db").toString
    val script = new StringBuilder(
      "CREATE VIRTUAL TABLE t USING fts5(x, tokenize='unicode61 remove_diacritics 2');\n" +
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
      assert(Unicode61Rd2.tokenize(s).toSeq === real(i),
        s"rd=2 tokenization diverges from the sqlite3 binary on <$s>")
    }
    assert(strings.count(_.exists(_ > 0x7F)) > 200, "generator degenerate")
  }
}

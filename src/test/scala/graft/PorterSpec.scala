package graft

import java.nio.file.Files

import graft.functions.{Porter, Unicode61}
import graft.sinks.SqliteCli

import org.scalatest.funsuite.AnyFunSuite

/** FTS5 `porter` tokenizer fidelity ([[graft.functions.Porter]]):
  * the classic 1980 Porter stemmer on top of unicode61, verified
  * against the real sqlite3 binary's `tokenize='porter'` tables via
  * fts5vocab — the same probe-first methodology as Unicode61Spec.
  */
class PorterSpec extends AnyFunSuite {

  test("vocabulary goldens probed from FTS5 porter (incl. the k<=1 bypass, digits, non-ASCII)") {
    val goldens = Seq(
      "running" -> "run", "runs" -> "run", "ran" -> "ran",
      "connection" -> "connect", "connected" -> "connect", "connecting" -> "connect",
      "caresses" -> "caress", "ponies" -> "poni", "ties" -> "ti", "caress" -> "caress",
      "cats" -> "cat", "feed" -> "feed", "agreed" -> "agre", "plastered" -> "plaster",
      "bled" -> "bled", "motoring" -> "motor", "sing" -> "sing",
      "conflated" -> "conflat", "troubled" -> "troubl", "sized" -> "size",
      "hopping" -> "hop", "tanned" -> "tan", "falling" -> "fall",
      "hissing" -> "hiss", "fizzed" -> "fizz", "failing" -> "fail", "filing" -> "file",
      "happy" -> "happi", "sky" -> "sky",
      "relational" -> "relat", "rational" -> "ration",
      "vietnamization" -> "vietnam", "predication" -> "predic", "operator" -> "oper",
      "feudalism" -> "feudal", "decisiveness" -> "decis", "hopefulness" -> "hope",
      "callousness" -> "callous", "formality" -> "formal", "sensitivity" -> "sensit",
      "sensibility" -> "sensibl", "triplicate" -> "triplic", "formative" -> "form",
      "formalize" -> "formal", "electricity" -> "electr", "electrical" -> "electr",
      "hopeful" -> "hope", "goodness" -> "good", "revival" -> "reviv",
      "allowance" -> "allow", "inference" -> "infer", "airliner" -> "airlin",
      "gyroscopic" -> "gyroscop", "adjustable" -> "adjust", "defensible" -> "defens",
      "irritant" -> "irrit", "replacement" -> "replac", "adjustment" -> "adjust",
      "dependent" -> "depend", "adoption" -> "adopt", "homologou" -> "homolog",
      "communism" -> "commun", "activate" -> "activ", "angularity" -> "angular",
      "homologous" -> "homolog", "effective" -> "effect", "bowdlerize" -> "bowdler",
      "probate" -> "probat", "rate" -> "rate", "cease" -> "ceas",
      "controll" -> "control", "roll" -> "roll",
      "a" -> "a", "is" -> "is", "be" -> "be", "ee" -> "ee", "tree" -> "tree",
      "y" -> "y", "by" -> "by",
      "x9s" -> "x9", "abc123ing" -> "abc123", "ab" -> "ab", "the" -> "the")
    for ((w, want) <- goldens)
      assert(Porter.stem(w) === want, s"stem($w)")
    // through the composed pipeline: fold first, then stem
    assert(Porter.tokenize("Café MÜLLER Привет running!").toSeq ===
      Seq("cafe", "muller", "привет", "run"))
  }

  test("parity: corpus vocabulary + random soups stem exactly as the REAL FTS5 porter tokenizer") {
    assume(SqliteCli.binary.isDefined, "no sqlite3 binary on this box")
    val rnd = new scala.util.Random(20260815L)
    // random pseudo-words over stem-active letters (suffix-shaped tails
    // raise hit rates), plus step-2/3/4 suffixes glued onto random
    // stems, plus digit/mixed-script tails
    val letters = "abcdefghilmnoprstuvyz"
    val sufs = Seq("ed", "ing", "s", "es", "ies", "ational", "tional", "enci", "anci",
      "izer", "bli", "alli", "entli", "eli", "ousli", "ization", "ation", "ator",
      "alism", "iveness", "fulness", "ousness", "aliti", "iviti", "biliti", "logi",
      "icate", "ative", "alize", "iciti", "ical", "ful", "ness", "al", "ance", "ence",
      "er", "ic", "able", "ible", "ant", "ement", "ment", "ent", "ion", "ou", "ism",
      "ate", "iti", "ous", "ive", "ize", "e", "y", "ll", "eed")
    def stemBase() =
      (1 to (1 + rnd.nextInt(7))).map(_ => letters(rnd.nextInt(letters.length))).mkString
    val words = (
      (1 to 400).map(_ => stemBase() + sufs(rnd.nextInt(sufs.length))) ++
      (1 to 200).map(_ => stemBase()) ++
      Seq("приветing", "кафеed", "日本語s", "x9ed", "a1b2ing", "gas", "say",
        "dying", "lying", "flies", "die", "agreeing", "seeing", "possibli",
        "archaeologi", "controlling", "controlled", "generalization")
    ).distinct.filter(w => Unicode61.tokenize(w).length == 1)
    // ground truth: one fts5vocab pass over the porter table
    val db = Files.createTempDirectory("graft-porter").resolve("p.db").toString
    val script = new StringBuilder(
      "CREATE VIRTUAL TABLE t USING fts5(x, tokenize='porter');\n" +
        "CREATE VIRTUAL TABLE v USING fts5vocab(t,'instance');\nBEGIN;\n")
    words.zipWithIndex.foreach { case (w, i) =>
      script ++= s"INSERT INTO t(rowid, x) VALUES ($i, '$w');\n"
    }
    script ++= "COMMIT;\nSELECT doc, term FROM v ORDER BY doc;\n"
    val real: Map[Int, String] = SqliteCli.query(db, script.toString)
      .collect { case Seq(Some(doc), Some(term)) => doc.toInt -> term }.toMap
    words.zipWithIndex.foreach { case (w, i) =>
      val mine = Porter.tokenize(w)
      assert(mine.length === 1 && mine.head === real(i),
        s"porter diverges from the binary on <$w>: mine=${mine.toSeq} real=${real.get(i)}")
    }
    assert(words.length > 500, "generator degenerate")
  }
}

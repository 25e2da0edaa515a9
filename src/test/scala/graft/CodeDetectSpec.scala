package graft

import org.apache.spark.sql.functions._

import graft.operators.CodeDetect

/** Code-vs-prose heuristic goldens: each density counts what it says,
  * prose stays near zero, code-shaped text does not.
  */
class CodeDetectSpec extends SparkSpec {
  import spark.implicits._

  private def counts(s: String): (Long, Long, Long, Long, Long, Long) =
    Seq(s).toDF("t").select(CodeDetect.codeCounts(col("t")).as("c"))
      .select("c.n_chars", "c.n_lines", "c.n_tokens", "c.n_symbols",
        "c.n_indented", "c.n_keywords")
      .as[(Long, Long, Long, Long, Long, Long)].head()

  test("symbol / line / indent / keyword counts on a code snippet") {
    val (nChars, nLines, nToks, nSym, nInd, nKw) =
      counts("def f(x):\n    return x + 1;\n\tlet y = [x];")
    assert(nChars === 41L)
    assert(nLines === 3L)
    assert(nToks === 10L) // ws tokens: def f(x): / return x + 1; / let y = [x];
    assert(nSym === 7L) // ( ) ; = [ ] ; — colon and + are not in the set
    assert(nInd === 2L) // one 4-space line, one tab line
    assert(nKw === 3L) // def, return, let
  }

  test("prose has no symbols, indents, or (mostly) keywords") {
    val (_, nLines, _, nSym, nInd, nKw) =
      counts("the quick brown fox jumps over the lazy dog")
    assert(nLines === 1L)
    assert(nSym === 0L)
    assert(nInd === 0L)
    assert(nKw === 0L)
  }

  test("keyword hits tokenize like Fts (punctuation-delimited, lowered)") {
    val (_, _, _, _, _, nKw) = counts("Print(IF) for.while")
    // print, if, for, while all hit after lowering + non-alnum split
    assert(nKw === 4L)
  }

  test("empty text yields all-zero counts except the single empty line") {
    val (nChars, nLines, _, nSym, nInd, nKw) = counts("")
    assert(nChars === 0L)
    assert(nLines === 1L)
    assert(nSym === 0L && nInd === 0L && nKw === 0L)
  }
}

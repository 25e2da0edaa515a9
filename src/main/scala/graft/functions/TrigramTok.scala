package graft.functions

/** SQLite FTS5 `trigram` tokenizer (default options: `case_sensitive
  * 0`, `remove_diacritics 0`) — the substring-search tokenizer
  * (`sqlite.org/fts5.html#the_trigram_tokenizer`): the token stream of
  * a text is EVERY window of 3 consecutive CODEPOINTS of the
  * case-folded text. No separators exist — punctuation, spaces and
  * newlines are literal stream characters — so phrase adjacency over
  * these tokens is exactly substring occurrence in the folded text,
  * which is what makes a trigram FTS table answer `MATCH`, `LIKE` and
  * `GLOB` substring queries from the same index.
  *
  * The fold is the binary's own, probed per codepoint
  * ([[TrigramFoldData]], `scripts/probe_trigram.py`): simple case
  * folds over the FULL codepoint range (1057 pairs — NOT gated on the
  * unicode61 alphanumeric class), everything else verbatim, no skips.
  * Texts of fewer than 3 codepoints produce NO tokens — a query that
  * short can never match (pinned against the binary).
  *
  * FtsTrigramSpec fuzzes MATCH verdict parity against the sqlite3
  * binary over multi-script corpora.
  */
object TrigramTok {

  private val bmp: Array[Char] = {
    val t = new Array[Char](0x10000)
    var c = 0
    while (c < 0x10000) { t(c) = c.toChar; c += 1 }
    val fp = TrigramFoldData.foldPairs.split(',')
    var i = 0
    while (i < fp.length) {
      val cp = fp(i).toInt
      if (cp <= 0xFFFF) t(cp) = fp(i + 1).toInt.toChar
      i += 2
    }
    t
  }

  private val (astralCp, astralTo) = {
    val fp = TrigramFoldData.foldPairs.split(',').map(_.toInt)
    val pairs = fp.grouped(2).filter(_.head > 0xFFFF).toArray
    (pairs.map(_(0)), pairs.map(_(1)))
  }

  /** Fold one codepoint — total function, identity outside the table. */
  def foldCp(cp: Int): Int =
    if (cp < 0x10000) bmp(cp).toInt
    else {
      val i = java.util.Arrays.binarySearch(astralCp, cp)
      if (i >= 0) astralTo(i) else cp
    }

  /** Case-fold a string (codepoint-wise, length-preserving in cps). */
  def fold(s: String): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      sb.appendCodePoint(foldCp(cp))
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** The folded text as a codepoint array (the trigram stream's
    * character axis; token at position p covers cps p, p+1, p+2 —
    * 0-based here, the engine's positions are the same axis).
    */
  def foldedCps(s: String): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[Int](n)
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      out(k) = foldCp(cp)
      k += 1
      i += Character.charCount(cp)
    }
    out
  }

  /** All trigram tokens of `s` in stream order (WITH duplicates — the
    * positional token stream, one token per window).
    */
  def tokenize(s: String): Array[String] = {
    val cps = foldedCps(s)
    if (cps.length < 3) return Array.empty
    val out = new Array[String](cps.length - 2)
    var p = 0
    while (p + 2 < cps.length) {
      val sb = new java.lang.StringBuilder(6)
      sb.appendCodePoint(cps(p)).appendCodePoint(cps(p + 1)).appendCodePoint(cps(p + 2))
      out(p) = sb.toString
      p += 1
    }
    out
  }

  /** Catalyst-facing twin (same contract as Unicode61.tokensArray). */
  def tokensArray(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokenize(s.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(toks(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** Catalyst-facing fold (string → folded string). */
  def foldUtf8(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(fold(s.toString))
}

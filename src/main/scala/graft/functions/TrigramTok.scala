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

  /** Tokenizer option modes, matching the binary's constructor matrix
    * (probed): default fold (case_sensitive 0 remove_diacritics 0),
    * case-sensitive (identity fold — no diacritic removal either), and
    * remove_diacritics 1 (case fold + diacritic strip + 25 combining
    * marks REMOVED from the stream). `case_sensitive 1` combined with
    * `remove_diacritics 1` is a constructor ERROR in the binary —
    * callers enforce that.
    */
  final val ModeFold0 = 0
  final val ModeCaseSensitive = 1
  final val ModeRd1 = 2

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

  private val rd1Bmp: Array[Char] = {
    val t = new Array[Char](0x10000)
    var c = 0
    while (c < 0x10000) { t(c) = c.toChar; c += 1 }
    val fp = TrigramRd1FoldData.foldPairs.split(',')
    var i = 0
    while (i < fp.length) {
      val cp = fp(i).toInt
      if (cp <= 0xFFFF) t(cp) = fp(i + 1).toInt.toChar
      i += 2
    }
    // skipped combining marks: sentinel 0 (cp 0 itself never folds to 0
    // elsewhere; the probe covers 1..0x10FFFF)
    TrigramRd1FoldData.skipped.split(',').foreach(s => t(s.toInt) = 0)
    t
  }

  private val (rd1AstralCp, rd1AstralTo) = {
    val fp = TrigramRd1FoldData.foldPairs.split(',').map(_.toInt)
    val pairs = fp.grouped(2).filter(_.head > 0xFFFF).toArray
    (pairs.map(_(0)), pairs.map(_(1)))
  }

  /** Mode-aware fold: folded cp, or -1 = removed from the stream
    * (rd1's combining marks). [[ModeCaseSensitive]] is the identity.
    */
  def foldCpMode(cp: Int, mode: Int): Int = mode match {
    case ModeCaseSensitive => cp
    case ModeRd1 =>
      if (cp < 0x10000) {
        val f = rd1Bmp(cp)
        if (f == 0 && cp != 0) -1 else f.toInt
      } else {
        val i = java.util.Arrays.binarySearch(rd1AstralCp, cp)
        if (i >= 0) rd1AstralTo(i) else cp
      }
    case _ => foldCp(cp)
  }

  /** Case-fold a string (codepoint-wise; rd1 DROPS its removed marks,
    * so the folded string can be shorter in that mode).
    */
  def fold(s: String, mode: Int = ModeFold0): String = {
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val f = foldCpMode(cp, mode)
      if (f >= 0) sb.appendCodePoint(f)
      i += Character.charCount(cp)
    }
    sb.toString
  }

  /** The folded text as a codepoint array (the trigram stream's
    * character axis; token at position p covers cps p, p+1, p+2 —
    * 0-based here, the engine's positions are the same axis). Removed
    * marks (rd1) occupy no position.
    */
  def foldedCps(s: String, mode: Int = ModeFold0): Array[Int] = {
    val n = s.codePointCount(0, s.length)
    val out = new Array[Int](n)
    var i = 0
    var k = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      val f = foldCpMode(cp, mode)
      if (f >= 0) { out(k) = f; k += 1 }
      i += Character.charCount(cp)
    }
    if (k == n) out else java.util.Arrays.copyOf(out, k)
  }

  /** All trigram tokens of `s` in stream order (WITH duplicates — the
    * positional token stream, one token per window).
    */
  def tokenize(s: String, mode: Int = ModeFold0): Array[String] = {
    val cps = foldedCps(s, mode)
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
  def tokensArray(s: org.apache.spark.unsafe.types.UTF8String, mode: Int)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokenize(s.toString, mode)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(toks(i))
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def tokensArray(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = tokensArray(s, ModeFold0)

  /** Catalyst-facing fold (string → folded string). */
  def foldUtf8(s: org.apache.spark.unsafe.types.UTF8String, mode: Int)
      : org.apache.spark.unsafe.types.UTF8String =
    org.apache.spark.unsafe.types.UTF8String.fromString(fold(s.toString, mode))

  def foldUtf8(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.unsafe.types.UTF8String = foldUtf8(s, ModeFold0)

  /** FTS5 `highlight()` over a trigram table, on the RAW text: every
    * occurrence of every (folded) needle in the folded text wraps its
    * ORIGINAL character range in `open`/`close`; overlapping AND
    * touching ranges coalesce into one span, and an anchored needle
    * (`^pfx`) marks only an occurrence at offset 0 — all probed
    * against the binary ('ell OR llo' on "Hello" → "H[ello]",
    * 'abc OR def' on "abcdef" → "[abcdef]", 'aaa' on "aaaa" →
    * "[aaaa]", '^hel' marks only the head). Needles arrive ALREADY
    * folded (plan-time constants); matching is over the default-mode
    * folded codepoint stream, positions mapped back to raw char
    * offsets (folding is 1:1 per codepoint in mode 0).
    */
  def highlightRaw(raw: String, needles: Array[(String, Boolean)],
      open: String, close: String): String = {
    if (needles.isEmpty) return raw
    val n = raw.codePointCount(0, raw.length)
    val cps = new Array[Int](n)      // folded stream
    val charAt = new Array[Int](n + 1) // cp index -> raw char offset
    var i = 0
    var k = 0
    while (i < raw.length) {
      val cp = raw.codePointAt(i)
      cps(k) = foldCp(cp)
      charAt(k) = i
      k += 1
      i += Character.charCount(cp)
    }
    charAt(n) = raw.length
    // occurrences per needle (cp ranges); anchored: offset 0 only
    val ranges = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    needles.foreach { case (needle, anchored) =>
      val ncps = new Array[Int](needle.codePointCount(0, needle.length))
      var j = 0; var m = 0
      while (j < needle.length) {
        val cp = needle.codePointAt(j); ncps(m) = cp; m += 1
        j += Character.charCount(cp)
      }
      if (ncps.nonEmpty && ncps.length <= n) {
        val last = if (anchored) 0 else n - ncps.length
        var p = 0
        while (p <= last) {
          var q = 0
          while (q < ncps.length && cps(p + q) == ncps(q)) q += 1
          if (q == ncps.length) ranges += ((p, p + ncps.length))
          p += 1
        }
      }
    }
    if (ranges.isEmpty) return raw
    // merge overlapping AND touching (probed: 'abc OR def' coalesces)
    val sorted = ranges.sortBy(r => (r._1, r._2))
    val merged = scala.collection.mutable.ArrayBuffer[(Int, Int)](sorted.head)
    sorted.tail.foreach { case (s, e) =>
      val (cs, ce) = merged.last
      if (s <= ce) merged(merged.length - 1) = (cs, math.max(ce, e))
      else merged += ((s, e))
    }
    val sb = new java.lang.StringBuilder(raw.length + merged.length * (open.length + close.length))
    var prev = 0
    merged.foreach { case (s, e) =>
      sb.append(raw, prev, charAt(s)).append(open)
        .append(raw, charAt(s), charAt(e)).append(close)
      prev = charAt(e)
    }
    sb.append(raw, prev, raw.length)
    sb.toString
  }
}

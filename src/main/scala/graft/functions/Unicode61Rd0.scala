package graft.functions

/** SQLite FTS5 `unicode61 remove_diacritics 0` — the accent-PRESERVING
  * tokenizer option ("Müller" and "Muller" stay distinct terms; needed
  * for languages where diacritics are semantic). Same per-codepoint
  * architecture as [[Unicode61]] with two behavioral differences,
  * both probed from the real implementation ([[Unicode61Rd0Data]]):
  *
  *   - folds are PURE case folds ('É'→'é', 'Ł'→'ł'); no diacritic
  *     removal
  *   - the diacritic combining marks (exactly rd=1's elision list) are
  *     KEPT verbatim inside a token and skipped outside one —
  *     "áb" is the single token "áb", "́ab" is "ab"
  *
  * Unicode61Rd0Spec fuzzes token parity against the sqlite3 binary on
  * the same multi-script strings as the rd=1 suite.
  */
object Unicode61Rd0 {

  private final val Sep: Char = 0
  private final val Keep: Char = 1

  private def parseInts(s: String): Array[Int] = {
    val parts = s.split(',')
    val out = new Array[Int](parts.length)
    var i = 0
    while (i < parts.length) { out(i) = parts(i).toInt; i += 1 }
    out
  }

  private val bmp: Array[Char] = {
    val t = new Array[Char](0x10000)
    val ar = parseInts(Unicode61Rd0Data.alnumRanges)
    var i = 0
    while (i < ar.length) {
      var c = ar(i)
      while (c <= ar(i + 1) && c <= 0xFFFF) { t(c) = c.toChar; c += 1 }
      i += 2
    }
    val fp = parseInts(Unicode61Rd0Data.foldPairs)
    i = 0
    while (i < fp.length) {
      if (fp(i) <= 0xFFFF) t(fp(i)) = fp(i + 1).toChar
      i += 2
    }
    val kr = parseInts(Unicode61Rd0Data.keepRanges)
    i = 0
    while (i < kr.length) {
      var c = kr(i)
      while (c <= kr(i + 1)) { t(c) = Keep; c += 1 }
      i += 2
    }
    t
  }

  private val (astralStart, astralEnd) = {
    val ar = parseInts(Unicode61Rd0Data.alnumRanges).grouped(2)
      .filter(_.head > 0xFFFF).toArray
    (ar.map(_(0)), ar.map(_(1)))
  }
  private val (astralFoldCp, astralFoldTo) = {
    val fp = parseInts(Unicode61Rd0Data.foldPairs).grouped(2)
      .filter(_.head > 0xFFFF).toArray
    (fp.map(_(0)), fp.map(_(1)))
  }

  /** Fold one codepoint: folded cp, or -1 (separator) or -3 (kept
    * combining mark: verbatim inside a token, skipped outside).
    */
  def foldCp(cp: Int): Int = {
    if (cp < 0x10000) {
      val f = bmp(cp)
      if (f == Sep) -1 else if (f == Keep) -3 else f.toInt
    } else {
      val fi = java.util.Arrays.binarySearch(astralFoldCp, cp)
      if (fi >= 0) astralFoldTo(fi)
      else {
        var lo = 0
        var hi = astralStart.length - 1
        var res = -1
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          if (astralStart(mid) > cp) hi = mid - 1
          else { res = mid; lo = mid + 1 }
        }
        if (res >= 0 && cp <= astralEnd(res)) cp else -1
      }
    }
  }

  /** Tokenize with rd=0 semantics: case-fold token chars, keep marks
    * inside tokens, split on separators, skip marks outside tokens.
    */
  def tokenize(s: String): Array[String] = {
    val out = new java.util.ArrayList[String](8)
    val sb = new java.lang.StringBuilder(16)
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      val f = foldCp(cp)
      if (f >= 0) sb.appendCodePoint(f)
      else if (f == -3) { if (sb.length > 0) sb.appendCodePoint(cp) }
      else if (sb.length > 0) { out.add(sb.toString); sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out.add(sb.toString)
    out.toArray(new Array[String](out.size))
  }
}

package graft.functions

/** SQLite FTS5 `unicode61 remove_diacritics 2` — the FULL
  * diacritic-removal option (SQLite ≥3.27). Identical architecture to
  * the default rd=1 [[Unicode61]]; the only behavioral difference is
  * the fold table: 112 multi-diacritic codepoints ('ǖ' u+diaeresis+
  * macron, 'ǟ', 'ḉ', ...) that rd=1's legacy table folds to an
  * accent-bearing char (or leaves as-is) fold all the way to the bare
  * letter under rd=2. All tables probed from the real implementation
  * ([[Unicode61Rd2Data]], scripts/probe_unicode61.py); the elided
  * combining-mark class probed identical to rd=1's.
  * Unicode61Rd2Spec fuzzes token parity against the sqlite3 binary.
  */
object Unicode61Rd2 {

  private final val Sep: Char = 0
  private final val Join: Char = 1

  private def parseInts(s: String): Array[Int] = {
    val parts = s.split(',')
    val out = new Array[Int](parts.length)
    var i = 0
    while (i < parts.length) { out(i) = parts(i).toInt; i += 1 }
    out
  }

  /** bmp(c) = folded char, or Sep / Join. */
  private val bmp: Array[Char] = {
    val t = new Array[Char](0x10000) // zero-filled = Sep
    // no range crosses the BMP boundary and no BMP cp folds astral
    // (asserted at generation time from the probe output)
    val ar = parseInts(Unicode61Rd2Data.alnumRanges)
    var i = 0
    while (i < ar.length) {
      var c = ar(i)
      while (c <= ar(i + 1) && c <= 0xFFFF) { t(c) = c.toChar; c += 1 }
      i += 2
    }
    val fp = parseInts(Unicode61Rd2Data.foldPairs)
    i = 0
    while (i < fp.length) {
      if (fp(i) <= 0xFFFF) t(fp(i)) = fp(i + 1).toChar
      i += 2
    }
    val jr = parseInts(Unicode61Rd2Data.joinRanges)
    i = 0
    while (i < jr.length) {
      var c = jr(i)
      while (c <= jr(i + 1)) { t(c) = Join; c += 1 }
      i += 2
    }
    t
  }

  private val (astralStart, astralEnd) = {
    val ar = parseInts(Unicode61Rd2Data.alnumRanges).grouped(2)
      .filter(_.head > 0xFFFF).toArray
    (ar.map(_(0)), ar.map(_(1)))
  }
  private val (astralFoldCp, astralFoldTo) = {
    val fp = parseInts(Unicode61Rd2Data.foldPairs).grouped(2)
      .filter(_.head > 0xFFFF).toArray
    (fp.map(_(0)), fp.map(_(1)))
  }

  /** Fold one codepoint: the folded codepoint, or -1 (separator) or
    * -2 (elided diacritic). O(1) for the BMP, binary search above it.
    */
  def foldCp(cp: Int): Int = {
    if (cp < 0x10000) {
      val f = bmp(cp)
      if (f == Sep) -1 else if (f == Join) -2 else f.toInt
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

  /** Tokenize: fold token chars, elide join chars, split on
    * separators, drop empties. Single pass over codepoints.
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
      else if (f == -1 && sb.length > 0) { out.add(sb.toString); sb.setLength(0) }
      i += Character.charCount(cp)
    }
    if (sb.length > 0) out.add(sb.toString)
    out.toArray(new Array[String](out.size))
  }

  /** Codegen entry point (same contract as
    * [[Unicode61.tokensArray]]): token array as catalyst ArrayData.
    */
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
}

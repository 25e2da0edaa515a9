package graft.functions

/** SQLite FTS5 `ascii` tokenizer (the legacy FTS3 "simple" rule set):
  * token characters are ASCII alphanumerics plus EVERY codepoint
  * ≥ 0x80; the ONLY fold is ASCII A-Z → a-z ("MÜLLER" → "mÜller" —
  * the Ü is kept verbatim, probed). Everything else (ASCII punctuation
  * / space / control) separates.
  *
  * The closed form above is not an approximation: the full
  * per-codepoint probe (`scripts/probe_unicode61.py "ascii"`) returns
  * exactly ALNUM = {48-57, 97-122, 128-0x10FFFF minus surrogates},
  * FOLD = {65-90 → +32}, no join/keep class — three ranges, so no
  * generated table file is needed. AsciiTokSpec re-probes the ASCII
  * block per-codepoint against the sqlite3 binary and fuzzes 300
  * multi-script strings for token parity.
  */
object AsciiTok {

  /** Fold one codepoint: folded cp, or -1 (separator). */
  def foldCp(cp: Int): Int = {
    if (cp >= 0x80) cp
    else if ((cp >= '0' && cp <= '9') || (cp >= 'a' && cp <= 'z')) cp
    else if (cp >= 'A' && cp <= 'Z') cp + 32
    else -1
  }

  /** Tokenize as FTS5 `ascii` does: single pass, split on ASCII
    * non-alphanumerics, fold A-Z only.
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
      else if (sb.length > 0) { out.add(sb.toString); sb.setLength(0) }
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

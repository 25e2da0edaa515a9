package graft.functions

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** SQLite FTS5 `unicode61` tokenizer (default options:
  * `remove_diacritics 1`), the tokenizer the reference gets by
  * delegating FTS to SQLite (`/root/reference/csvs_to_sqlite/utils.py:374-438`).
  *
  * Semantics, probed per-codepoint from the real implementation
  * ([[Unicode61Data]], scripts/probe_unicode61.py):
  *
  *   - token characters are Unicode 6.x alphanumerics (categories L*
  *     and N*) — "Привет", "日本語", "café" all carry token chars the
  *     engine's former ASCII tokenizer silently dropped
  *   - each token char FOLDS per-codepoint: simple case folding
  *     ('É'→'e', 'Я'→'я') plus diacritic removal ('é'→'e', 'ü'→'u';
  *     'ß', 'ø', 'æ' fold to themselves — unicode61 does NOT
  *     decompose them)
  *   - a small set of combining marks (U+0300… — the
  *     remove_diacritics table) is ELIDED without breaking the token:
  *     "éf" is the single token "ef"
  *   - every other codepoint is a separator
  *
  * The tokenizer is strictly per-codepoint (no context), so one
  * BMP lookup table + binary search for astral planes reproduces it
  * exactly; Unicode61Spec fuzzes parity against the sqlite3 binary.
  *
  * On pure-ASCII text this tokenizer is identical to
  * `lower(s) split [^a-z0-9]+` — which is why switching [[graft.operators.Fts]]
  * to it left every ASCII-corpus oracle byte-stable.
  */
object Unicode61 {

  /** BMP table sentinels — 0x00/0x01 are control chars (always
    * separators), so they are free as markers.
    */
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
    // no range crosses the BMP boundary (probe-verified), so a plain
    // start<=0xFFFF split between this table and the astral arrays is
    // exhaustive
    val ar = parseInts(Unicode61Data.alnumRanges)
    var i = 0
    while (i < ar.length) {
      var c = ar(i)
      while (c <= ar(i + 1) && c <= 0xFFFF) { t(c) = c.toChar; c += 1 }
      i += 2
    }
    val fp = parseInts(Unicode61Data.foldPairs)
    i = 0
    while (i < fp.length) {
      if (fp(i) <= 0xFFFF) t(fp(i)) = fp(i + 1).toChar // no BMP cp folds astral (probe-verified)
      i += 2
    }
    val jr = parseInts(Unicode61Data.joinRanges)
    i = 0
    while (i < jr.length) {
      var c = jr(i)
      while (c <= jr(i + 1)) { t(c) = Join; c += 1 }
      i += 2
    }
    t
  }

  // astral tables: sorted range starts/ends and fold keys/values
  private val (astralStart, astralEnd) = {
    val ar = parseInts(Unicode61Data.alnumRanges).grouped(2)
      .filter(_.head > 0xFFFF).toArray
    (ar.map(_(0)), ar.map(_(1)))
  }
  private val (astralFoldCp, astralFoldTo) = {
    val fp = parseInts(Unicode61Data.foldPairs).grouped(2)
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

  /** Tokenize as unicode61 does: fold token chars, elide join chars,
    * split on separators, drop empties. Single pass over codepoints.
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

  /** True when `s` contains at least one token character. */
  def hasToken(s: String): Boolean = {
    var i = 0
    val n = s.length
    while (i < n) {
      val cp = s.codePointAt(i)
      if (foldCp(cp) >= 0) return true
      i += Character.charCount(cp)
    }
    false
  }

  /** Codegen entry point for [[graft.expressions.Unicode61Tokens]]:
    * the token array as catalyst ArrayData of UTF8String.
    */
  def tokensArray(s: UTF8String): ArrayData = {
    val toks = tokenize(s.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) { out(i) = UTF8String.fromString(toks(i)); i += 1 }
    new GenericArrayData(out)
  }

  /** FTS5 `highlight()` on RAW text for full grammar queries, PHRASE
    * hits included (r18): tokenize with raw byte spans, find every
    * occurrence of every query phrase (`terms(p)(k)` = folded term k
    * of phrase p, `prefix(p)(k)` its prefix-star flag), coalesce
    * overlapping hits exactly as fts5_aux.c's CInst iterator (merge
    * while next start <= current max end; adjacent hits stay
    * separate), and wrap each merged region's ORIGINAL bytes — from
    * the first hit token's raw start to the last one's raw end, so
    * `"new york"` wraps `New-York` separator included. SqliteCliSpec
    * pins byte-parity against the real FTS5 `highlight(d, 0, …)` on
    * raw multilingual punctuated text, multi-token phrases included.
    */
  /** [[highlightRawPhrases]] with a per-phrase activity mask: phrase p
    * participates only when `active(p)` (the per-row highlight gate —
    * an OR operand whose branch didn't match reports no instances).
    */
  def highlightRawPhrasesGated(s: String, terms: Array[Array[String]],
      prefix: Array[Array[Boolean]], active: Array[Boolean],
      open: String, close: String): String =
    highlightRawPhrasesConstrained(s, terms, prefix,
      new Array[Boolean](terms.length),
      Array.fill(terms.length)(-1), new Array[Int](terms.length),
      active, open, close)

  def highlightRawPhrases(s: String, terms: Array[Array[String]],
      prefix: Array[Array[Boolean]], open: String, close: String): String =
    highlightRawPhrasesGated(s, terms, prefix,
      Array.fill(terms.length)(true), open, close)

  /** The constraint-complete core (r18b): [[highlightRawPhrases]] plus
    * FTS5's INSTANCE-list narrowing, pinned against the sqlite3 binary:
    *
    *   - `anchored(p)`: an initial-token phrase (`^abc`) reports only
    *     its position-0 instance (`^a` over `a b a` wraps the first
    *     `a` alone);
    *   - `groupId(p) >= 0`: phrase p belongs to a NEAR group; an
    *     instance survives only if SOME one-instance-per-member
    *     assignment containing it satisfies the clump rule
    *     `max(start) − min(end) − 1 <= N` (`groupN(p)`) — the witness
    *     formulation of fts5_expr.c's lookahead trim, which emits
    *     exactly the union of valid-clump participants (probed:
    *     `NEAR(a b, 2)` over `a q…q b a` wraps only the trailing
    *     `b a`). Witness search uses the PRE-trim instance lists of
    *     the other members, and (ms, me) tightens monotonically, so
    *     a violated partial clump prunes the branch exactly.
    */
  def highlightRawPhrasesConstrained(s: String, terms: Array[Array[String]],
      prefix: Array[Array[Boolean]], anchored: Array[Boolean],
      groupId: Array[Int], groupN: Array[Int], active: Array[Boolean],
      open: String, close: String): String = {
    // pass 1: folded tokens + their raw spans (same scan as the
    // tokenizer: fold >= 0 joins the token, -1 separates, -2 elides
    // inside a span)
    val tokText = new scala.collection.mutable.ArrayBuffer[String]()
    val tokS = new scala.collection.mutable.ArrayBuffer[Int]()
    val tokE = new scala.collection.mutable.ArrayBuffer[Int]()
    val tok = new java.lang.StringBuilder(16)
    var tokStart = -1
    var i = 0
    val n = s.length
    def flush(endExclusive: Int): Unit = if (tokStart >= 0) {
      tokText += tok.toString; tokS += tokStart; tokE += endExclusive
      tok.setLength(0); tokStart = -1
    }
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      val f = foldCp(cp)
      if (f >= 0) { if (tokStart < 0) tokStart = i; tok.appendCodePoint(f) }
      else if (f == -1) flush(i)
      // f == -2 (elided diacritic): stays inside the token span
      i += w
    }
    flush(n)
    // pass 2: per-phrase hits as (startTok, endTok) inclusive
    val nP = terms.length
    val byPhrase = Array.fill(nP)(Vector.empty[(Int, Int)])
    var p = 0
    while (p < nP) {
      val ts = terms(p); val ps = prefix(p)
      var a = 0
      while (a + ts.length <= tokText.length) {
        var k = 0
        var ok = true
        while (ok && k < ts.length) {
          val t = tokText(a + k)
          ok = if (ps(k)) t.startsWith(ts(k)) else t == ts(k)
          k += 1
        }
        if (ok) byPhrase(p) = byPhrase(p) :+ ((a, a + ts.length - 1))
        a += 1
      }
      if (anchored(p)) byPhrase(p) = byPhrase(p).filter(_._1 == 0)
      p += 1
    }
    // pass 2b: NEAR instance narrowing (see scaladoc) — witnesses come
    // from the pre-trim snapshot, trims land on the live lists
    val snapshot: Array[Vector[(Int, Int)]] = byPhrase.clone()
    groupId.toSet.filter(_ >= 0).foreach { g =>
      val members = (0 until nP).filter(groupId(_) == g)
      if (members.length >= 2) {
        val n = groupN(members.head)
        members.foreach { m =>
          val others = members.filter(_ != m).map(snapshot)
          byPhrase(m) = byPhrase(m).filter { case (hs, he) =>
            def rec(j: Int, ms: Int, me: Int): Boolean =
              if (ms - me - 1 > n) false
              else if (j == others.length) true
              else others(j).exists { case (s2, e2) =>
                rec(j + 1, math.max(ms, s2), math.min(me, e2)) }
            rec(0, hs, he)
          }
        }
      }
    }
    val hits = new scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    p = 0
    while (p < nP) {
      if (active(p)) hits ++= byPhrase(p)
      p += 1
    }
    if (hits.isEmpty) return s
    // pass 3: sequential merge over start-sorted hits (fts5 CInst)
    val sorted = hits.sortBy(h => (h._1, h._2))
    val merged = new scala.collection.mutable.ArrayBuffer[(Int, Int)]()
    sorted.foreach { case (a, b) =>
      if (merged.nonEmpty && a <= merged.last._2)
        merged(merged.length - 1) = (merged.last._1, math.max(merged.last._2, b))
      else merged += ((a, b))
    }
    // pass 4: emit raw segments with markers at merged region bounds
    val out = new java.lang.StringBuilder(n + 16 * merged.length)
    var pos = 0
    merged.foreach { case (a, b) =>
      out.append(s, pos, tokS(a)).append(open)
        .append(s, tokS(a), tokE(b)).append(close)
      pos = tokE(b)
    }
    out.append(s, pos, n)
    out.toString
  }

  /** FTS5 `highlight()` semantics on the RAW text: every token whose
    * unicode61 fold is in `terms` gets its ORIGINAL span (case,
    * diacritics, exact bytes) wrapped in open/close markers; all other
    * characters pass through untouched. Single pass; spans are token
    * boundaries as the tokenizer sees them, so "CAFÉ," highlights as
    * "<b>CAFÉ</b>," for the term 'cafe'. SqliteCliSpec pins
    * byte-parity against the real FTS5 `highlight(d, 0, …)` on raw
    * multilingual punctuated text. (Single-token surface; the phrase
    * generalization is [[highlightRawPhrases]].)
    */
  def highlightRaw(s: String, terms: java.util.Set[String],
      open: String, close: String): String = {
    val out = new java.lang.StringBuilder(s.length + 16)
    val tok = new java.lang.StringBuilder(16)
    var tokStart = -1 // raw index where the current token began
    var i = 0
    val n = s.length
    def flush(endExclusive: Int): Unit = {
      if (tokStart >= 0) {
        val raw = s.substring(tokStart, endExclusive)
        if (terms.contains(tok.toString)) {
          out.append(open).append(raw).append(close)
        } else out.append(raw)
        tok.setLength(0)
        tokStart = -1
      }
    }
    while (i < n) {
      val cp = s.codePointAt(i)
      val w = Character.charCount(cp)
      val f = foldCp(cp)
      if (f >= 0) {
        if (tokStart < 0) tokStart = i
        tok.appendCodePoint(f)
      } else if (f == -1) {
        flush(i)
        out.appendCodePoint(cp)
      }
      // f == -2 (elided diacritic): stays inside the token span,
      // contributes nothing to the folded key
      else if (tokStart < 0) out.appendCodePoint(cp) // mark outside any token
      i += w
    }
    flush(n)
    out.toString
  }
}

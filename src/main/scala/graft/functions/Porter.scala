package graft.functions

/** The Porter stemming algorithm (M.F. Porter, "An algorithm for suffix
  * stripping", Program 14(3) 1980) — the EXACT classic variant SQLite's
  * FTS5 `porter` tokenizer applies on top of unicode61
  * (`sqlite.org/fts5.html#porter_tokenizer`), reproduced from the
  * published algorithm and fuzzed token-for-token against the sqlite3
  * binary (PorterSpec): vocabulary goldens (ponies→poni, happy→happi,
  * agreed→agre, …), the length≤2 bypass, digits-as-consonants
  * (x9s→x9), and non-ASCII pass-through (привет unchanged; mixed-script
  * tails behave as consonant runs, matching FTS5's byte-level view for
  * every probed case).
  *
  * Operates on the ALREADY-FOLDED token ([[Unicode61.tokenize]] output)
  * — lowercase, no diacritics — so only `a e i o u` are vowels and
  * every other char (consonants, digits, non-ASCII) is a consonant,
  * exactly as the reference implementation's byte test.
  */
object Porter {

  private def isVowelChar(c: Char): Boolean =
    c == 'a' || c == 'e' || c == 'i' || c == 'o' || c == 'u'

  /** True when b(i) is a consonant under Porter's definition: not a
    * vowel, and 'y' only when not preceded by a consonant.
    */
  private def cons(b: Array[Char], i: Int): Boolean = {
    val c = b(i)
    if (isVowelChar(c)) false
    else if (c == 'y') i == 0 || !cons(b, i - 1)
    else true
  }

  /** m() — the number of consonant-vowel sequences in b[0..j]. */
  private def measure(b: Array[Char], j: Int): Int = {
    var n = 0
    var i = 0
    var done = false
    while (!done && i <= j && cons(b, i)) i += 1 // leading consonants
    if (i > j) return 0
    while (i <= j) {
      while (i <= j && !cons(b, i)) i += 1 // vowel run
      if (i > j) return n
      n += 1
      while (i <= j && cons(b, i)) i += 1 // consonant run
    }
    done = true
    n
  }

  private def vowelInStem(b: Array[Char], j: Int): Boolean =
    (0 to j).exists(i => !cons(b, i))

  private def doubleC(b: Array[Char], j: Int): Boolean =
    j >= 1 && b(j) == b(j - 1) && cons(b, j)

  /** cvc(i) — consonant-vowel-consonant ending at i, where the final
    * consonant is not w, x or y (the "e-restoration" test).
    */
  private def cvc(b: Array[Char], i: Int): Boolean =
    i >= 2 && cons(b, i) && !cons(b, i - 1) && cons(b, i - 2) &&
      b(i) != 'w' && b(i) != 'x' && b(i) != 'y'

  /** Stem one folded token. Tokens of length <= 2 pass through (the
    * reference's `k <= 1` bypass).
    */
  def stem(word: String): String = {
    if (word.length <= 2) return word
    val b = word.toCharArray
    var k = b.length - 1 // index of last char of the current stem

    def ends(s: String): Boolean = {
      val n = s.length
      if (n > k + 1) false
      else {
        var i = 0
        var ok = true
        while (ok && i < n) { ok = b(k + 1 - n + i) == s.charAt(i); i += 1 }
        ok
      }
    }
    var j0 = 0 // stem end before the matched suffix (set by `after`)
    def setTo(s: String): Unit = { // replace the matched suffix with s
      var i = 0
      while (i < s.length) { b(j0 + 1 + i) = s.charAt(i); i += 1 }
      k = j0 + s.length
    }
    def after(suffix: String): Boolean = {
      if (ends(suffix)) { j0 = k - suffix.length; true } else false
    }
    def r(mCond: Int => Boolean, s: String): Unit =
      if (mCond(measure(b, j0))) setTo(s)

    // ---- step 1a
    if (ends("sses")) k -= 2
    else if (ends("ies")) k -= 2
    else if (b(k) == 's' && k >= 1 && b(k - 1) != 's') k -= 1

    // ---- step 1b
    var extraEd = false
    if (after("eed")) {
      if (measure(b, j0) > 0) k -= 1
    } else if ((after("ed") && vowelInStem(b, j0)) ||
               { val hit = after("ing") && vowelInStem(b, j0); hit }) {
      k = j0
      extraEd = true
    }
    if (extraEd) {
      if (ends("at") || ends("bl") || ends("iz")) { k += 1; b(k) = 'e' }
      else if (doubleC(b, k) && b(k) != 'l' && b(k) != 's' && b(k) != 'z') k -= 1
      else if (measure(b, k) == 1 && cvc(b, k)) { k += 1; b(k) = 'e' }
    }

    // ---- step 1c: y -> i when a vowel is in the stem
    if (ends("y") && vowelInStem(b, k - 1)) b(k) = 'i'

    // ---- step 2 (m > 0)
    def step2Pair(suf: String, rep: String): Boolean =
      if (after(suf)) { r(_ > 0, rep); true } else false
    if (k >= 1) (b(k - 1): @annotation.switch) match {
      case 'a' => val _ = step2Pair("ational", "ate") || step2Pair("tional", "tion")
      case 'c' => val _ = step2Pair("enci", "ence") || step2Pair("anci", "ance")
      case 'e' => val _ = step2Pair("izer", "ize")
      case 'g' => val _ = step2Pair("logi", "log")
      case 'l' => val _ = step2Pair("bli", "ble") || step2Pair("alli", "al") ||
        step2Pair("entli", "ent") || step2Pair("eli", "e") || step2Pair("ousli", "ous")
      case 'o' => val _ = step2Pair("ization", "ize") || step2Pair("ation", "ate") ||
        step2Pair("ator", "ate")
      case 's' => val _ = step2Pair("alism", "al") || step2Pair("iveness", "ive") ||
        step2Pair("fulness", "ful") || step2Pair("ousness", "ous")
      case 't' => val _ = step2Pair("aliti", "al") || step2Pair("iviti", "ive") ||
        step2Pair("biliti", "ble")
      case _ =>
    }

    // ---- step 3 (m > 0)
    def step3Pair(suf: String, rep: String): Boolean =
      if (after(suf)) { r(_ > 0, rep); true } else false
    (b(k): @annotation.switch) match {
      case 'e' => val _ = step3Pair("icate", "ic") || step3Pair("ative", "") ||
        step3Pair("alize", "al")
      case 'i' => val _ = step3Pair("iciti", "ic")
      case 'l' => val _ = step3Pair("ical", "ic") || step3Pair("ful", "")
      case 's' => val _ = step3Pair("ness", "")
      case _ =>
    }

    // ---- step 4 (m > 1): drop the suffix entirely
    def step4(suf: String): Boolean =
      if (after(suf)) { if (measure(b, j0) > 1) k = j0; true } else false
    if (k >= 1) (b(k - 1): @annotation.switch) match {
      case 'a' => val _ = step4("al")
      case 'c' => val _ = step4("ance") || step4("ence")
      case 'e' => val _ = step4("er")
      case 'i' => val _ = step4("ic")
      case 'l' => val _ = step4("able") || step4("ible")
      case 'n' => val _ = step4("ant") || step4("ement") || step4("ment") || step4("ent")
      case 'o' =>
        // (m>1 and (*S or *T)) ION — the stem must end in s or t
        if (ends("ion") && k - 3 >= 0 && (b(k - 3) == 's' || b(k - 3) == 't')) {
          j0 = k - 3
          if (measure(b, j0) > 1) k = j0
        } else { val _ = step4("ou") }
      case 's' => val _ = step4("ism")
      case 't' => val _ = step4("ate") || step4("iti")
      case 'u' => val _ = step4("ous")
      case 'v' => val _ = step4("ive")
      case 'z' => val _ = step4("ize")
      case _ =>
    }

    // ---- step 5a: drop final e when m > 1, or m == 1 and not cvc
    if (b(k) == 'e') {
      val m = measure(b, k - 1)
      if (m > 1 || (m == 1 && !cvc(b, k - 1))) k -= 1
    }
    // ---- step 5b: m > 1, double l -> single l
    if (b(k) == 'l' && doubleC(b, k) && measure(b, k - 1) > 1) k -= 1

    new String(b, 0, k + 1)
  }

  /** unicode61 fold + Porter stem per token — the exact pipeline of
    * FTS5's `tokenize='porter'` default (porter wrapping unicode61).
    */
  def tokenize(s: String): Array[String] =
    Unicode61.tokenize(s).map(stem)

  /** Codegen entry point for [[graft.expressions.PorterTokens]]. */
  def tokensArray(s: org.apache.spark.unsafe.types.UTF8String)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val toks = tokenize(s.toString)
    val out = new Array[Any](toks.length)
    var i = 0
    while (i < toks.length) {
      out(i) = org.apache.spark.unsafe.types.UTF8String.fromString(toks(i)); i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

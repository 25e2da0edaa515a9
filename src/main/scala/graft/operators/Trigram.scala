package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Trigram-indexed SUBSTRING search (extension — the `LIKE '%needle%'`
  * accelerator): the technique behind PostgreSQL's pg_trgm and SQLite
  * FTS5's `trigram` tokenizer (`sqlite.org/fts5.html#the_trigram_tokenizer`),
  * re-expressed Spark-first. Token FTS cannot answer substring
  * predicates (a needle can span token boundaries — "vector hash"
  * crosses a space; "ctor ha" starts mid-token); a full-corpus
  * `contains()` scan can, but reads every byte of a 100 TB corpus for
  * every search.
  *
  * The index: distinct (trigram, rowid) pairs over the case-folded
  * text — built once, shuffled by trigram like any inverted index.
  * A search folds the needle the same way, takes ITS trigrams, and
  * intersects the posting lists (one aggregation keyed on rowid — the
  * same no-self-join intersection as [[Fts.matchRowids]]); every true
  * match contains every needle trigram, so the candidate set has NO
  * false negatives. An exact `contains` verify on just the candidates
  * (semi-join back to the corpus) removes the false positives —
  * trigram adjacency is not enforced by the intersection ("abc" +
  * "bcd" elsewhere in the doc would slip through. The RESULT is exact;
  * only the pruning is approximate, the same exact-verify stance as
  * [[Bloom]].
  *
  * Scale shape: index build is one explode + distinct (map-side
  * combined); a search touches only the needle's trigram postings —
  * selectivity ~ product of trigram frequencies — then verifies a
  * candidate set that is usually orders of magnitude under the corpus.
  * Needles shorter than 3 chars have no trigram and must fall back to
  * a scan (loud require, caller's choice).
  *
  * Case folding is `lower` (SQL LOWER semantics, matching the DuckDB
  * oracle's), deliberately NOT unicode61: substring search preserves
  * the raw character stream (punctuation, spacing) — diacritic elision
  * would change string POSITIONS and break `contains` equivalence.
  */
object Trigram {

  /** Distinct (trigram, rowid) inverted index. */
  def index(df: DataFrame, rowidCol: String = Rowid.ColName,
      textCol: String = "text"): DataFrame = {
    val folded = lower(col(textCol))
    val grams = when(length(folded) >= 3,
        transform(sequence(lit(1), length(folded) - 2), i => folded.substr(i, lit(3))))
      .otherwise(array().cast("array<string>"))
    df.select(col(rowidCol), explode(array_distinct(grams)).as("trigram"))
  }

  /** Rowids whose text CONTAINS `needle` (case-insensitive), answered
    * through the trigram index + exact verify. `corpus` must be the
    * SAME rows the index was built from.
    */
  def search(corpus: DataFrame, idx: DataFrame, needle: String,
      rowidCol: String = Rowid.ColName, textCol: String = "text"): DataFrame = {
    val folded = needle.toLowerCase
    require(folded.length >= 3,
      s"trigram search needs a needle of >= 3 chars (got '$needle') — fall back to a contains() scan")
    val grams = (0 to folded.length - 3).map(i => folded.substring(i, i + 3)).distinct
    val candidates = idx
      .filter(col("trigram").isin(grams: _*))
      .groupBy(col(rowidCol))
      .agg(countDistinct(col("trigram")).as("__ng"))
      .filter(col("__ng") === lit(grams.size))
      .select(col(rowidCol))
    // exact verify: trigram presence does not imply adjacency
    corpus.join(candidates, Seq(rowidCol), "left_semi")
      .filter(contains(lower(col(textCol)), lit(folded)))
  }

  /** GLOB search through the trigram index — the other pattern surface
    * an FTS5 trigram table accelerates (`sqlite.org/fts5.html#the_trigram_tokenizer`:
    * "LIKE and GLOB patterns"). SQLite GLOB semantics, probed against
    * the binary: case-SENSITIVE whole-string match, `*` any sequence,
    * `?` one char, `[...]` classes with `[^...]` negation and `[[]`
    * literal-bracket escape.
    *
    * Pruning: every literal run of >= 3 chars in the pattern must
    * appear contiguously in any match, and a case-sensitive match
    * implies case-insensitive containment of the folded run — so the
    * runs' trigrams intersect posting lists exactly as [[search]]
    * (safe superset). A pattern with no 3-char literal run (e.g.
    * `*a?b*`) cannot prune and verifies over the full corpus — still
    * exact, the caller's signal to reshape the pattern. Verification
    * translates the GLOB to an anchored regex ([[globToRegex]]) on the
    * RAW text (case kept).
    */
  def globSearch(corpus: DataFrame, idx: DataFrame, pattern: String,
      rowidCol: String = Rowid.ColName, textCol: String = "text"): DataFrame = {
    val grams = literalRuns(pattern).filter(_.length >= 3)
      .flatMap { run =>
        val f = run.toLowerCase
        (0 to f.length - 3).map(i => f.substring(i, i + 3))
      }.distinct
    val base =
      if (grams.isEmpty) corpus
      else {
        val candidates = idx
          .filter(col("trigram").isin(grams: _*))
          .groupBy(col(rowidCol))
          .agg(countDistinct(col("trigram")).as("__ng"))
          .filter(col("__ng") === lit(grams.size.toLong))
          .select(col(rowidCol))
        corpus.join(candidates, Seq(rowidCol), "left_semi")
      }
    base.filter(regexp_like(col(textCol), lit("(?s)^" + globToRegex(pattern) + "$")))
  }

  /** SQL LIKE search through the trigram index — the third pattern
    * surface an FTS5 trigram table accelerates. SQLite LIKE semantics,
    * probed against the binary: whole-string match, `%` any sequence,
    * `_` one char, optional ESCAPE char, and case folding for ASCII
    * ONLY (`'%café%'` does NOT match `CAFÉ` there — É is non-ASCII, so
    * it stays unfolded; probed). Pruning is the same literal-run gram
    * intersection as [[globSearch]] (an ASCII-case-insensitive match
    * implies containment of the lower-folded run); verification
    * translates the pattern to an anchored regex where each ASCII
    * letter becomes its two-case class — NOT `(?i)`, which would
    * wrongly fold non-ASCII too.
    */
  def likeSearch(corpus: DataFrame, idx: DataFrame, pattern: String,
      escape: Option[Char] = None,
      rowidCol: String = Rowid.ColName, textCol: String = "text"): DataFrame = {
    val parsed = parseLike(pattern, escape)
    val grams = parsed.collect { case LikeLit(run) if run.length >= 3 =>
        val f = run.toLowerCase
        (0 to f.length - 3).map(i => f.substring(i, i + 3))
      }.flatten.distinct
    val base =
      if (grams.isEmpty) corpus
      else {
        val candidates = idx
          .filter(col("trigram").isin(grams: _*))
          .groupBy(col(rowidCol))
          .agg(countDistinct(col("trigram")).as("__ng"))
          .filter(col("__ng") === lit(grams.size.toLong))
          .select(col(rowidCol))
        corpus.join(candidates, Seq(rowidCol), "left_semi")
      }
    val rx = parsed.map {
      case LikeAny => ".*"
      case LikeOne => "."
      case LikeLit(run) => run.map {
        case c if c >= 'a' && c <= 'z' => s"[$c${c.toUpper}]"
        case c if c >= 'A' && c <= 'Z' => s"[${c.toLower}$c]"
        case c if "\\.[]{}()*+?^$|".indexOf(c) >= 0 => "\\" + c
        case c => c.toString
      }.mkString
    }.mkString
    base.filter(regexp_like(col(textCol), lit("(?s)^" + rx + "$")))
  }

  private sealed trait LikePart
  private case object LikeAny extends LikePart
  private case object LikeOne extends LikePart
  private case class LikeLit(run: String) extends LikePart

  /** LIKE pattern → parts, honoring the optional ESCAPE char (an
    * escaped `%`/`_`/escape-char is a literal; a trailing escape or an
    * escape before any other char is an error, as SQLite).
    */
  private def parseLike(pattern: String, escape: Option[Char]): Seq[LikePart] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[LikePart]
    val cur = new StringBuilder
    def flush(): Unit = { if (cur.nonEmpty) { out += LikeLit(cur.toString); cur.clear() } }
    var i = 0
    while (i < pattern.length) {
      val c = pattern.charAt(i)
      if (escape.contains(c)) {
        require(i + 1 < pattern.length,
          s"LIKE pattern ends in the escape character: $pattern")
        cur.append(pattern.charAt(i + 1)); i += 2
      } else if (c == '%') { flush(); out += LikeAny; i += 1 }
      else if (c == '_') { flush(); out += LikeOne; i += 1 }
      else { cur.append(c); i += 1 }
    }
    flush()
    out.toSeq
  }

  /** Literal runs of a GLOB pattern: maximal substrings containing no
    * `*`, `?` or `[...]` class (a class matches ONE variable char and
    * breaks the run, like `?`).
    */
  private[graft] def literalRuns(pattern: String): Seq[String] = {
    val runs = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var i = 0
    def flush(): Unit = { if (cur.nonEmpty) { runs += cur.toString; cur.clear() } }
    while (i < pattern.length) pattern.charAt(i) match {
      case '*' | '?' => flush(); i += 1
      case '[' =>
        flush()
        var j = i + 1
        if (j < pattern.length && pattern.charAt(j) == '^') j += 1
        if (j < pattern.length && pattern.charAt(j) == ']') j += 1
        while (j < pattern.length && pattern.charAt(j) != ']') j += 1
        require(j < pattern.length, s"unterminated '[' class in GLOB pattern: $pattern")
        i = j + 1
      case c => cur.append(c); i += 1
    }
    flush()
    runs.toSeq
  }

  /** SQLite GLOB → Java regex body (caller anchors). Classes keep `-`
    * ranges and `^` negation; the first `]` after `[` or `[^` is a
    * literal member (SQLite rule, probed: `a[[]b]c` matches `a[b]c`).
    */
  private[graft] def globToRegex(glob: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < glob.length) glob.charAt(i) match {
      case '*' => sb.append(".*"); i += 1
      case '?' => sb.append('.'); i += 1
      case '[' =>
        val cls = new StringBuilder("[")
        var j = i + 1
        if (j < glob.length && glob.charAt(j) == '^') { cls.append('^'); j += 1 }
        if (j < glob.length && glob.charAt(j) == ']') { cls.append("\\]"); j += 1 }
        var closed = false
        while (j < glob.length && !closed) {
          val c = glob.charAt(j)
          if (c == ']') closed = true
          else {
            if (c == '\\' || c == '[' || c == '&') cls.append('\\')
            cls.append(c)
          }
          j += 1
        }
        require(closed, s"unterminated '[' class in GLOB pattern: $glob")
        sb.append(cls).append(']')
        i = j
      case c =>
        if ("\\.[]{}()*+?^$|".indexOf(c) >= 0) sb.append('\\')
        sb.append(c)
        i += 1
    }
    sb.toString
  }
}

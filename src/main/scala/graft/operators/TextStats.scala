package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text analysis for training-data pipelines: language ID, quality
  * scoring, token counting, fingerprinting (extension — SURVEY §7.2.8).
  *
  * Everything here is per-row arithmetic over codegen'd builtins — no
  * UDFs, no shuffles; it runs at scan speed on any corpus size. Counts
  * are exact integers and ratios are double divisions of exact integers,
  * so the DuckDB oracles match bit-for-bit.
  */
object TextStats {

  /** Stopword lists driving the n-gram-free language heuristic. Small on
    * purpose: the heuristic is argmax of stopword hits with deterministic
    * alphabetical tie-break, 'und' for unknown/empty.
    */
  val stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en" -> Seq("the", "a", "and", "of", "to", "in", "is", "that"),
    "es" -> Seq("el", "los", "las", "una", "es", "y", "que", "por"),
    "fr" -> Seq("le", "les", "et", "est", "une", "que", "pour", "dans"))

  /** Native tokenizer pass + hash-set membership
    * ([[graft.expressions.StopwordHits]]); the
    * `size(filter(toks, isin(...)))` HOF spelling is kept as the parity
    * reference for the spec.
    */
  private def hitCount(text: Column, words: Seq[String]): Column =
    graft.expressions.StopwordHits.stopword_hits(text, words)

  private[graft] def hitCountHof(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words.map(lit): _*).cast(BooleanType)))

  /** Language-ID: stopword-hit argmax. Returns (lang, hits) struct. */
  def langId(text: Column): Column = {
    val scored = stopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(hitCount(text, words).cast(LongType).as("hits"), lit(lang).as("lang"))
    }
    // array_max on (hits, lang) structs: lexicographic -> highest hits,
    // then lexicographically LAST language; to make ties resolve to the
    // alphabetically FIRST language, compare on (hits, reversed-rank).
    val ranked = scored.zipWithIndex.map { case (s, i) =>
      struct(s.getField("hits").as("hits"), lit(-i).as("nrank"), s.getField("lang").as("lang"))
    }
    val best = array_max(array(ranked: _*))
    when(best.getField("hits") > 0, best.getField("lang")).otherwise(lit("und"))
  }

  /** Character trigrams of a string (positions 1..len-2, multiplicity
    * preserved) — the raw material of profile-based n-gram language ID.
    * Pure narrow codegen: a `transform` over `sequence` with a
    * dynamic-position Substring (the Column-API `substring` only takes
    * literal positions, hence the catalyst spelling). Pass text already
    * normalized (lowered) and MATERIALIZED in a projection — an inline
    * `lower(...)` here would re-evaluate per element inside the lambda.
    */
  def charTrigrams(normText: Column): Column = {
    import org.apache.spark.sql.catalyst.expressions.{Literal, Substring}
    import org.apache.spark.sql.graftshim.GraftShim
    // the length guard matters: sequence(1, 0) in Spark is the
    // DESCENDING [1, 0], not empty — a <3-char string must short-circuit
    when(length(normText) >= 3,
      transform(sequence(lit(1), length(normText) - 2),
        i => GraftShim.column(
          Substring(GraftShim.expression(normText), GraftShim.expression(i), Literal(3)))))
      .otherwise(array().cast("array<string>"))
  }

  /** Quality metrics: exact counts + ratio arithmetic.
    * Returns a struct of (n_chars, n_tokens, mean_token_len, punct_ratio,
    * stopword_ratio, quality_score).
    */
  def quality(text: Column): Column = {
    val toks = Fts.tokens(Seq(text))
    val nChars = length(text).cast(LongType)
    val nTokens = size(toks).cast(LongType)
    val alnumChars = length(regexp_replace(lower(text), "[^a-z0-9]", "")).cast(LongType)
    val spaceChars = length(regexp_replace(text, "[^ ]", "")).cast(LongType)
    val punctChars = nChars - alnumChars - spaceChars
    val allStop = stopwords.values.flatten.toSeq.distinct.sorted
    val stopHits = hitCount(text, allStop).cast(LongType)
    val meanTokLen = when(nTokens > 0,
      alnumChars.cast(DoubleType) / nTokens.cast(DoubleType)).otherwise(lit(0.0))
    val punctRatio = when(nChars > 0,
      punctChars.cast(DoubleType) / nChars.cast(DoubleType)).otherwise(lit(0.0))
    val stopRatio = when(nTokens > 0,
      stopHits.cast(DoubleType) / nTokens.cast(DoubleType)).otherwise(lit(0.0))
    // Heuristic score in [0,1]: reward mid-length tokens + stopword
    // presence, penalize punctuation soup. Computed EXACTLY:
    // score = (sh/nt)/2 + (ac/nt)/10 - pc/nc over the common
    // denominator 10·nt·nc, clamped, rounded half-up at 6 dp as
    // integer ppm, then ONE exact division to double. A float spelling
    // rounded with round(x, 6) is engine-divergent at 6-dp midpoints
    // (Spark rounds the shortest-decimal repr, DuckDB the binary
    // value — found by the sf1 gate); integer ppm is deterministic on
    // both. Overflow-safe while n_tokens·n_chars < ~9e11 per document
    // (a 1 MB doc is ~2.5e11) — far past any sane training document.
    val num = lit(5L) * stopHits * nChars + alnumChars * nChars -
      lit(10L) * punctChars * nTokens
    val den = lit(10L) * nTokens * nChars
    // integral `div`, not `/`: Column./ on longs is DOUBLE division,
    // which loses exactness past 2^53 — num*1e6 reaches ~1e18 here
    val ppm = when(nTokens <= 0 || nChars <= 0 || num <= 0, lit(0L))
      .when(num >= den, lit(1000000L))
      .otherwise(call_function("div",
        num * lit(1000000L) + call_function("div", den, lit(2L)), den))
    val score = ppm.cast(DoubleType) / lit(1000000.0)
    struct(nChars.as("n_chars"), nTokens.as("n_tokens"),
      meanTokLen.as("mean_token_len"), punctRatio.as("punct_ratio"),
      stopRatio.as("stopword_ratio"), score.as("quality_score"))
  }

  /** Within-document repetition signals (the Gopher-style filters a
    * curation pipeline gates on): token diversity plus duplicate-n-gram
    * fractions. Pure per-row array arithmetic over exact integer counts
    * — no shuffle, runs at scan speed; ratios are double divisions of
    * exact ints rounded to 6 dp so the DuckDB oracle matches.
    *
    * Returns a struct of (n_tokens, distinct_token_ratio,
    * dup_2gram_frac, dup_3gram_frac). Empty docs report ratio 1.0 and
    * dup fractions 0 (their single degenerate shingle is unique).
    */
  def repetition(text: Column): Column = {
    val toks = Fts.tokens(Seq(text))
    val nTokens = size(toks).cast(LongType)
    def dupFrac(w: Int): Column = {
      val sh = TextDedup.shingles(text, w)
      val total = size(sh).cast(DoubleType) // >= 1 by construction
      round((total - size(array_distinct(sh)).cast(DoubleType)) / total, 6)
    }
    val distinctRatio = when(nTokens > 0,
      round(size(array_distinct(toks)).cast(DoubleType) /
        nTokens.cast(DoubleType), 6)).otherwise(lit(1.0))
    struct(nTokens.as("n_tokens"),
      distinctRatio.as("distinct_token_ratio"),
      dupFrac(2).as("dup_2gram_frac"),
      dupFrac(3).as("dup_3gram_frac"))
  }

  /** Whitespace token count. `array_remove` is a codegen'd builtin; the
    * `filter(...)` HOF spelling it replaces was CodegenFallback.
    */
  def wsTokenCount(text: Column): Column =
    size(array_remove(split(text, "\\s+"), "")).cast(LongType)

  /** BPE-ish subword count: runs of letters, runs of digits, and single
    * other non-space characters each count as one token (a cheap proxy
    * for byte-pair tokenizer counts).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0)))
      .cast(LongType)

  /** Readability counts for the Flesch reading-ease feature, with the
    * standard cheap proxies: sentences = non-empty `[.!?]+` splits,
    * words = [[Fts.tokens]], syllables = vowel-group runs
    * (`[aeiouy]+`) per token, floored at 1 so all-consonant tokens
    * ("mr", "xyz") count one. Words and sentences are floored at 1 so
    * the downstream divisions are total. All codegen'd builtins over
    * one row — no shuffle. The score itself
    * (`206835 − (1015·w div s) − (84600·sy div w)`, ×1e3 integer) is
    * applied at the query layer with exact `div`, keeping the division
    * sequence the cross-engine contract.
    */
  def readabilityCounts(text: Column): Column = {
    val sentences = greatest(
      size(filter(split(text, "[.!?]+"), s => trim(s) =!= "")), lit(1))
      .cast(LongType)
    val toks = Fts.tokens(Seq(text))
    val words = greatest(size(toks), lit(1)).cast(LongType)
    val syllables = aggregate(
      transform(toks, t =>
        greatest(size(regexp_extract_all(t, lit("[aeiouy]+"), lit(0))), lit(1))),
      lit(0L), (acc, x) => acc + x.cast(LongType))
    struct(words.as("n_words"), sentences.as("n_sentences"),
      syllables.as("n_syllables"))
  }
}

package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Gopher-style document quality rules (extension — SURVEY §7.2.8):
  * the repetition-free subset of the quality filters from Rae et al.,
  * "Scaling Language Models: ... Gopher" (A1.1), as exact-integer
  * per-document flags. The within-doc repetition rules of that table
  * live in [[TextStats.repetition]]; this operator covers the
  * length/shape/stopword gates:
  *
  *   - word count in [minWords, maxWords]
  *   - mean word length in [3, 10] characters
  *   - >= 80% of words contain at least one alphabetic character
  *   - >= 2 hits from a small required-stopword list
  *
  * Every rule is integer arithmetic (ratios compared cross-multiplied,
  * never divided), so the DuckDB oracle matches bit-for-bit, and the
  * whole thing is narrow per-row codegen — no UDFs, no shuffle, scan
  * speed at any corpus size.
  */
object GopherFilter {

  /** The stopword gate list from the paper ("the, be, to, of, and,
    * that, have, with" in spirit) restricted to our tokenizer's
    * lowercase alphanumerics.
    */
  val requiredStopwords: Seq[String] =
    Seq("the", "a", "and", "of", "to", "in", "is", "that")

  /** Per-document counters + rule flags. Returns a struct of
    * (n_words, sum_word_len, n_alpha_words, stop_hits,
    *  flag_word_count, flag_mean_len, flag_alpha, flag_stop, pass) —
    * counters as exact BIGINTs, flags as 0/1 BIGINTs.
    */
  def flags(text: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
    val toks = Fts.tokens(Seq(text))
    val nWords = size(toks).cast(LongType)
    val sumLen = aggregate(toks, lit(0L), (acc, t) => acc + length(t))
    val nAlpha = size(filter(toks, t => t.rlike("[a-z]"))).cast(LongType)
    val stopHits =
      graft.expressions.StopwordHits.stopword_hits(text, requiredStopwords)
        .cast(LongType)
    val flagWc = nWords >= minWords && nWords <= maxWords
    // 3 <= sumLen/nWords <= 10, cross-multiplied to stay integer-exact
    val flagMean = nWords > 0 &&
      sumLen >= nWords * 3 && sumLen <= nWords * 10
    // nAlpha/nWords >= 0.8  <=>  5*nAlpha >= 4*nWords
    val flagAlpha = nWords > 0 && nAlpha * 5 >= nWords * 4
    val flagStop = stopHits >= 2
    val pass = flagWc && flagMean && flagAlpha && flagStop
    struct(
      nWords.as("n_words"),
      sumLen.as("sum_word_len"),
      nAlpha.as("n_alpha_words"),
      stopHits.as("stop_hits"),
      flagWc.cast(LongType).as("flag_word_count"),
      flagMean.cast(LongType).as("flag_mean_len"),
      flagAlpha.cast(LongType).as("flag_alpha"),
      flagStop.cast(LongType).as("flag_stop"),
      pass.cast(LongType).as("pass"))
  }
}

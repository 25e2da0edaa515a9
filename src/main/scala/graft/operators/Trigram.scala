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
}

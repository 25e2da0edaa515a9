package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.PortableHash

/** Line-level corpus cleaning (extension — SURVEY §7.2.8): the two
  * structural filters every web-scale training pipeline runs before
  * document-level dedup.
  *
  *  - [[c4Filter]]: C4-style WITHIN-document line rules (Raffel et al.,
  *    "Exploring the Limits of Transfer Learning" §2.2) — keep lines
  *    that end in terminal punctuation, have at least 5 words, and are
  *    not bullet items; drop whole documents left with fewer than 3
  *    surviving lines. Pure per-row array compute over codegen'd
  *    builtins — zero shuffle, runs at scan speed on any corpus size.
  *
  *  - [[boilerplateStrip]]: CCNet-style CROSS-document line dedup
  *    (Wenzek et al., "CCNet" §3) — a line whose hash occurs in >=
  *    `minDocs` distinct documents is boilerplate (nav bars, footers,
  *    cookie banners) and is removed from EVERY document. One
  *    map-side-combined aggregation keyed by the 60-bit line hash, a
  *    same-key join back (exchange reuse), one doc-keyed
  *    reconstruction — never all-pairs, same scale shape as
  *    [[ParaDedup]] but keyed on structural lines with a
  *    remove-all-copies policy instead of keep-first blocks.
  */
object LineOps {

  /** Whitespace word count of one line (kept in lockstep with
    * `DuckSql.wsWords`).
    */
  private def wordCount(line: Column): Column =
    size(array_remove(split(line, "\\s+"), ""))

  /** The C4 keep rule for a single line: terminal punctuation, >= 5
    * words, not a bullet item.
    */
  def keepLine(line: Column): Column =
    line.rlike("[.!?\"]$") && wordCount(line) >= 5 && !line.startsWith("- ")

  /** Apply the line rules to a newline-delimited document. Returns a
    * struct (n_lines, n_kept, doc_kept, clean_text); documents with
    * fewer than `minKeptLines` surviving lines are dropped entirely
    * (doc_kept = 0, clean_text = '').
    */
  def c4Filter(raw: Column, minKeptLines: Int = 3): Column = {
    val lines = split(raw, "\n")
    val kept = filter(lines, keepLine _)
    val docKept = size(kept) >= minKeptLines
    struct(
      size(lines).cast(LongType).as("n_lines"),
      size(kept).cast(LongType).as("n_kept"),
      docKept.cast(LongType).as("doc_kept"),
      when(docKept, array_join(kept, "\n")).otherwise(lit("")).as("clean_text"))
  }

  /** WITHIN-document exact duplicate-line removal (the Dolma toolkit's
    * intra-doc paragraph dedup; Soldaini et al. 2024, arXiv:2402.00159)
    * — keep the FIRST occurrence of each exact line, preserve order.
    * The cross-doc complement is [[boilerplateStrip]]: that one removes
    * lines shared ACROSS documents; this one removes a document
    * repeating itself (scraped nav menus, pagination echoes, template
    * stutter).
    *
    * Returns `struct(n_lines, n_removed, clean_text)`. Pure narrow
    * per-row compute — no shuffle, no join, stays in whole-stage
    * codegen; the prefix-containment filter is O(lines²) per document
    * in the worst case, on line counts (not characters), which is the
    * right trade against a per-doc hash-set UDF that would leave
    * codegen.
    */
  def dedupLines(raw: Column): Column = {
    val lines = split(raw, "\n")
    // keep index i iff lines[i] is absent from the prefix lines[0..i-1]
    val kept = filter(lines,
      (l: Column, i: Column) => !array_contains(slice(lines, lit(1), i), l))
    struct(
      size(lines).cast(LongType).as("n_lines"),
      (size(lines) - size(kept)).cast(LongType).as("n_removed"),
      array_join(kept, "\n").as("clean_text"))
  }

  /** Remove every line that occurs in >= `minDocs` DISTINCT documents.
    * Returns one row per input document:
    * (doc_id, n_lines, n_boiler, clean_text) where clean_text is the
    * newline-join of surviving lines in original order.
    */
  def boilerplateStrip(
      df: DataFrame, idCol: String, rawCol: String,
      minDocs: Int = 3): DataFrame = {
    val lines = df
      .select(col(idCol).cast(LongType).as("doc_id"),
        posexplode(split(col(rawCol), "\n")).as(Seq("line_no", "line")))
      .withColumn("h", PortableHash.hash60(col("line")))
    // distinct (h, doc) first, then a plain count: two map-side-combined
    // shuffles on the same key beat count(DISTINCT doc_id)'s expand at
    // scale, and the second is a near-no-op after the first
    val docFreq = lines.select(col("h"), col("doc_id")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("n_docs"))
    lines.join(docFreq, Seq("h"))
      .withColumn("kept", col("n_docs") < minDocs)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).cast(LongType).as("n_lines"),
        sum(when(col("kept"), 0L).otherwise(1L)).cast(LongType).as("n_boiler"),
        // collect_list drops nulls -> only kept lines; sort restores
        // original line order regardless of shuffle arrival order
        concat_ws("\n", transform(
          array_sort(collect_list(when(col("kept"),
            struct(col("line_no"), col("line"))))),
          l => l.getField("line"))).as("clean_text"))
  }
}

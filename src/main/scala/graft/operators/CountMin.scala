package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.PortableHash

/** Count-Min sketch — mergeable frequency estimation (extension;
  * SURVEY §2.10; Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms
  * 55(1), 2005).
  *
  * Why this exists next to Misra-Gries ([[HeavyHitters]]): MG answers
  * "which items are frequent" with a deletion-based summary whose
  * surviving counts depend on merge order; CMS answers "how frequent is
  * THIS item" with a pure counter array whose cells are sums — addition
  * commutes, so the merged sketch is bit-identical to the single-pass
  * sketch and (because the bucket hash is the portable md5-based
  * [[PortableHash.hash60]]) identical across engines. Like [[Kmv]], it
  * is the sketch family where the DuckDB oracle can demand hash-exact
  * equality rather than an error bound.
  *
  * Guarantee: estimate >= true count always (counters only ever add),
  * and estimate <= true + ε·N with probability 1-δ for width = e/ε,
  * depth = ln(1/δ) — overcount only, never undercount.
  *
  * Scale shape (100 TB): the sketch is depth × width cells REGARDLESS
  * of corpus size. Build = one map-side-combined aggregation keyed by
  * (row, bucket) — at most depth·width groups survive the partial
  * aggregate in every task, so the shuffle moves O(depth·width ×
  * nPartitions) rows no matter how many terms flow in. Probing
  * broadcast-joins the constant-size sketch.
  */
object CountMin {

  val DefaultDepth = 4
  val DefaultWidth = 512

  /** Row-j bucket of a term: `hash60(j || ":" || term) % width` — the
    * seeded portable hash family, twin of [[bucketSql]].
    */
  def bucket(j: Int, term: Column, width: Int): Column =
    PortableHash.hash60Seeded(lit(j), term) % width

  /** DuckDB twin of [[bucket]] (hash60 is non-negative, so `%` agrees
    * between engines with no pmod shim).
    */
  def bucketSql(jExpr: String, termExpr: String, width: Int): String =
    s"(${graft.queries.DuckSql.hash60Seeded(jExpr, termExpr)}) % $width"

  /** The per-term cell coordinates, one struct per sketch row:
    * `[(0, b0(term)), …, (depth-1, bd(term))]`.
    */
  private def cells(term: Column, depth: Int, width: Int): Column =
    array((0 until depth).map(j =>
      struct(lit(j).cast(LongType).as("row"),
        bucket(j, term, width).cast(LongType).as("bucket"))): _*)

  /** Build the sketch from pre-aggregated `(term, count)` rows — the
    * efficient shape: the term aggregation upstream is itself map-side
    * combined, and the sketch build then touches vocabulary-sized, not
    * corpus-sized, data. Output: `groupCols + (row, bucket, cell_count)`,
    * at most depth × width rows per group (`groupCols` builds one
    * independent sketch per group — e.g. per language).
    */
  def sketch(termCounts: DataFrame, termCol: String, countCol: String,
      depth: Int = DefaultDepth, width: Int = DefaultWidth,
      groupCols: Seq[String] = Nil): DataFrame =
    termCounts
      .select(groupCols.map(col) ++ Seq(col(countCol).cast(LongType).as("n"),
        explode(cells(col(termCol), depth, width)).as("cell")): _*)
      .groupBy(groupCols.map(col) ++ Seq(col("cell.row").as("row"),
        col("cell.bucket").as("bucket")): _*)
      .agg(sum(col("n")).cast(LongType).as("cell_count"))

  /** Point-query the sketch: for each probe term, the estimate is the
    * MIN over the depth rows of the addressed cell (within the probe's
    * group when `groupCols` is set). The sketch side is constant-size →
    * broadcast; the probe side stays partitioned.
    * Output: probe columns + `cms_estimate`.
    */
  def estimate(sk: DataFrame, probes: DataFrame, termCol: String,
      depth: Int = DefaultDepth, width: Int = DefaultWidth,
      groupCols: Seq[String] = Nil): DataFrame = {
    require(!probes.columns.contains("cell") && !probes.columns.contains("cms_estimate"),
      "probes must not carry reserved columns 'cell'/'cms_estimate'")
    val probeCols = probes.columns.map(col).toSeq
    val skr = groupCols.foldLeft(sk)((d, g) => d.withColumnRenamed(g, s"__sk_$g"))
    val cond = groupCols
      .map(g => col(g) === col(s"__sk_$g"))
      .foldLeft(col("cell.row") === skr("row") &&
        col("cell.bucket") === skr("bucket"))(_ && _)
    probes
      .withColumn("cell", explode(cells(col(termCol), depth, width)))
      .join(broadcast(skr), cond)
      .groupBy(probeCols: _*)
      .agg(min(col("cell_count")).cast(LongType).as("cms_estimate"))
  }

  // ---- Aggregator form (the mergeable streaming / combine path) ----

  /** Flat row-major counter array, length depth × width. */
  case class CmsState(cells: Array[Long])

  /** CMS as a typed [[Aggregator]] over raw term occurrences: O(d·w)
    * state, partials combine map-side, and the same UDAF drops into a
    * streaming groupBy. Cell sums commute, so merged == single-pass ==
    * the DataFrame [[sketch]] — bit-equal, asserted in the spec, not
    * just error-bounded.
    */
  class CmsAgg(depth: Int, width: Int)
      extends Aggregator[String, CmsState, Seq[Long]] {

    override def zero: CmsState = CmsState(new Array[Long](depth * width))

    override def reduce(s: CmsState, term: String): CmsState = {
      var j = 0
      while (j < depth) {
        val b = (graft.expressions.MinHashKernel.hash60(s"$j:$term") % width).toInt
        s.cells(j * width + b) += 1L
        j += 1
      }
      s
    }

    override def merge(a: CmsState, b: CmsState): CmsState = {
      val out = new Array[Long](a.cells.length)
      var i = 0
      while (i < out.length) { out(i) = a.cells(i) + b.cells(i); i += 1 }
      CmsState(out)
    }

    override def finish(s: CmsState): Seq[Long] = s.cells.toSeq

    override def bufferEncoder: Encoder[CmsState] = Encoders.product[CmsState]
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Long]]()
  }

  /** Column form: `cms_sketch(term)` for any groupBy (batch or
    * streaming); returns the flat row-major cell array.
    */
  def sketchAgg(term: Column, depth: Int = DefaultDepth,
      width: Int = DefaultWidth): Column =
    udaf(new CmsAgg(depth, width)).apply(term)

  /** Point query against a flat cell array from [[sketchAgg]]. */
  def estimateFromCells(cells: Seq[Long], term: String, depth: Int,
      width: Int): Long =
    (0 until depth).map { j =>
      val b = (graft.expressions.MinHashKernel.hash60(s"$j:$term") % width).toInt
      cells(j * width + b)
    }.min
}

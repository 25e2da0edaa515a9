package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Bounded-domain histogram sketch — EXACT, mergeable, order-independent
  * quantiles (extension; SURVEY §2.10). The quantile member of the
  * sketch family next to KMV (distinct), Count-Min (frequency),
  * Misra-Gries (heavy hitters) and Bloom (membership): per-group counts
  * over a CLAMPED integer domain, merged by summation.
  *
  * Why a histogram and not GK/t-digest/KLL: those sketches are either
  * randomized (KLL) or merge-order-dependent (GK, t-digest), so two
  * runs — or two engines — disagree in the last ulp and a hash-exact
  * oracle is impossible. Summed counts are exactly mergeable in ANY
  * order (Agarwal et al., "Mergeable Summaries", PODS'12 — the trivial
  * member of the family), and the quantile readout is then EXACT over
  * the clamped distribution, not an approximation. The trade is state
  * size: O(min(distinct values, domain)) per group instead of
  * O(1/eps) — the right trade for the integer measures a curation
  * pipeline actually gates on (token counts, line counts, byte
  * lengths), whose natural domains are a few thousand after clamping.
  *
  * 100 TB shape: one map-side-combined aggregation — partials the size
  * of the observed value set, no sort, no shuffle of raw rows, and the
  * SAME Aggregator drops into a streaming groupBy (batch ≡ stream
  * bit-equal; StreamingSpec). Values above `domain-1` clamp to
  * `domain-1`, negatives to 0 — the tails a gate never distinguishes
  * anyway; pick `domain` past the last quantile you read.
  *
  * The readout replays DuckDB's `quantile_disc` rule exactly:
  * `idx = max(0, ceil(n*p) - 1)` over the sorted clamped multiset
  * (probed against DuckDB across n in {1..1000}, p in {0, .1, .2, .25,
  * .5, .75, .9, .99, 1}; both engines evaluate `n*p` in IEEE754 double,
  * so the boundary cases agree bit-for-bit).
  */
object HistSketch {

  case class HistState(counts: Map[Int, Long])

  /** `n` plus one exact quantile per requested probability. `qs` are
    * None when n == 0 (an all-NULL or empty group) — exactly SQL's
    * `quantile_disc` over no non-NULL values, so a NULL-bearing column
    * can never hash-diverge from the oracle.
    */
  case class HistSummary(n: Long, qs: Seq[Option[Long]])

  class HistAgg(domain: Int, probs: Seq[Double])
      extends Aggregator[java.lang.Long, HistState, HistSummary] {
    require(domain >= 2, "histogram domain must be >= 2")
    require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0),
      s"probabilities must be in [0, 1]: $probs")

    private def clamp(v: Long): Int =
      if (v < 0L) 0 else if (v >= domain) domain - 1 else v.toInt

    override def zero: HistState = HistState(Map.empty)

    override def reduce(s: HistState, v: java.lang.Long): HistState =
      // SQL aggregate semantics: NULL values are ignored (DuckDB's
      // count/quantile_disc skip them; a silent null->0 bucket would
      // diverge from any SQL oracle)
      if (v == null) s
      else {
        val b = clamp(v.longValue)
        HistState(s.counts.updated(b, s.counts.getOrElse(b, 0L) + 1L))
      }

    override def merge(a: HistState, b: HistState): HistState =
      HistState(b.counts.foldLeft(a.counts) { case (m, (k, c)) =>
        m.updated(k, m.getOrElse(k, 0L) + c)
      })

    override def finish(s: HistState): HistSummary = {
      val n = s.counts.valuesIterator.sum
      if (n == 0L) HistSummary(0L, probs.map(_ => None))
      else {
        val sorted = s.counts.toArray.sortBy(_._1)
        val qs = probs.map { p =>
          // DuckDB quantile_disc: element at max(0, ceil(n*p) - 1) of
          // the sorted multiset (0-based)
          val idx = math.max(0L, math.ceil(n * p).toLong - 1L)
          var cum = 0L
          var i = 0
          var out = sorted.last._1.toLong
          var found = false
          while (!found && i < sorted.length) {
            cum += sorted(i)._2
            if (cum > idx) { out = sorted(i)._1.toLong; found = true }
            i += 1
          }
          Some(out)
        }
        HistSummary(n, qs)
      }
    }

    override def bufferEncoder: Encoder[HistState] = Encoders.product[HistState]
    override def outputEncoder: Encoder[HistSummary] = Encoders.product[HistSummary]
  }

  /** Column form for any batch or streaming groupBy:
    * `hist_quantiles(value)` → struct(n, qs array).
    */
  def quantileAgg(value: Column, domain: Int, probs: Seq[Double]): Column =
    udaf(new HistAgg(domain, probs), Encoders.LONG).apply(value.cast(LongType))

  /** Per-group exact quantiles, flattened to one column per requested
    * probability (`q_5` for 0.5, `q_99` for 0.99, `q_999` for 0.999).
    */
  def groupedQuantiles(df: DataFrame, groupCol: String, valueCol: String,
      domain: Int, probs: Seq[Double]): DataFrame = {
    val agg = df.groupBy(col(groupCol))
      .agg(quantileAgg(col(valueCol), domain, probs).as("h"))
    val cols = col(groupCol) +: col("h.n").as("n") +:
      probs.zipWithIndex.map { case (p, i) =>
        col("h.qs").getItem(i).as(qName(p))
      }
    agg.select(cols: _*)
  }

  /** `0.5 -> q_5`, `0.99 -> q_99`, `0.05 -> q_05`, `1.0 -> q_1`. */
  def qName(p: Double): String = {
    val s = BigDecimal(p).bigDecimal.stripTrailingZeros.toPlainString
    "q_" + (if (s.startsWith("0.")) s.substring(2) else s.replace(".", "_"))
  }
}

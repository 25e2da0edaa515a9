package graft.operators

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra-Gries heavy-hitters sketch as a custom typed [[Aggregator]]
  * (extension — SURVEY §7.5: a genuinely mergeable summary Spark has no
  * builtin for; the 100 TB path for "top terms" where the exact
  * per-term count table itself is too large to shuffle).
  *
  * Guarantees (Misra & Gries 1982; mergeability per Agarwal et al.,
  * "Mergeable Summaries", PODS'12): with k counters over n items,
  * every item with true count > n/(k+1) is present in the summary, and
  * each reported estimate undercounts its true count by at most
  * n/(k+1). Merging two summaries preserves the bound (counter-wise
  * add, then subtract the (k+1)-th largest count and drop non-positive
  * counters) — which is exactly why it scales: partial summaries
  * combine map-side like any Spark partial aggregate, state is O(k)
  * per group regardless of input size.
  *
  * Estimates (not exact counts) and partitioning-dependent low-order
  * values are inherent to the sketch — the companion spec asserts the
  * error BOUND, and exact verification belongs to the exact top-k
  * query ([[graft.queries.CorpusQueries.topTerms]]), same division of
  * labor as exact vs HLL distinct counts.
  */
object HeavyHitters {

  case class MGState(counters: Map[String, Long])

  class MisraGriesAgg(k: Int) extends Aggregator[String, MGState, Map[String, Long]] {
    require(k > 0, "k must be positive")

    override def zero: MGState = MGState(Map.empty)

    override def reduce(s: MGState, item: String): MGState = {
      val c = s.counters
      if (c.contains(item)) MGState(c.updated(item, c(item) + 1L))
      else if (c.size < k) MGState(c.updated(item, 1L))
      else {
        // decrement-all: the classic O(1)-amortized step
        MGState(c.flatMap { case (t, n) =>
          if (n > 1L) Some(t -> (n - 1L)) else None
        })
      }
    }

    override def merge(a: MGState, b: MGState): MGState = {
      val sum = b.counters.foldLeft(a.counters) { case (acc, (t, n)) =>
        acc.updated(t, acc.getOrElse(t, 0L) + n)
      }
      if (sum.size <= k) MGState(sum)
      else {
        val d = sum.values.toSeq.sorted(Ordering[Long].reverse)(k)
        MGState(sum.flatMap { case (t, n) =>
          if (n > d) Some(t -> (n - d)) else None
        })
      }
    }

    override def finish(s: MGState): Map[String, Long] = s.counters

    override def bufferEncoder: Encoder[MGState] = Encoders.product[MGState]
    override def outputEncoder: Encoder[Map[String, Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
  }

  /** Column form: `heavy_hitters(term, k)` usable in any groupBy agg;
    * returns a map of surviving term → estimated count.
    */
  def sketch(termCol: Column, k: Int): Column = udaf(new MisraGriesAgg(k)).apply(termCol)
}

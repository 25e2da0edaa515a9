package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming per-source admission quota (extension — SURVEY §2.10):
  * the streaming twin of batch mixture/cap sampling
  * ([[graft.operators.Sampling.mixtureSample]],
  * `AnalyticsQueries.domainCap`) — admit documents per source until
  * that source's quota is exhausted, then reject, across any number of
  * micro-batches.
  *
  * Scale design: `mapGroupsWithState`-family state keyed on the source
  * holds ONE long (admitted count) per source — state size is
  * O(|sources|), independent of stream length; the stream shuffles
  * once on the source key, the same key the batch caps group on.
  * Admission inside a batch is deterministic given arrival order
  * (sorted within the group by the caller-provided tie-break id before
  * counting), which is what makes the op testable: feeding the same
  * batches yields the same admit/reject assignment.
  *
  * Cross-batch ordering CONTRACT: the doc_id tie-break applies only
  * WITHIN a micro-batch. Across batches, admission order is arrival
  * order — whichever batch a document lands in competes only against
  * that batch's co-arrivals for the source's remaining slots. Two runs
  * that split the same documents into different micro-batches (e.g. a
  * multi-file drop the file source lists across two triggers) may
  * admit different ids, and BOTH are correct: a quota is a property of
  * the stream as experienced, not of a global id order the operator
  * never sees. Callers needing a batch-invariant assignment must
  * deliver each logical drop as one micro-batch (one file per drop).
  */
object StreamQuota {

  final case class QuotaIn(source: String, doc_id: Long, text: String)
  final case class QuotaOut(source: String, doc_id: Long, admitted: Boolean)

  /** Admit up to `quota` docs per source over the life of the stream.
    * Input must have (source, doc_id, text) columns.
    */
  def admit(df: DataFrame, quota: Int): Dataset[QuotaOut] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.selectExpr("source", "CAST(doc_id AS BIGINT) AS doc_id", "text")
      .as[QuotaIn]
      .groupByKey(_.source)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (source: String, rows: Iterator[QuotaIn], state: GroupState[Long]) => {
          val used = state.getOption.getOrElse(0L) // admitted so far
          // deterministic intra-batch order: smallest doc_id first
          val batch = rows.toSeq.sortBy(_.doc_id)
          val slots = math.max(0L, quota - used)
          val out = batch.zipWithIndex.map { case (r, i) =>
            QuotaOut(source, r.doc_id, i < slots)
          }
          state.update(used + math.min(slots, batch.size.toLong))
          out.iterator
        })
  }
}

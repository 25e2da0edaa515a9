package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.PortableHash

/** Streaming twin of the incremental ingest pipeline's admission stages
  * ([[graft.queries.PipelineQueries.pipelineIncremental]] stages 1+2):
  * per-document dispositions at ingest time — `dup_history` when the
  * content hash is already in the persisted keeper index, `accepted`
  * for the first fresh copy of a content, `dup_batch` for every later
  * copy — with the dedup state carried ACROSS micro-batches, so a
  * clone arriving a drop later than its original is still caught
  * online.
  *
  * Scale design: the history index joins stream-static on the content
  * hash (at steady state the index is the big side — Bloom-prefilter
  * it exactly as batch incremental dedup does); the cross-batch state
  * is ONE boolean per DISTINCT ingested content ("a keeper exists"),
  * keyed on the content hash — state size tracks distinct novel
  * contents, not stream length, and the stream shuffles once on the
  * same key the batch spelling groups on.
  *
  * Ordering CONTRACT (the [[StreamQuota]] contract, same words):
  * within a micro-batch, ties break by ascending doc_id; across
  * batches, first-arrival wins. Online dispositions therefore equal
  * the batch ledger's min-id-keeps spelling exactly when arrival order
  * respects doc_id order per content — e.g. each drop delivered as one
  * micro-batch of ascending ids, the shape StreamingSpec pins.
  */
object StreamIngest {

  final case class IngestIn(content_hash: Long, doc_id: Long, hist: Boolean)
  final case class IngestOut(doc_id: Long, status: String)

  /** Per-document ingest dispositions of a streaming `docs` frame with
    * (`idCol`, `textCol`) against a persisted `histIndex` with a
    * `content_hash` column ([[PortableHash.hash60]] of keeper texts).
    */
  def dispositions(docs: DataFrame, idCol: String, textCol: String,
      histIndex: DataFrame): Dataset[IngestOut] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(PortableHash.hash60(col(textCol)).as("content_hash"),
        col(idCol).cast("bigint").as("doc_id"))
      .join(histIndex.select(col("content_hash"), lit(true).as("__h")).distinct(),
        Seq("content_hash"), "left")
      .select(col("content_hash"), col("doc_id"),
        coalesce(col("__h"), lit(false)).as("hist"))
      .as[IngestIn]
      .groupByKey(_.content_hash)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(
        (_: Long, rows: Iterator[IngestIn], state: GroupState[Boolean]) => {
          var kept = state.getOption.getOrElse(false)
          val out = rows.toSeq.sortBy(_.doc_id).map { r =>
            if (r.hist) IngestOut(r.doc_id, "dup_history")
            else if (!kept) { kept = true; IngestOut(r.doc_id, "accepted") }
            else IngestOut(r.doc_id, "dup_batch")
          }
          state.update(kept)
          out.iterator
        })
  }
}

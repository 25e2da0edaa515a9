package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch as-of join
  * ([[graft.operators.AsOf.joinPrior]]): left-side events emit
  * immediately, annotated with the latest STRICTLY-PRIOR right-side
  * event of the same key seen so far — the continuous form of the
  * point-in-time lookup (feature freshness, "state at event time").
  *
  * Scale design: state via `flatMapGroupsWithState` is ONE small struct
  * per key (the newest right payload) — bounded by |keys| regardless of
  * stream length, and the stream shuffles once on the key, exactly like
  * the batch twin's single exchange. Within a micro-batch, rows are
  * processed in event-time order with left before right at equal
  * timestamps (a right row at the same instant is not yet visible —
  * the batch twin's strict inequality). Across batches, correctness
  * assumes per-key event-time-monotonic arrival (the same contract as
  * [[EventWindows.sessionizeStream]]); a late left row would observe
  * newer state than its timestamp.
  */
object StreamAsOf {

  /** `side` 0 = left (probe, emits), 1 = right (updates state). */
  case class AsOfEvent(key: Long, tsMicros: Long, event_id: Long, side: Int, value: Double)
  case class AsOfState(tsMicros: Long, event_id: Long, value: Double)
  /** `right_*` are -1 / -1 / 0.0 sentinels when no prior right row
    * existed (mirrors the batch graded query's NULL coalescing).
    */
  case class AsOfOut(key: Long, event_id: Long, tsMicros: Long,
    right_event_id: Long, right_tsMicros: Long, right_value: Double)

  def joinPriorStream(events: Dataset[AsOfEvent]): Dataset[AsOfOut] = {
    def update(key: Long, rows: Iterator[AsOfEvent],
        state: GroupState[AsOfState]): Iterator[AsOfOut] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[AsOfOut]
      var cur = state.getOption
      rows.toSeq.sortBy(e => (e.tsMicros, e.side, e.event_id)).foreach { e =>
        if (e.side == 1) {
          // keep only the newest right payload (late stragglers ignored)
          if (cur.forall(_.tsMicros <= e.tsMicros))
            cur = Some(AsOfState(e.tsMicros, e.event_id, e.value))
        } else {
          out += (cur match {
            case Some(s) =>
              AsOfOut(key, e.event_id, e.tsMicros, s.event_id, s.tsMicros, s.value)
            case None => AsOfOut(key, e.event_id, e.tsMicros, -1L, -1L, 0.0)
          })
        }
      }
      cur.foreach(state.update)
      out.iterator
    }
    implicit val stateEnc = Encoders.product[AsOfState]
    implicit val outEnc = Encoders.product[AsOfOut]
    events.groupByKey(_.key)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout)(update)
  }
}

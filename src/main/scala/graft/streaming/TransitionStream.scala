package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Live user-journey transition tracking — the streaming twin of the
  * batch `ts_markov` matrix: per user, every event emits the
  * (from_event → to_event) edge against that user's PREVIOUS event,
  * maintained as transformWithState ValueState of exactly one row per
  * user (the last event seen) — state bounded by |live users| forever,
  * no window, no history replay.
  *
  * Ordering contract: within a micro-batch a user's rows are folded
  * in (tus, event_id) order — the batch operator's order — and the
  * carried state chains batches, so an IN-ORDER feed reproduces the
  * batch transition multiset exactly (spec-pinned). Out-of-order
  * arrivals ACROSS batches chain in arrival order by design: a
  * last-event state cannot retract an emitted edge (append-only
  * output), which is the standard trade-off for an unbounded
  * clickstream; feed through a watermark-sorted stage upstream where
  * event-order matters more than latency.
  */
object TransitionStream {

  /** Input event row (tus = event-time micros). */
  case class Ev(user_id: Long, event_id: Long, tus: Long, event_type: String)

  /** One journey edge: `user_id` moved `from_event` → `to_event` at
    * `tus` (the destination event's time).
    */
  case class Transition(user_id: Long, from_event: String, to_event: String,
                        tus: Long)

  private case class LastEv(tus: Long, eventId: Long, eventType: String)

  class TransitionProcessor
      extends StatefulProcessor[Long, Ev, Transition] {
    @transient private var last: ValueState[LastEv] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      last = getHandle.getValueState[LastEv]("last",
        Encoders.product[LastEv], TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Ev],
        timerValues: TimerValues): Iterator[Transition] = {
      val sorted = rows.toSeq.sortBy(e => (e.tus, e.event_id))
      val out = Seq.newBuilder[Transition]
      var prev = Option(last.get())
      sorted.foreach { e =>
        prev.foreach(p =>
          out += Transition(key, p.eventType, e.event_type, e.tus))
        prev = Some(LastEv(e.tus, e.event_id, e.event_type))
      }
      prev.foreach(last.update)
      out.result().iterator
    }
  }

  /** Streaming entry point over an Ev-shaped stream. */
  def transitions(ds: Dataset[Ev]): Dataset[Transition] = {
    implicit val outEnc: org.apache.spark.sql.Encoder[Transition] =
      Encoders.product[Transition]
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .transformWithState(new TransitionProcessor,
        TimeMode.None(), OutputMode.Append())
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Live VPIN bucket maintenance — the streaming twin of the batch
  * `ts_vpin` (Easley, López de Prado & O'Hara RFS 2012): per series,
  * classify each hourly flow by the tick rule against the PREVIOUS
  * close (doubled volumes keep the even zero-change split integer),
  * accumulate into the current equal-volume bucket, and emit each
  * bucket the moment its volume fills — the live toxic-flow monitor a
  * desk alarms on, rows appearing as buckets complete rather than at
  * batch end.
  *
  * State per series is exactly one row: the last close plus the OPEN
  * bucket's (volume, buy-volume, index) — bounded by |series| forever,
  * no window, no replay. The bucket size is a constructor parameter
  * (the batch query derives total/50; a live feed fixes it from
  * history or config — same arithmetic downstream).
  *
  * Ordering contract mirrors [[TransitionStream]]: in-batch rows fold
  * in `bus` order and state chains batches, so an in-order feed
  * reproduces the batch bucket cuts exactly (spec-pinned). A flow
  * larger than the remaining bucket capacity SPLITS across buckets —
  * buy volume is apportioned to the earlier bucket up to its
  * remaining capacity, buy-first (deterministic, and exact in doubled
  * units) — so bucket volumes are exactly `bucketSize` except the
  * live tail.
  */
object VpinStream {

  /** One hourly flow: series key, hour bucket start (µs), close in
    * cents, volume in original units.
    */
  case class Flow(series: String, bus: Long, closeCents: Long, qty: Long)

  /** A completed (or force-flushed) VPIN bucket: `v2`/`buy2` are in
    * DOUBLED volume units; `imbalance` = |2·buy2 − v2| / v2 — equal to
    * the batch |V_buy − V_sell|/V.
    */
  case class VpinBucket(series: String, bucket: Long, v2: Long, buy2: Long,
                        imbalance: Double)

  private case class OpenState(lastClose: Long, bucket: Long,
                               v2: Long, buy2: Long)

  class VpinProcessor(bucketSize2: Long)
      extends StatefulProcessor[String, Flow, VpinBucket] {
    require(bucketSize2 >= 2, s"degenerate bucket size $bucketSize2")
    @transient private var open: ValueState[OpenState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      open = getHandle.getValueState[OpenState]("open",
        Encoders.product[OpenState], TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Flow],
        timerValues: TimerValues): Iterator[VpinBucket] = {
      val sorted = rows.toSeq.sortBy(_.bus)
      val out = Seq.newBuilder[VpinBucket]
      var st = Option(open.get())
      sorted.foreach { f =>
        st match {
          case None =>
            // first flow seeds the tick-rule reference; no flow counted
            // (the batch twin's `p IS NOT NULL` filter)
            st = Some(OpenState(f.closeCents, 0L, 0L, 0L))
          case Some(s) if f.qty <= 0L =>
            st = Some(s.copy(lastClose = f.closeCents))
          case Some(s) =>
            var v2 = f.qty * 2L
            var buy2 =
              if (f.closeCents > s.lastClose) v2
              else if (f.closeCents < s.lastClose) 0L
              else f.qty
            var cur = s.copy(lastClose = f.closeCents)
            while (v2 > 0L) {
              val room = bucketSize2 - cur.v2
              val takeV = math.min(v2, room)
              val takeB = math.min(buy2, takeV) // buy-first apportioning
              cur = cur.copy(v2 = cur.v2 + takeV, buy2 = cur.buy2 + takeB)
              v2 -= takeV; buy2 -= takeB
              if (cur.v2 == bucketSize2) {
                out += VpinBucket(key, cur.bucket, cur.v2, cur.buy2,
                  math.abs(2L * cur.buy2 - cur.v2).toDouble / cur.v2.toDouble)
                cur = OpenState(cur.lastClose, cur.bucket + 1L, 0L, 0L)
              }
            }
            st = Some(cur)
        }
      }
      st.foreach(open.update)
      out.result().iterator
    }
  }

  /** Streaming entry point over a Flow-shaped stream. */
  def buckets(ds: Dataset[Flow], bucketSize2: Long): Dataset[VpinBucket] = {
    implicit val outEnc: org.apache.spark.sql.Encoder[VpinBucket] =
      Encoders.product[VpinBucket]
    ds.groupByKey(_.series)(Encoders.STRING)
      .transformWithState(new VpinProcessor(bucketSize2),
        TimeMode.None(), OutputMode.Append())
  }
}

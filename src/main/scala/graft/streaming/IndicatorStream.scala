package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming technical indicators over the closed-candle stream — the
  * operator [[graft.ops.Indicators.emaTruncated]]'s scaladoc defers to:
  * the batch form truncates the EMA recursion at a window (bounded
  * state inside one SQL window frame), while the streaming form keeps
  * ONE running value per key in the state store and applies the exact
  * recursion ema ← α·close + (1−α)·ema with no truncation error at
  * all — O(1) state per key, one update per closed candle.
  *
  * Scale shape: a single hash exchange on the series key feeding
  * `transformWithState` (RocksDB); per-candle work is one ValueState
  * read + write. The bucket-monotonic guard makes updates idempotent
  * under sink redelivery (a re-sent closed candle with bucket ≤ the
  * state's last applied bucket is a no-op), the same at-least-once
  * discipline as [[graft.llm.IncrementalDedup.admitStream]].
  */
object IndicatorStream {
  import ExactCandleState.Closed

  /** (last applied candle bucket, running EMA). */
  case class EmaState(lastBucketMs: Long, ema: Double)

  case class EmaPoint(time_ms: Long, exchange: String, base_id: String,
                      quote_id: String, close: Double, ema: Double)

  class EmaProcessor(alphaNum: Int, alphaDen: Int)
      extends StatefulProcessor[(String, String, String), Closed, EmaPoint] {
    @transient private var st: ValueState[EmaState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[EmaState]("ema",
        Encoders.product[EmaState], TTLConfig.NONE)

    override def handleInputRows(key: (String, String, String),
                                 rows: Iterator[Closed],
                                 timerValues: TimerValues): Iterator[EmaPoint] = {
      val a = alphaNum.toDouble / alphaDen.toDouble
      val out = Seq.newBuilder[EmaPoint]
      // within-batch candles apply in bucket order; ≤-last buckets are
      // redeliveries or out-of-order leftovers and must not re-fold
      rows.toSeq.sortBy(_.time_ms).foreach { c =>
        val cur = Option(st.get())
        if (!cur.exists(_.lastBucketMs >= c.time_ms)) {
          val e = cur match {
            case None    => c.close // seed = first close, as the batch fold
            case Some(s) => a * c.close + (1.0d - a) * s.ema
          }
          st.update(EmaState(c.time_ms, e))
          out += EmaPoint(c.time_ms, key._1, key._2, key._3, c.close, e)
        }
      }
      out.result().iterator
    }
  }

  /** One EMA point per closed candle, keyed like the candle stream. */
  def emaOf(ds: Dataset[Closed], alphaNum: Int, alphaDen: Int): Dataset[EmaPoint] = {
    implicit val enc: org.apache.spark.sql.Encoder[EmaPoint] = Encoders.product[EmaPoint]
    ds.groupByKey(c => (c.exchange, c.base_id, c.quote_id))(
        Encoders.tuple(Encoders.STRING, Encoders.STRING, Encoders.STRING))
      .transformWithState(new EmaProcessor(alphaNum, alphaDen),
        TimeMode.None(), OutputMode.Append())
  }
}

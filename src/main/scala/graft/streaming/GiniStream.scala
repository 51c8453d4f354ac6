package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming Gini concentration — the live twin of the batch
  * `ts_gini` query ([[graft.catalog.SimGraphQueries]]): per group
  * (event type), maintain each user's running cent total in a
  * `transformWithState` map and emit, every trigger, the exact Gini
  * coefficient of the CURRENT totals via the same integer tie-block
  * algebra the batch plan uses (Σ x·m·(2·cum−m−n) over the value
  * histogram, one double division at the end).
  *
  * State per key is one Long per ACTIVE USER — the entity the
  * statistic ranges over, the [[CandleStream]] per-key-state shape
  * (bound it in deployment with a TTLConfig on the map if the user
  * universe churns). Totals are commutative SUMS, so arrival order
  * and batching cannot move the result; like the count-min cells and
  * unlike HLL registers they are NOT idempotent under input-level
  * duplication — the contract is each spend delivered once, which
  * Structured Streaming's exactly-once state guarantees provide
  * across retries. GiniStreamSpec asserts the streaming coefficient
  * equals the batch query's EXACTLY on the same rows.
  */
object GiniStream {

  case class Spend(group: String, user: Long, cents: Long)
  case class GiniRow(group: String, n_users: Long, sum_cents: Long,
                     gini: Double)

  /** Batch-identical Gini from per-user totals: histogram the values,
    * then the tie-block sum — all exact integers until the final
    * division (BigInt holds what the batch plan keeps in
    * decimal(38,0); both convert the same exact integer to double).
    */
  private[streaming] def giniOfTotals(totals: Iterator[Long]): (Long, Long, Double) = {
    val hist = totals.toSeq.groupBy(identity)
      .map { case (x, o) => (x, o.size.toLong) }
      .toSeq.sortBy(_._1)
    val n = hist.map(_._2).sum
    val sTot = hist.map { case (x, m) => x * m }.sum
    var cc = 0L
    var num = BigInt(0)
    hist.foreach { case (x, m) =>
      cc += m
      num += BigInt(x) * BigInt(m) * BigInt(2L * cc - m - n)
    }
    (n, sTot, num.toDouble / (n.toDouble * sTot.toDouble))
  }

  class GiniProcessor extends StatefulProcessor[String, Spend, GiniRow] {
    @transient private var totals: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      totals = getHandle.getMapState[Long, Long]("totals",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String, rows: Iterator[Spend],
                                 timerValues: TimerValues): Iterator[GiniRow] = {
      rows.foreach { s =>
        val cur = if (totals.containsKey(s.user)) totals.getValue(s.user) else 0L
        totals.updateValue(s.user, cur + s.cents)
      }
      val (n, sTot, gini) = giniOfTotals(totals.iterator().map(_._2))
      Iterator.single(GiniRow(key, n, sTot, gini))
    }
  }

  /** One snapshot per (key, trigger); the latest row per key is the
    * live concentration reading.
    */
  def giniOf(ds: Dataset[Spend]): Dataset[GiniRow] = {
    implicit val enc: org.apache.spark.sql.Encoder[GiniRow] = Encoders.product[GiniRow]
    ds.groupByKey(_.group)(Encoders.STRING)
      .transformWithState(new GiniProcessor, TimeMode.None(), OutputMode.Append())
  }
}

package graft.streaming

import java.security.MessageDigest

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming HyperLogLog — [[graft.llm.Sketches.hllEstimate]] as a
  * `transformWithState` register map. The reason a sketch (and not an
  * exact distinct set) is the right streaming state: registers are
  * MONOTONE MAXES, so updates commute, redeliveries are absorbed, and
  * state per key is ≤ 256 small entries forever — the exact-set
  * alternative grows with the stream and can't be bounded.
  *
  * The register algorithm is byte-for-byte the batch one (md5 hex,
  * first 2 chars → bucket, next 10 → rank): SketchStreamSpec asserts
  * the streaming estimate equals the batch estimate EXACTLY on the
  * same rows — the mergeability property that lets a 100 TB profile
  * combine per-partition, per-hour, or per-day sketches without ever
  * re-reading data.
  */
object SketchStream {

  case class Distinct(group: Long, value: String)
  case class Estimate(group: Long, n_seen: Long, est: Double, v_zero: Long)

  /** Batch-identical md5-hex of the value. */
  private[streaming] def md5Hex(s: String): String =
    MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString

  /** Batch-identical hex rank (graft.llm.Sketches.hexRank, len=10). */
  private[streaming] def hexRank(tail: String): Int = {
    val lt = tail.dropWhile(_ == '0')
    if (lt.isEmpty) 41
    else {
      val lz = lt.head match {
        case c if "89abcdef".contains(c) => 0
        case c if "4567".contains(c)     => 1
        case c if "23".contains(c)       => 2
        case '1'                         => 3
        case _                           => 4
      }
      4 * (tail.length - lt.length) + lz + 1
    }
  }

  /** Batch-identical estimate from (register → max rank). */
  private[streaming] def estimate(regs: Map[String, Int]): (Double, Long) = {
    val vZero = 256L - regs.size
    val s = regs.values.map(m => 1L << (41 - m)).sum + vZero * (1L << 41)
    val alpha = 0.7213d / (1.0d + 1.079d / 256.0d)
    val raw = alpha * 65536.0d * (1L << 41).toDouble / s.toDouble
    val est =
      // StrictMath, not math.log: Spark's Log expression evaluates via
      // StrictMath and the Math.log intrinsic can differ by 1 ulp —
      // enough to break the exact streaming ≡ batch parity contract.
      if (raw <= 640.0d && vZero > 0L) 256.0d * StrictMath.log(256.0d / vZero)
      else raw
    (est, vZero)
  }

  class HllProcessor extends StatefulProcessor[Long, Distinct, Estimate] {
    @transient private var regs: MapState[String, Int] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      regs = getHandle.getMapState[String, Int]("regs",
        Encoders.STRING, Encoders.scalaInt, TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Distinct],
                                 timerValues: TimerValues): Iterator[Estimate] = {
      var n = Option(seen.get()).getOrElse(0L)
      rows.foreach { d =>
        n += 1
        val h = md5Hex(d.value)
        val bucket = h.substring(0, 2)
        val rank = hexRank(h.substring(2, 12))
        if (!regs.containsKey(bucket) || regs.getValue(bucket) < rank)
          regs.updateValue(bucket, rank)
      }
      seen.update(n)
      val local = regs.iterator().map(p => p._1 -> p._2).toMap
      val (est, vZero) = estimate(local)
      Iterator.single(Estimate(key, n, est, vZero))
    }
  }

  /** One estimate snapshot per (key, trigger) — the latest row per key
    * is the live cardinality estimate.
    */
  def hllOf(ds: Dataset[Distinct]): Dataset[Estimate] = {
    implicit val enc: org.apache.spark.sql.Encoder[Estimate] = Encoders.product[Estimate]
    ds.groupByKey(_.group)(Encoders.scalaLong)
      .transformWithState(new HllProcessor, TimeMode.None(), OutputMode.Append())
  }

  // ------------------------------------------------------ count-min

  case class Occur(group: Long, value: String)
  case class CmCell(group: Long, r: Long, b: String, c: Long)

  /** Streaming count-min — [[graft.llm.Sketches.countMin]]'s cells as
    * a `transformWithState` counter map, byte-compatible with the
    * batch scheme (3-hex slices of one md5). Counts are COMMUTATIVE
    * SUMS, so arrival order and batching cannot move the final
    * sketch, and state per key is bounded by 4·4096 cells forever —
    * the live heavy-hitters feed a stream-side corpus profile wants.
    * (Unlike the HLL registers, counts are not idempotent under
    * input-level duplication: the stream contract is each occurrence
    * delivered once, which Structured Streaming's exactly-once state
    * guarantees provide across retries.)
    */
  class CmProcessor extends StatefulProcessor[Long, Occur, CmCell] {
    @transient private var counts: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("cm",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Occur],
                                 timerValues: TimerValues): Iterator[CmCell] = {
      rows.foreach { o =>
        val h = md5Hex(o.value)
        var r = 0
        while (r < 4) {
          val cell = r.toString + "|" + h.substring(3 * r, 3 * r + 3)
          val cur = if (counts.containsKey(cell)) counts.getValue(cell) else 0L
          counts.updateValue(cell, cur + 1L)
          r += 1
        }
      }
      counts.iterator().map { case (cell, c) =>
        val i = cell.indexOf('|')
        CmCell(key, cell.substring(0, i).toLong, cell.substring(i + 1), c)
      }
    }
  }

  /** Full sketch snapshot per (key, trigger); cells only grow, so the
    * max count per (group, r, b) is the live sketch.
    */
  def cmOf(ds: Dataset[Occur]): Dataset[CmCell] = {
    implicit val enc: org.apache.spark.sql.Encoder[CmCell] = Encoders.product[CmCell]
    ds.groupByKey(_.group)(Encoders.scalaLong)
      .transformWithState(new CmProcessor, TimeMode.None(), OutputMode.Append())
  }

  // ----------------------------------------------------- SpaceSaving

  /** One summary row per tracked value: `count` the SpaceSaving
    * estimate (true count ≤ count ≤ true + err), `err` the
    * overestimation bound inherited at insertion, `n_seen` the
    * group's total arrivals so far — rows sharing the max n_seen ARE
    * the live summary (and n_seen/m is the guaranteed-present
    * threshold). The bracket applies to the live summary only: a
    * value evicted after a snapshot can keep accumulating truth
    * while its stale row stands still.
    */
  case class HeavyHitter(group: Long, value: String, count: Long, err: Long,
                         n_seen: Long)

  /** Streaming heavy hitters — SpaceSaving (Metwally et al. ICDT'05)
    * as a `transformWithState` counter map of FIXED capacity m per
    * key: a hit increments; a miss with a full map evicts the
    * minimum counter and inherits its count as the new entry's error
    * bound. Unlike the sketches, the summary is order-DEPENDENT — but
    * its guarantees are not, and those are what the spec pins:
    * every value with true count > n/m is present (it cannot be
    * evicted: the min counter never exceeds n/m), and every estimate
    * brackets truth as `count − err ≤ true ≤ count`. Eviction ties
    * break on the smallest value string, so a given arrival order
    * replays deterministically (exactly-once state makes retries
    * replays, not re-orders). This is the live top-k feed; the exact
    * batch twin is the `llm_count_min` top-20 aggregation.
    */
  class TopKProcessor(m: Int) extends StatefulProcessor[Long, Occur, HeavyHitter] {
    @transient private var counters: MapState[String, (Long, Long)] = _
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      counters = getHandle.getMapState[String, (Long, Long)]("ss",
        Encoders.STRING, Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong),
        TTLConfig.NONE)
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong, TTLConfig.NONE)
    }

    override def handleInputRows(key: Long, rows: Iterator[Occur],
                                 timerValues: TimerValues): Iterator[HeavyHitter] = {
      // work on a local map: SpaceSaving reads the minimum on every
      // miss, which would be a full state scan per row through the
      // store API; the summary is ≤ m entries, so one load + one
      // write-back per batch is the right state-access shape
      val local = scala.collection.mutable.HashMap[String, (Long, Long)]()
      counters.iterator().foreach { case (v, ce) => local(v) = ce }
      var n = Option(seen.get()).getOrElse(0L)
      rows.foreach { o =>
        n += 1L
        local.get(o.value) match {
          case Some((c, e)) => local(o.value) = (c + 1L, e)
          case None if local.size < m => local(o.value) = (1L, 0L)
          case None =>
            val (evict, (minC, _)) = local.minBy { case (v, (c, _)) => (c, v) }
            local.remove(evict)
            local(o.value) = (minC + 1L, minC)
        }
      }
      seen.update(n)
      local.foreach { case (v, ce) => counters.updateValue(v, ce) }
      counters.keys().filter(!local.contains(_)).toArray
        .foreach(counters.removeKey)
      local.iterator.map { case (v, (c, e)) => HeavyHitter(key, v, c, e, n) }
    }
  }

  /** Full summary snapshot per (key, trigger); rows from the latest
    * trigger are the live top-k candidates.
    */
  def topKOf(ds: Dataset[Occur], m: Int): Dataset[HeavyHitter] = {
    implicit val enc: org.apache.spark.sql.Encoder[HeavyHitter] = Encoders.product[HeavyHitter]
    ds.groupByKey(_.group)(Encoders.scalaLong)
      .transformWithState(new TopKProcessor(m), TimeMode.None(), OutputMode.Append())
  }

  // ------------------------------------------------------------ KMV

  /** (group, n_mins, u_k, est): est = (k−1)/u_k once the group has
    * accumulated k distinct hashes, 0.0 until then (estimator
    * undefined — n_mins < k tells the consumer the exact count IS
    * n_mins).
    */
  case class KmvEstimate(group: Long, n_mins: Long, u_k: Double, est: Double)

  /** Batch-identical hash uniform: first 13 md5 hex chars as a 52-bit
    * integer, dyadic-shifted into (0,1) — digit-for-digit the
    * [[graft.llm.Sketches.hashUniform]] Column expression.
    */
  private[streaming] def hashUniform(s: String): Double =
    (java.lang.Long.parseLong(md5Hex(s).substring(0, 13), 16) + 0.5d) /
      4503599627370496.0d

  /** Streaming KMV — [[graft.llm.Sketches.kmvKthMin]]'s k smallest
    * DISTINCT hash uniforms as `transformWithState` list state. Like
    * the HLL registers (and unlike count-min), the state is a
    * MONOTONE MIN-SET: duplicate values hash identically and are
    * dropped, so the operator is idempotent under input-level
    * redelivery as well as arrival-order-free, with ≤ k doubles per
    * key forever.
    */
  class KmvProcessor(k: Int) extends StatefulProcessor[Long, Distinct, KmvEstimate] {
    @transient private var mins: ListState[Double] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      mins = getHandle.getListState[Double]("mins", Encoders.scalaDouble, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Distinct],
                                 timerValues: TimerValues): Iterator[KmvEstimate] = {
      val buf = scala.collection.mutable.ArrayBuffer[Double]()
      mins.get().foreach(buf += _) // sorted ascending from the last write
      rows.foreach { d =>
        val u = hashUniform(d.value)
        if (buf.length < k || u < buf.last) {
          val i = buf.search(u)(Ordering.Double.TotalOrdering)
          i match {
            case scala.collection.Searching.InsertionPoint(p) =>
              buf.insert(p, u)
              if (buf.length > k) buf.remove(buf.length - 1)
            case _ => () // already present: KMV is a distinct sketch
          }
        }
      }
      mins.put(buf.toArray)
      val est =
        if (buf.length == k) (k - 1).toDouble / buf.last else 0.0d
      Iterator.single(KmvEstimate(key, buf.length.toLong,
        if (buf.length == k) buf.last else 0.0d, est))
    }
  }

  /** One estimate snapshot per (key, trigger) — latest row per key is
    * the live distinct-count estimate.
    */
  def kmvOf(ds: Dataset[Distinct], k: Int = 256): Dataset[KmvEstimate] = {
    implicit val enc: org.apache.spark.sql.Encoder[KmvEstimate] = Encoders.product[KmvEstimate]
    ds.groupByKey(_.group)(Encoders.scalaLong)
      .transformWithState(new KmvProcessor(k), TimeMode.None(), OutputMode.Append())
  }

  // --------------------------------------------- sampled quantiles

  /** One observation: `rowKey` a row-unique string (hashes into the
    * sample rank), `v` the integer payload (cents) whose quantiles
    * are estimated.
    */
  case class Obs(group: Long, rowKey: String, v: Long)

  /** `h_k` is the sample's largest retained hash — monotone DECREASING
    * once the sample is full (a new pair only enters by evicting it),
    * so (n_sample asc, h_k desc) orders snapshots by recency and the
    * max of that pair over emitted rows IS the live estimate.
    */
  case class QuantileEst(group: Long, n_sample: Long, h_k: Long,
                         p50c: Long, p90c: Long, p99c: Long)

  /** Streaming sampled quantiles — the
    * [[graft.functions.KmvPairsAgg]] min-k (hash, payload) sample as
    * `transformWithState` list state, emitting a p50/p90/p99 snapshot
    * per (key, trigger). The state is a monotone min-set of pairs
    * (≤ k·16 bytes per key forever): duplicate row keys hash
    * identically and dedup, so the operator is idempotent under
    * redelivery and arrival-order-free — the SAME sample (and hence
    * the bit-identical estimate) as the batch `ts_sample_quantiles`
    * aggregate over whatever rows have arrived. Quantile picks are
    * the batch query's integer-index rule over the value-sorted
    * sample, error √(q(1−q)/k).
    */
  class QuantileProcessor(k: Int) extends StatefulProcessor[Long, Obs, QuantileEst] {
    @transient private var sample: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sample = getHandle.getListState[(Long, Long)]("kmvpairs",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[QuantileEst] = {
      val ord = implicitly[Ordering[(Long, Long)]]
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      sample.get().foreach(buf += _) // (h, v) ascending from the last write
      rows.foreach { o =>
        val p = (java.lang.Long.parseLong(md5Hex(o.rowKey).substring(0, 13), 16), o.v)
        if (buf.length < k || ord.lt(p, buf.last)) {
          buf.search(p)(ord) match {
            case scala.collection.Searching.InsertionPoint(i) =>
              buf.insert(i, p)
              if (buf.length > k) buf.remove(buf.length - 1)
            case _ => () // identical (hash, payload) pair: dedup
          }
        }
      }
      sample.put(buf.toArray)
      val sv = buf.map(_._2).toArray.sorted
      val n = sv.length
      if (n == 0) Iterator.empty
      else {
        def pick(num: Long, den: Long): Long = sv((((n - 1) * num) / den).toInt)
        Iterator.single(QuantileEst(key, n.toLong, buf.last._1,
          pick(1L, 2L), pick(9L, 10L), pick(99L, 100L)))
      }
    }
  }

  /** One quantile snapshot per (key, trigger) — the latest row per
    * key is the live estimate.
    */
  def quantilesOf(ds: Dataset[Obs], k: Int = 256): Dataset[QuantileEst] = {
    implicit val enc: org.apache.spark.sql.Encoder[QuantileEst] = Encoders.product[QuantileEst]
    ds.groupByKey(_.group)(Encoders.scalaLong)
      .transformWithState(new QuantileProcessor(k), TimeMode.None(), OutputMode.Append())
  }

  /** Live robust-statistics snapshot per (key, trigger): `med_c` the
    * sample median, `mad_c` the median absolute deviation — both
    * exact integer picks from the min-k sample (no interpolation), so
    * the pair is a pure order-free function of the sample set. This
    * is the streaming side of the batch `ts_mad_outliers` family: a
    * consumer scores live bars as |c − med| / (1.4826·mad) against
    * the latest snapshot (the control-chart pattern — bounds update
    * per trigger, scoring stays stateless).
    */
  case class MadEst(group: Long, n_sample: Long, h_k: Long,
                    med_c: Long, mad_c: Long)

  /** [[quantilesOf]]' robust-moments sibling: same KmvPairsAgg min-k
    * (hash, payload) list state, emitting median + MAD instead of the
    * quantile trio. Identical determinism contract — idempotent under
    * redelivery, arrival-order-free, ≤ k·16 bytes state per key.
    */
  class MadProcessor(k: Int) extends StatefulProcessor[Long, Obs, MadEst] {
    @transient private var sample: ListState[(Long, Long)] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      sample = getHandle.getListState[(Long, Long)]("kmvpairs",
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong), TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[MadEst] = {
      val ord = implicitly[Ordering[(Long, Long)]]
      val buf = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      sample.get().foreach(buf += _)
      rows.foreach { o =>
        val p = (java.lang.Long.parseLong(md5Hex(o.rowKey).substring(0, 13), 16), o.v)
        if (buf.length < k || ord.lt(p, buf.last)) {
          buf.search(p)(ord) match {
            case scala.collection.Searching.InsertionPoint(i) =>
              buf.insert(i, p)
              if (buf.length > k) buf.remove(buf.length - 1)
            case _ => ()
          }
        }
      }
      sample.put(buf.toArray)
      val sv = buf.map(_._2).toArray.sorted
      val n = sv.length
      if (n == 0) Iterator.empty
      else {
        val med = sv((n - 1) / 2)
        val devs = sv.map(v => math.abs(v - med)).sorted
        Iterator.single(MadEst(key, n.toLong, buf.last._1, med, devs((n - 1) / 2)))
      }
    }
  }

  /** One robust-moments snapshot per (key, trigger); latest row per
    * key (max (n_sample, −h_k)) is the live estimate.
    */
  def madOf(ds: Dataset[Obs], k: Int = 256): Dataset[MadEst] = {
    implicit val enc: org.apache.spark.sql.Encoder[MadEst] = Encoders.product[MadEst]
    ds.groupByKey(_.group)(Encoders.scalaLong)
      .transformWithState(new MadProcessor(k), TimeMode.None(), OutputMode.Append())
  }

  // ---------------------------------------------------------- bloom

  case class FirstSeen(group: Long, value: String, emitted: Boolean)

  /** Streaming Bloom first-occurrence gate —
    * [[graft.llm.Sketches.bloomBuild]]'s word map as
    * `transformWithState` state: a value whose `h` probed bits are
    * all already set is suppressed (`emitted = false`), otherwise it
    * is emitted and its bits fold in. This is the bounded-state
    * approximate-dedup gate: state per key is ≤ 2^bitsLog2/32 word
    * entries FOREVER (an exact first-seen set grows with the
    * stream), every true duplicate occurrence after the first is
    * suppressed (bits are monotone — once set, a duplicate can never
    * re-emit), and the price is a small false-suppression rate of
    * genuinely-new values at the standard Bloom FP rate.
    *
    * The probed positions are byte-identical to the batch
    * [[graft.llm.Sketches.bloomProbes]] (6-hex md5 slices mod 2^b,
    * 32-bit words), and setting bits for a suppressed value is a
    * no-op by definition, so the FINAL word map equals the batch
    * `bloomBuild` over all arrived values exactly — order-, batching-
    * and redelivery-invariant (the mergeability the spec pins), even
    * though which values got emitted is arrival-order-dependent like
    * SpaceSaving's summary.
    */
  class BloomProcessor(h: Int = 4, bitsLog2: Int = 18)
      extends StatefulProcessor[Long, Distinct, FirstSeen] {
    @transient private var words: MapState[Long, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      words = getHandle.getMapState[Long, Long]("bloom",
        Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[Distinct],
                                 timerValues: TimerValues): Iterator[FirstSeen] = {
      // lazy map is consumed sequentially by the engine, so each
      // row's decision sees every earlier row's bits
      rows.map { d =>
        val hex = md5Hex(d.value)
        val ps = (0 until h).map { i =>
          java.lang.Long.parseLong(hex.substring(6 * i, 6 * i + 6), 16) %
            (1L << bitsLog2)
        }
        def bit(p: Long): (Long, Long) = (p / 32L, 1L << (p % 32L).toInt)
        val allSet = ps.forall { p =>
          val (w, m) = bit(p)
          words.containsKey(w) && (words.getValue(w) & m) != 0L
        }
        if (!allSet) ps.foreach { p =>
          val (w, m) = bit(p)
          val cur = if (words.containsKey(w)) words.getValue(w) else 0L
          words.updateValue(w, cur | m)
        }
        FirstSeen(key, d.value, !allSet)
      }
    }
  }

  /** One row per arrival; `emitted` rows are the gate's pass-through
    * stream (at-most-one per distinct value, minus Bloom FPs).
    */
  def bloomFirstSeen(ds: Dataset[Distinct], h: Int = 4,
                     bitsLog2: Int = 18): Dataset[FirstSeen] = {
    implicit val enc: org.apache.spark.sql.Encoder[FirstSeen] = Encoders.product[FirstSeen]
    ds.groupByKey(_.group)(Encoders.scalaLong)
      .transformWithState(new BloomProcessor(h, bitsLog2), TimeMode.None(),
        OutputMode.Append())
  }
}

package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Streaming ordered funnels over gap sessions — the live form of
  * [[graft.ops.Analytics.funnel]]: every closed session emits one row
  * with its strict-ordered stage-reach times (stage k's first hit
  * strictly after stage k−1's), append-only once the watermark passes
  * the session close, riding [[Sessionizer]]'s `session_window`
  * machinery so out-of-order events within the watermark land in the
  * right session before the funnel is evaluated.
  *
  * The fold is EXACT event-time semantics, not arrival-order: the
  * session's (t, stage) events collect into the aggregate, sort by
  * (t, stage) — a total order, so the result is deterministic under
  * any arrival/merge order — and one left fold computes t₀..tₙ₋₁
  * with the same strict-after rule the batch operator applies
  * (verified equal in FunnelStreamSpec). State per LIVE session is
  * its event multiset: that is the price of exact out-of-order
  * funnels (stage k's answer can depend on any event once an earlier
  * stage's time moves), bounded by session length and evicted at
  * emit — the right trade for click-stream sessions; an O(1)-state
  * arrival-order fold is the alternative when sessions are huge and
  * in-order delivery is guaranteed.
  */
object FunnelStream {

  /** Closed sessions with funnel reach times: (key, session_start,
    * session_end, n_events, t0..t{n−1}) — tₖ null where the session
    * never reached stage k in order.
    */
  def closedFunnels(df: DataFrame, key: Column, tsCol: String,
                    stage: Column, stages: Seq[String],
                    gap: String, delay: String): DataFrame =
    closedFunnels(df, key, tsCol, stage, stages, gap, delay, within = None)

  /** [[closedFunnels]] with the conversion-window bound of
    * [[graft.ops.Analytics.funnel]]'s `within` form (windowFunnel
    * semantics): stage k ≥ 1 must also land within `within` of t₀.
    * The bound is one more predicate in the same event-time fold, so
    * batch/stream parity holds clause for clause.
    */
  def closedFunnels(df: DataFrame, key: Column, tsCol: String,
                    stage: Column, stages: Seq[String],
                    gap: String, delay: String,
                    within: Option[Column]): DataFrame = {
    require(stages.nonEmpty, "closedFunnels needs at least one stage")
    val evs = sort_array(collect_list(struct(col(tsCol).as("t"),
      stage.cast("string").as("s"))))
    val init = struct(stages.indices.map(i =>
      lit(null).cast("timestamp").as(s"t$i")): _*)
    def step(acc: Column, e: Column): Column =
      struct(stages.zipWithIndex.map { case (st, i) =>
        val hit =
          if (i == 0)
            acc.getField("t0").isNull && e.getField("s") === st
          else
            acc.getField(s"t$i").isNull &&
              acc.getField(s"t${i - 1}").isNotNull &&
              e.getField("s") === st &&
              e.getField("t") > acc.getField(s"t${i - 1}") &&
              within.map(w => e.getField("t") <= acc.getField("t0") + w)
                .getOrElse(lit(true))
        when(hit, e.getField("t")).otherwise(acc.getField(s"t$i")).as(s"t$i")
      }: _*)
    val folded = aggregate(evs, init, step)
    df.withWatermark(tsCol, delay)
      .groupBy(session_window(col(tsCol), gap).as("sw"), key.as("key"))
      .agg(count(lit(1)).as("n_events"), folded.as("f"))
      .select((col("key") +: col("sw.start").as("session_start") +:
        col("sw.end").as("session_end") +: col("n_events") +:
        stages.indices.map(i => col(s"f.t$i").as(s"t$i"))): _*)
  }
}

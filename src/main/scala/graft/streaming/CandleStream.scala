package graft.streaming

import graft.ops.CandleOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's Redis-based WS candle pipeline re-expressed as
  * Structured Streaming (SURVEY §2.9). The three exchange WS fetchers
  * all reduce to one canonical stream row
  * (ts_ms, exchange, base_id, quote_id, open, high, low, close, volume)
  * — fetchers/helpers/ws.py:6-17 — which is this module's input; the
  * Redis hop (`ws_sub_*` hashes + updater flush loop,
  * fetchers/ws/updater.py) is replaced by the streaming state store +
  * watermark-driven emission, and crash recovery (ST6) by
  * checkpointing to an idempotent sink.
  *
  * Scale: both aggregations are keyed by (exchange, base_id, quote_id
  * [, bucket]) — state partitions by key hash across executors; no
  * global state, no driver bottleneck.
  */
object CandleStream {
  private val keys = Seq("exchange", "base_id", "quote_id")

  private def withTs(stream: DataFrame): DataFrame =
    stream.withColumn("ts", timestamp_millis(col("ts_ms")))

  /** ST1+ST7: latest-value serving view — per key, the most recent
    * 1-minute candle, newest message wins; an older out-of-order
    * message never replaces a newer one (the `new_ts >= current_ts`
    * guard, fetchers/ws/bitfinex.py:202-217). Run in update output
    * mode (memory sink for queries, or foreachBatch to a KV store).
    */
  def latestServeView(stream: DataFrame): DataFrame =
    stream
      .groupBy(keys.map(col): _*)
      .agg(max_by(
        struct(col("ts_ms"), col("open"), col("high"), col("low"),
          col("close"), col("volume")), col("ts_ms")).as("c"))
      .select(
        col("exchange"), col("base_id"), col("quote_id"),
        col("c.ts_ms").as("ts_ms"), col("c.open").as("open"),
        col("c.high").as("high"), col("c.low").as("low"),
        col("c.close").as("close"), col("c.volume").as("volume"))

  /** ST2+ST3: closed-candle emission — repeated updates of the same
    * 1-minute bucket collapse to the latest message per bucket; a
    * bucket is emitted (append mode) once the watermark passes its
    * end, i.e. when newer data has arrived or the `delay` force-flush
    * bound expires (the updater's flush-all-but-latest loop +
    * DATA_HELD_MLS_THRESHOLD=1h, fetchers/ws/updater.py:29-30,177-184).
    */
  def closedCandles(stream: DataFrame, delay: String = "1 hour"): DataFrame =
    withTs(stream)
      .withWatermark("ts", delay)
      .groupBy((keys.map(col) :+ window(col("ts"), "1 minute")): _*)
      .agg(max_by(
        struct(col("open"), col("high"), col("low"), col("close"),
          col("volume")), col("ts_ms")).as("c"))
      .select(
        col("window.start").as("time"),
        col("exchange"), col("base_id"), col("quote_id"),
        col("c.open").as("open"), col("c.high").as("high"),
        col("c.low").as("low"), col("c.close").as("close"),
        col("c.volume").as("volume"))

  /** ST4: flush batch → base table with first-write-wins (ON CONFLICT
    * DO NOTHING, fetchers/config/queries.py:4). Use inside
    * foreachBatch against the stored table.
    */
  def flushIgnoreDuplicates(existing: DataFrame, batch: DataFrame): DataFrame =
    CandleOps.insertIgnore(existing, CandleOps.dedup(batch))

  /** ST5: periodic REST repair — re-fetched rows upsert with
    * DO UPDATE (celery_app/celery_tasks.py:73-84).
    */
  def reconcile(existing: DataFrame, refetched: DataFrame): DataFrame =
    CandleOps.upsert(existing, CandleOps.dedup(refetched))

  /** ST5's LIVE form: stream–stream left-outer join of the WS candle
    * stream with the REST repair stream, per (key, 1-minute bucket),
    * inside the watermark horizon — the streaming counterpart of
    * [[reconcile]] (which fixes the table after the fact, the batch
    * shadow of the reference's updater/repair pair). A live message
    * whose bucket gets a repair row within `delay` emits with the
    * repair's authoritative values (`repaired = true`); an unmatched
    * message emits unchanged once both watermarks pass its bucket —
    * append-only output either way.
    *
    * Spark's event-time-window equi-join contract makes the state
    * BOUNDED: both sides carry `withWatermark(ts, delay)` and join on
    * the windowed event time, so each side's state holds only buckets
    * younger than the watermark — O(active keys × buckets-per-delay)
    * rows, partitioned by join key hash across executors, evicted as
    * the watermark advances (asserted in StreamRepairJoinSpec via
    * `stateOperators.numRowsTotal`). Repairs arriving later than
    * `delay` are outside the live join horizon by design; they remain
    * the batch [[reconcile]] path's job.
    */
  def repairJoin(live: DataFrame, repairs: DataFrame,
                 delay: String = "10 minutes"): DataFrame = {
    val l = withTs(live).withWatermark("ts", delay)
      .select(keys.map(col) :+ window(col("ts"), "1 minute").as("bucket") :+
        col("ts_ms") :+ col("open") :+ col("high") :+ col("low") :+
        col("close") :+ col("volume"): _*)
    // the repair side re-fetches periodically, so the same (key,
    // bucket) can arrive more than once inside the horizon — exactly
    // why batch [[reconcile]] runs CandleOps.dedup first. Without this
    // dedup every duplicate repair row would re-emit each matched live
    // message into the append-only output (nothing retracts).
    // First-repair-wins within the watermark, state evicted with it.
    // the dedup key is a PLAIN minute number, not the window() column:
    // deriving the window before the dedup would leave two event-time
    // columns (ts + bucket) in one stream, which the join rejects; the
    // windowed bucket is derived after, and `ts` dropped, so exactly
    // one event-time column reaches the join
    val r = withTs(repairs).withWatermark("ts", delay)
      .withColumn("bucket_min", (col("ts_ms") - pmod(col("ts_ms"), lit(60000L))) / 60000L)
      .dropDuplicatesWithinWatermark((keys :+ "bucket_min").toArray)
      .select(keys.map(col) :+ window(col("ts"), "1 minute").as("bucket") :+
        struct(col("open").as("open"), col("high").as("high"),
          col("low").as("low"), col("close").as("close"),
          col("volume").as("volume")).as("r"): _*)
    l.join(r, keys :+ "bucket", "left_outer")
      .select(
        col("bucket.start").as("time"),
        col("exchange"), col("base_id"), col("quote_id"), col("ts_ms"),
        coalesce(col("r.open"), col("open")).as("open"),
        coalesce(col("r.high"), col("high")).as("high"),
        coalesce(col("r.low"), col("low")).as("low"),
        coalesce(col("r.close"), col("close")).as("close"),
        coalesce(col("r.volume"), col("volume")).as("volume"),
        col("r").isNotNull.as("repaired"))
  }

  /** The full live pipeline (reference updater loop, ws/updater.py):
    * WS stream → closed candles → first-write-wins append into the
    * date-partitioned base table, every `triggerSecs` (reference
    * UPDATE_FREQUENCY_SECS=10). Exactly-once = checkpoint + the
    * idempotent ST4 sink policy (re-delivered batches dedupe against
    * the table). Returns the running query; stop() to shut down.
    *
    * Scale: each micro-batch appends only to the date partitions its
    * buckets fall in, and the first-write-wins anti-join reads back
    * only partitions >= the batch's min date (explicit p_date filter
    * -> partition pruning), so per-trigger cost tracks the batch, not
    * the table's age. Long-lived tables still need periodic small-file
    * compaction (standard for 10s appends).
    */
  /** [[runPipeline]] against a [[graft.storage.TxTable]] — the
    * concurrent-writer-safe form. Each micro-batch stages its files
    * and append-commits them through the table's transaction log, so
    * a maintenance rewrite (incremental refresh, compaction —
    * AggregateMaintenance / TxTable.compact) running at the same
    * moment can never drop the batch's files: rewrites are
    * partition-conflict-checked and retried, appends are
    * never-conflicting (TxLog.scala). First-write-wins (ST4) holds
    * because the anti-join reads the snapshot the commit builds on.
    * The reference gets this interleaving safety from Postgres MVCC;
    * plain-parquet [[runPipeline]] remains for single-writer tables.
    */
  def runPipelineTx(stream: DataFrame, table: graft.storage.TxTable,
                    checkpoint: String, triggerSecs: Int = 10,
                    watermark: String = "1 hour",
                    maintainEvery: Int = 30, vacuumRetain: Int = 20)
      : org.apache.spark.sql.streaming.StreamingQuery = {
    // triggerSecs <= 0 selects Trigger.AvailableNow: process every
    // available input batch (plus the no-data batches that flush
    // watermark-expired windows), then self-terminate. This is the
    // deterministic replay/test mode — completion is defined by the
    // DATA being drained, not by a wall-clock window, so it cannot
    // flap under host CPU steal the way a fixed-duration run can.
    val trig =
      if (triggerSecs <= 0) org.apache.spark.sql.streaming.Trigger.AvailableNow()
      else org.apache.spark.sql.streaming.Trigger.ProcessingTime(s"$triggerSecs seconds")
    // Maintenance cadence: every `maintainEvery` triggers (~5 min at
    // the 10 s default) the sink compacts fat partitions and vacuums
    // past the retention horizon, so a long-lived stream's file count
    // AND transaction-log size stay bounded without an external job.
    // Both run through the same conflict-checked commit path, so a
    // separate maintenance process (the deployment-scale alternative)
    // can take over by just calling the same methods; `vacuumRetain`
    // must exceed the longest concurrent reader's snapshot age in
    // commits. Set maintainEvery <= 0 to disable.
    val sinceMaintain = new java.util.concurrent.atomic.AtomicInteger(0)
    closedCandles(stream, watermark)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(trig)
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        import org.apache.spark.sql.functions.{col, to_date}
        // ONE tiny driver action per trigger: the touched-partition set
        // doubles as the emptiness check (dedup can't change the date
        // set, so it's computed on the raw batch — no cache needed).
        val withDate = batch.toDF().withColumn("p_date", to_date(col("time")))
        val parts = table.touchedPartitions(withDate)
        if (parts.nonEmpty) {
          val incoming = CandleOps.dedup(withDate)
          if (table.version < 0) table.append(incoming)
          else {
            // first-write-wins against the current snapshot, pruned to
            // the batch's own partitions (partition pruning at scale);
            // a re-delivered batch after crash recovery anti-joins to
            // nothing — the idempotent ST4/ST6 sink policy.
            val existing = table.read()
              .filter(col("p_date").cast("string").isInCollection(parts))
              .select((CandleOps.keyCols :+ "time").map(col): _*)
            table.append(
              incoming.join(existing, CandleOps.keyCols :+ "time", "left_anti"))
          }
        }
        if (maintainEvery > 0 &&
            sinceMaintain.incrementAndGet() >= maintainEvery) {
          sinceMaintain.set(0)
          table.compact()
          table.vacuum(vacuumRetain)
        }
        ()
      }
      .start()
  }

  def runPipeline(stream: DataFrame, tablePath: String, checkpoint: String,
                  triggerSecs: Int = 10, watermark: String = "1 hour")
      : org.apache.spark.sql.streaming.StreamingQuery = {
    val spark = stream.sparkSession
    closedCandles(stream, watermark)
      .writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime(s"$triggerSecs seconds"))
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        import org.apache.spark.sql.functions.{col, count, lit, to_date}
        // ONE driver action per trigger: row count (empty micro-batches
        // — watermark-advance ticks — must not write: an empty parquet
        // append creates a schemaless directory that breaks the next
        // batch's read-back) and min date (prunes the dedup read to the
        // dates this batch touches — a 10s trigger must not scan months
        // of partitions) come from a single aggregation of the raw
        // batch; dedup can't change either, so `incoming` is consumed
        // exactly once by the write job and needs no cache.
        val stats = batch
          .agg(count(lit(1)).as("n"),
            org.apache.spark.sql.functions.min(to_date(col("time"))).as("d"))
          .first()
        if (stats.getLong(0) > 0L) {
          val incoming = CandleOps.dedup(batch.toDF())
          // filesystem-agnostic existence check (java.io.File would
          // always say false on HDFS/S3 and silently disable dedup)
          val path = new org.apache.hadoop.fs.Path(tablePath)
          val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val tableExists = fs.exists(path) &&
            fs.listStatus(path).exists(_.getPath.getName.startsWith("p_date="))
          val fresh =
            if (tableExists) {
              val existing = spark.read.parquet(tablePath)
                .filter(col("p_date") >= lit(stats.getDate(1)))
                .select((CandleOps.keyCols :+ "time").map(col): _*)
              incoming.join(existing, CandleOps.keyCols :+ "time", "left_anti")
            } else incoming
          fresh
            .withColumn("p_date", to_date(col("time")))
            .write.partitionBy("p_date").mode("append").parquet(tablePath)
        }
        ()
      }
      .start()
  }
}

/** Canonical WS stream row (FIXTURES.md §3) as a case class for typed
  * streaming sources.
  */
case class WsCandle(ts_ms: Long, exchange: String, base_id: String, quote_id: String,
               open: Double, high: Double, low: Double, close: Double, volume: Double)

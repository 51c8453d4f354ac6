package graft.core

import org.apache.spark.sql.types._

/** Static schemas mirroring the reference's DDL
  * (reference scripts/database/init/create.sql:12-64) — fixed, no
  * inference/evolution, exactly like the reference's hand-written
  * SQLAlchemy models (web/models/ohlcvs.py:12-141).
  *
  * Prices/volumes are DoubleType here rather than Decimal: the
  * reference stores unbounded NUMERIC but rounds every served value to
  * 4 dp HALF_EVEN at the boundary (common/helpers/numbers.py:7-23), so
  * double + boundary bround(4) preserves observable semantics while
  * keeping every expression codegen-friendly. Swap to
  * DecimalType(38,8) via these constants if exact storage is wanted.
  */
object Schemas {

  /** Fact table; PK (exchange, base_id, quote_id, time) — hypertable
    * partitioned on time (create.sql:87). At scale: partition parquet
    * by to_date(time), sort within partitions by (exchange, base_id,
    * quote_id, time) for min/max skipping.
    */
  val ohlcvs: StructType = StructType(Seq(
    StructField("time", TimestampType, nullable = false),
    StructField("exchange", StringType, nullable = false),
    StructField("base_id", StringType, nullable = false),
    StructField("quote_id", StringType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false)))

  /** Dimension table (create.sql:24-30) — always broadcastable. */
  val symbolExchange: StructType = StructType(Seq(
    StructField("exchange", StringType, nullable = false),
    StructField("base_id", StringType, nullable = false),
    StructField("quote_id", StringType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("is_trading", BooleanType, nullable = false)))

  /** Error sink (create.sql:32-42). */
  val ohlcvsErrors: StructType = StructType(Seq(
    StructField("exchange", StringType, nullable = false),
    StructField("symbol", StringType, nullable = false),
    StructField("start_date", TimestampType, nullable = true),
    StructField("end_date", TimestampType, nullable = true),
    StructField("time_frame", StringType, nullable = true),
    StructField("ohlcv_section", StringType, nullable = true),
    StructField("resp_status_code", ShortType, nullable = true),
    StructField("exception_class", StringType, nullable = false),
    StructField("exception_message", StringType, nullable = true)))

  /** Rollup row (create.sql:105-223): bucket + key + OHLCV. */
  val candleRollup: StructType = StructType(Seq(
    StructField("bucket", TimestampType, nullable = false),
    StructField("exchange", StringType, nullable = false),
    StructField("base_id", StringType, nullable = false),
    StructField("quote_id", StringType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false)))

  /** Canonical WS stream row — what all three exchange WS fetchers
    * reduce to before Redis (fetchers/helpers/ws.py:6-17).
    */
  val wsCandle: StructType = StructType(Seq(
    StructField("ts_ms", LongType, nullable = false),
    StructField("exchange", StringType, nullable = false),
    StructField("base_id", StringType, nullable = false),
    StructField("quote_id", StringType, nullable = false),
    StructField("open", DoubleType, nullable = false),
    StructField("high", DoubleType, nullable = false),
    StructField("low", DoubleType, nullable = false),
    StructField("close", DoubleType, nullable = false),
    StructField("volume", DoubleType, nullable = false)))

  /** Implemented read intervals → bucket width seconds
    * (web/routes/api/rest/utils/readers.py:180-289). The reference
    * also *declares* 3h/14D/1M but crashes on them
    * (web/config/constants.py:2-4) — we implement them properly
    * instead (SURVEY §7.4 risk 6).
    */
  val intervalSeconds: Map[String, Long] = Map(
    "1m" -> 60L, "5m" -> 300L, "15m" -> 900L, "30m" -> 1800L,
    "1h" -> 3600L, "3h" -> 10800L, "6h" -> 21600L, "12h" -> 43200L,
    "1D" -> 86400L, "7D" -> 604800L, "14D" -> 1209600L)

  /** Calendar-width intervals (variable bucket length — served via
    * `CandleOps.rollupCalendar`, not fixed-width `time_bucket`).
    */
  val calendarIntervals: Map[String, String] = Map("1M" -> "month")

  /** Rollup widths maintained as materialized tables (the 8 CAggs,
    * create.sql:105-223).
    */
  val rollupIntervals: Seq[String] =
    Seq("5m", "15m", "30m", "1h", "6h", "12h", "1D", "7D")
}

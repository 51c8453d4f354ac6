package graft.ingest

import graft.SparkSpec
import graft.ops.CandleOps
import org.apache.spark.sql.functions._

/** [[JdbcCandleSink]] against embedded Derby (the in-sandbox
  * Postgres stand-in): first-write-wins and latest-wins must agree
  * row-for-row with [[CandleOps.insertIgnore]]/`upsert`, the fast
  * path must be what runs on conflict-free pages, and a redelivered
  * batch must converge (idempotence — the foreachBatch contract).
  */
class JdbcCandleSinkSpec extends SparkSpec {
  import graft.SparkSpec.spark.implicits._
  import JdbcCandleSink._

  private val columns = Seq(
    "time" -> "TIMESTAMP", "exchange" -> "VARCHAR(64)",
    "base_id" -> "VARCHAR(16)", "quote_id" -> "VARCHAR(16)",
    "open" -> "DOUBLE", "high" -> "DOUBLE", "low" -> "DOUBLE",
    "close" -> "DOUBLE", "volume" -> "DOUBLE")
  private val keys = Seq("exchange", "base_id", "quote_id", "time")

  private def freshDb(name: String): String = {
    val url = s"jdbc:derby:memory:$name;create=true"
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.execute(
        """CREATE TABLE "candles" (
          |  "time" TIMESTAMP NOT NULL, "exchange" VARCHAR(64) NOT NULL,
          |  "base_id" VARCHAR(16) NOT NULL, "quote_id" VARCHAR(16) NOT NULL,
          |  "open" DOUBLE, "high" DOUBLE, "low" DOUBLE, "close" DOUBLE,
          |  "volume" DOUBLE,
          |  PRIMARY KEY ("exchange", "base_id", "quote_id", "time"))""".stripMargin)
      st.close()
    } finally conn.close()
    url
  }

  private def candles(rows: Seq[(String, String, String, String, Double)]) =
    rows.map { case (t, e, b, q, v) =>
      (java.sql.Timestamp.valueOf(t), e, b, q, v, v + 1, v - 1, v, 10.0 * v)
    }.toDF("time", "exchange", "base_id", "quote_id",
      "open", "high", "low", "close", "volume")

  private def tableRows(url: String): Set[(String, String, String, String, Double)] = {
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val rs = conn.createStatement().executeQuery(
        """SELECT "time", "exchange", "base_id", "quote_id", "open" FROM "candles"""")
      val out = scala.collection.mutable.Set.empty[(String, String, String, String, Double)]
      // Derby renders "...00:00:00.0"; Spark's string cast omits the
      // fractional part — normalize for compare
      while (rs.next()) out += ((rs.getTimestamp(1).toString.stripSuffix(".0"),
        rs.getString(2), rs.getString(3), rs.getString(4), rs.getDouble(5)))
      out.toSet
    } finally conn.close()
  }

  private def dfRows(df: org.apache.spark.sql.DataFrame) =
    df.select(col("time").cast("string"), col("exchange"), col("base_id"),
        col("quote_id"), col("open"))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2), r.getString(3),
        r.getDouble(4))).toSet

  test("insert-ignore parity with CandleOps.insertIgnore (first-write-wins) + idempotence") {
    val url = freshDb("ig")
    val b1 = candles(Seq(
      ("2021-01-01 00:00:00", "bitfinex", "BTC", "USD", 100.0),
      ("2021-01-01 01:00:00", "bitfinex", "BTC", "USD", 101.0)))
    val b2 = candles(Seq(
      ("2021-01-01 01:00:00", "bitfinex", "BTC", "USD", 999.0), // conflict
      ("2021-01-01 02:00:00", "bitfinex", "BTC", "USD", 102.0))) // fresh
    write(b1, url, "candles", columns, keys, Mode.InsertIgnore, DerbyDialect)
    write(b2, url, "candles", columns, keys, Mode.InsertIgnore, DerbyDialect)
    val want = dfRows(CandleOps.insertIgnore(b1, b2))
    assert(tableRows(url) === want,
      "JDBC first-write-wins must match the Spark-side insertIgnore")
    // redelivery converges (at-least-once foreachBatch contract)
    write(b2, url, "candles", columns, keys, Mode.InsertIgnore, DerbyDialect)
    assert(tableRows(url) === want)
  }

  test("insert-update parity with CandleOps.upsert (latest-wins) + idempotence") {
    val url = freshDb("up")
    val b1 = candles(Seq(
      ("2021-01-01 00:00:00", "binance", "ETH", "USD", 10.0),
      ("2021-01-01 01:00:00", "binance", "ETH", "USD", 11.0)))
    val b2 = candles(Seq(
      ("2021-01-01 01:00:00", "binance", "ETH", "USD", 555.0), // conflict -> update
      ("2021-01-01 02:00:00", "binance", "ETH", "USD", 12.0)))
    write(b1, url, "candles", columns, keys, Mode.InsertUpdate, DerbyDialect)
    write(b2, url, "candles", columns, keys, Mode.InsertUpdate, DerbyDialect)
    val want = dfRows(CandleOps.upsert(b1, b2))
    assert(tableRows(url) === want,
      "JDBC latest-wins must match the Spark-side upsert")
    write(b2, url, "candles", columns, keys, Mode.InsertUpdate, DerbyDialect)
    assert(tableRows(url) === want)
  }

  test("conflict-free pages stay on the fast path; page size pages the batch") {
    val url = freshDb("fp")
    val big = candles((0 until 25).map(i =>
      (f"2021-01-02 ${i % 24}%02d:00:00", "bittrex", s"C$i", "USD", i.toDouble)))
    // pageSize 10 -> 3 pages; no conflicts -> fallback statement never used
    write(big, url, "candles", columns, keys, Mode.InsertIgnore,
      CountingDialect, pageSize = 10)
    assert(tableRows(url).size === 25)
    assert(CountingDialect.conflictCalls.get() === 0,
      "a conflict-free write must never build the fallback statement")
    // a second delivery conflicts everywhere -> fallback engages, result converges
    write(big, url, "candles", columns, keys, Mode.InsertIgnore,
      CountingDialect, pageSize = 10)
    assert(tableRows(url).size === 25)
    assert(CountingDialect.conflictCalls.get() > 0)
  }

  test("PostgresDialect golden SQL: the reference's literal conflict statements") {
    // The PG branch can't execute in-sandbox (no embedded Postgres, zero
    // egress) — pin the generated statement TEXT instead, against the
    // reference contract: PSQL_INSERT_IGNOREDUP_QUERY appends
    // `ON CONFLICT DO NOTHING` (queries.py:4) and
    // PSQL_INSERT_UPDATE_QUERY appends
    // `ON CONFLICT (<keys>) DO UPDATE SET <col> = <excluded>` (queries.py:13).
    import JdbcCandleSink.PostgresDialect
    assert(PostgresDialect.insertSql("ohlcvs", columns) ===
      """INSERT INTO "ohlcvs" ("time", "exchange", "base_id", "quote_id", """ +
        """"open", "high", "low", "close", "volume") """ +
        "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?)")
    assert(PostgresDialect.conflictSql("ohlcvs", columns, keys, Mode.InsertIgnore) ===
      """INSERT INTO "ohlcvs" ("time", "exchange", "base_id", "quote_id", """ +
        """"open", "high", "low", "close", "volume") """ +
        "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?) ON CONFLICT DO NOTHING")
    assert(PostgresDialect.conflictSql("ohlcvs", columns, keys, Mode.InsertUpdate) ===
      """INSERT INTO "ohlcvs" ("time", "exchange", "base_id", "quote_id", """ +
        """"open", "high", "low", "close", "volume") """ +
        "VALUES (?, ?, ?, ?, ?, ?, ?, ?, ?) " +
        """ON CONFLICT ("exchange", "base_id", "quote_id", "time") """ +
        """DO UPDATE SET "open" = EXCLUDED."open", "high" = EXCLUDED."high", """ +
        """"low" = EXCLUDED."low", "close" = EXCLUDED."close", """ +
        """"volume" = EXCLUDED."volume"""")
    // PG binds one marker per column in column order, both modes — the
    // multi-marker reorder is Derby MERGE's quirk, never Postgres's
    assert(PostgresDialect.conflictBindOrder(columns, keys, Mode.InsertIgnore)
      === columns.indices)
    assert(PostgresDialect.conflictBindOrder(columns, keys, Mode.InsertUpdate)
      === columns.indices)
  }

  test("a non-integrity fast-path failure rolls back and propagates, never half-commits") {
    val url = freshDb("strlen")
    // second row's exchange overflows VARCHAR(64): SQLState 22001 (data
    // exception, NOT the integrity class 23) — must propagate with the
    // open transaction rolled back, and no partial page may commit
    val bad = candles(Seq(
      ("2021-01-04 00:00:00", "bitfinex", "BTC", "USD", 1.0),
      ("2021-01-04 01:00:00", "x" * 100, "BTC", "USD", 2.0))).coalesce(1)
    intercept[org.apache.spark.SparkException] {
      write(bad, url, "candles", columns, keys, Mode.InsertIgnore, DerbyDialect)
    }
    assert(tableRows(url).isEmpty, "the failed page must not half-commit")
    // the same URL still accepts a clean write afterwards
    val ok = candles(Seq(("2021-01-04 00:00:00", "bitfinex", "BTC", "USD", 1.0)))
    write(ok, url, "candles", columns, keys, Mode.InsertIgnore, DerbyDialect)
    assert(tableRows(url).size === 1)
  }

  test("in-batch duplicate keys resolve in row order, not as an error") {
    val url = freshDb("dup")
    // ONE partition: row order is defined within a partition's pages;
    // across partitions the commit order is undefined (callers
    // repartition by key when in-batch duplicates are possible)
    val dup = candles(Seq(
      ("2021-01-03 00:00:00", "bitfinex", "LTC", "USD", 1.0),
      ("2021-01-03 00:00:00", "bitfinex", "LTC", "USD", 2.0))).coalesce(1)
    write(dup, url, "candles", columns, keys, Mode.InsertUpdate, DerbyDialect)
    assert(tableRows(url) ===
      Set(("2021-01-03 00:00:00", "bitfinex", "LTC", "USD", 2.0)),
      "latest-wins must apply WITHIN a page too (sequential fallback)")
  }
}

/** Derby dialect that counts fallback-statement builds (same JVM in
  * local mode, so the static counter is visible to the test).
  */
object CountingDialect extends JdbcCandleSink.Dialect {
  val conflictCalls = new java.util.concurrent.atomic.AtomicInteger(0)
  override def conflictSql(table: String, columns: Seq[(String, String)],
                           keys: Seq[String], mode: JdbcCandleSink.Mode): String = {
    conflictCalls.incrementAndGet()
    JdbcCandleSink.DerbyDialect.conflictSql(table, columns, keys, mode)
  }
  override def conflictBindOrder(columns: Seq[(String, String)],
                                 keys: Seq[String],
                                 mode: JdbcCandleSink.Mode): Seq[Int] =
    JdbcCandleSink.DerbyDialect.conflictBindOrder(columns, keys, mode)
}

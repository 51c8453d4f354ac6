package graft.ingest

import java.nio.file.{Files, Paths}
import org.scalatest.funsuite.AnyFunSuite

/** LIVE PostgreSQL semantics for [[JdbcCandleSink.PostgresDialect]]'s
  * generated statements — the last semantic gap the Derby MERGE twin
  * and the golden-text asserts (JdbcCandleSinkSpec) can't close: that
  * the statement TEXT the sink generates really carries the
  * reference's first-write-wins / latest-wins behavior on a real
  * Postgres (fetchers/config/queries.py:4-15).
  *
  * No Postgres JDBC driver exists in this sandbox (zero egress), so
  * the JDBC wire path itself stays covered by the live Derby twin;
  * here the EXACT SQL the dialect generates — markers substituted
  * with literals in the dialect's own bind order — is executed
  * through `psql` against a throwaway initdb cluster on a unix
  * socket. Environments without a local PostgreSQL cancel (not fail)
  * with the golden-text asserts remaining the gate.
  */
class PostgresLiveSpec extends AnyFunSuite {

  private val columns = Seq(
    "time" -> "TIMESTAMP", "exchange" -> "VARCHAR(100)",
    "base_id" -> "VARCHAR(20)", "quote_id" -> "VARCHAR(20)",
    "open" -> "DOUBLE", "high" -> "DOUBLE", "low" -> "DOUBLE",
    "close" -> "DOUBLE", "volume" -> "DOUBLE")
  private val keys = Seq("exchange", "base_id", "quote_id", "time")

  /** Run a shell command as the `postgres` user (the server refuses
    * root), cwd pinned to /tmp so `su` never warns about an
    * unreadable working directory.
    */
  private def asPg(cmd: String): (Int, String) = {
    val pb = new ProcessBuilder("su", "postgres", "-c", cmd)
    pb.directory(new java.io.File("/tmp"))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
    (p.waitFor(), out)
  }

  private def pgAvailable: Boolean =
    Seq("/usr/bin/psql").exists(f => Files.exists(Paths.get(f))) &&
      new ProcessBuilder("which", "initdb", "pg_ctl").start().waitFor() == 0 &&
      asPg("true")._1 == 0

  /** The dialect's `?` markers substituted with SQL literals, in the
    * dialect's own bind order — exactly what the JDBC layer would
    * bind, expressed as text psql can run.
    */
  private def substitute(sql: String, values: Seq[String]): String = {
    val parts = sql.split("\\?", -1)
    require(parts.length == values.length + 1,
      s"marker count ${parts.length - 1} != values ${values.length}")
    parts.zipAll(values.map(Some(_)), "", None)
      .map { case (s, v) => s + v.getOrElse("") }.mkString
  }

  private def row(ts: String, o: Double, h: Double, l: Double, c: Double,
      v: Double): Seq[String] =
    Seq(s"TIMESTAMP '$ts'", "'bitfinex'", "'BTC'", "'USD'",
      o.toString, h.toString, l.toString, c.toString, v.toString)

  test("live Postgres: generated ON CONFLICT statements carry the reference semantics") {
    assume(pgAvailable,
      "no runnable local PostgreSQL — JdbcCandleSinkSpec's golden-text " +
        "asserts and the Derby live twin remain the gate")
    import JdbcCandleSink.{Mode, PostgresDialect}
    val dir = Files.createTempDirectory("pglive")
    Runtime.getRuntime.exec(
      Array("chown", "-R", "postgres:postgres", dir.toString)).waitFor()
    val data = s"$dir/data"
    val port = 54329
    def psql(sql: String): String = {
      val f = Files.createTempFile(dir, "stmt", ".sql")
      Files.writeString(f, sql)
      Runtime.getRuntime.exec(
        Array("chown", "postgres:postgres", f.toString)).waitFor()
      val (rc, out) = asPg(s"psql -h $dir -p $port -d postgres -tA -f $f")
      assert(rc == 0, s"psql failed:\n$sql\n$out")
      out.trim
    }
    try {
      assert(asPg(s"initdb -D $data -A trust")._1 == 0)
      val (rcStart, outStart) = asPg(
        s"pg_ctl -D $data -o '-k $dir -p $port -c listen_addresses=' -l $dir/log start")
      assert(rcStart == 0, s"pg_ctl start failed: $outStart")
      try {
        psql(
          """CREATE TABLE "ohlcvs" (
            |  "time" TIMESTAMP NOT NULL, "exchange" VARCHAR(100) NOT NULL,
            |  "base_id" VARCHAR(20) NOT NULL, "quote_id" VARCHAR(20) NOT NULL,
            |  "open" DOUBLE PRECISION, "high" DOUBLE PRECISION,
            |  "low" DOUBLE PRECISION, "close" DOUBLE PRECISION,
            |  "volume" DOUBLE PRECISION,
            |  PRIMARY KEY ("exchange", "base_id", "quote_id", "time"))"""
            .stripMargin)
        val ignoreSql = PostgresDialect.conflictSql("ohlcvs", columns, keys,
          Mode.InsertIgnore)
        val updateSql = PostgresDialect.conflictSql("ohlcvs", columns, keys,
          Mode.InsertUpdate)
        // PG binds one marker per column in column order, both modes
        assert(PostgresDialect.conflictBindOrder(columns, keys, Mode.InsertIgnore)
          == columns.indices)
        val ts = "2021-01-01 00:00:00"
        // first write lands
        psql(substitute(ignoreSql, row(ts, 100.0, 101.0, 99.0, 100.5, 2.0)))
        assert(psql("""SELECT count(*) FROM "ohlcvs"""") == "1")
        // conflicting re-delivery: DO NOTHING keeps the first write
        psql(substitute(ignoreSql, row(ts, 777.0, 778.0, 776.0, 777.5, 9.0)))
        assert(psql(
          """SELECT "open" || ',' || "volume" FROM "ohlcvs"""") == "100,2")
        // repair path: DO UPDATE overwrites o/h/l/c/v, still one row
        psql(substitute(updateSql, row(ts, 200.0, 201.0, 199.0, 200.5, 5.0)))
        assert(psql("""SELECT count(*) FROM "ohlcvs"""") == "1")
        assert(psql(
          """SELECT "open" || ',' || "high" || ',' || "low" || ',' ||
            |       "close" || ',' || "volume" FROM "ohlcvs"""".stripMargin)
          == "200,201,199,200.5,5")
        // a fresh key inserts under both modes (conflict clauses are inert)
        psql(substitute(updateSql,
          row("2021-01-01 00:01:00", 300.0, 301.0, 299.0, 300.5, 1.0)))
        assert(psql("""SELECT count(*) FROM "ohlcvs"""") == "2")
      } finally asPg(s"pg_ctl -D $data stop -m immediate")
    } finally {
      Runtime.getRuntime.exec(Array("rm", "-rf", dir.toString)).waitFor()
    }
  }
}

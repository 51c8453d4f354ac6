package graft.ingest

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col

/** JDBC bulk-upsert candle sink — the reference's PostgreSQL/
  * TimescaleDB write path re-expressed as a Spark `foreachBatch`
  * writer (reference `fetchers/helpers/dbhelpers.py:34-132`
  * `psql_bulk_insert` and `fetchers/config/queries.py:4-15` conflict
  * policies):
  *
  *  - FAST PATH first: plain multi-row batch INSERT per page — the
  *    COPY analogue (no conflict handling, maximum throughput);
  *  - on an integrity violation the page ROLLS BACK and replays
  *    through the dialect's conflict-handling statement
  *    (`ON CONFLICT DO NOTHING` / `DO UPDATE` on PostgreSQL, `MERGE`
  *    on Derby), row-ordered, `pageSize` = 1000 rows per page like
  *    the reference's `execute_values(page_size=1000)`;
  *  - [[Mode.InsertIgnore]] is first-write-wins,
  *    [[Mode.InsertUpdate]] is latest-wins — the same policies as
  *    [[graft.ops.CandleOps.insertIgnore]]/`upsert` (parity spec'd in
  *    JdbcCandleSinkSpec against embedded Derby, the in-sandbox
  *    stand-in for Postgres).
  *
  * Both modes are idempotent, so an at-least-once redelivered
  * micro-batch converges — the property the streaming
  * `foreachBatch` contract needs. Scale: one connection per
  * PARTITION, pages bound memory to `pageSize` rows, and the
  * per-page fallback (not whole-batch) keeps a single hot key from
  * degrading every other page's fast path. Repartition upstream to
  * match the database's ingest parallelism.
  */
object JdbcCandleSink {

  sealed trait Mode
  object Mode {
    /** first-write-wins: `ON CONFLICT DO NOTHING` (queries.py:4). */
    case object InsertIgnore extends Mode
    /** latest-wins: `ON CONFLICT (...) DO UPDATE SET ...` (queries.py:13). */
    case object InsertUpdate extends Mode
  }

  /** SQL-dialect seam: identifier quoting is uniform (double quotes,
    * both engines); the conflict statement differs. `columns` carry
    * their SQL types because Derby's `MERGE ... USING (VALUES ?)`
    * needs typed parameter markers (`CAST(? AS T)`).
    */
  trait Dialect extends Serializable {
    protected def q(ident: String): String = "\"" + ident + "\""

    /** Plain fast-path INSERT — the COPY analogue. */
    def insertSql(table: String, columns: Seq[(String, String)]): String =
      s"INSERT INTO ${q(table)} (${columns.map(c => q(c._1)).mkString(", ")}) " +
        s"VALUES (${columns.map(_ => "?").mkString(", ")})"

    /** Conflict-handling fallback statement. */
    def conflictSql(table: String, columns: Seq[(String, String)],
                    keys: Seq[String], mode: Mode): String

    /** Row-field index for each `?` in [[conflictSql]], in marker
      * order — dialects whose statement repeats or reorders columns
      * (Derby's MERGE) override this; the default is one marker per
      * column in column order.
      */
    def conflictBindOrder(columns: Seq[(String, String)], keys: Seq[String],
                          mode: Mode): Seq[Int] = columns.indices

    /** Whether `e` (or anything on its cause/next chains) is a
      * unique/PK violation — SQLState class 23.
      */
    def isIntegrityViolation(e: java.sql.SQLException): Boolean = {
      var cur: Throwable = e
      var n = 0
      while (cur != null && n < 20) {
        cur match {
          case s: java.sql.SQLException
            if Option(s.getSQLState).exists(_.startsWith("23")) => return true
          case s: java.sql.SQLException if s.getNextException != null &&
            s.getNextException != s =>
            if (isIntegrityViolation(s.getNextException)) return true
          case _ =>
        }
        cur = if (cur.getCause == cur) null else cur.getCause
        n += 1
      }
      false
    }
  }

  /** PostgreSQL / TimescaleDB: the reference's literal statements. */
  object PostgresDialect extends Dialect {
    override def conflictSql(table: String, columns: Seq[(String, String)],
                             keys: Seq[String], mode: Mode): String = {
      val base = insertSql(table, columns)
      mode match {
        case Mode.InsertIgnore => s"$base ON CONFLICT DO NOTHING"
        case Mode.InsertUpdate =>
          val upd = columns.map(_._1).filterNot(keys.contains)
            .map(c => s"${q(c)} = EXCLUDED.${q(c)}").mkString(", ")
          s"$base ON CONFLICT (${keys.map(q).mkString(", ")}) DO UPDATE SET $upd"
      }
    }
  }

  /** Embedded Derby (ships with Spark) — the spec's Postgres
    * stand-in. Derby's MERGE source must be a base table or table
    * function (ERROR 42XAL rejects a VALUES subquery), so the
    * one-row dummy table `SYSIBM.SYSDUMMY1` is the source and the
    * row's values appear as typed markers (`CAST(? AS T)` — Derby
    * cannot infer bare `?` types here) in the ON, SET, and INSERT
    * clauses; [[conflictBindOrder]] maps each marker back to its row
    * field.
    */
  object DerbyDialect extends Dialect {
    private def typed(c: (String, String)): String = s"CAST(? AS ${c._2})"

    override def conflictSql(table: String, columns: Seq[(String, String)],
                             keys: Seq[String], mode: Mode): String = {
      val keyCols = columns.filter(c => keys.contains(c._1))
      val updCols = columns.filterNot(c => keys.contains(c._1))
      val on = keyCols.map(c => s"t.${q(c._1)} = ${typed(c)}").mkString(" AND ")
      val matched = mode match {
        case Mode.InsertIgnore => ""
        case Mode.InsertUpdate =>
          s"WHEN MATCHED THEN UPDATE SET " +
            updCols.map(c => s"${q(c._1)} = ${typed(c)}").mkString(", ") + " "
      }
      val ins = s"WHEN NOT MATCHED THEN INSERT " +
        s"(${columns.map(c => q(c._1)).mkString(", ")}) " +
        s"VALUES (${columns.map(typed).mkString(", ")})"
      s"MERGE INTO ${q(table)} t USING SYSIBM.SYSDUMMY1 ON $on $matched$ins"
    }

    override def conflictBindOrder(columns: Seq[(String, String)],
                                   keys: Seq[String], mode: Mode): Seq[Int] = {
      val keyIdx = columns.zipWithIndex.collect {
        case (c, i) if keys.contains(c._1) => i }
      val updIdx = columns.zipWithIndex.collect {
        case (c, i) if !keys.contains(c._1) => i }
      val setIdx = mode match {
        case Mode.InsertIgnore => Seq.empty
        case Mode.InsertUpdate => updIdx
      }
      keyIdx ++ setIdx ++ columns.indices
    }
  }

  /** Write `df`'s `columns` to `table`, one JDBC connection per
    * partition, fast-path pages with conflict fallback. Blocking —
    * call from the driver or a `foreachBatch` body.
    *
    * Ordering contract: first/latest-wins is row-ordered WITHIN a
    * partition; across partitions commit order is undefined (they
    * run concurrently). A batch that can contain duplicate keys
    * should `repartition` on the key columns first so all versions
    * of a key land in one partition's ordered pages.
    */
  def write(df: DataFrame, url: String, table: String,
            columns: Seq[(String, String)], keys: Seq[String], mode: Mode,
            dialect: Dialect, pageSize: Int = 1000,
            connProps: Map[String, String] = Map.empty): Unit = {
    require(keys.nonEmpty && keys.forall(columns.map(_._1).contains),
      s"keys $keys must be a subset of columns")
    val names = columns.map(_._1)
    df.select(names.map(col): _*).foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val props = new java.util.Properties()
        connProps.foreach { case (k, v) => props.setProperty(k, v) }
        val conn = java.sql.DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          rows.grouped(pageSize).foreach { page =>
            writePage(conn, page, url, table, columns, keys, mode, dialect)
          }
        } finally conn.close()
      }
    }
  }

  /** `foreachBatch` adapter:
    * `stream.writeStream.foreachBatch(JdbcCandleSink.foreachBatchWriter(...))`.
    */
  def foreachBatchWriter(url: String, table: String,
                         columns: Seq[(String, String)], keys: Seq[String],
                         mode: Mode, dialect: Dialect, pageSize: Int = 1000,
                         connProps: Map[String, String] = Map.empty)
      : (DataFrame, Long) => Unit =
    (batch, _) => write(batch, url, table, columns, keys, mode, dialect,
      pageSize, connProps)

  private def writePage(conn: java.sql.Connection, page: Seq[Row], url: String,
                        table: String, columns: Seq[(String, String)],
                        keys: Seq[String], mode: Mode, dialect: Dialect): Unit = {
    def bind(st: java.sql.PreparedStatement, r: Row): Unit = {
      var i = 0
      while (i < columns.size) {
        st.setObject(i + 1, r.get(i)); i += 1
      }
    }
    val fast = conn.prepareStatement(dialect.insertSql(table, columns))
    val fastOk =
      try {
        page.foreach { r => bind(fast, r); fast.addBatch() }
        fast.executeBatch()
        conn.commit()
        true
      } catch {
        case e: java.sql.SQLException if dialect.isIntegrityViolation(e) =>
          conn.rollback() // reference: rollback then conflict-handling replay
          false
        case e: Throwable =>
          // any OTHER mid-batch failure (timeout, serialization error,
          // connection fault) must also release the open transaction —
          // relying on driver rollback-on-close semantics would leave a
          // partially-applied batch pinned until the pool reaps it. The
          // rollback's own failure must not mask the root cause.
          try conn.rollback() catch { case _: Throwable => }
          throw e
      } finally fast.close()
    if (!fastOk) {
      val fb = conn.prepareStatement(
        dialect.conflictSql(table, columns, keys, mode))
      val order = dialect.conflictBindOrder(columns, keys, mode)
      try {
        // row-ordered single statements, NOT one multi-VALUES
        // statement: Postgres errors on a duplicate key WITHIN one
        // INSERT..ON CONFLICT DO UPDATE statement ("cannot affect row
        // a second time"); sequential execution gives in-batch
        // duplicates well-defined first/latest-wins order instead
        page.foreach { r =>
          order.zipWithIndex.foreach { case (f, p) =>
            fb.setObject(p + 1, r.get(f)) }
          fb.addBatch()
        }
        fb.executeBatch()
        conn.commit()
      } catch { case e: Throwable => conn.rollback(); throw e }
      finally fb.close()
    }
  }
}

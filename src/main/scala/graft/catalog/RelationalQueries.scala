package graft.catalog

import graft.core.Tables
import graft.ops.Analytics
import graft.catalog.Oracle._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Relational operator battery (SURVEY §2.2/2.3/2.4/2.6/2.7/2.8)
  * exercised on the TPC-H-ish tables, each with a DuckDB oracle.
  * See TimeSeriesQueries for the shared output conventions.
  */
object RelationalQueries {

  /** J1/J2 + A-style agg: revenue per nation, region-filtered.
    * nation/region are broadcast (tiny dims, like symbol_exchange in
    * the reference — SURVEY J1); lineitem⋈orders is the only big
    * shuffle and AQE handles the rest.
    */
  private def joinRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .filter(r("r_name") === "ASIA" &&
        o("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        o("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy(n("n_name").as("n_name"))
      .agg(
        (sum(revenueTenK(li("l_extendedprice"), li("l_discount"))) / 10000.0d).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  private val joinRevenueSql: String =
    s"""SELECT n_name,
       |       SUM(${revenueTenKSql("l_extendedprice", "l_discount")}) / 10000.0 AS revenue,
       |       count(*) AS n_items
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey  = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |WHERE r_name = 'ASIA'
       |  AND o_orderdate >= TIMESTAMP '1996-01-01'
       |  AND o_orderdate <  TIMESTAMP '1998-01-01'
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** J3/W7: latest order per customer (LATERAL top-1 / DISTINCT ON). */
  private def latestOrder(s: SparkSession, d: String): DataFrame =
    Analytics.latestPerKey(
        Tables.orders(s, d),
        Seq(col("o_custkey")),
        Seq(col("o_orderdate").desc, col("o_orderkey").desc))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
      .orderBy(col("o_custkey"))

  private val latestOrderSql: String =
    """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice
      |FROM orders
      |QUALIFY row_number() OVER (
      |  PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) = 1
      |ORDER BY o_custkey""".stripMargin

  /** J5: anti-join — customers with no orders since 2001 (reference
    * schemas/delete_queries.sql:3-10 NOT EXISTS pattern).
    */
  private def antiJoin(s: SparkSession, d: String): DataFrame = {
    val recent = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("2001-01-01").cast("timestamp"))
    Tables.customer(s, d)
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val antiJoinSql: String =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2001-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** J6: semi-join — customers with at least one order since 1999. */
  private def semiJoin(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1999-01-01").cast("timestamp"))
    Tables.customer(s, d)
      .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val semiJoinSql: String =
    """SELECT c_custkey, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey
      |                AND o_orderdate >= TIMESTAMP '1999-01-01')
      |ORDER BY c_custkey""".stripMargin

  /** A2: grouped count + HAVING + ORDER + LIMIT (reference
    * common_basequote_30, create.sql:94-99).
    */
  private def havingTopK(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_orderkey")).as("n_orders"))
      .filter(col("n_orders") > 2)
      .orderBy(col("n_orders").desc, col("l_partkey").asc)
      .limit(30)

  private val havingTopKSql: String =
    """SELECT l_partkey, count(DISTINCT l_orderkey) AS n_orders
      |FROM lineitem GROUP BY 1 HAVING count(DISTINCT l_orderkey) > 2
      |ORDER BY n_orders DESC, l_partkey LIMIT 30""".stripMargin

  /** A6: exact distinct count of pairs after a time filter. */
  private def distinctPairs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp"))
      .agg(countDistinct(col("l_partkey"), col("l_suppkey")).as("n_pairs"))

  private val distinctPairsSql: String =
    """SELECT count(*) AS n_pairs FROM (
      |  SELECT DISTINCT l_partkey, l_suppkey FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01')""".stripMargin

  /** A4/W4: top-20 by total revenue with 'Other' bucket (reference
    * top_20_quoted_vol, create.sql:280-316). Totals are kept as exact
    * ten-thousandths Longs through the ranking so ordering is exact.
    */
  private def top20Other(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    val totals = li.join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .groupBy(p("p_name").as("grp"))
      .agg(sum(revenueTenK(col("l_extendedprice"), col("l_discount"))).as("t"))
    Analytics.topNWithOther(totals, col("grp"), col("t"), 20)
      .select(col("bqgrp"), (col("total_volume") / 10000.0d).as("total_volume"))
      .orderBy(col("total_volume").desc, col("bqgrp"))
  }

  private val top20OtherSql: String =
    s"""WITH totals AS (
       |  SELECT p_name AS grp,
       |         SUM(${revenueTenKSql("l_extendedprice", "l_discount")}) AS t
       |  FROM lineitem JOIN part ON l_partkey = p_partkey GROUP BY 1
       |), ranked AS (
       |  SELECT grp, t, row_number() OVER (ORDER BY t DESC, grp) AS rk FROM totals
       |)
       |SELECT CASE WHEN rk > 20 THEN 'Other' ELSE grp END AS bqgrp,
       |       SUM(t) / 10000.0 AS total_volume
       |FROM ranked GROUP BY 1 ORDER BY 2 DESC, 1""".stripMargin

  /** F3-F7/F12: scalar-function projection battery. */
  private def scalarProject(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(col("o_orderkey") < 100)
      .select(
        col("o_orderkey"),
        unix_millis(col("o_orderdate").cast("timestamp")).as("order_ms"),
        concat_ws("-", col("o_orderstatus"), col("o_orderpriority")).as("status_prio"),
        when(col("o_orderstatus") === "F", lit("finished"))
          .otherwise(lit("open")).as("status_label"),
        coalesce(nullif(col("o_orderstatus"), lit("F")), lit("done")).as("coalesced"),
        cents(col("o_totalprice")).cast("long").as("price_cents"),
        to_json(struct(col("o_orderkey"), col("o_orderstatus"))).as("js"))
      .orderBy(col("o_orderkey"))

  private val scalarProjectSql: String =
    s"""SELECT o_orderkey,
       |       epoch_ms(o_orderdate) AS order_ms,
       |       concat(o_orderstatus, '-', o_orderpriority) AS status_prio,
       |       CASE WHEN o_orderstatus = 'F' THEN 'finished' ELSE 'open' END AS status_label,
       |       coalesce(nullif(o_orderstatus, 'F'), 'done') AS coalesced,
       |       ${centsSql("o_totalprice")} AS price_cents,
       |       CAST(to_json(struct_pack(o_orderkey := o_orderkey,
       |                                o_orderstatus := o_orderstatus)) AS VARCHAR) AS js
       |FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey""".stripMargin

  /** §2.7 set ops: union of overlapping subsets + dedup by id. */
  private def unionDedup(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select("event_id", "event_type", "value")
    val a = e.filter(col("value") > 100d)
    val b = e.filter(col("value") > 50d && col("event_type") === "click")
    a.unionByName(b)
      .dropDuplicates("event_id")
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  private val unionDedupSql: String =
    """SELECT event_type, count(*) AS n FROM (
      |  SELECT DISTINCT event_id, event_type FROM (
      |    SELECT event_id, event_type FROM events WHERE value > 100
      |    UNION ALL
      |    SELECT event_id, event_type FROM events WHERE value > 50 AND event_type = 'click'))
      |GROUP BY 1 ORDER BY 1""".stripMargin

  /** J8: FK `ON DELETE CASCADE` as the explicit double-delete job
    * (AggregateMaintenance.cascadeDelete; reference
    * create_tables.sql:66-70 + delete_queries.sql): delete the
    * BUILDING-segment customers, cascade to their orders, and verify
    * both surviving tables in one deterministic output.
    */
  private def cascadeDelete(s: SparkSession, d: String): DataFrame = {
    val (dim, Seq(orders)) = graft.maintenance.AggregateMaintenance.cascadeDelete(
      Tables.customer(s, d), col("c_mktsegment") === "BUILDING", Seq("c_custkey"),
      Seq(Tables.orders(s, d).withColumnRenamed("o_custkey", "c_custkey"))) : @unchecked
    orders.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        sum(cents(col("o_totalprice"))).cast("long").as("price_cents"))
      .crossJoin(dim.agg(count(lit(1)).as("n_dim_survivors")))
      .orderBy(col("o_orderstatus"))
  }

  private val cascadeDeleteSql: String =
    s"""SELECT o_orderstatus, count(*) AS n_orders,
       |       CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS price_cents,
       |       (SELECT count(*) FROM customer WHERE c_mktsegment <> 'BUILDING') AS n_dim_survivors
       |FROM orders
       |WHERE NOT EXISTS (SELECT 1 FROM customer
       |                  WHERE c_custkey = o_custkey AND c_mktsegment = 'BUILDING')
       |GROUP BY 1 ORDER BY 1""".stripMargin

  /** ROLLUP grouping sets: order value by (nation, priority) with
    * per-nation and grand-total subtotal rows in one pass — Spark
    * `rollup()` expands the sets inside a single hash-aggregate (one
    * shuffle, map-side partials for every set), vs the naive
    * union-of-3-aggregations which scans and shuffles three times.
    * `grouping_id()` (Spark) and `GROUPING(a, b)` (DuckDB) share the
    * first-column-is-MSB bitmask convention; null group keys from the
    * subtotal rows are projected to 'ALL' so the checked output is
    * null-free (catalog convention).
    */
  private def rollupRevenue(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n = Tables.nation(s, d)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .rollup(n("n_name").as("n_name"), o("o_orderpriority").as("o_orderpriority"))
      .agg(
        grouping_id().cast("bigint").as("gid"),
        sum(cents(o("o_totalprice"))).as("price_cents"),
        count(lit(1)).as("n_orders"))
      .select(
        coalesce(col("n_name"), lit("ALL")).as("n_name"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("o_orderpriority"),
        col("gid"), col("price_cents"), col("n_orders"))
      .orderBy("gid", "n_name", "o_orderpriority")
  }

  private val rollupRevenueSql: String =
    s"""SELECT coalesce(n_name, 'ALL') AS n_name,
       |       coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       |       CAST(GROUPING(n_name, o_orderpriority) AS BIGINT) AS gid,
       |       CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS price_cents,
       |       count(*) AS n_orders
       |FROM orders
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |GROUP BY ROLLUP(n_name, o_orderpriority)
       |ORDER BY gid, n_name, o_orderpriority""".stripMargin

  /** Ratio-to-report: each priority's share of its nation's order
    * value — aggregate once, then a partition-scoped window sum over
    * the (tiny) aggregated frame; the percentage divides two exact
    * integer cent totals so both engines run the identical IEEE
    * divide. The window runs AFTER the groupBy (25 nations × 5
    * priorities rows), so its sort cost is nil at any input scale.
    */
  private def shareQ(s: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(s, dir)
    val c = Tables.customer(s, dir)
    val n = Tables.nation(s, dir)
    val g = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .groupBy(n("n_name").as("n_name"), o("o_orderpriority").as("o_orderpriority"))
      .agg(sum(cents(o("o_totalprice"))).as("pc"))
    val natTotal = sum(col("pc")).over(
      org.apache.spark.sql.expressions.Window.partitionBy(col("n_name")))
    g.select(col("n_name"), col("o_orderpriority"),
        col("pc").as("price_cents"),
        r4((col("pc") * 100L).cast("double") / natTotal.cast("double")).as("share_pct"))
      .orderBy("n_name", "o_orderpriority")
  }

  private val shareSql: String =
    s"""WITH g AS (
       |  SELECT n_name, o_orderpriority,
       |         CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS pc
       |  FROM orders
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation ON c_nationkey = n_nationkey
       |  GROUP BY 1, 2
       |)
       |SELECT n_name, o_orderpriority, pc AS price_cents,
       |       ${r4Sql("CAST(pc * 100 AS DOUBLE) / CAST(CAST(SUM(pc) OVER (PARTITION BY n_name) AS BIGINT) AS DOUBLE)")} AS share_pct
       |FROM g ORDER BY n_name, o_orderpriority""".stripMargin

  /** GROUPING SETS through the SQL entry point — a set combination
    * (priority-only totals ∪ status-only totals) that neither ROLLUP
    * nor CUBE expresses, exercising the second user-facing API
    * surface (`spark.sql`) like ts_sql_candle_1h does. Still one
    * Expand + one hash-aggregate pass. `grouping_id()` (Spark,
    * all-grouping-columns form) ↔ `GROUPING(a, b)` (DuckDB): same
    * first-column-MSB bitmask.
    */
  private def groupingSetsQ(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir).createOrReplaceTempView("graft_orders")
    s.sql(
      """SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
        |       coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
        |       CAST(grouping_id() AS BIGINT) AS gid,
        |       CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS price_cents,
        |       count(*) AS n_orders
        |FROM graft_orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        |ORDER BY gid, o_orderpriority, o_orderstatus""".stripMargin)
  }

  private val groupingSetsSql: String =
    s"""SELECT coalesce(o_orderpriority, 'ALL') AS o_orderpriority,
       |       coalesce(o_orderstatus, 'ALL') AS o_orderstatus,
       |       CAST(GROUPING(o_orderpriority, o_orderstatus) AS BIGINT) AS gid,
       |       CAST(SUM(${centsSql("o_totalprice")}) AS BIGINT) AS price_cents,
       |       count(*) AS n_orders
       |FROM orders
       |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
       |ORDER BY gid, o_orderpriority, o_orderstatus""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "rel_grouping_sets"  -> groupingSetsQ,
    "rel_share"          -> shareQ,
    "rel_rollup"         -> rollupRevenue,
    "rel_cascade_delete" -> cascadeDelete,
    "rel_join_revenue"   -> joinRevenue,
    "rel_latest_order"   -> latestOrder,
    "rel_anti_join"      -> antiJoin,
    "rel_semi_join"      -> semiJoin,
    "rel_having_topk"    -> havingTopK,
    "rel_distinct_pairs" -> distinctPairs,
    "rel_top20_other"    -> top20Other,
    "rel_scalar_project" -> scalarProject,
    "rel_union_dedup"    -> unionDedup,
  )

  def oracleSql: Map[String, String] = Map(
    "rel_grouping_sets"  -> groupingSetsSql,
    "rel_share"          -> shareSql,
    "rel_rollup"         -> rollupRevenueSql,
    "rel_cascade_delete" -> cascadeDeleteSql,
    "rel_join_revenue"   -> joinRevenueSql,
    "rel_latest_order"   -> latestOrderSql,
    "rel_anti_join"      -> antiJoinSql,
    "rel_semi_join"      -> semiJoinSql,
    "rel_having_topk"    -> havingTopKSql,
    "rel_distinct_pairs" -> distinctPairsSql,
    "rel_top20_other"    -> top20OtherSql,
    "rel_scalar_project" -> scalarProjectSql,
    "rel_union_dedup"    -> unionDedupSql,
  )
}

package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** A query with an optional DuckDB oracle. Column names in `fn` output and
  * `oracle` SQL must match exactly (driver sorts columns by name before
  * hashing). Every query takes the scale-factor dir so the same plan runs
  * at any scale.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String)

/** Shared helpers for oracle-parity queries.
  *
  * Numeric parity strategy: the synthetic tables store money-like values as
  * doubles. Double summation is order-dependent, so any SUM in an
  * oracle-checked query casts to decimal FIRST (exact, associative) and the
  * final aggregate is cast to a fixed decimal type on both sides.
  *
  * Timestamp parity strategy: timestamps in oracle-checked output are
  * rendered as strings (date_format / strftime) so writer-precision
  * differences can't affect the hash. `events.ts` is parquet
  * TIMESTAMP(NANOS): Spark reads it as a long (nanosAsLong), DuckDB as
  * TIMESTAMP_NS; both sides derive buckets/orderings from integer nanos.
  */
object Qh {
  def dec(c: Column, p: Int = 20, s: Int = 4): Column = c.cast(DecimalType(p, s))
  def dec38(c: Column, s: Int = 4): Column = c.cast(DecimalType(38, s))
  /** Correctness-gate rendering: DECIMAL output columns hash differently
    * across parquet readers (Decimal objects vs float64), so every
    * decimal-exact result is converted to DOUBLE as the LAST step on both
    * engines — equal decimals convert to bit-identical doubles (correctly
    * rounded). ONLY valid while the decimal's unscaled value stays under
    * 2^53: beyond that the engines' conversion pipelines round differently
    * by 1 ulp (observed on DECIMAL(38,8) sums at sf0.1). Scale-8 money
    * sums use `decStr` instead.
    */
  def dbl(c: Column): Column = c.cast(DoubleType)

  /** Exact rendering for high-scale decimals whose unscaled value can
    * exceed 2^53: both engines print decimals with full trailing-zero
    * scale ("2706323975.35610000"), byte-identical. Caveat: Spark switches
    * to scientific notation below 1e-7 — fine for money sums ≫ 1.
    * Keep ordering on the DECIMAL column, project the string last.
    */
  def decStr(c: Column): Column = c.cast(StringType)
  /** exact revenue term: extendedprice * (1 - discount), decimal arithmetic */
  def revenue(ep: Column, disc: Column): Column =
    dec(ep) * (lit(1).cast(DecimalType(10, 4)) - dec(disc, 10, 4))
  /** events.ts (long ns, UTC) → timestamp (µs truncation). Integer DIV —
    * double division loses ~128 ns at 2^60 and can misbucket boundary rows.
    */
  def tsFromNanos(tsNs: Column): Column =
    timestamp_micros(graft.functions.ColumnOps.intDiv(tsNs, 1000L))
}

/** SURVEY.md §2 core relational operators re-expressed over the star schema:
  * scans/sinks (S4-S6), filters/projections (P2-P7), joins (J1-J4),
  * aggregations (A1-A6), window dedup (W1), sort/limit (O1), set-ops (U1).
  * Reference citations are on each query.
  */
object CoreQueries {
  import Qh._

  val all: Map[String, Q] = Map(

    // ───── headline TPC-H-shaped aggregates ─────

    // A1-analog + pricing summary; hash-agg with map-side partial agg.
    "q1_pricing_summary" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .filter($"l_shipdate" <= lit("1998-09-02").cast(TimestampType))
          .groupBy($"l_returnflag", $"l_linestatus")
          .agg(
            dbl(dec38(sum(dec($"l_quantity")))).as("sum_qty"),
            dbl(dec38(sum(dec($"l_extendedprice")))).as("sum_base_price"),
            decStr(dec38(sum(revenue($"l_extendedprice", $"l_discount")), 8)).as("sum_disc_price"),
            count(lit(1)).as("count_order"))
          .orderBy($"l_returnflag", $"l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(20,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_qty,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4))) AS DECIMAL(38,4)) AS DOUBLE) AS sum_base_price,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(10,4)))) AS DECIMAL(38,8)) AS VARCHAR) AS sum_disc_price,
        COUNT(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
      "TPC-H Q1-shaped pricing summary; exercises decimal-exact partial+final hash agg"),

    // Join-heavy headline: top revenue orders for one segment (TPC-H Q3 shape).
    // customer is tiny relative to lineitem → broadcast; Catalyst/AQE confirms.
    "q3_top_revenue_orders" -> Q(
      (s, d) => {
        import s.implicits._
        val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
          .select($"c_custkey")
        val ord = Tables.orders(s, d).select($"o_orderkey", $"o_custkey", $"o_orderdate")
        val li = Tables.lineitem(s, d).select($"l_orderkey", $"l_extendedprice", $"l_discount")
        li.join(ord, li("l_orderkey") === ord("o_orderkey"))
          .join(broadcast(cust), ord("o_custkey") === cust("c_custkey"))
          .groupBy($"o_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"))
          .agg(dec38(sum(revenue($"l_extendedprice", $"l_discount")), 8).as("rev_d"))
          .orderBy($"rev_d".desc, $"o_orderkey")
          .limit(10)
          .select($"o_orderkey", $"o_date", decStr($"rev_d").as("revenue"))
      },
      Some("""WITH agg AS (
          SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(10,4)))) AS DECIMAL(38,8)) AS rev_d
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          WHERE c_mktsegment = 'BUILDING'
          GROUP BY o_orderkey, strftime(o_orderdate, '%Y-%m-%d')
          ORDER BY rev_d DESC, o_orderkey LIMIT 10)
        SELECT o_orderkey, o_date, CAST(rev_d AS VARCHAR) AS revenue FROM agg"""),
      "TPC-H Q3-shaped join+agg+topk; broadcast dim join"),

    // ───── aggregations (SURVEY §2.4) ─────

    // A1 monthly P&L (reference 129f09ac6c14:21-34): month bucket × type →
    // ROUND(SUM)::BIGINT + count, ordered month desc.
    "a1_monthly_pnl" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy(date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM").as("year_month"),
            $"o_orderstatus")
          .agg(round(sum(dec($"o_totalprice")), 0).cast(LongType).as("total"),
            count(lit(1)).as("record_count"))
          .orderBy($"year_month".desc, $"o_orderstatus")
      },
      Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS year_month,
        o_orderstatus,
        CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(20,4))), 0) AS BIGINT) AS total,
        COUNT(*) AS record_count
        FROM orders GROUP BY 1, 2 ORDER BY year_month DESC, o_orderstatus"""),
      "monthly P&L hash-agg (ref 129f09ac6c14:21-34): month bucket + ROUND(SUM)"),

    // A2 totals by category with COALESCE default (ref 129f09ac6c14:37-48).
    "a2_category_totals" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.part(s, d)
          .groupBy(coalesce($"p_brand", lit("Uncategorized")).as("category"))
          .agg(dbl(dec38(sum(dec($"p_retailprice")))).as("total"),
            count(lit(1)).as("record_count"))
          .orderBy($"total".desc, $"category")
      },
      Some("""SELECT COALESCE(p_brand, 'Uncategorized') AS category,
        CAST(CAST(SUM(CAST(p_retailprice AS DECIMAL(20,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total,
        COUNT(*) AS record_count
        FROM part GROUP BY 1 ORDER BY total DESC, category"""),
      "expenses-by-category analog (ref 129f09ac6c14:37-48)"),

    // A3 dimension extraction: DISTINCT + non-empty filter (ref b80da1af78f7:46-53).
    "a3_distinct_dims" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .filter($"c_mktsegment".isNotNull && $"c_mktsegment" =!= "")
          .select($"c_mktsegment".as("name")).distinct()
          .orderBy($"name")
      },
      Some("""SELECT DISTINCT c_mktsegment AS name FROM customer
        WHERE c_mktsegment IS NOT NULL AND c_mktsegment != '' ORDER BY 1"""),
      "DISTINCT dimension extraction (ref b80da1af78f7:46-53)"),

    // A4 campaigns-style rollup with null→0 coercion (ref src/marts.py:15-25).
    "a4_events_rollup" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .groupBy($"event_type")
          .agg(dbl(dec38(sum(dec(coalesce($"value", lit(0)))))).as("total_value"),
            count(lit(1)).as("n_events"),
            countDistinct($"user_id").as("n_users"))
          .orderBy($"event_type")
      },
      Some("""SELECT event_type,
        CAST(CAST(SUM(CAST(COALESCE(value, 0) AS DECIMAL(20,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total_value,
        COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users
        FROM events GROUP BY event_type ORDER BY event_type"""),
      "campaigns rollup analog (ref src/marts.py:15-25) + distinct count"),

    // A5 max-PK scan (ref gas/pk_master.gs:84-90): regexp-extract counter, max.
    "a5_max_pk" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.customer(s, d)
          .agg(max(regexp_extract($"c_name", "Customer#(\\d+)", 1).cast(LongType)).as("max_pk"))
      },
      Some("""SELECT MAX(CAST(regexp_extract(c_name, 'Customer#(\d+)', 1) AS BIGINT)) AS max_pk
        FROM customer"""),
      "max-scan PK counter (ref gas/pk_master.gs:84-90)"),

    // A7 approximate distinct (engine extension, SURVEY §2.4 note): HLL++
    // sketch — the 100 TB cardinality path where exact COUNT(DISTINCT)
    // would shuffle every key. Deterministic for fixed input but engine-
    // specific, so no cross-engine oracle; bounded-error vs exact is
    // asserted in CoreQueriesSpec.
    "a7_approx_distinct" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .agg(approx_count_distinct($"l_orderkey", 0.02).as("approx_orders"),
            approx_count_distinct($"l_partkey", 0.02).as("approx_parts"))
      },
      None,
      "approx_count_distinct (HLL++, rsd 2%) — sketch-based cardinality"),

    // A8 rollup (engine extension): subtotals per month×status plus
    // per-month and grand totals in one pass — GROUPING SETS shape.
    "a8_rollup" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .rollup(date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM").as("year_month"),
            $"o_orderstatus")
          .agg(dbl(dec38(sum(dec($"o_totalprice")))).as("total"), count(lit(1)).as("n"))
          .orderBy($"year_month".asc_nulls_first, $"o_orderstatus".asc_nulls_first)
      },
      Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS year_month,
        o_orderstatus,
        CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(20,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total,
        COUNT(*) AS n
        FROM orders GROUP BY ROLLUP (1, 2)
        ORDER BY year_month ASC NULLS FIRST, o_orderstatus ASC NULLS FIRST"""),
      "ROLLUP subtotal lattice (engine extension)"),

    // A9 pivot (engine extension): status columns per month. Oracle uses
    // conditional aggregation — same result, names pinned on both sides.
    "a9_pivot" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .groupBy(date_format(date_trunc("month", $"o_orderdate"), "yyyy-MM").as("year_month"))
          .pivot("o_orderstatus", Seq("O", "F", "P"))
          .agg(dec38(sum(dec($"o_totalprice"))))
          .withColumnsRenamed(Map("O" -> "total_o", "F" -> "total_f", "P" -> "total_p"))
          .select($"year_month", dbl($"total_o").as("total_o"),
            dbl($"total_f").as("total_f"), dbl($"total_p").as("total_p"))
          .orderBy($"year_month")
      },
      Some("""SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS year_month,
        CAST(CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(20,4)) END) AS DECIMAL(38,4)) AS DOUBLE) AS total_o,
        CAST(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(20,4)) END) AS DECIMAL(38,4)) AS DOUBLE) AS total_f,
        CAST(CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(20,4)) END) AS DECIMAL(38,4)) AS DOUBLE) AS total_p
        FROM orders GROUP BY 1 ORDER BY year_month"""),
      "PIVOT to status columns (engine extension)"),

    // A6 count / error-rate monitors (ref main.py:96-103,195-212).
    "a6_quality_monitor" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.lineitem(s, d)
          .agg(count(lit(1)).as("n_rows"),
            count(when($"l_discount" > 0.05, 1)).as("n_flagged"),
            countDistinct($"l_orderkey").as("n_orders"))
      },
      Some("""SELECT COUNT(*) AS n_rows,
        COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS n_flagged,
        COUNT(DISTINCT l_orderkey) AS n_orders FROM lineitem"""),
      "count/error-rate monitor (ref main.py:96-103)"),

    // ───── projections / filters (SURVEY §2.2) ─────

    // P2 technical-field-exclusion projection (ref 129f09ac6c14:51-67):
    // narrow select + filter must push down to the parquet scan.
    "p2_projection" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .filter($"o_orderstatus" === "O")
          .select($"o_orderkey", $"o_custkey",
            date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date
        FROM orders WHERE o_orderstatus = 'O' ORDER BY o_orderkey"""),
      "business projection w/ filter+column pushdown (ref 129f09ac6c14:51-67)"),

    // P4 type-membership filter (ref 129f09ac6c14:30).
    "p4_type_filter" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .filter($"event_type".isin("signup", "purchase"))
          .select($"event_id", $"user_id", $"event_type")
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, user_id, event_type FROM events
        WHERE event_type IN ('signup', 'purchase') ORDER BY event_id"""),
      "IN-list filter (ref 129f09ac6c14:30)"),

    // P6 date-floor garbage guard (ref 129f09ac6c14:31).
    "p6_date_floor" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1997-06-01").cast(TimestampType))
          .select($"o_orderkey", date_format($"o_orderdate", "yyyy-MM-dd").as("o_date"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS o_date
        FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01' ORDER BY o_orderkey"""),
      "timestamp floor filter (ref 129f09ac6c14:31)"),

    // ───── joins (SURVEY §2.3) ─────

    // J1 anti-join — the reference's core CDC operator (src/transform.py:203-209).
    // Filtered right side keeps the result non-empty at every SF.
    "j1_anti_join" -> Q(
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
        val o = Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1998-06-01").cast(TimestampType))
          .select($"o_custkey")
        c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
          .select($"c_custkey", $"c_name")
          .orderBy($"c_custkey")
      },
      Some("""SELECT c_custkey, c_name FROM customer c
        WHERE NOT EXISTS (SELECT 1 FROM orders o
          WHERE o.o_orderdate >= TIMESTAMP '1998-06-01' AND o.o_custkey = c.c_custkey)
        ORDER BY c_custkey"""),
      "anti-join change detection (ref src/transform.py:203-209)"),

    // J2-analog semi-join (EXISTS; ref main.py:151 dedup-on-insert shape).
    "j2_semi_join" -> Q(
      (s, d) => {
        import s.implicits._
        val su = Tables.supplier(s, d)
        val li = Tables.lineitem(s, d).select($"l_suppkey")
        su.join(li, su("s_suppkey") === li("l_suppkey"), "left_semi")
          .select($"s_suppkey", $"s_name")
          .orderBy($"s_suppkey")
      },
      Some("""SELECT s_suppkey, s_name FROM supplier s
        WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)
        ORDER BY s_suppkey"""),
      "semi-join / EXISTS dedup-on-insert shape (ref main.py:151)"),

    // Multi-way star join with broadcast dims; group on the smallest dim.
    "j3_star_join" -> Q(
      (s, d) => {
        import s.implicits._
        val c = Tables.customer(s, d)
        val n = Tables.nation(s, d)
        val r = Tables.region(s, d)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy($"r_name")
          .agg(count(lit(1)).as("n_customers"),
            dbl(dec38(sum(dec($"c_acctbal")))).as("total_acctbal"))
          .orderBy($"r_name")
      },
      Some("""SELECT r_name, COUNT(*) AS n_customers,
        CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total_acctbal
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name ORDER BY r_name"""),
      "star join, both dims broadcast"),

    // J4 audit old-vs-new diff (ref 7a8b9c0d1e2f:24-35): snapshot join where
    // state differs → (key, old, new).
    "j4_audit_diff" -> Q(
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val oldS = ev.filter($"event_id" % 2 === 0).groupBy($"user_id")
          .agg(max(dec($"value")).as("old_value"))
        val newS = ev.filter($"event_id" % 2 === 1).groupBy($"user_id")
          .agg(max(dec($"value")).as("new_value"))
        oldS.join(newS, Seq("user_id"))
          .filter($"old_value" =!= $"new_value")
          .select($"user_id", dbl($"old_value").as("old_value"),
            dbl($"new_value").as("new_value"))
          .orderBy($"user_id")
      },
      Some("""WITH olds AS (
          SELECT user_id, MAX(CAST(value AS DECIMAL(20,4))) AS old_value
          FROM events WHERE event_id % 2 = 0 GROUP BY user_id),
        news AS (
          SELECT user_id, MAX(CAST(value AS DECIMAL(20,4))) AS new_value
          FROM events WHERE event_id % 2 = 1 GROUP BY user_id)
        SELECT olds.user_id AS user_id, CAST(old_value AS DOUBLE) AS old_value,
          CAST(new_value AS DOUBLE) AS new_value
        FROM olds JOIN news USING (user_id)
        WHERE old_value != new_value ORDER BY user_id"""),
      "audit old-vs-new snapshot diff (ref 7a8b9c0d1e2f:24-35)"),

    // ───── sinks as set algebra (SURVEY §2.1) ─────

    // S5 insert-if-absent (ref main.py:142-163): existing ∪ (incoming ⟕̸ existing).
    "s5_insert_if_absent" -> Q(
      (s, d) => {
        import s.implicits._
        val ev = Tables.events(s, d)
        val existing = ev.filter($"event_id" < 5000).select($"event_id", $"event_type")
        val incoming = ev.filter($"event_id" >= 2500).select($"event_id", $"event_type")
        existing.unionByName(
            incoming.join(existing.select($"event_id"), Seq("event_id"), "left_anti"))
          .orderBy($"event_id")
      },
      Some("""SELECT event_id, event_type FROM events WHERE event_id < 5000
        UNION ALL
        SELECT e.event_id, e.event_type FROM events e
        WHERE e.event_id >= 2500 AND NOT EXISTS
          (SELECT 1 FROM events x WHERE x.event_id < 5000 AND x.event_id = e.event_id)
        ORDER BY event_id"""),
      "insert-if-absent sink semantics (ref main.py:142-163)"),

    // S6/J3 last-writer-wins upsert (ref src/transform.py:240-334): one row
    // per key, newest by event time. W1's ranked-dedup shape generalized.
    "s6_upsert_lastwins" -> Q(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
        Tables.events(s, d)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"user_id", $"event_id", $"event_type")
          .orderBy($"user_id")
      },
      Some("""SELECT user_id, event_id, event_type FROM (
          SELECT user_id, event_id, event_type,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) DESC, event_id DESC) AS rn
          FROM events) t WHERE rn = 1 ORDER BY user_id"""),
      "last-writer-wins upsert (ref src/transform.py:240-334)"),

    // ───── window / dedup (SURVEY §2.5) ─────

    // W1 DISTINCT ON priority dedup (ref b80da1af78f7:22-43): one winner per
    // group by explicit priority order.
    "w1_priority_dedup" -> Q(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"c_nationkey").orderBy($"c_acctbal".desc, $"c_custkey")
        Tables.customer(s, d)
          .withColumn("rn", row_number().over(w))
          .filter($"rn" === 1)
          .select($"c_nationkey", $"c_custkey", $"c_name", $"c_acctbal")
          .orderBy($"c_nationkey")
      },
      Some("""SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM (
          SELECT *, ROW_NUMBER() OVER
            (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
          FROM customer) t WHERE rn = 1 ORDER BY c_nationkey"""),
      "DISTINCT ON priority dedup (ref b80da1af78f7:22-43)"),

    // Running total — frame-spec window (engine extension beyond the ref).
    "w2_running_total" -> Q(
      (s, d) => {
        import s.implicits._
        val w = Window.partitionBy($"user_id").orderBy($"event_id")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("running_value", dbl(dec38(sum(dec($"value")).over(w))))
          .select($"user_id", $"event_id", $"running_value")
          .orderBy($"user_id", $"event_id")
      },
      Some("""SELECT user_id, event_id,
        CAST(CAST(SUM(CAST(value AS DECIMAL(20,4))) OVER
          (PARTITION BY user_id ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DECIMAL(38,4)) AS DOUBLE) AS running_value
        FROM events ORDER BY user_id, event_id"""),
      "running-total frame window (engine extension)"),

    // ───── sort / limit (SURVEY §2.6) ─────

    "o1_topk_orders" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.orders(s, d)
          .orderBy($"o_totalprice".desc, $"o_orderkey")
          .select($"o_orderkey", $"o_totalprice")
          .limit(10)
      },
      Some("""SELECT o_orderkey, o_totalprice FROM orders
        ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"""),
      "top-k via TakeOrderedAndProject (no full sort at scale)"),

    // ───── set ops (SURVEY §2.7) ─────

    // U1 UNION ALL of explicit/implicit dimension rows (ref b80da1af78f7:41).
    "u1_union_dims" -> Q(
      (s, d) => {
        import s.implicits._
        val manual = Tables.supplier(s, d)
          .select($"s_name".as("name"), lit("manual").as("origin"))
        val derived = Tables.customer(s, d)
          .select($"c_name".as("name"), lit("transaction").as("origin"))
        manual.unionByName(derived).orderBy($"name", $"origin")
      },
      Some("""SELECT s_name AS name, 'manual' AS origin FROM supplier
        UNION ALL
        SELECT c_name AS name, 'transaction' AS origin FROM customer
        ORDER BY name, origin"""),
      "UNION ALL dimension fusion (ref b80da1af78f7:41)"),

    // ───── scalar functions w/ SQL-checkable parity (SURVEY §2.8) ─────

    // F1 (partial) date format round-trip dd.MM.yyyy (ref src/transform.py:18-40).
    "f1_date_roundtrip" -> Q(
      (s, d) => {
        import s.implicits._
        graft.operators.Par.fan(Tables.orders(s, d))
          .select($"o_orderkey",
            date_format(
              to_timestamp(date_format($"o_orderdate", "dd.MM.yyyy"), "dd.MM.yyyy"),
              "yyyy-MM-dd").as("parsed_date"))
          .orderBy($"o_orderkey")
      },
      Some("""SELECT o_orderkey,
        strftime(strptime(strftime(o_orderdate, '%d.%m.%Y'), '%d.%m.%Y'), '%Y-%m-%d') AS parsed_date
        FROM orders ORDER BY o_orderkey"""),
      "dd.MM.yyyy parse round-trip (ref src/transform.py:30-36)"),

    // F6 MD5 content hash (ref src/utils.py:14-19).
    "f6_md5_hash" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.documents(s, d)
          .select($"doc_id", md5($"text").as("content_hash"))
          .orderBy($"doc_id")
      },
      Some("SELECT doc_id, md5(text) AS content_hash FROM documents ORDER BY doc_id"),
      "MD5 content hash (ref src/utils.py:14-19)"),

    // F17 zero-padded PK synthesis (ref gas/pk_master.gs:8-12).
    "f17_format_pk" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.supplier(s, d)
          .select($"s_suppkey", format_string("sa_%06d", $"s_suppkey").as("pk"))
          .orderBy($"s_suppkey")
      },
      Some("SELECT s_suppkey, printf('sa_%06d', s_suppkey) AS pk FROM supplier ORDER BY s_suppkey"),
      "zero-padded surrogate PK format (ref gas/pk_master.gs:8-12)"),

    // ───── streaming-equivalent batch window (SURVEY §2.9) ─────

    // Tumbling 5-minute event-time window; same grouping a Structured
    // Streaming query uses (graft.streaming). Bucket derived from integer
    // nanos on both sides.
    "st1_tumbling_window" -> Q(
      (s, d) => {
        import s.implicits._
        Tables.events(s, d)
          .withColumn("ts_utc", Qh.tsFromNanos($"ts"))
          .groupBy(window($"ts_utc", "5 minutes").getField("start").as("bucket_start"),
            $"event_type")
          .agg(count(lit(1)).as("n"), dbl(dec38(sum(dec($"value")))).as("total_value"))
          .select(date_format($"bucket_start", "yyyy-MM-dd HH:mm:ss").as("bucket"),
            $"event_type", $"n", $"total_value")
          .orderBy($"bucket", $"event_type")
      },
      Some("""SELECT strftime(make_timestamp((epoch_ns(ts) // 300000000000) * 300000000),
          '%Y-%m-%d %H:%M:%S') AS bucket,
        event_type, COUNT(*) AS n,
        CAST(CAST(SUM(CAST(value AS DECIMAL(20,4))) AS DECIMAL(38,4)) AS DOUBLE) AS total_value
        FROM events GROUP BY 1, 2 ORDER BY bucket, event_type"""),
      "tumbling event-time window, batch flavor of the streaming agg"),
  )
}

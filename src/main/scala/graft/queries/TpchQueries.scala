package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Round-12 completion of the TPC-H-shaped analytics suite. The suite
  * already carried Q1/Q3/Q5/Q17/Q18/Q21; this file adds the other 16 —
  * all 22 canonical shapes are now registered and oracle-gated.
  *
  * Columns/tables the reduced star schema (TESTDATA.md) lacks are
  * substituted with shape-preserving surrogates, noted per query: the
  * distinct shipped (part, supplier) pairs stand in for partsupp
  * (Q2/Q16/Q20), shipped value for supply-side stock value (Q11),
  * ship-delay buckets for l_shipmode (Q12), shipped-late for
  * commit/receipt lateness (Q4), retail cost for ps_supplycost (Q9),
  * nation keys for phone country codes (Q22). Every surrogate keeps the
  * query's PLAN shape — the thing being engineered — intact:
  * decorrelated min-by-group (Q2), scalar-threshold HAVING (Q11),
  * anti-joined exclusion under a distinct count (Q16), semi-join volume
  * threshold (Q20).
  *
  * Scale doctrine (the point of the file): `broadcast` hints ONLY on
  * frames whose cardinality does not grow with scale factor — nation
  * (25), region (5), and 1-row scalar aggregates. customer/part/
  * supplier GROW with SF, and Spark honors an explicit hint even when
  * the build side no longer fits — at 100 TB a hard-coded
  * broadcast(customer) is an OOM, so those joins are left to the
  * optimizer: statistics pick broadcast at these SFs (the plans below
  * are all-BHJ), AQE flips to sort-merge when a dim outgrows the
  * threshold, and PlanSpec pins that the flip changes no answers.
  * Every fact-side aggregate is decimal-exact with map-side partial
  * agg; correlated subqueries arrive DECORRELATED (the Q17
  * adjudication) — per-group aggregates computed once and joined back,
  * never re-evaluated per probe row; scalar subqueries are 1-row
  * broadcast cross joins, never collected.
  *
  * Oracle parity: money sums render via decStr (exact decimal strings —
  * scale-8 unscaled values exceed 2^53 at sf0.1, where double conversion
  * diverges by 1 ulp); ratios (Q8/Q14) funnel both operands through
  * DECIMAL(18,6) before ONE double division (the proven cl1 protocol);
  * counts are BIGINT on both engines (DuckDB SUM(int) is HUGEINT —
  * always cast).
  */
object TpchQueries {
  import Qh._

  private def ts(s: String) = lit(s).cast(TimestampType)

  val all: Map[String, Q] = Map(

    // ───── Q2: min-cost supplier (partsupp surrogate) ─────
    // The shipped-pairs dedup (distinct l_partkey × l_suppkey) is the
    // partsupp surrogate; the correlated MIN subquery is decorrelated
    // into one per-part aggregate joined back on equality — computed
    // once, not per candidate row. The part slice and the EUROPE
    // supplier slice broadcast by statistics at these SFs; the only
    // fact-sized shuffle is the pair dedup itself.
    "q2_min_cost_supplier" -> Q(
      (s, d) => {
        val ps = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val supEu = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("s_suppkey"), col("s_acctbal"), col("s_name"), col("n_name"))
        val p = Tables.part(s, d).filter(col("p_size") === 15)
          .select(col("p_partkey"), col("p_name"))
        val cand = ps
          .join(p, col("l_partkey") === col("p_partkey"))
          .join(supEu, col("l_suppkey") === col("s_suppkey"))
        val mn = cand.groupBy(col("p_partkey").as("mp"))
          .agg(min(col("s_acctbal")).as("min_bal"))
        cand.join(mn, col("p_partkey") === col("mp") && col("s_acctbal") === col("min_bal"))
          .select(col("s_acctbal"), col("s_name"), col("n_name"), col("p_partkey"), col("p_name"))
          .orderBy(col("s_acctbal").desc, col("s_name"), col("p_partkey"))
          .limit(100)
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
          sup_eu AS (SELECT s_suppkey, s_acctbal, s_name, n_name
            FROM supplier JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey WHERE r_name = 'EUROPE'),
          cand AS (SELECT p_partkey, p_name, s_acctbal, s_name, n_name
            FROM ps JOIN part ON l_partkey = p_partkey
            JOIN sup_eu ON l_suppkey = s_suppkey
            WHERE p_size = 15),
          mn AS (SELECT p_partkey AS mp, MIN(s_acctbal) AS min_bal FROM cand GROUP BY 1)
        SELECT s_acctbal, s_name, n_name, p_partkey, p_name
        FROM cand JOIN mn ON p_partkey = mp AND s_acctbal = min_bal
        ORDER BY s_acctbal DESC, s_name, p_partkey LIMIT 100"""),
      "TPC-H Q2-shaped decorrelated min-by-group over the shipped-pairs partsupp surrogate"),

    // ───── Q4: order priority checking (EXISTS semi join) ─────
    // "Late" = any line shipped >60 days after the order date (this
    // schema has no commit/receipt dates — the q21 adjudication). The
    // EXISTS is a left-semi join carrying two longs + one date per row;
    // the quarter filter prunes orders before the probe.
    "q4_order_priority" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1996-07-01") &&
            col("o_orderdate") < ts("1996-10-01"))
          .select(col("o_orderkey"), col("o_orderdate"), col("o_orderpriority"))
        val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_shipdate"))
        o.join(li,
            col("o_orderkey") === col("l_orderkey") &&
              col("l_shipdate") > date_add(col("o_orderdate"), 60), "left_semi")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("order_count"))
          .orderBy(col("o_orderpriority"))
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS order_count FROM orders
        WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1996-10-01'
          AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
            AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        GROUP BY 1 ORDER BY 1"""),
      "TPC-H Q4-shaped EXISTS semi join: late-line orders per priority"),

    // ───── Q6: forecasting revenue change (pure scan) ─────
    // The pushdown showcase: all three predicates reach the parquet
    // scan (PushedFilters), the projection reads four columns, and the
    // whole plan is one WholeStageCodegen span over a partial+final agg
    // — the cheapest possible shape for a 100 TB fact scan.
    "q6_forecast_revenue" -> Q(
      (s, d) => {
        Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-01-01") &&
            col("l_shipdate") < ts("1997-01-01") &&
            col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
          .agg(decStr(dec38(sum(dec(col("l_extendedprice")) * dec(col("l_discount"), 10, 4)), 8))
              .as("revenue"),
            count(lit(1)).as("n_items"))
      },
      Some("""SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * CAST(l_discount AS DECIMAL(10,4))) AS DECIMAL(38,8)) AS VARCHAR) AS revenue,
          COUNT(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24"""),
      "TPC-H Q6: single-scan filtered aggregate, all predicates pushed to parquet"),

    // ───── Q7: volume shipping between two nations ─────
    // The nation-pair disjunction filters through two BROADCAST copies
    // of nation (25 rows) hung off supplier and customer; the only
    // fact-sized shuffle is lineitem ⋈ orders on the order key.
    "q7_volume_shipping" -> Q(
      (s, d) => {
        val n1 = Tables.nation(s, d)
          .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))
        val n2 = Tables.nation(s, d)
          .select(col("n_nationkey").as("cnk"), col("n_name").as("cust_nation"))
        val sup = Tables.supplier(s, d)
          .join(broadcast(n1), col("s_nationkey") === col("snk"))
          .select(col("s_suppkey"), col("supp_nation"))
        val cust = Tables.customer(s, d)
          .join(broadcast(n2), col("c_nationkey") === col("cnk"))
          .select(col("c_custkey"), col("cust_nation"))
        val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1998-01-01"))
          .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"),
            col("l_extendedprice"), col("l_discount"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(sup, col("l_suppkey") === col("s_suppkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .filter((col("supp_nation") === "NATION_3" && col("cust_nation") === "NATION_7") ||
            (col("supp_nation") === "NATION_7" && col("cust_nation") === "NATION_3"))
          .groupBy(col("supp_nation"), col("cust_nation"),
            year(col("l_shipdate")).cast(LongType).as("l_year"))
          .agg(decStr(dec38(sum(revenue(col("l_extendedprice"), col("l_discount"))), 8))
              .as("revenue"),
            count(lit(1)).as("n_lines"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l_shipdate) AS BIGINT) AS l_year,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(10,4)))) AS DECIMAL(38,8)) AS VARCHAR) AS revenue,
          COUNT(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation n1 ON s_nationkey = n1.n_nationkey
        JOIN nation n2 ON c_nationkey = n2.n_nationkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
          AND ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
            OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
        GROUP BY 1, 2, 3 ORDER BY 1, 2, 3"""),
      "TPC-H Q7-shaped bidirectional nation-pair trade volume by ship year"),

    // ───── Q8: national market share ─────
    // Ratio parity: numerator and denominator are decimal-exact sums,
    // funneled through DECIMAL(18,6) before the ONE double division —
    // scale-8 unscaled values exceed 2^53 at sf0.1 where double
    // conversion diverges by 1 ulp (the Qh.dbl caveat).
    "q8_market_share" -> Q(
      (s, d) => {
        val custEu = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
            col("n_regionkey") === col("r_regionkey"))
          .select(col("c_custkey"))
        val suppN = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
              .select(col("n_nationkey").as("snk"), col("n_name").as("supp_nation"))),
            col("s_nationkey") === col("snk"))
          .select(col("s_suppkey"), col("supp_nation"))
        val p = Tables.part(s, d).filter(col("p_type") === "STANDARD").select(col("p_partkey"))
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1998-01-01"))
          .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_extendedprice"), col("l_discount"))
        val rev = revenue(col("l_extendedprice"), col("l_discount"))
        val d186 = (c: Column) => dbl(c.cast(DecimalType(18, 6)))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(custEu, col("o_custkey") === col("c_custkey"))
          .join(suppN, col("l_suppkey") === col("s_suppkey"))
          .groupBy(year(col("o_orderdate")).cast(LongType).as("o_year"))
          .agg(dec38(coalesce(sum(when(col("supp_nation") === "NATION_8", rev)), lit(0)), 8).as("num_d"),
            dec38(sum(rev), 8).as("den_d"),
            count(lit(1)).as("n_lines"))
          .select(col("o_year"), (d186(col("num_d")) / d186(col("den_d"))).as("mkt_share"),
            col("n_lines"))
          .orderBy(col("o_year"))
      },
      Some("""WITH vol AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
            CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(10,4))) AS rev,
            n2.n_name AS supp_nation
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN part ON l_partkey = p_partkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation n1 ON c_nationkey = n1.n_nationkey
          JOIN region ON n1.n_regionkey = r_regionkey
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation n2 ON s_nationkey = n2.n_nationkey
          WHERE r_name = 'EUROPE' AND p_type = 'STANDARD'
            AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1998-01-01')
        SELECT o_year,
          CAST(CAST(CAST(COALESCE(SUM(CASE WHEN supp_nation = 'NATION_8' THEN rev END), 0) AS DECIMAL(38,8)) AS DECIMAL(18,6)) AS DOUBLE)
            / CAST(CAST(CAST(SUM(rev) AS DECIMAL(38,8)) AS DECIMAL(18,6)) AS DOUBLE) AS mkt_share,
          COUNT(*) AS n_lines
        FROM vol GROUP BY 1 ORDER BY 1"""),
      "TPC-H Q8-shaped market share: one nation's slice of a region's filtered trade per year"),

    // ───── Q9: product-type profit (cost surrogate) ─────
    // ps_supplycost does not exist in this star; retail value of the
    // shipped quantity stands in as the cost term (profit = discounted
    // revenue − retail cost — semantics-preserving: a per-line decimal
    // expression joined from the part dim). Grouped by supplier nation ×
    // order year over the 'red%' part slice.
    "q9_product_profit" -> Q(
      (s, d) => {
        val p = Tables.part(s, d).filter(col("p_name").startsWith("red"))
          .select(col("p_partkey"), col("p_retailprice"))
        val suppN = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)
              .select(col("n_nationkey").as("snk"), col("n_name"))),
            col("s_nationkey") === col("snk"))
          .select(col("s_suppkey"), col("n_name"))
        val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"))
        val li = Tables.lineitem(s, d)
          .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
            col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        val profit = revenue(col("l_extendedprice"), col("l_discount")) -
          dec(col("p_retailprice")) * dec(col("l_quantity"), 10, 4)
        li.join(p, col("l_partkey") === col("p_partkey"))
          .join(o, col("l_orderkey") === col("o_orderkey"))
          .join(suppN, col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("n_name").as("nation"),
            year(col("o_orderdate")).cast(LongType).as("o_year"))
          .agg(decStr(dec38(sum(profit), 8)).as("sum_profit"), count(lit(1)).as("n_lines"))
          .orderBy(col("nation"), col("o_year").desc)
      },
      Some("""SELECT n_name AS nation, CAST(year(o_orderdate) AS BIGINT) AS o_year,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(10,4)))
            - CAST(p_retailprice AS DECIMAL(20,4)) * CAST(l_quantity AS DECIMAL(10,4))) AS DECIMAL(38,8)) AS VARCHAR) AS sum_profit,
          COUNT(*) AS n_lines
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN part ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation ON s_nationkey = n_nationkey
        WHERE p_name LIKE 'red%'
        GROUP BY 1, 2 ORDER BY 1, 2 DESC"""),
      "TPC-H Q9-shaped profit rollup by supplier nation × year (retail-cost surrogate)"),

    // ───── Q10: returned-item losses ─────
    // Aggregate BEFORE the wide projection: the revenue rollup groups on
    // c_custkey alone, and the name/balance/nation columns ride the
    // customer broadcast — the top-20 cap is TakeOrderedAndProject.
    "q10_returned_items" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("1996-10-01") && col("o_orderdate") < ts("1997-01-01"))
          .select(col("o_orderkey"), col("o_custkey"))
        val li = Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
          .select(col("l_orderkey"), col("l_extendedprice"), col("l_discount"))
        val cust = Tables.customer(s, d)
          .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
          .select(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .join(cust, col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
          .agg(dec38(sum(revenue(col("l_extendedprice"), col("l_discount"))), 8).as("rev_d"))
          .orderBy(col("rev_d").desc, col("c_custkey"))
          .limit(20)
          .select(col("c_custkey"), col("c_name"), decStr(col("rev_d")).as("revenue"),
            col("c_acctbal"), col("n_name"))
      },
      Some("""WITH agg AS (
          SELECT c_custkey, c_name, c_acctbal, n_name,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(10,4)))) AS DECIMAL(38,8)) AS rev_d
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE o_orderdate >= TIMESTAMP '1996-10-01' AND o_orderdate < TIMESTAMP '1997-01-01'
            AND l_returnflag = 'R'
          GROUP BY 1, 2, 3, 4
          ORDER BY rev_d DESC, c_custkey LIMIT 20)
        SELECT c_custkey, c_name, CAST(rev_d AS VARCHAR) AS revenue, c_acctbal, n_name FROM agg"""),
      "TPC-H Q10-shaped returned-revenue ranking: quarter of orders, R-flag lines, top 20"),

    // ───── Q11: important parts (shipped-value surrogate) ─────
    // Q11's shape is the scalar-subquery-in-HAVING: per-group value vs a
    // fraction of the GLOBAL total. With no partsupp, value = retail
    // value of the quantity one nation's suppliers shipped per part. The
    // total is the per-part aggregate RE-aggregated (one k-row pass),
    // broadcast as a 1-row cross join; the threshold compare funnels
    // both sides through DECIMAL(18,2)→DOUBLE so the (0.002 × total)
    // multiply is the identical double op sequence on both engines.
    "q11_important_parts" -> Q(
      (s, d) => {
        val supN = Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")),
            col("s_nationkey") === col("n_nationkey"))
          .select(col("s_suppkey"))
        val p = Tables.part(s, d).select(col("p_partkey"), col("p_retailprice"))
        val value = dec(col("l_quantity"), 10, 4) * dec(col("p_retailprice"))
        val vals = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
          .join(supN, col("l_suppkey") === col("s_suppkey"))
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_partkey"))
          .agg(dec38(sum(value), 8).as("value_d"))
        val tot = vals.agg(dbl(dec(sum(col("value_d")), 18, 2)).as("total"))
        vals.crossJoin(broadcast(tot))
          .filter(dbl(dec(col("value_d"), 18, 2)) > lit(0.002) * col("total"))
          .select(col("l_partkey").as("p_partkey"), decStr(col("value_d")).as("value"),
            col("value_d"))
          .orderBy(col("value_d").desc, col("p_partkey"))
          .drop("value_d")
      },
      Some("""WITH val AS (
          SELECT l_partkey, CAST(SUM(CAST(l_quantity AS DECIMAL(10,4)) * CAST(p_retailprice AS DECIMAL(20,4))) AS DECIMAL(38,8)) AS value_d
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN part ON l_partkey = p_partkey
          WHERE n_name = 'NATION_3' GROUP BY 1),
         tot AS (SELECT CAST(CAST(SUM(value_d) AS DECIMAL(18,2)) AS DOUBLE) AS total FROM val)
        SELECT p_partkey, value FROM (
          SELECT l_partkey AS p_partkey, CAST(value_d AS VARCHAR) AS value, value_d
          FROM val, tot WHERE CAST(CAST(value_d AS DECIMAL(18,2)) AS DOUBLE) > 0.002 * total
          ORDER BY value_d DESC, l_partkey)"""),
      "TPC-H Q11-shaped value-share threshold: per-part aggregate vs broadcast global total"),

    // ───── Q12: shipping-delay priority classes ─────
    // l_shipmode does not exist; ship-delay buckets (≤30 / ≤90 / >90
    // days from order to ship) are the mode surrogate. One fact-fact
    // join projected to three columns, then a 3-group hash agg of CASE
    // counts. Midnight-aligned timestamps make datediff == DuckDB
    // date_diff('day') exactly.
    "q12_priority_shipping" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_orderdate"),
          col("o_orderpriority"))
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01"))
          .select(col("l_orderkey"), col("l_shipdate"))
        val delay = datediff(col("l_shipdate").cast(DateType), col("o_orderdate").cast(DateType))
        val hi = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        li.join(o, col("l_orderkey") === col("o_orderkey"))
          .select(when(delay <= 30, "fast").when(delay <= 90, "medium").otherwise("slow")
              .as("ship_bucket"),
            when(hi, 1L).otherwise(0L).as("hi"), when(hi, 0L).otherwise(1L).as("lo"))
          .groupBy(col("ship_bucket"))
          .agg(sum(col("hi")).as("high_line_count"), sum(col("lo")).as("low_line_count"))
          .orderBy(col("ship_bucket"))
      },
      Some("""SELECT CASE WHEN date_diff('day', o_orderdate, l_shipdate) <= 30 THEN 'fast'
            WHEN date_diff('day', o_orderdate, l_shipdate) <= 90 THEN 'medium'
            ELSE 'slow' END AS ship_bucket,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        GROUP BY 1 ORDER BY 1"""),
      "TPC-H Q12-shaped priority split by ship-delay bucket (shipmode surrogate)"),

    // ───── Q13: customer order-count distribution ─────
    // The one outer join in the canonical suite: customers LEFT JOIN a
    // priority-filtered orders projection, two-stage aggregate (orders
    // per customer → customers per count). count(o_orderkey) over the
    // null-extended rows lands the zero bucket exactly.
    "q13_customer_distribution" -> Q(
      (s, d) => {
        val o = Tables.orders(s, d)
          .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
          .select(col("o_orderkey"), col("o_custkey"))
        Tables.customer(s, d).select(col("c_custkey"))
          .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
          .groupBy(col("c_custkey"))
          .agg(count(col("o_orderkey")).as("c_count"))
          .groupBy(col("c_count"))
          .agg(count(lit(1)).as("custdist"))
          .orderBy(col("custdist").desc, col("c_count").desc)
      },
      Some("""WITH o AS (SELECT o_orderkey, o_custkey FROM orders
            WHERE o_orderpriority <> '4-NOT SPECIFIED'),
          co AS (SELECT c_custkey, COUNT(o_orderkey) AS c_count
            FROM customer LEFT JOIN o ON c_custkey = o_custkey
            GROUP BY 1)
        SELECT c_count, COUNT(*) AS custdist FROM co
        GROUP BY 1 ORDER BY custdist DESC, c_count DESC"""),
      "TPC-H Q13-shaped outer-join histogram: order counts per customer, customers per count"),

    // ───── Q14: promotion effect (ratio) ─────
    "q14_promo_revenue" -> Q(
      (s, d) => {
        val p = Tables.part(s, d).select(col("p_partkey"), col("p_type"))
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-03-01") && col("l_shipdate") < ts("1996-04-01"))
          .select(col("l_partkey"), col("l_extendedprice"), col("l_discount"))
        val rev = revenue(col("l_extendedprice"), col("l_discount"))
        val d186 = (c: Column) => dbl(c.cast(DecimalType(18, 6)))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .agg(dec38(coalesce(sum(when(col("p_type") === "PROMO", rev)), lit(0)), 8).as("num_d"),
            dec38(sum(rev), 8).as("den_d"), count(lit(1)).as("n_lines"))
          .select(decStr(col("num_d")).as("promo_revenue"),
            (lit(100) * d186(col("num_d")) / d186(col("den_d"))).as("promo_share"),
            col("n_lines"))
      },
      Some("""SELECT
          CAST(CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(10,4))) END), 0) AS DECIMAL(38,8)) AS VARCHAR) AS promo_revenue,
          100 * CAST(CAST(CAST(COALESCE(SUM(CASE WHEN p_type = 'PROMO'
              THEN CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(10,4))) END), 0) AS DECIMAL(38,8)) AS DECIMAL(18,6)) AS DOUBLE)
            / CAST(CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(10,4)))) AS DECIMAL(38,8)) AS DECIMAL(18,6)) AS DOUBLE) AS promo_share,
          COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01'"""),
      "TPC-H Q14-shaped promo revenue share for one ship month"),

    // ───── Q15: top supplier (scalar-max view) ─────
    // The revenue "view" is one per-supplier aggregate; the scalar MAX
    // is a 1-row broadcast cross join compared on the exact DECIMAL —
    // never collected, ties kept (the spec's ties-possible semantics).
    "q15_top_supplier" -> Q(
      (s, d) => {
        val r = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1996-04-01"))
          .groupBy(col("l_suppkey"))
          .agg(dec38(sum(revenue(col("l_extendedprice"), col("l_discount"))), 8).as("rev_d"))
        val mx = r.agg(max(col("rev_d")).as("mx"))
        r.crossJoin(broadcast(mx)).filter(col("rev_d") === col("mx"))
          .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
          .select(col("s_suppkey"), col("s_name"), decStr(col("rev_d")).as("total_revenue"))
          .orderBy(col("s_suppkey"))
      },
      Some("""WITH r AS (
          SELECT l_suppkey,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(10,4)))) AS DECIMAL(38,8)) AS rev_d
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY 1),
         m AS (SELECT MAX(rev_d) AS mx FROM r)
        SELECT s_suppkey, s_name, CAST(rev_d AS VARCHAR) AS total_revenue
        FROM r JOIN m ON rev_d = mx
        JOIN supplier ON l_suppkey = s_suppkey
        ORDER BY s_suppkey"""),
      "TPC-H Q15-shaped quarterly top supplier via broadcast scalar max"),

    // ───── Q16: supplier counts by part attribute (partsupp surrogate) ─────
    // The shipped-pairs dedup again stands in for partsupp; "complaint"
    // suppliers become negative-balance ones, excluded by ANTI join
    // (NOT IN over a nullable-free key — anti join is the
    // null-safe/scalable form). The distinct-count groups on three part
    // attributes riding the part broadcast.
    "q16_supplier_counts" -> Q(
      (s, d) => {
        val ps = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_suppkey")).distinct()
        val bad = Tables.supplier(s, d).filter(col("s_acctbal") < 0)
          .select(col("s_suppkey"))
        val p = Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(1, 5, 9, 15, 21, 28, 36, 45))
          .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
        ps.join(bad, col("l_suppkey") === col("s_suppkey"), "left_anti")
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"), col("p_type"), col("p_size"))
          .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
          .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
      },
      Some("""WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
        SELECT p_brand, p_type, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
        FROM ps JOIN part ON l_partkey = p_partkey
        WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
          AND p_size IN (1, 5, 9, 15, 21, 28, 36, 45)
          AND NOT EXISTS (SELECT 1 FROM supplier
            WHERE s_suppkey = l_suppkey AND s_acctbal < 0)
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""),
      "TPC-H Q16-shaped distinct-supplier counts per part attribute, anti-joined exclusions"),

    // ───── Q19: discounted revenue (disjunctive brand/size/qty) ─────
    // The OR-of-ANDs predicate evaluates after the broadcast hash join
    // on the part key (the equi key factors out of all three branches —
    // Catalyst keeps the join equi, never a nested loop).
    "q19_discounted_revenue" -> Q(
      (s, d) => {
        val p = Tables.part(s, d).select(col("p_partkey"), col("p_brand"), col("p_size"))
        val li = Tables.lineitem(s, d)
          .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"), col("l_discount"))
        li.join(p, col("l_partkey") === col("p_partkey"))
          .filter(
            (col("p_brand") === "Brand#12" && col("p_size").between(1, 5) &&
              col("l_quantity").between(1, 11)) ||
            (col("p_brand") === "Brand#3" && col("p_size").between(1, 10) &&
              col("l_quantity").between(10, 20)) ||
            (col("p_brand") === "Brand#14" && col("p_size").between(1, 15) &&
              col("l_quantity").between(20, 30)))
          .agg(decStr(dec38(sum(revenue(col("l_extendedprice"), col("l_discount"))), 8))
              .as("revenue"),
            count(lit(1)).as("n_lines"))
      },
      Some("""SELECT CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(20,4)) * (1 - CAST(l_discount AS DECIMAL(10,4)))) AS DECIMAL(38,8)) AS VARCHAR) AS revenue,
          COUNT(*) AS n_lines
        FROM lineitem JOIN part ON l_partkey = p_partkey
        WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
           OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
           OR (p_brand = 'Brand#14' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)"""),
      "TPC-H Q19-shaped disjunctive predicate revenue over an equi part join"),

    // ───── Q20: excess shippers (partsupp surrogate) ─────
    // Availability becomes shipped volume: suppliers who moved >50 units
    // of any 'red%' part in the year, restricted to one region. The
    // inner aggregate groups on (suppkey, partkey) — fact-sized but
    // two-column — then collapses to a distinct supplier set that
    // LEFT-SEMI probes the 100-row supplier dim.
    "q20_excess_shippers" -> Q(
      (s, d) => {
        val p = Tables.part(s, d).filter(col("p_name").startsWith("red"))
          .select(col("p_partkey"))
        val shipped = Tables.lineitem(s, d)
          .filter(col("l_shipdate") >= ts("1996-01-01") && col("l_shipdate") < ts("1997-01-01"))
          .join(p, col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_suppkey"), col("l_partkey"))
          .agg(dec38(sum(dec(col("l_quantity"), 10, 4))).as("qty"))
          .filter(col("qty") > 50)
          .select(col("l_suppkey")).distinct()
        Tables.supplier(s, d)
          .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
          .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AFRICA")),
            col("n_regionkey") === col("r_regionkey"))
          .join(shipped, col("s_suppkey") === col("l_suppkey"), "left_semi")
          .select(col("s_name"), col("n_name"))
          .orderBy(col("s_name"))
      },
      Some("""WITH shipped AS (
          SELECT l_suppkey, l_partkey,
            CAST(SUM(CAST(l_quantity AS DECIMAL(10,4))) AS DECIMAL(38,4)) AS qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          WHERE p_name LIKE 'red%'
            AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
          GROUP BY 1, 2)
        SELECT s_name, n_name
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        WHERE r_name = 'AFRICA'
          AND EXISTS (SELECT 1 FROM shipped WHERE l_suppkey = s_suppkey AND qty > 50)
        ORDER BY s_name"""),
      "TPC-H Q20-shaped volume-threshold supplier selection (shipped-volume surrogate)"),

    // ───── Q1 under incremental view maintenance ─────
    // The stored mart (DECIMAL partials through 1998-01-01, 6 rows)
    // absorbs the 1998 delta slice at serve time — the only fact rows
    // read are the delta's (ship-date predicate pushed to parquet;
    // IncrementalMartSpec pins the pushdown, advance == rebuild, and
    // empty-delta fixed points). Gated on q1's ORACLE VERBATIM — the
    // d30/ann8 shared-oracle doctrine applied to view maintenance:
    // exact decimal partials are abelian, so state ⊕ delta equals the
    // full recompute bit for bit.
    "q1_incremental_mart" -> Q(
      (s, d) => graft.marts.TpchMart.q1Maintained(s, d,
        Tables.lineitem(s, d), "1998-01-01", "1998-09-02"),
      CoreQueries.all("q1_pricing_summary").oracle,
      "TPC-H Q1 served from a maintained mart: stored decimal partials ⊕ delta slice"),

    // ───── Q22: global sales opportunity ─────
    // Country codes become nation keys. The positive-balance average is
    // a decimal-exact scalar broadcast (the Q17 protocol); dormancy is
    // an ANTI join against recent orders, carrying one long per probe.
    "q22_global_sales" -> Q(
      (s, d) => {
        val nats = Seq(1, 5, 9, 13, 17).map(lit(_))
        val cust = Tables.customer(s, d).filter(col("c_nationkey").isin(nats: _*))
          .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
        val avgBal = cust.filter(col("c_acctbal") > 0)
          .agg((dbl(dec38(sum(dec(col("c_acctbal"))))) / count(lit(1))).as("avg_bal"))
        val recent = Tables.orders(s, d)
          .filter(col("o_orderdate") >= ts("2000-07-01")).select(col("o_custkey"))
        cust.crossJoin(broadcast(avgBal))
          .filter(col("c_acctbal") > col("avg_bal"))
          .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
          .groupBy(col("c_nationkey"))
          .agg(count(lit(1)).as("numcust"),
            decStr(dec38(sum(dec(col("c_acctbal"))))).as("totacctbal"))
          .orderBy(col("c_nationkey"))
      },
      Some("""WITH pos AS (
          SELECT CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DECIMAL(38,4)) AS DOUBLE) / COUNT(*) AS avg_bal
          FROM customer WHERE c_acctbal > 0 AND c_nationkey IN (1, 5, 9, 13, 17))
        SELECT c_nationkey, COUNT(*) AS numcust,
          CAST(CAST(SUM(CAST(c_acctbal AS DECIMAL(20,4))) AS DECIMAL(38,4)) AS VARCHAR) AS totacctbal
        FROM customer, pos
        WHERE c_nationkey IN (1, 5, 9, 13, 17) AND c_acctbal > avg_bal
          AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
            AND o_orderdate >= TIMESTAMP '2000-07-01')
        GROUP BY 1 ORDER BY 1"""),
      "TPC-H Q22-shaped dormant rich customers: scalar-avg broadcast + anti join"))
}

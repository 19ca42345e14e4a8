package graft
package entry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Ffiec, Text, Vectors}
import graft.operators.{CombineParts, Dedup, Graph, KeyChecks, Knn, LongPivot, Pq, Sampling, TextAnalytics}
import graft.sources.{Scan, XbrlZip}
import graft.streaming.Sessions

import graft.entry.EntryHelpers._

/** Gate registry, TPC-H planner shapes (Q2/Q4/Q6/Q7/Q8/Q9/Q11/Q12/
  * Q13/Q14/Q15/Q16/Q17/Q18/Q19/Q20/Q21/Q22) — moved verbatim out of
  * GatesAnalyticsShapes at round 14 (registry growth watch; zero
  * behavior change, every entry byte-identical at split time).
  * SparkEntry concatenates the family maps back into the driver
  * contract.
  */
private[graft] object GatesTpch {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

// TPC-H Q17 SHAPE: correlated scalar subquery (per-part average
    // quantity threshold) written AS SQL so Catalyst's decorrelation
    // (RewriteCorrelatedScalarSubquery) is the machinery under test —
    // the physical plan must be an aggregate-then-join, never a
    // per-row subquery (PlanSpec asserts). Arithmetic: quantities are
    // integral doubles, so SUM/AVG/0.2* replay bit-identically in
    // DuckDB; revenue sums exact integer cents.
    "q241_tpch_q17" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
                 AS sum_cents,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM g_lineitem JOIN g_part ON p_partkey = l_partkey
        WHERE p_brand = 'Brand#12' AND p_size < 15
          AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
                            FROM g_lineitem l2
                            WHERE l2.l_partkey = p_partkey)""")
    }),

// TPC-H Q18 SHAPE: group-filter-join-back — the IN subquery over
    // a HAVING aggregate plans as a semi-join on the aggregated key,
    // then the big three-way join re-aggregates. Quantities integral
    // -> exact long sums.
    "q242_tpch_q18" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      s.sql("""
        SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
               CAST(o_orderkey AS BIGINT) AS o_orderkey,
               CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
               CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        FROM g_customer, g_orders, g_lineitem
        WHERE o_orderkey IN (SELECT l_orderkey
                             FROM g_lineitem
                             GROUP BY l_orderkey
                             HAVING SUM(CAST(l_quantity AS BIGINT)) > 180)
          AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
        ORDER BY total_cents DESC, o_orderkey
        LIMIT 100""")
    }),

// TPC-H Q21 SHAPE: the double-correlated EXISTS / NOT EXISTS over
    // lineitem self-references — authored as SQL so Catalyst's
    // decorrelation (RewritePredicateSubquery: EXISTS → LeftSemi,
    // NOT EXISTS → LeftAnti, both with the <> residual) is the
    // machinery under test; PlanSpec asserts no per-row subquery and
    // no BNLJ survive. The synthetic lineitem has no
    // receipt/commit dates, so "late" is a fixed ship-date cutoff —
    // the correlation structure (same order, OTHER supplier, none of
    // the others late) is Q21's exactly.
    // TPC-H Q6 shape (forecasting revenue change — round 11,
    // completing the 22-query TPC-H sweep): the pure scan query —
    // date-range + discount-band + quantity filters, one global sum.
    // The discount band compares ROUNDED basis points on both
    // engines so no float boundary can flap; revenue sums exact
    // integer micro-cents (the q236 discipline). The plan is the
    // benchmark's point: filters push to the parquet scan, no
    // shuffle beyond the final partial-agg exchange.
    "q335_tpch_q6" -> ((s, dir) => {
      val bp = round(col("l_discount") * 10000).cast("long")
      t(s, dir, "lineitem")
        .where(col("l_shipdate") >= lit("1996-01-01").cast("timestamp_ntz")
          && col("l_shipdate") < lit("1997-01-01").cast("timestamp_ntz")
          && bp >= 500L && bp <= 700L && col("l_quantity") < 24)
        .agg(sum((round(col("l_extendedprice") * 100).cast("long") * bp)
          .cast(DecimalType(38, 0))).cast("long").as("revenue_e6"))
    }),

// TPC-H Q4 shape (order-priority checking — round 11): date-range
    // on orders + CORRELATED EXISTS against lineitem on a non-key
    // predicate (the schema ships no l_commitdate/l_receiptdate, so
    // "late line" is l_shipdate ≥ o_orderdate + 60 days — same
    // correlated-semi shape, outer column inside the subquery
    // predicate), then the per-priority count. Spark plans it as a
    // left-semi join with the date arithmetic in the join condition.
    "q336_tpch_q4" -> ((s, dir) => {
      val o = t(s, dir, "orders")
        .where(col("o_orderdate") >= lit("1996-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1996-04-01").cast("timestamp_ntz"))
      val l = t(s, dir, "lineitem").select(col("l_orderkey"), col("l_shipdate"))
      o.join(l, col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") >= col("o_orderdate") + expr("INTERVAL 60 DAY"),
          "left_semi")
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("order_count"))
        .orderBy("o_orderpriority")
    }),

"q248_tpch_q21" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      s.sql("""
        SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        FROM g_supplier, g_lineitem l1, g_orders
        WHERE s_suppkey = l1.l_suppkey
          AND o_orderkey = l1.l_orderkey
          AND o_orderstatus = 'F'
          AND l1.l_shipdate > TIMESTAMP '1997-01-01'
          AND EXISTS (SELECT 1 FROM g_lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM g_lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > TIMESTAMP '1997-01-01')
        GROUP BY s_name
        ORDER BY numwait DESC, s_name
        LIMIT 100""")
    }),

// TPC-H Q20 SHAPE: an IN-subquery that itself nests an IN plus a
    // CORRELATED scalar aggregate — multi-level decorrelation (the
    // synthetic schema has no partsupp, so the per-(part) half-average
    // threshold correlates on lineitem directly; the nesting depth is
    // Q20's). AVG over integral-valued doubles replays bit-identically
    // (exact partial sums), the q241 precedent.
    // TPC-H Q20, FULL FIDELITY (round 9 — derived partsupp): the
    // nested IN chain partsupp→part plus a TWO-KEY correlated scalar
    // SUM over lineitem (excess-inventory suppliers in one nation).
    // Spark must decorrelate the (l_partkey, l_suppkey) correlate to
    // a grouped aggregate re-joined on BOTH keys. Integer quantities;
    // a pair with no 1995 shipments yields NULL → excluded (both
    // engines agree on NULL comparison semantics here).
    "q251_tpch_q20" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      val nSup = t(s, dir, "supplier").count()
      s.sql(partsuppSparkSql(nSup)).createOrReplaceTempView("g_partsupp")
      s.sql("""
        SELECT s.s_name
        FROM g_supplier s JOIN g_nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_3'
          AND s.s_suppkey IN (
            SELECT ps.ps_suppkey FROM g_partsupp ps
            WHERE ps.ps_partkey IN (SELECT p_partkey FROM g_part
                                    WHERE p_name LIKE 'red%')
              AND 2 * ps.ps_availqty >
                (SELECT CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
                 FROM g_lineitem l
                 WHERE l.l_partkey = ps.ps_partkey
                   AND l.l_suppkey = ps.ps_suppkey
                   AND l.l_shipdate >= TIMESTAMP '1995-01-01'
                   AND l.l_shipdate < TIMESTAMP '1996-01-01'))
        ORDER BY s_name""")
    }),

// TPC-H Q2, FULL FIDELITY (round 9 — derived partsupp closes the
    // r8 schema gap): min-cost EUROPE supplier per qualifying part,
    // the correlated scalar MIN through a FOUR-TABLE join
    // (partsupp⋈supplier⋈nation⋈region) — the decorrelation must
    // aggregate over the whole snowflake and re-join on the outer
    // part key. Cost kept in integer cents (ps_supplycost_c).
    "q256_tpch_q2" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("g_part")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      t(s, dir, "region").createOrReplaceTempView("g_region")
      val nSup = t(s, dir, "supplier").count()
      s.sql(partsuppSparkSql(nSup)).createOrReplaceTempView("g_partsupp")
      s.sql("""
        SELECT CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents,
          s.s_name, n.n_name, p.p_partkey, ps.ps_supplycost_c
        FROM g_part p, g_supplier s, g_partsupp ps, g_nation n, g_region r
        WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
          AND p.p_size IN (5, 15, 25, 45) AND p.p_type LIKE '%MALL'
          AND s.s_nationkey = n.n_nationkey
          AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
          AND ps.ps_supplycost_c = (
            SELECT MIN(ps2.ps_supplycost_c)
            FROM g_partsupp ps2, g_supplier s2, g_nation n2, g_region r2
            WHERE ps2.ps_partkey = p.p_partkey
              AND s2.s_suppkey = ps2.ps_suppkey
              AND s2.s_nationkey = n2.n_nationkey
              AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
        ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
        LIMIT 100""")
    }),

// TPC-H Q11, FULL FIDELITY (round 9 — derived partsupp): one
    // nation's inventory value per part, filtered by an UNCORRELATED
    // scalar fraction of the SAME three-way join in HAVING — pure
    // integer value (supplycost_c × availqty), integer DIV threshold.
    "q257_tpch_q11" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("g_part")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      val nSup = t(s, dir, "supplier").count()
      s.sql(partsuppSparkSql(nSup)).createOrReplaceTempView("g_partsupp")
      s.sql("""
        SELECT ps_partkey,
          CAST(SUM(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
        FROM g_partsupp, g_supplier, g_nation
        WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
          AND n_name = 'NATION_7'
        GROUP BY ps_partkey
        HAVING SUM(ps_supplycost_c * ps_availqty)
          > (SELECT SUM(ps_supplycost_c * ps_availqty) DIV 3000
             FROM g_partsupp, g_supplier, g_nation
             WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
               AND n_name = 'NATION_7')
        ORDER BY value_c DESC, ps_partkey""")
    }),

// TPC-H Q15 SHAPE: the top-revenue supplier — an aggregate CTE
    // referenced twice (row side + MAX scalar), exact micro-cents.
    "q258_tpch_q15" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      s.sql("""
        WITH rev AS (
          SELECT l_suppkey,
            CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
              * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
              AS BIGINT) AS total_e6
          FROM g_lineitem
          WHERE l_shipdate >= TIMESTAMP '1996-01-01'
            AND l_shipdate < TIMESTAMP '1996-04-01'
          GROUP BY l_suppkey)
        SELECT s_suppkey, s_name, total_e6
        FROM g_supplier JOIN rev ON s_suppkey = l_suppkey
        WHERE total_e6 = (SELECT MAX(total_e6) FROM rev)
        ORDER BY s_suppkey""")
    }),

// TPC-H Q22 SHAPE: anti-join (customers with NO orders) gated by
    // an uncorrelated scalar AVG threshold — balances quantized to
    // integer cents INSIDE the subquery so the average replays
    // bit-identically.
    "q259_tpch_q22" -> ((s, dir) => {
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
          CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
            AS totacctbal_c
        FROM g_customer c
        WHERE c_nationkey IN (1, 3, 5, 7)
          AND CAST(round(c_acctbal * 100) AS BIGINT)
            > (SELECT AVG(CAST(round(c2.c_acctbal * 100) AS BIGINT))
               FROM g_customer c2
               WHERE CAST(round(c2.c_acctbal * 100) AS BIGINT) > 0
                 AND c2.c_nationkey IN (1, 3, 5, 7))
          AND NOT EXISTS (SELECT 1 FROM g_orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderpriority = '1-URGENT')
        GROUP BY c_nationkey
        ORDER BY c_nationkey""")
    }),

// TPC-H Q7 SHAPE: volume shipping between two nations — the same
    // dimension table joined TWICE under different roles (nation n1
    // supplier-side, n2 customer-side) with the symmetric pair
    // disjunction applied across both aliases. Exact e6 revenue.
    "q263_tpch_q7" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      s.sql("""
        SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
          CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
          CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
            * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_e6
        FROM g_supplier s, g_lineitem l, g_orders o, g_customer c,
             g_nation n1, g_nation n2
        WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
          AND c.c_custkey = o.o_custkey
          AND s.s_nationkey = n1.n_nationkey
          AND c.c_nationkey = n2.n_nationkey
          AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
            OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
          AND l.l_shipdate >= TIMESTAMP '1996-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1, 2, 3
        ORDER BY supp_nation, cust_nation, l_year""")
    }),

// TPC-H Q8 SHAPE: national market share — a conditional aggregate
    // (CASE on the supplier's nation) over a 6-table snowflake where
    // one branch of the nation dimension filters (customer region) and
    // the other only labels. Numerator and denominator kept as exact
    // e6 integers instead of the reference's float ratio.
    "q264_tpch_q8" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
          CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
            THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
              * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
            ELSE 0 END) AS BIGINT) AS nation_vol_e6,
          CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
            * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS total_vol_e6
        FROM g_part p, g_supplier s, g_lineitem l, g_orders o,
             g_customer c, g_nation n1, g_nation n2
        WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
          AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
          AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = 0
          AND s.s_nationkey = n2.n_nationkey
          AND p.p_type = 'PROMO'
        GROUP BY 1
        ORDER BY o_year""")
    }),

// TPC-H Q9 SHAPE: product-type profit — LIKE-filtered part join
    // with a two-term measure (revenue minus cost; p_retailprice
    // stands in for the absent ps_supplycost), grouped by the
    // SUPPLIER's nation and order year. Exact e6 profit.
    "q265_tpch_q9" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      t(s, dir, "nation").createOrReplaceTempView("g_nation")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT n.n_name AS nation,
          CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
          CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
              * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
            - CAST(round(p.p_retailprice * 100) AS BIGINT) * 10000
              * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_e6
        FROM g_part p, g_supplier s, g_lineitem l, g_orders o, g_nation n
        WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
          AND o.o_orderkey = l.l_orderkey
          AND s.s_nationkey = n.n_nationkey
          AND p.p_name LIKE '%red%'
        GROUP BY 1, 2
        ORDER BY nation, o_year DESC""")
    }),

// TPC-H Q12 SHAPE: two-way conditional counts after a fact-fact
    // join (l_returnflag stands in for the absent l_shipmode) — the
    // CASE-IN bucketing aggregate.
    "q266_tpch_q12" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      s.sql("""
        SELECT l.l_returnflag AS shipmode,
          CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
          CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
            THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        FROM g_orders o JOIN g_lineitem l ON o.o_orderkey = l.l_orderkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
          AND l.l_shipdate < TIMESTAMP '1998-01-01'
        GROUP BY 1
        ORDER BY shipmode""")
    }),

// TPC-H Q13 SHAPE: customer order-count distribution — a LEFT
    // OUTER join with an extra non-key join predicate (the priority
    // exclusion must stay IN the join condition, not become a filter),
    // then a histogram over the per-customer counts.
    "q267_tpch_q13" -> ((s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("g_orders")
      t(s, dir, "customer").createOrReplaceTempView("g_customer")
      s.sql("""
        SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
          SELECT c.c_custkey,
            CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
          FROM g_customer c LEFT OUTER JOIN g_orders o
            ON c.c_custkey = o.o_custkey
            AND o.o_orderpriority <> '4-NOT SPECIFIED'
          GROUP BY c.c_custkey) t
        GROUP BY c_count
        ORDER BY custdist DESC, c_count DESC""")
    }),

// TPC-H Q14 SHAPE: promo revenue share — conditional numerator
    // over a dimension attribute with a tight date slice; exact e6
    // numerator/denominator instead of the float percentage.
    "q268_tpch_q14" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT
          CAST(SUM(CASE WHEN p.p_type = 'PROMO'
            THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
              * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
            ELSE 0 END) AS BIGINT) AS promo_e6,
          CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
            * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS total_e6
        FROM g_lineitem l JOIN g_part p ON l.l_partkey = p.p_partkey
        WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
          AND l.l_shipdate < TIMESTAMP '1997-04-01'""")
    }),

// TPC-H Q16, FULL FIDELITY (round 9 — derived partsupp):
    // COUNT(DISTINCT ps_suppkey) per attribute triple with a NOT-IN
    // exclusion subquery (null-aware anti join on partsupp's
    // supplier key).
    "q269_tpch_q16" -> ((s, dir) => {
      t(s, dir, "part").createOrReplaceTempView("g_part")
      t(s, dir, "supplier").createOrReplaceTempView("g_supplier")
      val nSup = t(s, dir, "supplier").count()
      s.sql(partsuppSparkSql(nSup)).createOrReplaceTempView("g_partsupp")
      s.sql("""
        SELECT p.p_brand, p.p_type, p.p_size,
          CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
        FROM g_part p JOIN g_partsupp ps ON p.p_partkey = ps.ps_partkey
        WHERE p.p_brand <> 'Brand#4' AND p.p_type NOT LIKE 'MED%'
          AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
          AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM g_supplier
                                    WHERE s_name LIKE '%000000014%')
        GROUP BY 1, 2, 3
        ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""")
    }),

// TPC-H Q19 SHAPE: a DISJUNCTION of cross-table conjunctions
    // (brand × size × quantity brackets) — the predicate must ride the
    // equi-join as a post-join condition without degrading the join
    // itself to a nested loop.
    "q270_tpch_q19" -> ((s, dir) => {
      t(s, dir, "lineitem").createOrReplaceTempView("g_lineitem")
      t(s, dir, "part").createOrReplaceTempView("g_part")
      s.sql("""
        SELECT
          CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
            * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
            AS BIGINT) AS revenue_e6,
          CAST(COUNT(*) AS BIGINT) AS n_lines
        FROM g_lineitem l JOIN g_part p ON p.p_partkey = l.l_partkey
        WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
            AND l.l_quantity BETWEEN 1 AND 11)
           OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
            AND l.l_quantity BETWEEN 10 AND 20)
           OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
            AND l.l_quantity BETWEEN 20 AND 30)""")
    }))

  val oracles: Map[String, String] = Map(

// Same correlated scalar subquery; quantities are integral doubles
    // so AVG and 0.2* replay bit-identically.
    "q241_tpch_q17" ->
      """SELECT CAST(SUM(CAST(ROUND(l_extendedprice * 100) AS BIGINT))
        |         AS BIGINT) AS sum_cents,
        |       CAST(COUNT(*) AS BIGINT) AS n_rows
        |FROM lineitem JOIN part ON p_partkey = l_partkey
        |WHERE p_brand = 'Brand#12' AND p_size < 15
        |  AND l_quantity < (SELECT 0.2 * AVG(l2.l_quantity)
        |                    FROM lineitem l2
        |                    WHERE l2.l_partkey = p_partkey)""".stripMargin,

// Group-filter-join-back; exact integer quantity sums.
    "q242_tpch_q18" ->
      """SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
        |       CAST(o_orderkey AS BIGINT) AS o_orderkey,
        |       CAST(ROUND(o_totalprice * 100) AS BIGINT) AS total_cents,
        |       CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (SELECT l_orderkey
        |                     FROM lineitem
        |                     GROUP BY l_orderkey
        |                     HAVING SUM(CAST(l_quantity AS BIGINT)) > 180)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_totalprice
        |ORDER BY total_cents DESC, o_orderkey
        |LIMIT 100""".stripMargin,

"q251_tpch_q20" ->
      s"""WITH partsupp AS ($partsuppDuckSql)
         |SELECT s.s_name
         |FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
         |WHERE n.n_name = 'NATION_3'
         |  AND s.s_suppkey IN (
         |    SELECT ps.ps_suppkey FROM partsupp ps
         |    WHERE ps.ps_partkey IN (SELECT p_partkey FROM part
         |                            WHERE p_name LIKE 'red%')
         |      AND 2 * ps.ps_availqty >
         |        (SELECT CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT)
         |         FROM lineitem l
         |         WHERE l.l_partkey = ps.ps_partkey
         |           AND l.l_suppkey = ps.ps_suppkey
         |           AND l.l_shipdate >= TIMESTAMP '1995-01-01'
         |           AND l.l_shipdate < TIMESTAMP '1996-01-01'))
         |ORDER BY s_name""".stripMargin,

"q257_tpch_q11" ->
      s"""WITH partsupp AS ($partsuppDuckSql)
         |SELECT ps_partkey,
         |  CAST(SUM(ps_supplycost_c * ps_availqty) AS BIGINT) AS value_c
         |FROM partsupp, supplier, nation
         |WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |  AND n_name = 'NATION_7'
         |GROUP BY ps_partkey
         |HAVING SUM(ps_supplycost_c * ps_availqty)
         |  > (SELECT SUM(ps_supplycost_c * ps_availqty) // 3000
         |     FROM partsupp, supplier, nation
         |     WHERE ps_suppkey = s_suppkey AND s_nationkey = n_nationkey
         |       AND n_name = 'NATION_7')
         |ORDER BY value_c DESC, ps_partkey""".stripMargin,

"q258_tpch_q15" ->
      """WITH rev AS (
        |  SELECT l_suppkey,
        |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(round(l_discount * 10000) AS BIGINT)))
        |      AS BIGINT) AS total_e6
        |  FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |    AND l_shipdate < TIMESTAMP '1996-04-01'
        |  GROUP BY l_suppkey)
        |SELECT s_suppkey, s_name, total_e6
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_e6 = (SELECT MAX(total_e6) FROM rev)
        |ORDER BY s_suppkey""".stripMargin,

"q259_tpch_q22" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
        |  CAST(SUM(CAST(round(c_acctbal * 100) AS BIGINT)) AS BIGINT)
        |    AS totacctbal_c
        |FROM customer c
        |WHERE c_nationkey IN (1, 3, 5, 7)
        |  AND CAST(round(c_acctbal * 100) AS BIGINT)
        |    > (SELECT AVG(CAST(round(c2.c_acctbal * 100) AS BIGINT))
        |       FROM customer c2
        |       WHERE CAST(round(c2.c_acctbal * 100) AS BIGINT) > 0
        |         AND c2.c_nationkey IN (1, 3, 5, 7))
        |  AND NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey
        |                    AND o.o_orderpriority = '1-URGENT')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin,

"q263_tpch_q7" ->
      """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
        |  CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
        |  CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
        |    AS BIGINT) AS revenue_e6
        |FROM supplier s, lineitem l, orders o, customer c,
        |     nation n1, nation n2
        |WHERE s.s_suppkey = l.l_suppkey AND o.o_orderkey = l.l_orderkey
        |  AND c.c_custkey = o.o_custkey
        |  AND s.s_nationkey = n1.n_nationkey
        |  AND c.c_nationkey = n2.n_nationkey
        |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
        |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        |  AND l.l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin,

"q264_tpch_q8" ->
      """SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
        |    THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
        |    ELSE 0 END) AS BIGINT) AS nation_vol_e6,
        |  CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
        |    AS BIGINT) AS total_vol_e6
        |FROM part p, supplier s, lineitem l, orders o,
        |     customer c, nation n1, nation n2
        |WHERE p.p_partkey = l.l_partkey AND s.s_suppkey = l.l_suppkey
        |  AND l.l_orderkey = o.o_orderkey AND o.o_custkey = c.c_custkey
        |  AND c.c_nationkey = n1.n_nationkey AND n1.n_regionkey = 0
        |  AND s.s_nationkey = n2.n_nationkey
        |  AND p.p_type = 'PROMO'
        |GROUP BY 1
        |ORDER BY o_year""".stripMargin,

"q265_tpch_q9" ->
      """SELECT n.n_name AS nation,
        |  CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
        |  CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
        |    - CAST(round(p.p_retailprice * 100) AS BIGINT) * 10000
        |      * CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS profit_e6
        |FROM part p, supplier s, lineitem l, orders o, nation n
        |WHERE s.s_suppkey = l.l_suppkey AND p.p_partkey = l.l_partkey
        |  AND o.o_orderkey = l.l_orderkey
        |  AND s.s_nationkey = n.n_nationkey
        |  AND p.p_name LIKE '%red%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year DESC""".stripMargin,

"q266_tpch_q12" ->
      """SELECT l.l_returnflag AS shipmode,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
        |  AND l.l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1
        |ORDER BY shipmode""".stripMargin,

"q267_tpch_q13" ->
      """SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist FROM (
        |  SELECT c.c_custkey,
        |    CAST(COUNT(o.o_orderkey) AS BIGINT) AS c_count
        |  FROM customer c LEFT OUTER JOIN orders o
        |    ON c.c_custkey = o.o_custkey
        |    AND o.o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c.c_custkey) t
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,

"q268_tpch_q14" ->
      """SELECT
        |  CAST(SUM(CASE WHEN p.p_type = 'PROMO'
        |    THEN CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |      * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT))
        |    ELSE 0 END) AS BIGINT) AS promo_e6,
        |  CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
        |    AS BIGINT) AS total_e6
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |WHERE l.l_shipdate >= TIMESTAMP '1997-03-01'
        |  AND l.l_shipdate < TIMESTAMP '1997-04-01'""".stripMargin,

"q269_tpch_q16" ->
      s"""WITH partsupp AS ($partsuppDuckSql)
         |SELECT p.p_brand, p.p_type, p.p_size,
         |  CAST(COUNT(DISTINCT ps.ps_suppkey) AS BIGINT) AS supplier_cnt
         |FROM part p JOIN partsupp ps ON p.p_partkey = ps.ps_partkey
         |WHERE p.p_brand <> 'Brand#4' AND p.p_type NOT LIKE 'MED%'
         |  AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
         |  AND ps.ps_suppkey NOT IN (SELECT s_suppkey FROM supplier
         |                            WHERE s_name LIKE '%000000014%')
         |GROUP BY 1, 2, 3
         |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin,

"q270_tpch_q19" ->
      """SELECT
        |  CAST(SUM(CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (10000 - CAST(round(l.l_discount * 10000) AS BIGINT)))
        |    AS BIGINT) AS revenue_e6,
        |  CAST(COUNT(*) AS BIGINT) AS n_lines
        |FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
        |WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
        |    AND l.l_quantity BETWEEN 1 AND 11)
        |   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
        |    AND l.l_quantity BETWEEN 10 AND 20)
        |   OR (p.p_brand = 'Brand#4' AND p.p_size BETWEEN 1 AND 15
        |    AND l.l_quantity BETWEEN 20 AND 30)""".stripMargin,

"q256_tpch_q2" ->
      s"""WITH partsupp AS ($partsuppDuckSql)
         |SELECT CAST(round(s.s_acctbal * 100) AS BIGINT) AS acctbal_cents,
         |  s.s_name, n.n_name, p.p_partkey, ps.ps_supplycost_c
         |FROM part p, supplier s, partsupp ps, nation n, region r
         |WHERE p.p_partkey = ps.ps_partkey AND s.s_suppkey = ps.ps_suppkey
         |  AND p.p_size IN (5, 15, 25, 45) AND p.p_type LIKE '%MALL'
         |  AND s.s_nationkey = n.n_nationkey
         |  AND n.n_regionkey = r.r_regionkey AND r.r_name = 'EUROPE'
         |  AND ps.ps_supplycost_c = (
         |    SELECT MIN(ps2.ps_supplycost_c)
         |    FROM partsupp ps2, supplier s2, nation n2, region r2
         |    WHERE ps2.ps_partkey = p.p_partkey
         |      AND s2.s_suppkey = ps2.ps_suppkey
         |      AND s2.s_nationkey = n2.n_nationkey
         |      AND n2.n_regionkey = r2.r_regionkey AND r2.r_name = 'EUROPE')
         |ORDER BY acctbal_cents DESC, n_name, s_name, p_partkey
         |LIMIT 100""".stripMargin,

// Q6: same rounded-bp band and exact micro-cents sum; the COALESCE
    // keeps the one-row output non-null if the band were empty.
    "q335_tpch_q6" ->
      """SELECT CAST(COALESCE(SUM(
        |    CAST(round(l_extendedprice * 100) AS HUGEINT)
        |      * CAST(round(l_discount * 10000) AS BIGINT)), 0)
        |  AS BIGINT) AS revenue_e6
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND CAST(round(l_discount * 10000) AS BIGINT) BETWEEN 500 AND 700
        |  AND l_quantity < 24""".stripMargin,

// Q4: the correlated EXISTS verbatim — the outer o_orderdate
    // rides into the subquery's date arithmetic.
    "q336_tpch_q4" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1996-04-01'
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem
        |    WHERE l_orderkey = o_orderkey
        |      AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

"q248_tpch_q21" ->
      """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
        |FROM supplier, lineitem l1, orders
        |WHERE s_suppkey = l1.l_suppkey
        |  AND o_orderkey = l1.l_orderkey
        |  AND o_orderstatus = 'F'
        |  AND l1.l_shipdate > TIMESTAMP '1997-01-01'
        |  AND EXISTS (SELECT 1 FROM lineitem l2
        |              WHERE l2.l_orderkey = l1.l_orderkey
        |                AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
        |                  WHERE l3.l_orderkey = l1.l_orderkey
        |                    AND l3.l_suppkey <> l1.l_suppkey
        |                    AND l3.l_shipdate > TIMESTAMP '1997-01-01')
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name
        |LIMIT 100""".stripMargin)
}

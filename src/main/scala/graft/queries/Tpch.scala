package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}

/** TPC-H completion sweep (round 8): the decision-support query shapes
  * NOT yet claimed by the macro rows (Q1/Q5/Q7/Q9/Q17/Q18 shapes landed
  * in earlier rounds as q1_pricing_summary, Q_JOIN16/17, Q_JOIN14,
  * Q_AGG16/17). The reference delegated its relational surface to
  * Shark/HiveQL (SURVEY §2 Table Q); this file proves the rebuilt
  * surface covers the full decorrelation/aggregation/join repertoire of
  * the benchmark those engines were graded on.
  *
  * Schema adaptations (testdata is reduced TPC-H — no partsupp, no
  * comment/shipmode/commitdate columns): partsupp-derived relations are
  * rebuilt from `lineitem` (supply = min extendedprice per part,
  * availability = shipped qty per supplier×part); ship-delay predicates
  * use `l_shipdate > o_orderdate + INTERVAL n DAY` instead of
  * commit/receipt dates; Q12's shipmode classes become quantity
  * classes; Q22's country code is the customer-name suffix.
  *
  * Scale notes (100 TB): every dimension join here (nation, region,
  * supplier, part at 1/30000th of lineitem) is broadcast — the only
  * shuffles are the fact-side aggregations on their natural keys.
  * Subquery shapes are written so Catalyst decorrelates them into
  * joins (EXISTS/IN → left-semi, NOT EXISTS/NOT IN → (null-aware)
  * anti, correlated scalar agg → groupBy + join on the correlation
  * key): no per-row re-execution anywhere. Q21's double-correlated
  * EXISTS/NOT EXISTS pair shuffles lineitem on l_orderkey once per
  * branch — the same key as the base join, so AQE coalesces the
  * exchanges; Q13's two-level aggregate shrinks to |customer| rows
  * after the first groupBy.
  */
object Tpch {

  private def views(s: SparkSession, d: String): Unit = {
    Tables.region(s, d).createOrReplaceTempView("region_v")
    Tables.nation(s, d).createOrReplaceTempView("nation_v")
    Tables.customer(s, d).createOrReplaceTempView("customer_v")
    Tables.supplier(s, d).createOrReplaceTempView("supplier_v")
    Tables.part(s, d).createOrReplaceTempView("part_v")
    Tables.orders(s, d).createOrReplaceTempView("orders_v")
    Tables.lineitem(s, d).createOrReplaceTempView("lineitem_v")
  }

  /** Rewrites the oracle SQL (plain table names) into the Spark temp-view
    * names. Oracle and Spark text stay a single source of truth: the
    * declared SQL is EXACTLY what DuckDB runs, and the Spark side runs
    * the same text with `_v` views substituted.
    */
  private def sparkSql(oracle: String): (SparkSession, String) => DataFrame =
    (s, d) => {
      views(s, d)
      val txt = Seq("region", "nation", "customer", "supplier", "part",
        "orders", "lineitem").foldLeft(oracle) { (t, n) =>
        t.replaceAll(s"\\b$n\\b", s"${n}_v")
      }
      s.sql(txt)
    }

  // ---------------------------------------------------------------
  // Q2 shape — minimum-cost supplier: correlated scalar MIN over the
  // (lineitem-derived) supply relation, re-joined to pick the argmin
  // rows. Catalyst decorrelates the scalar subquery into a groupBy on
  // the correlation key (partkey) + join — the supply CTE is computed
  // once, not per part.
  private val q2Sql =
    """WITH supply AS (
      |  SELECT l_partkey AS su_partkey, l_suppkey AS su_suppkey,
      |         min(l_extendedprice) AS su_cost
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT p_partkey, p_brand, s_name, round(su_cost, 2) AS cost
      |FROM part, supply, supplier, nation, region
      |WHERE p_partkey = su_partkey AND s_suppkey = su_suppkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'EUROPE' AND p_size < 5 AND p_type = 'STANDARD'
      |  AND su_cost = (SELECT min(s2.su_cost)
      |                 FROM supply s2, supplier sp2, nation n2, region r2
      |                 WHERE s2.su_partkey = p_partkey
      |                   AND sp2.s_suppkey = s2.su_suppkey
      |                   AND sp2.s_nationkey = n2.n_nationkey
      |                   AND n2.n_regionkey = r2.r_regionkey
      |                   AND r2.r_name = 'EUROPE')
      |ORDER BY p_partkey, s_name""".stripMargin

  // ---------------------------------------------------------------
  // Q3 shape — shipping priority: segment-filtered 3-table join,
  // revenue per order, global top 10 (TakeOrderedAndProject, no full
  // sort at scale).
  private def q3(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") > "1997-06-01")
      .join(Tables.orders(s, d).filter(col("o_orderdate") < "1997-06-01"),
        col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  private val q3Sql =
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue,
      |  CAST(o_orderdate AS DATE) AS o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-06-01'
      |  AND l_shipdate > TIMESTAMP '1997-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ---------------------------------------------------------------
  // Q4 shape — order-priority checking: EXISTS decorrelated into a
  // left-semi join on l_orderkey (late shipment stands in for the
  // missing commit/receipt dates).
  private val q4Sql =
    """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey
      |                AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---------------------------------------------------------------
  // Q6 shape — forecasting revenue change: the pure scan-side
  // predicate+sum (all three filters push into the parquet scan;
  // map-side partial sum, single-row exchange).
  private def q6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1997-01-01" &&
        col("l_shipdate") < "1998-01-01" &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24.0)
      .agg(round(sum(col("l_extendedprice") * col("l_discount")), 2)
        .as("revenue"))

  private val q6Sql =
    """SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-01-01'
      |  AND l_discount BETWEEN 0.05 AND 0.07
      |  AND l_quantity < 24.0""".stripMargin

  // ---------------------------------------------------------------
  // Q8 shape — national market share: two nation roles (supplier-side
  // share inside customer-region volume), conditional-sum ratio per
  // year. All dims broadcast; one shuffle on the group key.
  private def q8(s: SparkSession, d: String): DataFrame = {
    val n1 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_regionkey")))
    val n2 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val r = broadcast(Tables.region(s, d).filter(col("r_name") === "ASIA"))
    val p = broadcast(Tables.part(s, d).filter(col("p_type") === "ECONOMY"))
    val vol = Tables.lineitem(s, d)
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("c_nationkey") === col("c_nk"))
      .join(r, col("n_regionkey") === col("r_regionkey"))
      .join(n2, col("s_nationkey") === col("s_nk"))
      .select(year(col("o_orderdate")).cast("long").as("o_year"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("volume"),
        col("supp_nation"))
    vol.groupBy(col("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", col("volume"))
          .otherwise(lit(0.0))) / sum(col("volume")), 4).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  private val q8Sql =
    """SELECT o_year,
      |  round(sum(CASE WHEN supp_nation = 'NATION_3' THEN volume
      |                 ELSE 0.0 END) / sum(volume), 4) AS mkt_share
      |FROM (
      |  SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |    l_extendedprice * (1.0 - l_discount) AS volume,
      |    n2.n_name AS supp_nation
      |  FROM part, lineitem, supplier, orders, customer,
      |       nation n1, nation n2, region
      |  WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
      |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |    AND c_nationkey = n1.n_nationkey
      |    AND n1.n_regionkey = r_regionkey
      |    AND s_nationkey = n2.n_nationkey
      |    AND r_name = 'ASIA' AND p_type = 'ECONOMY') t
      |GROUP BY o_year
      |ORDER BY o_year""".stripMargin

  // ---------------------------------------------------------------
  // Q10 shape — returned-item reporting: quarter of orders × returned
  // lines, revenue per customer, top 20.
  private def q10(s: SparkSession, d: String): DataFrame = {
    val n = broadcast(Tables.nation(s, d))
    Tables.lineitem(s, d).filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d).filter(
        col("o_orderdate") >= "1997-01-01" &&
          col("o_orderdate") < "1997-04-01"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(n, col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  private val q10Sql =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-04-01'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  // ---------------------------------------------------------------
  // Q11 shape — important values: per-part revenue HAVING a
  // global-aggregate scalar-subquery threshold. The CTE is evaluated
  // once; the scalar subquery broadcasts one row.
  private val q11Sql =
    """WITH partrev AS (
      |  SELECT l_partkey, sum(l_extendedprice * (1.0 - l_discount)) AS rev
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3')
      |  GROUP BY l_partkey)
      |SELECT l_partkey, round(rev, 2) AS rev_value
      |FROM partrev
      |WHERE rev > (SELECT sum(rev) * 0.0012 FROM partrev)
      |ORDER BY rev_value DESC, l_partkey""".stripMargin

  // ---------------------------------------------------------------
  // Q12 shape — shipping classes vs priority: conditional counts per
  // class (quantity class stands in for the missing shipmode), ship
  // delay window on the join.
  private def q12(s: SparkSession, d: String): DataFrame = {
    val urgent = col("o_orderpriority") === "1-URGENT" ||
      col("o_orderpriority") === "2-HIGH"
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1997-01-01" &&
        col("l_shipdate") < "1998-01-01")
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAY"))
      .select(when(col("l_quantity") > 25.0, "HEAVY").otherwise("LIGHT")
        .as("qty_class"),
        when(urgent, 1L).otherwise(0L).as("high"),
        when(!urgent, 1L).otherwise(0L).as("low"))
      .groupBy(col("qty_class"))
      .agg(sum(col("high")).cast("long").as("high_line_count"),
        sum(col("low")).cast("long").as("low_line_count"))
      .orderBy(col("qty_class"))
  }

  private val q12Sql =
    """SELECT qty_class,
      |  CAST(sum(high) AS BIGINT) AS high_line_count,
      |  CAST(sum(low) AS BIGINT) AS low_line_count
      |FROM (
      |  SELECT CASE WHEN l_quantity > 25.0 THEN 'HEAVY'
      |              ELSE 'LIGHT' END AS qty_class,
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |         THEN 1 ELSE 0 END AS high,
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |         THEN 0 ELSE 1 END AS low
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1998-01-01'
      |    AND l_shipdate > o_orderdate + INTERVAL 30 DAY) t
      |GROUP BY qty_class
      |ORDER BY qty_class""".stripMargin

  // ---------------------------------------------------------------
  // Q13 shape — customer order-count distribution: LEFT OUTER join
  // with a join-side filter (never a WHERE — that would turn it
  // inner), then a distribution-of-counts second aggregate.
  private val q13Sql =
    """WITH c_orders AS (
      |  SELECT c_custkey, count(o_orderkey) AS c_count
      |  FROM customer
      |  LEFT OUTER JOIN orders ON c_custkey = o_custkey
      |    AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |SELECT CAST(c_count AS BIGINT) AS c_count,
      |  CAST(count(*) AS BIGINT) AS custdist
      |FROM c_orders
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  // ---------------------------------------------------------------
  // Q14 shape — promotion effect: conditional-sum percentage over one
  // month of shipments; part is broadcast.
  private def q14(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= "1997-09-01" &&
        col("l_shipdate") < "1997-10-01")
      .join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .otherwise(lit(0.0))) /
        sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4)
        .as("promo_revenue"))

  private val q14Sql =
    """SELECT round(100.0 *
      |    sum(CASE WHEN p_type = 'PROMO'
      |        THEN l_extendedprice * (1.0 - l_discount)
      |        ELSE 0.0 END) /
      |    sum(l_extendedprice * (1.0 - l_discount)), 4) AS promo_revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_shipdate >= TIMESTAMP '1997-09-01'
      |  AND l_shipdate < TIMESTAMP '1997-10-01'""".stripMargin

  // ---------------------------------------------------------------
  // Q15 shape — top supplier: quarterly revenue view equated with its
  // own MAX (scalar subquery over the same derived relation — computed
  // once, one-row broadcast).
  private val q15Sql =
    """WITH revenue AS (
      |  SELECT l_suppkey AS supplier_no,
      |    sum(l_extendedprice * (1.0 - l_discount)) AS total_revenue
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      |    AND l_shipdate < TIMESTAMP '1997-04-01'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, round(total_revenue, 2) AS total_revenue
      |FROM supplier, revenue
      |WHERE s_suppkey = supplier_no
      |  AND total_revenue = (SELECT max(total_revenue) FROM revenue)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------
  // Q16 shape — supplier counts by part attributes: distinct-count
  // aggregate behind a NOT IN (blacklist) anti join.
  private val q16Sql =
    """SELECT p_brand, p_size,
      |  CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM part JOIN lineitem ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#3' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0.0)
      |GROUP BY p_brand, p_size
      |ORDER BY supplier_cnt DESC, p_brand, p_size""".stripMargin

  // ---------------------------------------------------------------
  // Q19 shape — discounted revenue over a disjunction of conjunct
  // groups: the OR-of-ANDs pushes the common join key through and
  // lets the scan prune on the union of brand/size ranges.
  private def q19(s: SparkSession, d: String): DataFrame = {
    val g1 = col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
      col("l_quantity").between(1.0, 11.0)
    val g2 = col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
      col("l_quantity").between(10.0, 20.0)
    val g3 = col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
      col("l_quantity").between(20.0, 30.0)
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d)),
        col("l_partkey") === col("p_partkey"))
      .filter(g1 || g2 || g3)
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
  }

  private val q19Sql =
    """SELECT round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
      |       AND l_quantity BETWEEN 1.0 AND 11.0)
      |   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
      |       AND l_quantity BETWEEN 10.0 AND 20.0)
      |   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
      |       AND l_quantity BETWEEN 20.0 AND 30.0)""".stripMargin

  // ---------------------------------------------------------------
  // Q20 shape — potential promotion: nested IN over a grouped-HAVING
  // availability relation (lineitem stands in for partsupp availqty).
  private val q20Sql =
    """SELECT s_suppkey, s_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE (n_name LIKE 'NATION_1%' OR n_name LIKE 'NATION_2%')
      |  AND s_suppkey IN (
      |    SELECT l_suppkey
      |    FROM lineitem JOIN part ON l_partkey = p_partkey
      |    WHERE p_type = 'PROMO'
      |      AND l_shipdate >= TIMESTAMP '1997-01-01'
      |      AND l_shipdate < TIMESTAMP '1998-01-01'
      |    GROUP BY l_suppkey
      |    HAVING sum(l_quantity) > 400.0)
      |ORDER BY s_suppkey""".stripMargin

  // ---------------------------------------------------------------
  // Q21 shape — suppliers who kept orders waiting: the
  // EXISTS + NOT EXISTS pair over the same fact with different
  // correlations (multi-supplier order, sole late shipper).
  private val q21Sql =
    """SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
      |FROM supplier, lineitem l1, orders, nation
      |WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      |  AND o_orderstatus = 'F'
      |  AND l1.l_shipdate > o_orderdate + INTERVAL 60 DAY
      |  AND s_nationkey = n_nationkey AND n_name LIKE 'NATION_1%'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > o_orderdate + INTERVAL 60 DAY)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  // DataFrame form of the Q21 shape (r19, VERDICT item 3). The SQL
  // form's EXISTS + NOT EXISTS pair decorrelates into one left-semi
  // and one left-anti join, EACH shuffling lineitem on l_orderkey —
  // three full fact shuffles for one logical pass. Both branch
  // predicates are per-ORDER set properties, so one aggregation
  // computes them instead:
  //   per (l_orderkey, l_suppkey): late_cnt = # lines shipped > 60
  //     days after the order date;
  //   per l_orderkey (window over the aggregate, same partitioning):
  //     ns  = # distinct suppliers in the order,
  //     nls = # distinct suppliers with a late line.
  // A supplier's l1 rows survive the original predicate pair iff
  //   late_cnt > 0           (l1 itself exists and is late)
  //   ns > 1                 (EXISTS: some other supplier in order —
  //                           l1's supplier is in the set, so >1 ⟺
  //                           another exists)
  //   nls = 1                (NOT EXISTS other late supplier: l1's
  //                           supplier IS late, so the late set is
  //                           exactly {l1.l_suppkey} ⟺ size 1)
  // and count(*) per supplier = Σ late_cnt (every late line of the
  // qualifying (order, supplier) pair is one l1 row; the supplier ⋈
  // nation join is key-unique so it multiplies nothing). lineitem
  // moves ONCE: the explicit repartition(l_orderkey) is the shard-key
  // exchange, the orders join (broadcast locally, co-partitioned SMJ
  // at scale), the (l_orderkey, l_suppkey) aggregate (subset
  // clustering) and the order-window all reuse it. Oracle text
  // unchanged — DuckDB still runs the EXISTS/NOT EXISTS form and the
  // driver bit-compares.
  private def q21(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val oF = Tables.orders(s, d)
      .filter(col("o_orderstatus") === "F")
      .select(col("o_orderkey"), col("o_orderdate"))
    val base = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
      .transform(graft.operators.Distribute.by(_, col("l_orderkey")))
      .join(oF, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") +
          expr("INTERVAL 60 DAY")).as("late"))
    val w = Window.partitionBy(col("l_orderkey"))
    val qualifying = base
      .groupBy(col("l_orderkey"), col("l_suppkey"))
      .agg(count(when(col("late"), lit(1))).as("late_cnt"))
      .withColumn("ns", count(lit(1)).over(w))
      .withColumn("nls",
        count(when(col("late_cnt") > 0, lit(1))).over(w))
      .filter(col("late_cnt") > 0 && col("ns") > 1 && col("nls") === 1)
    val su = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)
        .filter(col("n_name").like("NATION_1%"))),
        col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"))
    // su is unhinted: at fixture scale the size estimate broadcasts
    // it; at 100 TB supplier scales with the data and the planner
    // must be free to shuffle the (already aggregated, filtered)
    // sides instead of force-broadcasting a fact-scaled relation.
    qualifying.join(su, col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(sum(col("late_cnt")).cast("bigint").as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  // ---------------------------------------------------------------
  // Q22 shape — global sales opportunity: scalar-subquery threshold +
  // NOT EXISTS anti join, grouped by a derived code (name suffix
  // stands in for the missing phone country code).
  private val q22Sql =
    """SELECT cntrycode, CAST(count(*) AS BIGINT) AS numcust,
      |  round(sum(c_acctbal), 2) AS totacctbal
      |FROM (
      |  SELECT right(c_name, 2) AS cntrycode, c_acctbal, c_custkey
      |  FROM customer
      |  WHERE right(c_name, 2) IN
      |      ('03', '04', '06', '13', '17', '23', '29', '31')
      |    AND c_acctbal > (SELECT avg(c_acctbal) FROM customer
      |                     WHERE c_acctbal > 0.0)
      |    AND NOT EXISTS (SELECT 1 FROM orders
      |                    WHERE o_custkey = c_custkey
      |                      AND o_orderpriority = '1-URGENT')) t
      |GROUP BY cntrycode
      |ORDER BY cntrycode""".stripMargin

  // DataFrame form of the Q2 shape: the supply relation (the
  // lineitem-wide aggregate both the outer query and the correlated
  // MIN need) is computed ONCE and cached — the SQL form evaluates
  // the CTE twice (no automatic reuse across the decorrelated
  // subquery), which at 100 TB doubles the dominant scan+agg.
  // persist() over localCheckpoint(true) (round-9 experiment, VERDICT
  // r8 item 9): the checkpointed branch planned as an opaque `Scan
  // ExistingRDD` — no column pruning, no stats for AQE — while the
  // InMemoryRelation keeps the schema'd plan and its statistics
  // visible to Catalyst. Repeated invocations hit the same cache
  // entry (CacheManager keys on the analyzed plan), so Bench/Verify
  // loops do not leak storage. At cluster scale this becomes a
  // reliable checkpoint or a pre-computed supply table. Same oracle
  // text as q2Sql.
  private def q2(s: SparkSession, d: String): DataFrame = {
    // r19 (VERDICT item 4): distribute-before-aggregate barrier keyed
    // on l_partkey. The supply aggregation used to run its partial
    // phase inside the scan stage — one task on the single-row-group
    // fixtures — then exchange on (partkey, suppkey), and minPerPart
    // below paid a SECOND exchange on partkey. hashpartitioning(
    // partkey) satisfies ClusteredDistribution for BOTH aggregates
    // (subset clustering), so the barrier replaces the two aggregate
    // exchanges with one shard-key exchange and every downstream
    // stage runs at full parallelism. Trade (documented, same family
    // as the r18 change-6 barriers): the exchange now carries raw
    // (partkey, suppkey, price) rows instead of map-side-combined
    // partials (~7× more rows at TPC-H row ratios); at 100 TB the
    // right production layout is lineitem bucketed by partkey, which
    // makes this exchange — and the debate — disappear.
    val supply = Tables.lineitem(s, d)
      .select(col("l_partkey").as("su_partkey"),
        col("l_suppkey").as("su_suppkey"), col("l_extendedprice"))
      .transform(graft.operators.Distribute.by(_, col("su_partkey")))
      .groupBy(col("su_partkey"), col("su_suppkey"))
      .agg(min(col("l_extendedprice")).as("su_cost"))
      .persist()
    val eurSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "EUROPE")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"))
    val eurSupply = supply
      .join(broadcast(eurSupp), col("su_suppkey") === col("s_suppkey"))
    val minPerPart = eurSupply.groupBy(col("su_partkey"))
      .agg(min(col("su_cost")).as("mc"))
    val parts = broadcast(Tables.part(s, d)
      .filter(col("p_size") < 5 && col("p_type") === "STANDARD"))
    eurSupply
      .join(parts, col("su_partkey") === col("p_partkey"))
      .join(minPerPart.withColumnRenamed("su_partkey", "mp_partkey"),
        col("p_partkey") === col("mp_partkey") &&
          col("su_cost") === col("mc"))
      .select(col("p_partkey"), col("p_brand"), col("s_name"),
        round(col("su_cost"), 2).as("cost"))
      .orderBy(col("p_partkey"), col("s_name"))
  }

  def all: Seq[GQuery] = Seq(
    GQuery("Q_TPCH2_min_cost_supplier", q2, Some(q2Sql)),
    GQuery("Q_TPCH3_shipping_priority", q3, Some(q3Sql)),
    GQuery("Q_TPCH4_priority_exists", sparkSql(q4Sql), Some(q4Sql)),
    GQuery("Q_TPCH6_forecast_revenue", q6, Some(q6Sql)),
    GQuery("Q_TPCH8_market_share", q8, Some(q8Sql)),
    GQuery("Q_TPCH10_returned_items", q10, Some(q10Sql)),
    GQuery("Q_TPCH11_important_values", sparkSql(q11Sql), Some(q11Sql)),
    GQuery("Q_TPCH12_qty_class_priority", q12, Some(q12Sql)),
    GQuery("Q_TPCH13_count_distribution", sparkSql(q13Sql), Some(q13Sql)),
    GQuery("Q_TPCH14_promo_effect", q14, Some(q14Sql)),
    GQuery("Q_TPCH15_top_supplier", sparkSql(q15Sql), Some(q15Sql)),
    GQuery("Q_TPCH16_supplier_cnt", sparkSql(q16Sql), Some(q16Sql)),
    GQuery("Q_TPCH19_disjunctive", q19, Some(q19Sql)),
    GQuery("Q_TPCH20_nested_having", sparkSql(q20Sql), Some(q20Sql)),
    GQuery("Q_TPCH21_waiting_supplier", q21, Some(q21Sql)),
    GQuery("Q_TPCH22_sales_opportunity", sparkSql(q22Sql), Some(q22Sql)))
}

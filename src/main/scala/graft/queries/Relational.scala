package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}

/** SURVEY §2 table Q — core relational surface: projection, filters,
  * every join type, sort/limit/top-k, set ops.
  *
  * Scale notes (100 TB mandate): joins against the dim tables
  * (region/nation/supplier) use explicit `broadcast()` so no shuffle of
  * the fact side ever happens for them; fact⋈fact joins are plain
  * equi-joins that Catalyst plans as shuffled hash/sort-merge on the
  * join key — the natural distributed plan. Filters sit directly on the
  * scans so they push into parquet (PushedFilters), and every query
  * projects only the columns it emits (ReadSchema pruning).
  *
  * Determinism (SURVEY §7.4): total ORDER BY with a unique tie-break on
  * both engines; explicit NULLS FIRST whenever a sort key is nullable;
  * doubles rounded; sums CAST to BIGINT in the oracle (DuckDB promotes
  * integer sums to HUGEINT).
  */
object Relational {

  // Q_PROJ1 — projection, aliasing, arithmetic expressions.
  private def projArith(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_quantity") >= 48.0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        // Per-row double arithmetic is emitted RAW: the same IEEE ops on
        // the same inputs are bit-identical across engines, while
        // round() is NOT (Spark rounds the shortest-decimal repr, DuckDB
        // the binary value — they disagree at x.xx5 boundaries).
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("net_price"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount"))
          * (lit(1.0) + col("l_tax"))).as("gross_price"),
        (col("l_quantity") * lit(2.0)).as("double_qty"),
        concat(col("l_returnflag"), lit("/"), col("l_linestatus")).as("flag"))
      // lineitem has NO unique key (FIXTURES.md) — order by every
      // emitted column so ties are full-row identical.
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_price"),
        col("gross_price"), col("double_qty"), col("flag"))

  private val projArithSql =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice * (1.0 - l_discount) AS net_price,
      |  l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS gross_price,
      |  l_quantity * 2.0 AS double_qty,
      |  l_returnflag || '/' || l_linestatus AS flag
      |FROM lineitem WHERE l_quantity >= 48.0
      |ORDER BY l_orderkey, l_linenumber, net_price, gross_price,
      |  double_qty, flag""".stripMargin

  // Q_FILT1 — predicate zoo: comparison, BETWEEN, IN, LIKE, boolean algebra.
  private def filtPredicates(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .filter(
        col("o_orderstatus") =!= "P" &&
          col("o_orderpriority").isin("1-URGENT", "2-HIGH") &&
          col("o_totalprice").between(1000.0, 150000.0) &&
          (col("o_orderpriority").like("1-%") || col("o_custkey") % 2 === 0) &&
          !col("o_orderstatus").isNull)
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_orderpriority"), col("o_totalprice").as("total"))
      .orderBy(col("o_orderkey"))

  private val filtPredicatesSql =
    """SELECT o_orderkey, o_custkey, o_orderstatus, o_orderpriority,
      |  o_totalprice AS total
      |FROM orders
      |WHERE o_orderstatus <> 'P'
      |  AND o_orderpriority IN ('1-URGENT', '2-HIGH')
      |  AND o_totalprice BETWEEN 1000.0 AND 150000.0
      |  AND (o_orderpriority LIKE '1-%' OR o_custkey % 2 = 0)
      |  AND o_orderstatus IS NOT NULL
      |ORDER BY o_orderkey""".stripMargin

  // Q_FILT2 — conditional expressions: CASE WHEN, IF, COALESCE, NULLIF.
  private def filtConditional(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000.0, "large")
          .when(col("o_totalprice") > 100000.0, "medium")
          .otherwise("small").as("size_bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("pending"))
          .as("status_or_pending"),
        when(col("o_orderpriority") === "1-URGENT", lit(1)).otherwise(lit(0))
          .as("is_urgent"))
      .orderBy(col("o_orderkey"))

  private val filtConditionalSql =
    """SELECT o_orderkey,
      |  CASE WHEN o_totalprice > 200000.0 THEN 'large'
      |       WHEN o_totalprice > 100000.0 THEN 'medium'
      |       ELSE 'small' END AS size_bucket,
      |  COALESCE(NULLIF(o_orderstatus, 'P'), 'pending') AS status_or_pending,
      |  CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
      |FROM orders ORDER BY o_orderkey""".stripMargin

  // Q_JOIN1 — inner equi-join fact⋈fact (shuffle join on the key at scale).
  private def joinInner(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).filter(col("l_quantity") >= 49.0)
    val o = Tables.orders(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"), "inner")
      .select(col("l_orderkey"), col("l_linenumber"),
        col("o_orderdate").cast("date").as("order_date"),
        col("o_totalprice").as("total"),
        (col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("net_price"))
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("net_price"))
  }

  private val joinInnerSql =
    """SELECT l_orderkey, l_linenumber,
      |  CAST(o_orderdate AS DATE) AS order_date,
      |  o_totalprice AS total,
      |  l_extendedprice * (1.0 - l_discount) AS net_price
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_quantity >= 49.0
      |ORDER BY l_orderkey, l_linenumber, net_price""".stripMargin

  // Q_JOIN2 — broadcast dim joins: supplier ⋈ nation ⋈ region with the
  // dims explicitly broadcast (MAPJOIN equivalent; no fact shuffle).
  private def joinBroadcast(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("r_name"),
        col("s_acctbal").as("acctbal"))
      .orderBy(col("s_suppkey"))

  private val joinBroadcastSql =
    """SELECT s_suppkey, s_name, n_name, r_name, s_acctbal AS acctbal
      |FROM supplier
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |ORDER BY s_suppkey""".stripMargin

  // Q_JOIN3 — left outer join (unmatched left rows keep NULL right cols).
  private def joinLeft(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).filter(col("c_custkey") % 10 === 0)
    val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .select(col("c_custkey"), col("c_name"), col("o_orderkey"),
        col("o_orderdate").cast("date").as("order_date"))
      .orderBy(col("c_custkey"), col("o_orderkey").asc_nulls_first)
  }

  private val joinLeftSql =
    """SELECT c_custkey, c_name, o_orderkey, CAST(o_orderdate AS DATE) AS order_date
      |FROM customer LEFT JOIN (
      |  SELECT * FROM orders WHERE o_orderpriority = '1-URGENT'
      |) ON c_custkey = o_custkey
      |WHERE c_custkey % 10 = 0
      |ORDER BY c_custkey, o_orderkey ASC NULLS FIRST""".stripMargin

  // Q_JOIN4 — full outer join of two per-nation aggregates with
  // deliberately non-overlapping key ranges on one side.
  private def joinFull(s: SparkSession, d: String): DataFrame = {
    val custPerNation = Tables.customer(s, d)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("n_cust"))
    val suppPerNation = Tables.supplier(s, d)
      .filter(col("s_nationkey") < 10)
      .groupBy(col("s_nationkey")).agg(count(lit(1)).as("n_supp"))
    custPerNation
      .join(suppPerNation, col("c_nationkey") === col("s_nationkey"), "full")
      .select(col("c_nationkey"), col("s_nationkey"),
        col("n_cust"), col("n_supp"))
      .orderBy(col("c_nationkey").asc_nulls_first,
        col("s_nationkey").asc_nulls_first)
  }

  private val joinFullSql =
    """SELECT c_nationkey, s_nationkey,
      |  CAST(n_cust AS BIGINT) AS n_cust, CAST(n_supp AS BIGINT) AS n_supp
      |FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY 1) c
      |FULL JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier
      |           WHERE s_nationkey < 10 GROUP BY 1) s
      |  ON c_nationkey = s_nationkey
      |ORDER BY c_nationkey ASC NULLS FIRST, s_nationkey ASC NULLS FIRST""".stripMargin

  // Q_JOIN5 — left semi (EXISTS): customers having ≥1 urgent order.
  private def joinSemi(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val urgent = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    c.join(urgent, c("c_custkey") === urgent("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val joinSemiSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // Q_JOIN6 — left anti (NOT EXISTS): customers with no urgent order
  // (unfiltered orders would match every customer — empty, trivial).
  private def joinAnti(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  private val joinAntiSql =
    """SELECT c_custkey, c_name FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  // Q_JOIN7 — cross join (small×small only; unbounded cross joins are
  // forbidden at scale).
  private def joinCross(s: SparkSession, d: String): DataFrame =
    Tables.region(s, d).crossJoin(Tables.nation(s, d))
      .select(col("r_regionkey"), col("r_name"), col("n_nationkey"), col("n_name"))
      .orderBy(col("r_regionkey"), col("n_nationkey"))

  private val joinCrossSql =
    """SELECT r_regionkey, r_name, n_nationkey, n_name
      |FROM region CROSS JOIN nation
      |ORDER BY r_regionkey, n_nationkey""".stripMargin

  // Q_JOIN8 — theta/non-equi self-join (BroadcastNestedLoop on the
  // broadcast-able side; at scale this needs banding/blocking, cf. N_SIM2).
  private def joinTheta(s: SparkSession, d: String): DataFrame = {
    val s1 = Tables.supplier(s, d).select(
      col("s_suppkey").as("k1"), col("s_acctbal").as("b1"))
    val s2 = Tables.supplier(s, d).select(
      col("s_suppkey").as("k2"), col("s_acctbal").as("b2"))
    s1.join(s2, col("k1") < col("k2") &&
        abs(col("b1") - col("b2")) < lit(10.0))
      .select(col("k1"), col("k2"),
        abs(col("b1") - col("b2")).as("bal_diff"))
      .orderBy(col("k1"), col("k2"))
  }

  private val joinThetaSql =
    """SELECT s1.s_suppkey AS k1, s2.s_suppkey AS k2,
      |  ABS(s1.s_acctbal - s2.s_acctbal) AS bal_diff
      |FROM supplier s1 JOIN supplier s2
      |  ON s1.s_suppkey < s2.s_suppkey
      | AND ABS(s1.s_acctbal - s2.s_acctbal) < 10.0
      |ORDER BY k1, k2""".stripMargin

  // Q_JOIN9 — multi-way star join (TPC-H Q3 shape): dim-filtered
  // customer ⋈ orders ⋈ lineitem, grouped, top-10 by revenue.
  private def joinStar(s: SparkSession, d: String): DataFrame = {
    val cutoff = lit("1997-06-30").cast("timestamp")
    val c = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val o = Tables.orders(s, d).filter(col("o_orderdate") < cutoff)
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > cutoff)
    c.join(o, col("c_custkey") === col("o_custkey"))
      .join(li, col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderdate"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 2)
        .as("revenue"))
      .select(col("o_orderkey"), col("o_orderdate").cast("date").as("order_date"),
        col("revenue"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(10)
  }

  private val joinStarSql =
    """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS order_date,
      |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-06-30 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-06-30 00:00:00'
      |GROUP BY o_orderkey, o_orderdate
      |ORDER BY revenue DESC, o_orderkey
      |LIMIT 10""".stripMargin

  // Q_JOIN14 — TPC-H-Q9-style profit rollup: a 5-table snowflake
  // (lineitem ⋈ orders ⋈ part ⋈ supplier ⋈ nation) grouped by
  // nation × order year. The fact side carries every shuffle; part is
  // filtered before the join (selective predicate first), supplier
  // and nation broadcast.
  private def joinProfit(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val o = Tables.orders(s, d)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val p = Tables.part(s, d).filter(col("p_name").contains("red"))
      .select(col("p_partkey"))
    val sup = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n = Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name"))
    li.join(p, col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"), col("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("profit"))
      .orderBy(col("n_name"), col("o_year"))
  }

  private val joinProfitSql =
    """SELECT n_name, CAST(year(o_orderdate) AS BIGINT) AS o_year,
      |  ROUND(SUM(l_extendedprice * (1.0 - l_discount)), 2) AS profit
      |FROM lineitem
      |JOIN part ON l_partkey = p_partkey
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |WHERE p_name LIKE '%red%'
      |GROUP BY n_name, year(o_orderdate)
      |ORDER BY n_name, o_year""".stripMargin

  // Q_JOIN10 — range/interval join: clicks within 1 h before a purchase
  // by the same user. Equi key (user_id) carries the shuffle; the range
  // predicate filters within each key group — the scalable shape.
  private def joinRange(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase").select(
      col("event_id").as("purchase_id"), col("user_id").as("p_user"),
      col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click").select(
      col("event_id").as("click_id"), col("user_id").as("c_user"),
      col("ts").as("c_ts"))
    p.join(c, col("p_user") === col("c_user") &&
        col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
        col("c_ts") <= col("p_ts"))
      .select(col("purchase_id"), col("click_id"), col("p_user").as("user_id"))
      .orderBy(col("purchase_id"), col("click_id"))
  }

  private val joinRangeSql =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id,
      |  p.user_id AS user_id
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON p.user_id = c.user_id
      | AND c.ts >= p.ts - INTERVAL 1 HOUR
      | AND c.ts <= p.ts
      |ORDER BY purchase_id, click_id""".stripMargin

  // Q_JOIN16 — local-supplier volume (TPC-H Q5 shape): six-table join
  // where customer AND supplier must share a nation — the join-order
  // stress test. Fact side shuffles on its keys; region/nation are
  // broadcast; the c_nationkey = s_nationkey conjunct rides the
  // supplier join rather than forcing an extra shuffle.
  private def joinVolume(s: SparkSession, d: String): DataFrame = {
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val n = Tables.nation(s, d)
    val o = Tables.orders(s, d).filter(
      col("o_orderdate") >= "1996-01-01" && col("o_orderdate") < "1997-01-01")
    Tables.lineitem(s, d)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey") &&
        col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  private val joinVolumeSql =
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1.0 - l_discount)), 2) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN supplier ON l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // Q_AGG16 — large-volume orders (TPC-H Q18 shape): pre-aggregate the
  // fact to find qualifying orders (partial agg before one shuffle on
  // the order key), then enrich — never join-then-aggregate the raw
  // fact against dimensions.
  private def aggLargeOrders(s: SparkSession, d: String): DataFrame = {
    val big = Tables.lineitem(s, d).groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).cast("long").as("total_qty"))
      .filter(col("total_qty") > 250)
    Tables.orders(s, d)
      .join(big, col("o_orderkey") === col("l_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("total_qty"))
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  private val aggLargeOrdersSql =
    """SELECT c_custkey, o_orderkey, o_totalprice,
      |  CAST(t.total_qty AS BIGINT) AS total_qty
      |FROM (SELECT l_orderkey, sum(l_quantity) AS total_qty
      |      FROM lineitem GROUP BY 1
      |      HAVING sum(l_quantity) > 250) t
      |JOIN orders ON o_orderkey = t.l_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  // Q_JOIN17 — volume shipping (TPC-H Q7 shape): bidirectional
  // two-nation trade by year. The nation pair predicate is a
  // disjunction over BOTH broadcast nation joins (supp side, cust
  // side); the fact side shuffles once per join key, the two tiny
  // nation dims broadcast, and the year rollup is a partial-agg
  // two-phase.
  private def joinVolumeShipping(s: SparkSession, d: String): DataFrame = {
    val n1 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation")))
    val n2 = broadcast(Tables.nation(s, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation")))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(Tables.supplier(s, d), col("l_suppkey") === col("s_suppkey"))
      .join(n1, col("s_nationkey") === col("s_nk"))
      .join(n2, col("c_nationkey") === col("c_nk"))
      .filter((col("supp_nation") === "NATION_3" &&
          col("cust_nation") === "NATION_7") ||
        (col("supp_nation") === "NATION_7" &&
          col("cust_nation") === "NATION_3"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))),
        2).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  private val joinVolumeShippingSql =
    """SELECT supp_nation, cust_nation, l_year,
      |  round(sum(volume), 2) AS revenue
      |FROM (
      |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      |    CAST(year(l_shipdate) AS BIGINT) AS l_year,
      |    l_extendedprice * (1.0 - l_discount) AS volume
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
      |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |  WHERE (n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
      |     OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // Q_AGG17 — small-quantity-order revenue (TPC-H Q17 shape): the
  // correlated "below 20% of this part's average quantity" predicate,
  // decorrelated into one per-part aggregate joined back to the fact —
  // the scan-twice-shuffle-once plan, never a per-row subquery.
  private def aggSmallQty(s: SparkSession, d: String): DataFrame = {
    val avgQty = Tables.lineitem(s, d).groupBy(col("l_partkey").as("p_pk"))
      .agg((avg(col("l_quantity")) * 0.2).as("qty_cut"))
    Tables.lineitem(s, d)
      .join(avgQty, col("l_partkey") === col("p_pk"))
      .filter(col("l_quantity") < col("qty_cut"))
      .agg(round(sum(col("l_extendedprice")) / 7.0, 2).as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  private val aggSmallQtySql =
    """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM lineitem l
      |JOIN (SELECT l_partkey AS p_pk, 0.2 * avg(l_quantity) AS qty_cut
      |      FROM lineitem GROUP BY 1) t
      |  ON l.l_partkey = t.p_pk
      |WHERE l.l_quantity < t.qty_cut""".stripMargin

  // Q_JOIN13 — skew-mitigated (salted) join, oracle-checked: the
  // salted plan replicates the build side nSalts× and splits each hot
  // probe key across salts, but its RESULT is exactly the plain join —
  // which is what the oracle states. SkewSpec separately asserts the
  // physical property (shuffle keys are (key, salt)).
  private def joinSalted(s: SparkSession, d: String): DataFrame = {
    val probe = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
    val build = Tables.supplier(s, d)
      .select(col("s_suppkey"), col("s_name"))
    graft.operators.Skew
      .saltedJoin(probe, build, "l_suppkey", "s_suppkey", "l_orderkey", 8)
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_items"),
        sum(round(col("l_quantity") * 100).cast("long")).as("qty_c"))
      .orderBy(col("s_name"))
  }

  private val joinSaltedSql =
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS n_items,
      |  CAST(SUM(CAST(ROUND(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_c
      |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      |GROUP BY s_name ORDER BY s_name""".stripMargin

  // Q_JOIN15 — binned range join: clicks within 5 min before a purchase
  // by ANY user — no equi key exists, so the scalable plan is the
  // time-binning rewrite (graft.operators.RangeJoin): equi-join on a
  // 5-min bin both sides shuffle-partition by, exact filter after.
  // PlanSpec asserts the plan has no nested-loop/cartesian join.
  private def joinBinnedRange(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase").select(
      col("event_id").as("purchase_id"),
      (col("ts") - expr("INTERVAL 5 MINUTE")).as("lo"), col("ts").as("hi"))
    val clicks = ev.filter(col("event_type") === "click").select(
      col("event_id").as("click_id"), col("ts").as("c_ts"),
      col("value").as("c_val"))
    val pairs = graft.operators.RangeJoin.binned(
      clicks, col("c_ts"), purchases, col("lo"), col("hi"), width = 300L)
    val perPurchase = pairs.groupBy(col("purchase_id")).agg(
      count(lit(1)).as("n_clicks"),
      round(sum(col("c_val")), 2).as("click_value"))
    purchases.select(col("purchase_id"))
      .join(perPurchase, Seq("purchase_id"), "left")
      .select(col("purchase_id"),
        coalesce(col("n_clicks"), lit(0L)).as("n_clicks"),
        coalesce(col("click_value"), lit(0.0)).as("click_value"))
      .orderBy(col("purchase_id"))
  }

  private val joinBinnedRangeSql =
    """SELECT p.event_id AS purchase_id,
      |  count(c.event_id) AS n_clicks,
      |  COALESCE(round(sum(c.value), 2), 0) AS click_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |  ON c.ts >= p.ts - INTERVAL 5 MINUTE AND c.ts <= p.ts
      |GROUP BY 1
      |ORDER BY purchase_id""".stripMargin

  // Q_JOIN11 — as-of join: latest click at-or-before each purchase per
  // user (range join + row_number, the window-SQL portable form).
  private def joinAsOf(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val p = ev.filter(col("event_type") === "purchase").select(
      col("event_id").as("purchase_id"), col("user_id").as("p_user"),
      col("ts").as("p_ts"))
    val c = ev.filter(col("event_type") === "click").select(
      col("event_id").as("click_id"), col("user_id").as("c_user"),
      col("ts").as("c_ts"))
    val joined = p.join(c, col("p_user") === col("c_user") &&
      col("c_ts") <= col("p_ts"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("purchase_id"))
      .orderBy(col("c_ts").desc, col("click_id").desc)
    joined.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("purchase_id"), col("p_user").as("user_id"), col("click_id"))
      .orderBy(col("purchase_id"))
  }

  private val joinAsOfSql =
    """SELECT purchase_id, user_id, click_id FROM (
      |  SELECT p.event_id AS purchase_id, p.user_id AS user_id,
      |    c.event_id AS click_id,
      |    ROW_NUMBER() OVER (PARTITION BY p.event_id
      |      ORDER BY c.ts DESC, c.event_id DESC) AS rn
      |  FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |  JOIN (SELECT * FROM events WHERE event_type = 'click') c
      |    ON p.user_id = c.user_id AND c.ts <= p.ts
      |) WHERE rn = 1 ORDER BY purchase_id""".stripMargin

  // Q_SORT1 — total order, multi-key, mixed direction.
  private def sortMultiKey(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_orderpriority"),
        col("o_orderdate").cast("date").as("order_date"))
      .orderBy(col("o_orderpriority").desc, col("order_date").asc,
        col("o_orderkey").asc)

  private val sortMultiKeySql =
    """SELECT o_orderkey, o_orderpriority, CAST(o_orderdate AS DATE) AS order_date
      |FROM orders
      |ORDER BY o_orderpriority DESC, order_date ASC, o_orderkey ASC""".stripMargin

  // Q_LIM1 — LIMIT after total order.
  private def limitK(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name"))
      .orderBy(col("n_nationkey")).limit(7)

  private val limitKSql =
    "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT 7"

  // Q_TOPK1 — global top-k (plans as TakeOrderedAndProject: per-partition
  // heap + driver merge, no total sort — the scalable top-k).
  private def topK(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_totalprice").as("total"))
      .orderBy(col("total").desc, col("o_orderkey"))
      .limit(10)

  private val topKSql =
    """SELECT o_orderkey, o_totalprice AS total FROM orders
      |ORDER BY total DESC, o_orderkey LIMIT 10""".stripMargin

  // Q_TOPK2 — per-group top-k via ranked window.
  private def topKPerGroup(s: SparkSession, d: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    Tables.customer(s, d)
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 3)
      .select(col("c_mktsegment"), col("rk"), col("c_custkey"),
        col("c_acctbal").as("acctbal"))
      .orderBy(col("c_mktsegment"), col("rk"))
  }

  private val topKPerGroupSql =
    """SELECT c_mktsegment, rk, c_custkey, acctbal FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal AS acctbal,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal DESC, c_custkey) AS INTEGER) AS rk
      |  FROM customer
      |) WHERE rk <= 3 ORDER BY c_mktsegment, rk""".stripMargin

  // Q_TOPK3 — per-group top-k through the CUSTOM whole-plan operator
  // (graft.plans.TopKPerKey: logical node + injected strategy +
  // two-phase partial/final exec). Same result contract as Q_TOPK2's
  // window formulation, but the pre-shuffle phase prunes every
  // partition to ≤ k rows per key, so the exchange carries k·|keys|
  // rows per partition instead of the whole table — the shape that
  // matters at 100 TB (see the node's scaladoc).
  private def topKCustom(s: SparkSession, d: String): DataFrame =
    graft.operators.TopK.perKey(
      Tables.customer(s, d).select(col("c_mktsegment"), col("c_custkey"),
        col("c_acctbal").as("acctbal")),
      keys = Seq("c_mktsegment"),
      orderBy = Seq(("acctbal", false), ("c_custkey", true)),
      k = 3)
      .orderBy(col("c_mktsegment"), col("acctbal").desc, col("c_custkey"))

  private val topKCustomSql =
    """SELECT c_mktsegment, c_custkey, acctbal FROM (
      |  SELECT c_mktsegment, c_custkey, c_acctbal AS acctbal,
      |    ROW_NUMBER() OVER (PARTITION BY c_mktsegment
      |      ORDER BY c_acctbal DESC, c_custkey) AS rk
      |  FROM customer) WHERE rk <= 3
      |ORDER BY c_mktsegment, acctbal DESC, c_custkey""".stripMargin

  private def urgent(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT")
      .select(col("o_orderkey"))
  private def big(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).filter(col("o_totalprice") > 150000.0)
      .select(col("o_orderkey"))

  // Q_SET1 — UNION ALL (bag union, keeps duplicates).
  private def unionAll(s: SparkSession, d: String): DataFrame =
    urgent(s, d).union(big(s, d)).orderBy(col("o_orderkey"))

  private val unionAllSql =
    """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION ALL
      |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
      |ORDER BY o_orderkey""".stripMargin

  // Q_SET2 — UNION DISTINCT.
  private def unionDistinct(s: SparkSession, d: String): DataFrame =
    urgent(s, d).union(big(s, d)).distinct().orderBy(col("o_orderkey"))

  private val unionDistinctSql =
    """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |UNION
      |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
      |ORDER BY o_orderkey""".stripMargin

  // Q_SET3 — INTERSECT.
  private def intersectQ(s: SparkSession, d: String): DataFrame =
    urgent(s, d).intersect(big(s, d)).orderBy(col("o_orderkey"))

  private val intersectSql =
    """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |INTERSECT
      |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
      |ORDER BY o_orderkey""".stripMargin

  // Q_SET4 — EXCEPT.
  private def exceptQ(s: SparkSession, d: String): DataFrame =
    urgent(s, d).except(big(s, d)).orderBy(col("o_orderkey"))

  private val exceptSql =
    """SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT'
      |EXCEPT
      |SELECT o_orderkey FROM orders WHERE o_totalprice > 150000.0
      |ORDER BY o_orderkey""".stripMargin

  // Q_SET6 — multiset (ALL) set ops: duplicates preserved by count,
  // the bag-semantics twins of Q_SET3/4.
  private def setAll(s: SparkSession, d: String): DataFrame = {
    val a = Tables.lineitem(s, d).select(col("l_returnflag").as("f"))
    val b = Tables.lineitem(s, d).filter(col("l_quantity") > 25.0)
      .select(col("l_returnflag").as("f"))
    a.exceptAll(b).groupBy(col("f")).agg(count(lit(1)).as("n_except"))
      .join(a.intersectAll(b).groupBy(col("f"))
        .agg(count(lit(1)).as("n_intersect")), Seq("f"), "full")
      .orderBy(col("f"))
  }

  private val setAllSql =
    """WITH a AS (SELECT l_returnflag AS f FROM lineitem),
      |b AS (SELECT l_returnflag AS f FROM lineitem WHERE l_quantity > 25.0),
      |ex AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n_except
      |  FROM (SELECT f FROM a EXCEPT ALL SELECT f FROM b) GROUP BY f),
      |ia AS (SELECT f, CAST(COUNT(*) AS BIGINT) AS n_intersect
      |  FROM (SELECT f FROM a INTERSECT ALL SELECT f FROM b) GROUP BY f)
      |SELECT COALESCE(ex.f, ia.f) AS f, n_except, n_intersect
      |FROM ex FULL JOIN ia ON ex.f = ia.f
      |ORDER BY f""".stripMargin

  // Q_SET5 — DISTINCT over a projection.
  private def distinctQ(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val distinctSql =
    """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("Q_PROJ1_project_arith", projArith, Some(projArithSql)),
    GQuery("Q_FILT1_predicates", filtPredicates, Some(filtPredicatesSql)),
    GQuery("Q_FILT2_conditional", filtConditional, Some(filtConditionalSql)),
    GQuery("Q_JOIN1_inner", joinInner, Some(joinInnerSql)),
    GQuery("Q_JOIN2_broadcast_dims", joinBroadcast, Some(joinBroadcastSql)),
    GQuery("Q_JOIN3_left_outer", joinLeft, Some(joinLeftSql)),
    GQuery("Q_JOIN4_full_outer", joinFull, Some(joinFullSql)),
    GQuery("Q_JOIN5_left_semi", joinSemi, Some(joinSemiSql)),
    GQuery("Q_JOIN6_left_anti", joinAnti, Some(joinAntiSql)),
    GQuery("Q_JOIN7_cross", joinCross, Some(joinCrossSql)),
    GQuery("Q_JOIN8_theta", joinTheta, Some(joinThetaSql)),
    GQuery("Q_JOIN9_star_top10", joinStar, Some(joinStarSql)),
    GQuery("Q_JOIN14_profit", joinProfit, Some(joinProfitSql)),
    GQuery("Q_JOIN10_range", joinRange, Some(joinRangeSql)),
    GQuery("Q_JOIN15_binned_range", joinBinnedRange, Some(joinBinnedRangeSql)),
    GQuery("Q_JOIN16_local_volume", joinVolume, Some(joinVolumeSql)),
    GQuery("Q_AGG16_large_orders", aggLargeOrders, Some(aggLargeOrdersSql)),
    GQuery("Q_JOIN17_volume_shipping", joinVolumeShipping,
      Some(joinVolumeShippingSql)),
    GQuery("Q_JOIN13_salted", joinSalted, Some(joinSaltedSql)),
    GQuery("Q_AGG17_small_qty", aggSmallQty, Some(aggSmallQtySql)),
    GQuery("Q_JOIN11_asof", joinAsOf, Some(joinAsOfSql)),
    GQuery("Q_SORT1_multikey", sortMultiKey, Some(sortMultiKeySql)),
    GQuery("Q_LIM1_limit", limitK, Some(limitKSql)),
    GQuery("Q_TOPK1_global", topK, Some(topKSql)),
    GQuery("Q_TOPK2_per_group", topKPerGroup, Some(topKPerGroupSql)),
    GQuery("Q_TOPK3_custom", topKCustom, Some(topKCustomSql)),
    GQuery("Q_SET1_union_all", unionAll, Some(unionAllSql)),
    GQuery("Q_SET2_union_distinct", unionDistinct, Some(unionDistinctSql)),
    GQuery("Q_SET3_intersect", intersectQ, Some(intersectSql)),
    GQuery("Q_SET4_except", exceptQ, Some(exceptSql)),
    GQuery("Q_SET5_distinct", distinctQ, Some(distinctSql)),
    GQuery("Q_SET6_all_ops", setAll, Some(setAllSql)))
}

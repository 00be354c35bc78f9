package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}

/** SURVEY §2 table Q — aggregation surface (Q_AGG*).
  *
  * Scale notes: every groupBy here has low-cardinality keys relative to
  * input, so Spark's partial (map-side) aggregation collapses data
  * before the shuffle — the same property the era-Hive `hive.map.aggr`
  * path provided. count(DISTINCT) expands to a two-phase Expand+Agg
  * plan, which is the distributed-exact form; the sketch twin
  * (approx_count_distinct, HLL) is declared rows-only since a sketch
  * can't hash-match an exact oracle.
  *
  * Determinism: DuckDB promotes SUM(INTEGER|BIGINT) to HUGEINT — every
  * integer sum is CAST to BIGINT in the oracle; double aggregates are
  * rounded (2 for sums, 4 for ratios/moments); arrays are sorted before
  * emission.
  */
object Aggregates {

  // Q_AGG1 — groupBy with the core agg family.
  private def aggGroupBy(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .groupBy(col("p_brand"))
      .agg(
        count(lit(1)).as("n_parts"),
        round(sum(col("p_retailprice")), 2).as("sum_price"),
        round(avg(col("p_retailprice")), 4).as("avg_price"),
        min(col("p_size")).as("min_size"),
        max(col("p_size")).as("max_size"),
        sum(col("p_size")).cast("long").as("sum_size"))
      .orderBy(col("p_brand"))

  private val aggGroupBySql =
    """SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  ROUND(SUM(p_retailprice), 2) AS sum_price,
      |  ROUND(AVG(p_retailprice), 4) AS avg_price,
      |  MIN(p_size) AS min_size, MAX(p_size) AS max_size,
      |  CAST(SUM(p_size) AS BIGINT) AS sum_size
      |FROM part GROUP BY p_brand ORDER BY p_brand""".stripMargin

  // Q_AGG2 — global aggregate, no grouping keys.
  private def aggGlobal(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .agg(
        count(lit(1)).as("n_rows"),
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        min(col("l_shipdate")).cast("date").as("min_ship"),
        max(col("l_shipdate")).cast("date").as("max_ship"))

  private val aggGlobalSql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty,
      |  ROUND(AVG(l_extendedprice), 4) AS avg_price,
      |  CAST(MIN(l_shipdate) AS DATE) AS min_ship,
      |  CAST(MAX(l_shipdate) AS DATE) AS max_ship
      |FROM lineitem""".stripMargin

  // Q_AGG3 — count(DISTINCT x), multiple distincts in one aggregate.
  private def aggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))

  private val aggDistinctSql =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_part,
      |  CAST(COUNT(*) AS BIGINT) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // Q_AGG4 — collect_list/collect_set, order-normalized via array_sort
  // (SURVEY §7.4 rule 5: never emit an unsorted collected array) and
  // '|'-joined: the driver's comparer hashes scalars only.
  private def aggCollect(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .groupBy(col("s_nationkey"))
      .agg(array_join(array_sort(collect_list(col("s_name"))), "|")
        .as("names"))
      .orderBy(col("s_nationkey"))

  private val aggCollectSql =
    """SELECT s_nationkey,
      |  array_to_string(list(s_name ORDER BY s_name), '|') AS names
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // Q_AGG5 — statistical moments: stddev/variance (samp+pop), corr, covar.
  private def aggStats(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        round(stddev_samp(col("l_quantity")), 4).as("sd_qty"),
        round(stddev_pop(col("l_quantity")), 4).as("sdp_qty"),
        round(var_samp(col("l_extendedprice")), 2).as("var_price"),
        (round(corr(col("l_quantity"), col("l_extendedprice")), 4) + lit(0.0))
          .as("corr_qp"),
        (round(covar_samp(col("l_quantity"), col("l_discount")), 4) + lit(0.0))
          .as("cov_qd"))
      .orderBy(col("l_linestatus"))

  private val aggStatsSql =
    """SELECT l_linestatus,
      |  ROUND(STDDEV_SAMP(l_quantity), 4) AS sd_qty,
      |  ROUND(STDDEV_POP(l_quantity), 4) AS sdp_qty,
      |  ROUND(VAR_SAMP(l_extendedprice), 2) AS var_price,
      |  ROUND(CORR(l_quantity, l_extendedprice), 4) + 0.0 AS corr_qp,
      |  ROUND(COVAR_SAMP(l_quantity, l_discount), 4) + 0.0 AS cov_qd
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // Q_AGG6 — exact percentile / median (linear interpolation definition
  // in both engines: Spark `percentile` = DuckDB `quantile_cont`).
  private def aggPercentile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_linestatus"))
      .agg(
        round(expr("percentile(l_quantity, 0.5)"), 4).as("p50_qty"),
        round(expr("percentile(l_quantity, 0.9)"), 4).as("p90_qty"),
        round(expr("percentile(l_extendedprice, 0.25)"), 4).as("p25_price"))
      .orderBy(col("l_linestatus"))

  private val aggPercentileSql =
    """SELECT l_linestatus,
      |  ROUND(QUANTILE_CONT(l_quantity, 0.5), 4) AS p50_qty,
      |  ROUND(QUANTILE_CONT(l_quantity, 0.9), 4) AS p90_qty,
      |  ROUND(QUANTILE_CONT(l_extendedprice, 0.25), 4) AS p25_price
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // Q_AGG7 — approx percentile (Greenwald-Khanna sketch). With
  // accuracy ≥ n the sketch stores every sample and the answer is the
  // exact order statistic — so the sketch path itself becomes
  // oracle-checkable (DuckDB quantile_disc) while still exercising the
  // mergeable-summary aggregation plan the 100 TB case uses. The
  // accuracy is DERIVED from the input count (not a fixed 1e6) so the
  // exactness precondition holds at every scale factor — at a fixed
  // accuracy the sketch would silently go approximate once per-group
  // rows exceed it and the hash oracle would flake with scale. (In a
  // real 100 TB job one uses a fixed accuracy and tolerates the bounded
  // error; the derivation here exists for the exact-match gate.)
  private def aggApproxPercentile(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val acc = math.min(math.max(li.count(), 10000L), Int.MaxValue.toLong).toInt
    li.groupBy(col("l_linestatus"))
      .agg(percentile_approx(col("l_quantity"), lit(0.5), lit(acc))
        .as("p50_approx"))
      .orderBy(col("l_linestatus"))
  }

  private val aggApproxPercentileSql =
    """SELECT l_linestatus, quantile_disc(l_quantity, 0.5) AS p50_approx
      |FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""".stripMargin

  // Q_AGG8 — HAVING (post-aggregation filter).
  private def aggHaving(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_total"))
      .filter(col("n_orders") >= 15)
      .orderBy(col("o_custkey"))

  private val aggHavingSql =
    """SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  ROUND(SUM(o_totalprice), 2) AS sum_total
      |FROM orders GROUP BY o_custkey
      |HAVING COUNT(*) >= 15 ORDER BY o_custkey""".stripMargin

  // Q_AGG9 — ROLLUP with grouping() flags to disambiguate NULL key rows.
  private def aggRollup(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
        count(lit(1)).as("n"))
      .select(col("l_returnflag"), col("l_linestatus"), col("sum_qty"), col("n"))
      .orderBy(col("l_returnflag").asc_nulls_first,
        col("l_linestatus").asc_nulls_first)

  private val aggRollupSql =
    """SELECT l_returnflag, l_linestatus,
      |  ROUND(SUM(l_quantity), 2) AS sum_qty, CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
      |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin

  // Q_AGG10 — CUBE.
  private def aggCube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("o_orderstatus").asc_nulls_first,
        col("o_orderpriority").asc_nulls_first)

  private val aggCubeSql =
    """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
      |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // Q_AGG11 — GROUPING SETS (SQL-only surface in Spark).
  private def aggGroupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql(
      """SELECT o_orderstatus, o_orderpriority, COUNT(1) AS n
        |FROM orders_gs
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |  o_orderpriority ASC NULLS FIRST""".stripMargin)
  }

  private val aggGroupingSetsSql =
    """SELECT o_orderstatus, o_orderpriority, CAST(COUNT(1) AS BIGINT) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY o_orderstatus ASC NULLS FIRST,
      |  o_orderpriority ASC NULLS FIRST""".stripMargin

  // Q_AGG12 — HLL approximate distinct (exact twin = Q_AGG3). The HLL
  // estimate itself is engine-specific, so the emitted columns are the
  // exact count plus a deterministic within-tolerance flag — the
  // property an HLL must satisfy — which DuckDB can oracle as TRUE.
  private def aggApproxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.02).as("ap"),
        countDistinct(col("l_partkey")).as("n_exact"))
      .select(col("l_returnflag"), col("n_exact"),
        (abs(col("ap") - col("n_exact")) <= col("n_exact") * 0.05)
          .as("approx_ok"))
      .orderBy(col("l_returnflag"))

  private val aggApproxDistinctSql =
    """SELECT l_returnflag,
      |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_exact,
      |  TRUE AS approx_ok
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin

  // Q_AGG14 — PIVOT: long → wide with an EXPLICIT value list (value
  // discovery would be a nondeterministic extra pass); columns
  // re-aliased to parquet-safe names. Oracle: conditional aggregation,
  // the engine-portable spelling of the same thing.
  private def aggPivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderstatus"))
      .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .select(col("o_orderstatus"),
        col("`1-URGENT`").as("p_urgent"), col("`2-HIGH`").as("p_high"),
        col("`3-MEDIUM`").as("p_medium"),
        col("`4-NOT SPECIFIED`").as("p_notspec"),
        col("`5-LOW`").as("p_low"))
      .orderBy(col("o_orderstatus"))

  private val aggPivotSql =
    """SELECT o_orderstatus,
      |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS BIGINT) AS p_urgent,
      |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '2-HIGH') AS BIGINT) AS p_high,
      |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '3-MEDIUM') AS BIGINT) AS p_medium,
      |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '4-NOT SPECIFIED') AS BIGINT) AS p_notspec,
      |  CAST(COUNT(*) FILTER (WHERE o_orderpriority = '5-LOW') AS BIGINT) AS p_low
      |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin

  // Q_AGG15 — UNPIVOT/melt: wide → long (the inverse surface).
  private def aggUnpivot(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .filter(col("p_partkey") % 200 === 0)
      .select(col("p_partkey"), col("p_size").cast("double").as("size"),
        col("p_retailprice").as("retail"))
      .unpivot(Array(col("p_partkey")),
        Array(col("size"), col("retail")), "metric", "val")
      .orderBy(col("p_partkey"), col("metric"))

  private val aggUnpivotSql =
    """SELECT p_partkey, metric, val FROM (
      |  SELECT p_partkey, 'size' AS metric, CAST(p_size AS DOUBLE) AS val
      |  FROM part WHERE p_partkey % 200 = 0
      |  UNION ALL
      |  SELECT p_partkey, 'retail', p_retailprice
      |  FROM part WHERE p_partkey % 200 = 0)
      |ORDER BY p_partkey, metric""".stripMargin

  // Q_AGG13 — max_by / min_by (argmax — the primitive behind C4 LWW).
  private def aggMaxBy(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .groupBy(col("s_nationkey"))
      .agg(
        max_by(col("s_name"), col("s_acctbal")).as("richest"),
        min_by(col("s_name"), col("s_acctbal")).as("poorest"),
        max(col("s_acctbal")).as("max_bal"))
      .orderBy(col("s_nationkey"))

  private val aggMaxBySql =
    """SELECT s_nationkey, ARG_MAX(s_name, s_acctbal) AS richest,
      |  ARG_MIN(s_name, s_acctbal) AS poorest,
      |  MAX(s_acctbal) AS max_bal
      |FROM supplier GROUP BY s_nationkey ORDER BY s_nationkey""".stripMargin

  // Q_AGG18 — deterministic mode: the most frequent value per group,
  // ties broken toward the SMALLEST value. Native `mode()` is
  // tie-nondeterministic in both engines (SURVEY §7.4), so the
  // portable form is count + row_number — same two-shuffle shape as
  // any top-1-per-group.
  private def aggMode(s: SparkSession, d: String): DataFrame = {
    val counts = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"),
        (col("l_quantity") * 100).cast("long").as("qty_c"))
      .agg(count(lit(1)).as("n_occ"))
    counts
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l_returnflag"))
          .orderBy(col("n_occ").desc, col("qty_c"))))
      .filter(col("rn") === 1).drop("rn")
      .orderBy(col("l_returnflag"))
  }

  private val aggModeSql =
    """SELECT l_returnflag, qty_c, n_occ FROM (
      |  SELECT l_returnflag, CAST(l_quantity * 100 AS BIGINT) AS qty_c,
      |    CAST(COUNT(*) AS BIGINT) AS n_occ,
      |    ROW_NUMBER() OVER (PARTITION BY l_returnflag
      |      ORDER BY COUNT(*) DESC, CAST(l_quantity * 100 AS BIGINT)) AS rn
      |  FROM lineitem GROUP BY 1, 2)
      |WHERE rn = 1 ORDER BY l_returnflag""".stripMargin

  // Q_AGG19 — conditional/boolean aggregates: count_if + bool_and/
  // bool_or (ANSI ANY/EVERY) — single partial-aggregable pass.
  private def aggCondBool(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count_if(col("o_totalprice") > 100000).as("n_big"),
        bool_and(col("o_totalprice") > 1000).cast("long").as("all_over_1k"),
        bool_or(col("o_totalprice") > 400000).cast("long").as("any_over_400k"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))

  private val aggCondBoolSql =
    """SELECT o_orderpriority,
      |  CAST(count_if(o_totalprice > 100000) AS BIGINT) AS n_big,
      |  CAST(bool_and(o_totalprice > 1000) AS BIGINT) AS all_over_1k,
      |  CAST(bool_or(o_totalprice > 400000) AS BIGINT) AS any_over_400k,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin

  // Q_AGG20 — bitwise aggregates: bit_and/bit_or/bit_xor over a
  // bounded integer domain + summed popcount. Exact integers, fully
  // partial-aggregable (each bit op is associative-commutative).
  private def aggBitwise(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select((col("o_orderkey") % 16).as("g"),
        (col("o_orderkey") % 4096).as("v"))
      .groupBy(col("g"))
      .agg(bit_and(col("v")).as("band"), bit_or(col("v")).as("bor"),
        bit_xor(col("v")).as("bxor"),
        sum(expr("bit_count(v)")).as("popcnt"))
      .orderBy(col("g"))

  private val aggBitwiseSql =
    """SELECT o_orderkey % 16 AS g,
      |  CAST(bit_and(o_orderkey % 4096) AS BIGINT) AS band,
      |  CAST(bit_or(o_orderkey % 4096) AS BIGINT) AS bor,
      |  CAST(bit_xor(o_orderkey % 4096) AS BIGINT) AS bxor,
      |  CAST(SUM(bit_count(CAST(o_orderkey % 4096 AS BIGINT))) AS BIGINT)
      |    AS popcnt
      |FROM orders GROUP BY 1 ORDER BY g""".stripMargin

  def all: Seq[GQuery] = Seq(
    GQuery("Q_AGG18_mode_deterministic", aggMode, Some(aggModeSql)),
    GQuery("Q_AGG19_cond_bool", aggCondBool, Some(aggCondBoolSql)),
    GQuery("Q_AGG20_bitwise", aggBitwise, Some(aggBitwiseSql)),
    GQuery("Q_AGG1_groupby", aggGroupBy, Some(aggGroupBySql)),
    GQuery("Q_AGG2_global", aggGlobal, Some(aggGlobalSql)),
    GQuery("Q_AGG3_count_distinct", aggDistinct, Some(aggDistinctSql)),
    GQuery("Q_AGG4_collect_sorted", aggCollect, Some(aggCollectSql)),
    GQuery("Q_AGG5_stats_moments", aggStats, Some(aggStatsSql)),
    GQuery("Q_AGG6_percentile_exact", aggPercentile, Some(aggPercentileSql)),
    GQuery("Q_AGG7_percentile_approx", aggApproxPercentile,
      Some(aggApproxPercentileSql)),
    GQuery("Q_AGG8_having", aggHaving, Some(aggHavingSql)),
    GQuery("Q_AGG9_rollup", aggRollup, Some(aggRollupSql)),
    GQuery("Q_AGG10_cube", aggCube, Some(aggCubeSql)),
    GQuery("Q_AGG11_grouping_sets", aggGroupingSets, Some(aggGroupingSetsSql)),
    GQuery("Q_AGG12_approx_distinct", aggApproxDistinct,
      Some(aggApproxDistinctSql)),
    GQuery("Q_AGG13_max_by", aggMaxBy, Some(aggMaxBySql)),
    GQuery("Q_AGG14_pivot", aggPivot, Some(aggPivotSql)),
    GQuery("Q_AGG15_unpivot", aggUnpivot, Some(aggUnpivotSql)))
}

package graft

import org.apache.spark.sql.functions._

/** Physical-plan assertions (SURVEY §4): the plans we designed for are
  * the plans Catalyst actually produces. Also covers the two
  * partition-physical inventory rows that can't be oracle-checked:
  * Q_SORT2 (SORT BY) and Q_SORT3 (DISTRIBUTE BY / CLUSTER BY).
  */
class PlanSpec extends GraftSpec {

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("Q_JOIN2 broadcasts the dims (no fact-side shuffle)") {
    val p = plan(Registry.byName("Q_JOIN2_broadcast_dims").fn(spark, sf()))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("Q_TOPK1 plans TakeOrderedAndProject (no global sort)") {
    val p = plan(Registry.byName("Q_TOPK1_global").fn(spark, sf()))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("flagship q1 pushes the shipdate filter into the parquet scan") {
    val p = plan(Registry.byName("q1_pricing_summary").fn(spark, sf()))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "LessThanOrEqual(l_shipdate,"), p)
    // partial (map-side) aggregation before the shuffle
    assert(p.contains("partial_sum"), p)
  }

  test("Q_SORT2: sortWithinPartitions adds no exchange") {
    val base = Tables.orders(spark, sf())
    val p = plan(base.sortWithinPartitions(col("o_orderdate")))
    assert(!p.contains("Exchange"), p)
    assert(p.contains("Sort"), p)
  }

  test("Q_SORT3: DISTRIBUTE BY + SORT BY = hash exchange + local sort") {
    val base = Tables.orders(spark, sf())
    val p = plan(base.repartition(col("o_custkey"))
      .sortWithinPartitions(col("o_orderdate")))
    assert(p.contains("Exchange hashpartitioning(o_custkey"), p)
    assert(p.contains("Sort [o_orderdate"), p)
    assert(!p.contains("rangepartitioning"), p)
  }

  test("N_SIM1 top-k over embeddings avoids a full global sort") {
    val p = plan(Registry.byName("N_SIM1_cosine_topk").fn(spark, sf()))
    assert(p.contains("TakeOrderedAndProject"), p)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.operators.Skew

/** Salting operators: result equivalence with the unsalted forms and
  * the salted shuffle shape.
  */
class SkewSpec extends GraftSpec {
  import spark.implicits._

  // Skewed fixture: key = l_orderkey % 3 (three hot keys).
  private lazy val fact = Tables.lineitem(spark, sf())
    .select((col("l_orderkey") % 3).as("k"), col("l_linenumber").as("ln"),
      col("l_extendedprice").as("v"))
  private lazy val dim = Seq((0L, "a"), (1L, "b"), (2L, "c"))
    .toDF("dk", "label")

  test("salted join equals the plain join on skewed keys") {
    val plain = fact.join(dim, col("k") === col("dk"))
      .select(col("k"), col("ln"), col("v"), col("label"))
    val salted = Skew.saltedJoin(fact, dim, "k", "dk", "ln", 8)
      .select(col("k"), col("ln"), col("v"), col("label"))
    assert(salted.count() == plain.count())
    assert(salted.except(plain).isEmpty && plain.except(salted).isEmpty)
  }

  test("salted join shuffles on (key, salt), not key alone") {
    // Disable broadcast so the shuffle actually materializes.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val p = Skew.saltedJoin(fact, dim, "k", "dk", "ln", 8)
        .queryExecution.executedPlan.toString
      assert(p.contains("hashpartitioning(k"), p)
      assert(p.contains("__graft_salt"), p)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("salted two-phase aggregation equals the direct aggregation") {
    val direct = fact.groupBy(col("k"))
      .agg(sum(col("v")).as("sum_value"), count(lit(1)).as("n"))
    val salted = Skew.saltedSumCount(fact, "k", "v", "ln", 8)
    val d = direct.select(col("k"), round(col("sum_value"), 2).as("s"),
      col("n"))
    val sl = salted.select(col("k"), round(col("sum_value"), 2).as("s"),
      col("n"))
    assert(sl.except(d).isEmpty && d.except(sl).isEmpty)
  }
}

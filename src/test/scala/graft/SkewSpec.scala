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

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // One hot key dominates its shuffle partition; with thresholds
    // scaled to test data, OptimizeSkewedJoin must split that
    // partition into parallel subtasks (plan tags the SMJ skew=true).
    // This is the runtime complement of the salting operators below:
    // AQE handles skew adaptively, salting handles it by layout.
    val confs = Seq(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 60000)
        .select((when(col("id") % 10 =!= 0, lit(0L))
          .otherwise(col("id") % 97)).as("k"), col("id").as("payload"))
      val right = spark.range(0, 97).select(col("id").as("rk"),
        (col("id") * 2).as("rv"))
      val joined = left.join(right, col("k") === col("rk"))
      // collect() (not count()) so THIS DataFrame's adaptive plan is
      // the one that executes and finalizes
      assert(joined.collect().length === 60000)
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("skew=true"), p)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

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

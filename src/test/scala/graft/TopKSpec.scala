package graft

import org.apache.spark.sql.functions._

/** The custom whole-plan operator ([[graft.plans.TopKPerKey]]) and the
  * injected optimizer rule ([[graft.plans.LevenshteinLengthGuard]]) —
  * the (c)-tier SparkSessionExtensions surface.
  */
class TopKSpec extends GraftSpec {

  test("TopK.perKey matches the window-function formulation") {
    val base = spark.read.parquet(s"${sf()}/customer.parquet")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
    val custom = graft.operators.TopK.perKey(base,
      keys = Seq("c_mktsegment"),
      orderBy = Seq(("c_acctbal", false), ("c_custkey", true)), k = 5)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("c_mktsegment"))
      .orderBy(col("c_acctbal").desc, col("c_custkey"))
    val windowed = base.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5).drop("rk")
    assert(custom.count() === windowed.count())
    assert(custom.exceptAll(windowed).isEmpty &&
      windowed.exceptAll(custom).isEmpty)
  }

  test("TopK.perKey plans partial + exchange + final (two-phase)") {
    val base = spark.read.parquet(s"${sf()}/customer.parquet")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
    val custom = graft.operators.TopK.perKey(base,
      keys = Seq("c_mktsegment"),
      orderBy = Seq(("c_acctbal", false), ("c_custkey", true)), k = 5)
    custom.count() // materialize AQE final plan
    val p = custom.queryExecution.executedPlan.toString
    assert(p.contains("GraftTopKPerKeyPartial"), p)
    assert(p.contains("GraftTopKPerKeyFinal"), p)
    // the partial phase must sit BELOW the exchange (prune, then ship)
    val partialIdx = p.indexOf("GraftTopKPerKeyPartial")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    val finalIdx = p.indexOf("GraftTopKPerKeyFinal")
    assert(exchangeIdx >= 0 && finalIdx < exchangeIdx &&
      exchangeIdx < partialIdx, p)
  }

  test("TopK.perKey partial phase bounds what the shuffle carries") {
    // 8 input partitions, 5 distinct segments, k=2: the exchange input
    // (= partial output) is at most 8 * 5 * 2 = 80 rows, never the
    // full 150-row table. Count partial output directly.
    val base = spark.read.parquet(s"${sf()}/customer.parquet")
      .select(col("c_mktsegment"), col("c_custkey"), col("c_acctbal"))
      .repartition(8)
    // static plan for this test: AQE wraps the tree in
    // AdaptiveSparkPlanExec, which hides the exec nodes from collect
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val partial = try {
      val custom = graft.operators.TopK.perKey(base,
        keys = Seq("c_mktsegment"),
        orderBy = Seq(("c_acctbal", false), ("c_custkey", true)), k = 2)
      custom.count()
      custom.queryExecution.executedPlan.collectFirst {
        case e: graft.plans.TopKPerKeyExec if e.partial => e
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    assert(partial.nonEmpty, "partial exec node not found")
    val shipped = partial.get.execute().count()
    val total = base.count()
    assert(shipped <= 80, s"partial shipped $shipped rows")
    assert(shipped < total, s"no pruning: $shipped of $total")
  }

  test("LevenshteinLengthGuard adds the length prefilter (idempotent)") {
    GraftExtensions.register(spark)
    val df = spark.read.parquet(s"${sf()}/nation.parquet")
      .select(col("n_name")).crossJoin(
        spark.read.parquet(s"${sf()}/region.parquet")
          .select(col("r_name")))
      .filter(levenshtein(col("n_name"), col("r_name")) <= 2)
    val optimized = df.queryExecution.optimizedPlan.toString
    assert(optimized.contains("abs((length(n_name"), optimized)
    // guard is implied, never changes results
    val expected = spark.read.parquet(s"${sf()}/nation.parquet")
      .select(col("n_name")).crossJoin(
        spark.read.parquet(s"${sf()}/region.parquet")
          .select(col("r_name")))
      .collect().count { r =>
        val (a, b) = (r.getString(0), r.getString(1))
        org.apache.commons.text.similarity.LevenshteinDistance
          .getDefaultInstance.apply(a, b) <= 2
      }
    assert(df.count() === expected)
  }
}

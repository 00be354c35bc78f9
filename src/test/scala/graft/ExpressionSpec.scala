package graft

import org.apache.spark.sql.functions._
import graft.sim.Similarity

/** The native codegen'd expression surface ([[graft.functions.CosineSim]]
  * via [[GraftExtensions]]): SQL registration, bit-equality with the
  * HOF formulation, and codegen compatibility.
  */
class ExpressionSpec extends GraftSpec {
  import spark.implicits._

  private lazy val vecs = Tables.embeddings(spark, sf())
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))

  test("graft_cosine registers through GraftExtensions and runs in SQL") {
    GraftExtensions.register(spark)
    vecs.createOrReplaceTempView("vecs_sql")
    val r = spark.sql(
      "SELECT graft_cosine(v, v) AS c FROM vecs_sql LIMIT 5")
      .as[Double].collect()
    assert(r.length == 5 && r.forall(c => math.abs(c - 1.0) < 1e-12))
  }

  test("native cosine is bit-identical to the HOF fold") {
    val q = vecs.filter(col("vec_id") === 0)
      .select(col("v").as("qv"))
    val joined = vecs.crossJoin(broadcast(q))
    val native = Similarity.cosineNative(vecs, "v", "qv")
    val hof = Similarity.dot("v", "qv") /
      (sqrt(Similarity.dot("v", "v")) * sqrt(Similarity.dot("qv", "qv")))
    val diffs = joined
      .select((native === hof || (isnan(native) && isnan(hof))).as("same"))
      .filter(!col("same")).count()
    assert(diffs == 0) // exact ==, not tolerance: same fp op order
  }

  test("graft_cosine participates in whole-stage codegen") {
    GraftExtensions.register(spark)
    val q = vecs.filter(col("vec_id") === 0).select(col("v").as("qv"))
    val df = vecs.crossJoin(broadcast(q))
      .select(expr("graft_cosine(v, qv)").as("c"))
    df.collect() // finalize the adaptive plan
    val plan = df.queryExecution.executedPlan.toString
    // '*(n)' is the whole-stage-codegen stage marker: the projection
    // evaluating graft_cosine must carry one (no fallback to
    // interpreted eval).
    assert("""\*\(\d+\) Project \[graft_cosine""".r
      .findFirstIn(plan).isDefined, plan)
  }

  test("null inputs yield null, not a crash") {
    GraftExtensions.register(spark)
    val df = Seq((Some(Seq(1.0, 0.0)), None: Option[Seq[Double]]))
      .toDF("a", "b")
    val out = df.selectExpr("graft_cosine(a, b) AS c")
      .select(col("c").isNull).as[Boolean].head()
    assert(out)
  }
}

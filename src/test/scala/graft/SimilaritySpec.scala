package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest, Prop}
import graft.sim.Similarity

class SimilaritySpec extends GraftSpec {
  import spark.implicits._

  test("cosine is 1 for self, within [-1, 1], symmetric (property)") {
    val gen = Gen.listOfN(8, Gen.choose(-10.0, 10.0))
      .suchThat(v => v.exists(_ != 0.0))
    val prop = Prop.forAllNoShrink(gen, gen) { (a, b) =>
      val df = Seq((a.toArray, b.toArray)).toDF("va", "vb")
        .select(Similarity.cosine("va", "vb").as("ab"),
          Similarity.cosine("vb", "va").as("ba"),
          Similarity.cosine("va", "va").as("self"))
      val r = df.as[(Double, Double, Double)].head()
      math.abs(r._1 - r._2) < 1e-12 &&
        r._1 >= -1.0 - 1e-12 && r._1 <= 1.0 + 1e-12 &&
        math.abs(r._3 - 1.0) < 1e-12
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(10), prop)
    assert(res.passed, res.status.toString)
  }

  test("topK returns k rows in non-increasing score order") {
    val e = Tables.embeddings(spark, sf())
    val top = Similarity.topK(e, e.filter(col("vec_id") === 0), 10)
      .as[(Long, Int, Double)].collect()
    assert(top.length == 10)
    assert(top.head._1 == 0L && top.head._3 == 1.0) // query itself first
    assert(top.sliding(2).forall(p => p(0)._3 >= p(1)._3))
  }

  test("centroid of identical vectors is that vector") {
    val df = Seq((1, Array(1.0f, 2.0f)), (1, Array(1.0f, 2.0f)))
      .toDF("label", "embedding")
    val c = Similarity.centroids(df).as[(Int, Array[Double])].head()
    assert(c._2.toSeq == Seq(1.0, 2.0))
  }
}

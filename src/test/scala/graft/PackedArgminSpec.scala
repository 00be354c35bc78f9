package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Test => SCTest, Prop}

/** Pins the BIGINT-packed argmin (r18 change 7, r19 hardening —
  * VERDICT r18 item 9 / ADVICE item 2): `min(d2q*nc + c) % nc` must
  * equal the struct-ordered `min_by(c, struct(d2q, c))` for every
  * input the operators can produce, including the FP-rounding edge
  * (a tiny negative d2q from the expanded dot form a·a − 2a·b + b·b)
  * that the greatest(·, 0) clamp normalizes.
  */
class PackedArgminSpec extends GraftSpec {
  import spark.implicits._

  private val nc = 16

  test("packed argmin == struct min_by over random (d2q, cell) rows") {
    val rowGen = for {
      d2q <- Gen.chooseNum(0L, (Long.MaxValue - nc) / nc)
      c <- Gen.choose(0, nc - 1)
    } yield (d2q, c)
    val groupGen = Gen.nonEmptyListOf(rowGen)
    val prop = Prop.forAllNoShrink(groupGen) { rows =>
      val df = rows.toDF("d2q", "c")
      val packed = df
        .agg((min(col("d2q") * nc + col("c")) % nc).cast("int")
          .as("cell")).as[Int].head()
      val structMin = df
        .agg(min_by(col("c"), struct(col("d2q"), col("c"))).as("cell"))
        .as[Int].head()
      packed == structMin
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("tie on d2q resolves to the lowest cell id, like the struct order") {
    val df = Seq((5L, 3), (5L, 1), (5L, 7), (6L, 0)).toDF("d2q", "c")
    val cell = df.agg((min(col("d2q") * nc + col("c")) % nc)
      .cast("int")).as[Int].head()
    assert(cell == 1)
  }

  test("greatest(d2q, 0) clamp: an FP-rounded negative cannot corrupt " +
    "the packing or the % decode") {
    // Without the clamp, (-1)*16 + 3 = -13 packs BELOW every true
    // zero-distance entry and (-13) % 16 = -13 is not even a cell id.
    val df = Seq((-1L, 3), (0L, 5), (2L, 0)).toDF("d2q", "c")
    val clamped = df.select(greatest(col("d2q"), lit(0L)).as("d2q"),
      col("c"))
    val cell = clamped.agg((min(col("d2q") * nc + col("c")) % nc)
      .cast("int")).as[Int].head()
    // clamp makes (-1, 3) ≡ (0, 3): beats (0, 5) on the tie-break.
    assert(cell == 3)
    // and the decoded value is a valid cell id on any clamped input
    assert(cell >= 0 && cell < nc)
  }

  test("overflow headroom: the documented d2q bound keeps the packed " +
    "key positive") {
    // Scaladoc bound (Similarity.pqTopK/semDedup): d2q ≤ Long.Max/nc
    // − nc. At the 1e6 fixed-point factor that is ‖v−cent‖² ≲ 5.7e11
    // — embedding coordinate norms up to ~10⁵, far above the unit-
    // scale fixture embeddings and any normalized production vector.
    val dMax = Long.MaxValue / nc - nc
    assert(dMax * nc + (nc - 1) > 0L)
    // just past Long.Max/nc the packed key wraps — the bound is tight
    // enough to matter, which is why it is pinned here
    val dWrap = Long.MaxValue / nc + 1
    assert(dWrap * nc + (nc - 1) < 0L)
  }
}

package graft

import org.apache.spark.sql.functions._
import graft.cassandra.CellModel

/** Properties of the Cassandra reconciliation operators (SURVEY §5
  * item 4).
  */
class CellSpec extends GraftSpec {
  import spark.implicits._

  private def cellDf(rows: Seq[(Long, Int, String, Long, Long)]) =
    rows.toDF("pk", "ck", "col", "value", "wt")

  test("C4 lww keeps max writetime, ties broken by larger value") {
    val cells = cellDf(Seq(
      (1L, 1, "qty", 10L, 100L),
      (1L, 1, "qty", 20L, 200L),   // newest wins
      (2L, 1, "qty", 5L, 100L),
      (2L, 1, "qty", 9L, 100L)))   // tie → larger value
    val merged = CellModel.lwwMerge(cells)
      .select("pk", "value").as[(Long, Long)].collect().toMap
    assert(merged == Map(1L -> 20L, 2L -> 9L))
  }

  test("C4 lww is idempotent and input-order-insensitive") {
    val base = CellModel.cells(spark, sf())
    val once = CellModel.lwwMerge(base)
    val twice = CellModel.lwwMerge(once)
    assert(once.except(twice).isEmpty && twice.except(once).isEmpty)
    val shuffled = CellModel.lwwMerge(base.orderBy(rand(7)))
    assert(once.except(shuffled).isEmpty && shuffled.except(once).isEmpty)
  }

  test("C5 tombstones shadow only cells at-or-before the deletion ts") {
    val cells = cellDf(Seq(
      (1L, 1, "qty", 10L, 100L),   // deleted (wt <= dts)
      (1L, 1, "qty", 30L, 400L),   // written after delete → survives
      (1L, 2, "qty", 11L, 100L),   // untouched cell
      (9L, 1, "qty", 12L, 100L)))  // partition-deleted
    val cellDel = Seq((1L, 1, "qty", 300L)).toDF("pk", "ck", "col", "dts")
    val partDel = Seq((9L, 500L)).toDF("pk", "pdts")
    val live = CellModel.tombstoneFilter(cells, cellDel, partDel)
      .select("pk", "ck", "value").as[(Long, Int, Long)].collect().toSet
    assert(live == Set((1L, 1, 30L), (1L, 2, 11L)))
  }

  test("C6 ttl expires exactly wt + ttl < qt") {
    val cells = cellDf(Seq(
      (11L, 1, "qty", 1L, CellModel.QueryTimeMs - CellModel.TtlMs - 1),
      (23L, 1, "qty", 2L, CellModel.QueryTimeMs - CellModel.TtlMs - 1),
      (11L, 2, "qty", 3L, CellModel.QueryTimeMs - CellModel.TtlMs)))
    // pk 11 carries a TTL (pk % 11 == 0) and its first cell is 1 ms too
    // old; pk 23 has no TTL so the same age survives.
    val live = CellModel.ttlFilter(cells)
      .select("pk", "ck").as[(Long, Int)].collect().toSet
    assert(live == Set((23L, 1), (11L, 2)))
  }

  test("C5b range tombstones shadow only covered (ck, wt) cells") {
    val cells = cellDf(Seq(
      (1L, 1, "qty", 10L, 100L),   // ck outside [2,4] → survives
      (1L, 2, "qty", 11L, 100L),   // inside range, wt <= rdts → deleted
      (1L, 4, "qty", 12L, 100L),   // inside range boundary → deleted
      (1L, 3, "qty", 13L, 400L),   // inside range, written after → survives
      (2L, 3, "qty", 14L, 100L)))  // other partition → survives
    val rd = Seq((1L, 2, 4, 300L)).toDF("pk", "ck_lo", "ck_hi", "rdts")
    val live = CellModel.rangeTombstoneFilter(cells, rd)
      .select("pk", "ck", "value").as[(Long, Int, Long)].collect().toSet
    assert(live == Set((1L, 1, 10L), (1L, 3, 13L), (2L, 3, 14L)))
  }

  test("C12/C13 map and set reassembly decode collection cells") {
    val cells = cellDf(Seq(
      (1L, 1, "qty", 5L, 100L), (1L, 1, "price", 9L, 100L),
      (1L, 2, "qty", 5L, 100L), (1L, 2, "qty", 7L, 200L)))
    val m = CellModel.reassembleMap(CellModel.lwwMerge(cells))
      .selectExpr("pk", "ck", "m['qty']", "m['price']")
      .as[(Long, Int, Option[Long], Option[Long])].collect().toSet
    assert(m == Set((1L, 1, Some(5L), Some(9L)),
      (1L, 2, Some(7L), None)))
    val set = CellModel.reassembleSet(cells)
      .select("elems").as[Seq[Long]].head()
    assert(set == Seq(5L, 7L)) // distinct + sorted
  }

  test("C10 counter merge sums shards instead of LWW") {
    val cells = cellDf(Seq(
      (1L, 1, "qty", 5L, 100L), (1L, 1, "qty", 7L, 200L)))
    val out = CellModel.counterMerge(cells)
      .select("counter", "n_shards").as[(Long, Long)].collect().toSeq
    assert(out == Seq((12L, 2L)))
  }

  test("C8/C9 parquet scan gets filter pushdown and column pruning") {
    val plan = Tables.lineitem(spark, sf())
      .filter(col("l_orderkey") === 3)
      .select(col("l_orderkey"), col("l_quantity"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_orderkey), " +
      "EqualTo(l_orderkey,3)]"), plan)
    assert(plan.contains("ReadSchema: struct<l_orderkey:bigint," +
      "l_quantity:double>"), plan)
  }
}

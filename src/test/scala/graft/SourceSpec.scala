package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.cassandra.CellModel
import graft.sources.CellSource

/** The DSv2 SSTable-lite source: snapshot round-trip, split pruning by
  * pk pushdown (C8), and column pruning (C9).
  */
class SourceSpec extends GraftSpec {
  import spark.implicits._

  private lazy val dir: String = {
    val d = Files.createTempDirectory("cells-snap").toString
    val cells = CellModel.cells(spark, sf())
      .as[(Long, Int, String, Long, Long)].collect().toSeq
    CellSource.writeSnapshot(d, cells, files = 8)
    d
  }

  private def read() = spark.read.format("graft.sources.CellSource").load(dir)

  test("snapshot round-trips through the DSv2 source") {
    val back = read()
    val orig = CellModel.cells(spark, sf())
    assert(back.count() == orig.count())
    assert(back.except(orig).isEmpty && orig.except(back).isEmpty)
  }

  test("pk pushdown prunes data files at planning time (C8)") {
    val all = read()
    assert(all.rdd.getNumPartitions == 8)
    val pk = CellModel.cells(spark, sf())
      .select(min(col("pk"))).as[Long].head()
    val one = read().filter(col("pk") === pk)
    // min pk lives in exactly the first sorted file → 7 files pruned.
    assert(one.rdd.getNumPartitions == 1)
    assert(one.count() > 0)
  }

  test("column pruning reaches the scan (C9)") {
    val plan = read().select(col("pk"), col("value"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("cols=pk,value"), plan)
  }

  test("reconciliation operators run unchanged on the DSv2 scan (C4)") {
    val viaSource = CellModel.lwwMerge(read())
    val viaParquet = CellModel.lwwMerge(CellModel.cells(spark, sf()))
    assert(viaSource.except(viaParquet).isEmpty &&
      viaParquet.except(viaSource).isEmpty)
  }
}

package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.Registry

/** Dev utility (r18): dump `explain("formatted")` for NAMED registry
  * queries into per-query files — the before/after plan evidence the
  * optimization rounds commit under plans/rNN/.
  *
  *   tools/run.sh graft.tools.PlanQ <sfDir> <outDir> <suffix> <q1,q2,..>
  *
  * Writes <outDir>/<query>_<suffix>.txt per query. Lifecycle queries
  * execute their statements while building the DataFrame (explain then
  * shows the final SELECT); loop-style queries (N_DEDUP10) show the
  * final-round plan — their round structure is code, not one plan.
  */
object PlanQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outDir = args(1)
    val suffix = args(2)
    val names = args(3).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = Registry.byName(n).fn(spark, sfDir)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${n}_$suffix.txt"),
        formatted.getBytes("UTF-8"))
      println(s"[planq] $n -> $outDir/${n}_$suffix.txt")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}

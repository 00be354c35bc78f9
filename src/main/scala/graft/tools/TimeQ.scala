package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: time named queries twice (cold/warm) at a given SF dir. */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // r18: no base-table pre-cache and clearCache() between runs — the
    // same per-query-independent methodology Bench now times with.
    names.foreach { n =>
      val fn = graft.Registry.byName(n).fn
      (1 to 2).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"[timeq] $n run$i: ${(System.nanoTime()-t0)/1e9}%.2fs rows=$c")
        try spark.catalog.clearCache() catch { case _: Throwable => }
      }
    }
    spark.stop()
  }
}

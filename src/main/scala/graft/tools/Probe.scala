package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only timing probe: fixed JVM/session cost vs per-query cost. */
object Probe {
  def main(args: Array[String]): Unit = {
    val t0 = System.nanoTime()
    def mark(s: String): Unit =
      println(f"[probe] $s: ${(System.nanoTime() - t0) / 1e9}%.1fs")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    mark("session up")
    val sf = "/root/testdata/sf0.001"
    spark.read.parquet(s"$sf/region.parquet").count()
    mark("first tiny count")
    graft.queries.Flagship.q1Pricing(spark, sf).count()
    mark("q1 first run")
    graft.queries.Flagship.q1Pricing(spark, sf).count()
    mark("q1 second run")
    graft.queries.Flagship.q1Pricing(spark, "/root/testdata/sf0.1").count()
    mark("q1 sf0.1")
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev-only: run one registry query by name N times (default 1),
  * print rows or the FULL stack on failure (Verify prints only the
  * message).
  */
object RunQ {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val n = if (args.length > 2) args(2).toInt else 1
    (1 to n).foreach { i =>
      println(s"[runq] pass $i")
      try graft.Registry.byName(args(0)).fn(spark, sf).show(100, false)
      catch { case e: Throwable => e.printStackTrace() }
    }
    spark.stop()
  }
}

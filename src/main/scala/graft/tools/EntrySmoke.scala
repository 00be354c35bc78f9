package graft.tools
import org.apache.spark.sql.SparkSession
object EntrySmoke {
  def main(a: Array[String]): Unit = {
    val s = SparkSession.builder().master("local[4]")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true").getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    println("[smoke] entry rows = " + graft.SparkEntry.entry(s).count())
    s.stop()
  }
}

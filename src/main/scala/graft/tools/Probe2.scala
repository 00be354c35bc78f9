package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.text.TextOps
import graft.dedup.Dedup
object Probe2 {
  def main(a: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[2]")
      .config("spark.ui.enabled","false").config("spark.sql.session.timeZone","UTC").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"))
      .toDF("id", "text")
      .select(col("id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("shingles", TextOps.shingles("toks"))
      .withColumn("sig", Dedup.minhashSignature("shingles"))
      .withColumn("bands", Dedup.lshBands("sig"))
    df.select("id", "shingles").show(false)
    df.select("id", "sig").show(false)
    df.select("id", "bands").show(false)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only r19 probe: which piece of the N_DEDUP4 graph owns the
  * 3-second single-task FileScan stage.
  */
object Probe3 {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(64).repartition(64)
      .selectExpr("lower('Warm')", "md5('warm')").collect()
    def t(label: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[probe3] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      spark.catalog.clearCache()
    }
    val docs = graft.Tables.documents(spark, sf)
      .select(col("doc_id").as("id"), col("text"))
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val base = docs.repartition(
        spark.sessionState.conf.numShufflePartitions, col("id"))
      .select(col("id"),
        graft.text.TextOps.tokens(col("text")).as("toks"))
    (1 to 2).foreach { _ =>
      t("scan only")(noop(docs))
      t("explode raw shingles")(noop(base.select(col("id"),
        explode(graft.text.TextOps.shingles("toks")).as("sh2"))))
      t("distinct then explode")(noop(base.select(col("id"),
        explode(array_distinct(
          graft.text.TextOps.shingles("toks"))).as("sh2"))))
      t("distinct+size+explode")(noop(base
        .withColumn("sh",
          array_distinct(graft.text.TextOps.shingles("toks")))
        .select(col("id"), size(col("sh")).as("n_sh"),
          explode(col("sh")).as("sh2"))))
      t("zip size explode")(noop(base
        .withColumn("sh",
          array_distinct(graft.text.TextOps.shingles("toks")))
        .select(col("id"), explode(expr(
          "transform(sh, x -> struct(x AS sh2, size(sh) AS n_sh))"))
          .as("t"))
        .select(col("id"), col("t.n_sh").as("n_sh"),
          col("t.sh2").as("sh2"))))
      t("shingleRows")(noop(graft.dedup.Dedup.shingleRows(docs)))
      t("sigs")(noop(graft.dedup.Dedup
        .minhashSignaturesRelational(docs)))
    }
    spark.stop()
  }
}

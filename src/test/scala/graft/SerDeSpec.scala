package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** SerDe / source-format coverage (the era stack read Text/Sequence/
  * RCFile through Hive SerDes; the modern equivalents are csv/json/orc
  * alongside parquet). Round-trips a real table through each format.
  */
class SerDeSpec extends GraftSpec {

  private lazy val nation = Tables.nation(spark, sf())
    .orderBy(col("n_nationkey"))

  private def roundTrip(fmt: String): Unit = {
    val dir = Files.createTempDirectory(s"serde-$fmt").toString + "/out"
    nation.write.format(fmt).option("header", "true").save(dir)
    val back = spark.read.format(fmt)
      .option("header", "true").option("inferSchema", "true").load(dir)
      .orderBy(col("n_nationkey"))
    assert(back.count() == 25)
    assert(back.select(col("n_name").cast("string")).collect().toSeq ==
      nation.select(col("n_name")).collect().toSeq, fmt)
  }

  test("csv round-trip (Text SerDe equivalent)") { roundTrip("csv") }
  test("json round-trip (JSON SerDe equivalent)") { roundTrip("json") }
  test("orc round-trip (RCFile/ORC lineage)") { roundTrip("orc") }

  test("parquet write partitioned by key (partitioned-table layout)") {
    val dir = Files.createTempDirectory("serde-part").toString + "/out"
    Tables.customer(spark, sf()).write
      .partitionBy("c_mktsegment").parquet(dir)
    val back = spark.read.parquet(dir)
    assert(back.count() == Tables.customer(spark, sf()).count())
    // partition pruning: scanning one segment reads only its directory
    val plan = back.filter(col("c_mktsegment") === "BUILDING")
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(c_mktsegment"), plan)
  }
}

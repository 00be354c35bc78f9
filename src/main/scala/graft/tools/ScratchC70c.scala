package graft.tools

import org.apache.spark.sql.SparkSession

/** Scratch probe (not part of the library surface): does a plain 2i
  * on a vector-valued (binary) data column build and probe?
  */
object ScratchC70c {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .appName("scratch").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val root = java.nio.file.Files.createTempDirectory("c70c").toString
    spark.conf.set("spark.sql.catalog.sc70", "graft.sources.CellCatalog")
    spark.conf.set("spark.sql.catalog.sc70.root", root)
    def cq(stmt: String) =
      graft.cql.Cql.catalogExecute(spark, stmt, "sc70")
    cq("CREATE KEYSPACE ks")
    cq("CREATE TABLE ks.emb (pk bigint, ck int, col text, " +
      "value vector<float, 2>, wt bigint)")
    cq("INSERT INTO ks.emb (pk, ck, v) VALUES (1, 1, [1.0, 0.0])")
    cq("INSERT INTO ks.emb (pk, ck, tag) VALUES (1, 1, [1.0, 1.0])")
    cq("INSERT INTO ks.emb (pk, ck, v) VALUES (2, 1, [0.9, 0.1])")
    cq("INSERT INTO ks.emb (pk, ck, tag) VALUES (2, 1, [0.0, 1.0])")
    try {
      cq("CREATE INDEX ON ks.emb (tag)")
      println("[scratch] CREATE INDEX ok")
      val hits = graft.sources.CellIndex.lookupPks(spark,
        s"$root/ks/emb_tag_idx",
        graft.functions.VectorCodec.encode(Array(1f, 1f)))
      println("[scratch] lookup pks = " +
        hits.collect().map(_.get(0)).mkString(","))
      val base = graft.sources.CellIndex.lookupBase(spark,
        s"$root/ks/emb_tag_idx".replace("emb_tag_idx", "emb"),
        s"$root/ks/emb_tag_idx",
        graft.functions.VectorCodec.encode(Array(1f, 1f)))
      println("[scratch] base rows = " + base.collect().length)
    } catch {
      case e: Throwable =>
        println("[scratch] FAILED: " + e)
        e.printStackTrace()
    }
    spark.stop()
  }
}

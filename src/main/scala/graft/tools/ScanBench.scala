package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: columnar vs row-at-a-time connector scan throughput over
  * a 5M-record snapshot (a full-decode aggregate so every record is
  * read). Measured 2026-08-12 on local[32]: columnar min 0.356 s /
  * med 0.365 s vs row min 0.376 s / med 0.396 s — ~6-8% faster; the
  * scan is deflate-bound, so the columnar win is the removed per-row
  * InternalRow allocation, and it grows with projection width.
  *
  *   tools/run.sh graft.tools.ScanBench
  */
object ScanBench {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // A row-bound workload: 5M records so per-record decode cost, not
    // chunk inflate setup, dominates.
    val snap = {
      val d = java.nio.file.Paths.get(
        "/root/repo/target/scanbench-5m")
      if (!java.nio.file.Files.exists(d.resolve("data-0007.cells"))) {
        val cells = (0L until 5000000L).map { i =>
          (i / 4, (i % 4).toInt, if (i % 2 == 0) "qty" else "price",
            i * 31 % 100000, i % 86400000)
        }
        graft.sources.CellSource.writeSnapshot(d.toString, cells, files = 8)
      }
      d.toString
    }
    def scan(columnar: Boolean) =
      spark.read.format("graft.sources.CellSource")
        .option("columnar", columnar.toString).load(snap)
        .agg(sum(col("value") + col("wt") + col("pk") + col("ck")))
    (1 to 2).foreach { _ => scan(true).collect(); scan(false).collect() }
    Seq(true, false).foreach { c =>
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        scan(c).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[scanbench] columnar=$c min=${times.min}%.3fs " +
        f"med=${times.sorted.apply(2)}%.3fs")
    }
    spark.stop()
  }
}

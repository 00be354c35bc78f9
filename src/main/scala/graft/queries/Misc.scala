package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{GQuery, Tables}

/** Remaining SURVEY §2 rows: the Shark-style in-memory cache surface
  * (Q_SRC2), TABLESAMPLE (Q_SAMP1), and seeded RNG (F_MATH2). The
  * latter two are declared rows-only (None oracle): RNG streams are
  * engine-specific (SURVEY §2 marks them ✗).
  */
object Misc {

  /** Q_SRC2 — CACHE TABLE: Shark's headline feature ([SHARK13] §3.2),
    * today `df.cache()` → InMemoryRelation (compressed columnar
    * batches). Plan-level cache reuse means later reads of the same
    * parquet path hit memory; results are identical to the uncached
    * oracle by construction.
    */
  private def cached(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).cache()
    o.count() // materialize the columnar cache
    o.filter(col("o_orderpriority") === "2-HIGH")
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))
  }

  private val cachedSql =
    """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
      |WHERE o_orderpriority = '2-HIGH' ORDER BY o_orderkey""".stripMargin

  /** Q_SAMP1 — TABLESAMPLE with a fixed seed: deterministic for one
    * engine+partitioning but not across engines → rows-only.
    */
  private def sampled(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).sample(withReplacement = false, 0.1, seed = 42)
      .select(col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_orderkey"))

  /** F_MATH2 — rand/randn with fixed seed: rows-only for the same
    * reason.
    */
  private def seededRand(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), rand(42).as("u"), randn(42).as("g"))
      .orderBy(col("doc_id"))

  /** Q_SRC1 — the bare parquet scan row of the inventory (every other
    * query exercises it implicitly; declared explicitly for the §2
    * checklist). Q_SNK1 (file sink) is the Verify harness itself —
    * every declared result is written through it.
    */
  private def parquetScan(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .orderBy(col("n_nationkey"))

  private val parquetScanSql =
    "SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"

  def all: Seq[GQuery] = Seq(
    GQuery("Q_SRC1_parquet_scan", parquetScan, Some(parquetScanSql)),
    GQuery("Q_SRC2_cache", cached, Some(cachedSql)),
    GQuery("Q_SAMP1_tablesample", sampled, None),
    GQuery("F_MATH2_rand", seededRand, None))
}

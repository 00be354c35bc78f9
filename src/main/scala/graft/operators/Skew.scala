package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for hot-key shuffles (SURVEY §4 scale toolkit).
  *
  * A hash-shuffle sends every row of one key to one partition; at
  * 100 TB a single hot key (the empty-string language, the null user,
  * the viral document) turns into one straggler task that dominates
  * the stage. Salting rewrites the key space: the probe side spreads
  * each key's rows across `nSalts` sub-keys via a deterministic
  * distributor column, the build side replicates each row to all
  * sub-keys — same join result, `nSalts`-way parallel hot keys.
  *
  * This is the manual form; AQE's skewJoin handles the same case
  * adaptively for sort-merge joins when statistics reveal the skew at
  * runtime. The manual form matters when the skew is known up front
  * (so the first run is already balanced) or the operator is an
  * aggregation (AQE skew handling doesn't cover aggs).
  */
object Skew {

  private val SaltCol = "__graft_salt"

  /** Salted inner equi-join. `distributor` is any probe-side column
    * whose hash spreads rows of one key (a line number, an event id —
    * NOT the key itself); determinism comes from hashing it rather
    * than from RNG, so results are stable across retries.
    */
  def saltedJoin(probe: DataFrame, build: DataFrame, probeKey: String,
      buildKey: String, distributor: String, nSalts: Int): DataFrame = {
    val salted = probe.withColumn(SaltCol,
      pmod(hash(col(distributor)), lit(nSalts)))
    val replicated = build.withColumn(SaltCol,
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated,
        salted(probeKey) === replicated(buildKey) &&
          salted(SaltCol) === replicated(SaltCol))
      .drop(SaltCol)
  }

  /** Salted two-phase aggregation: partial aggregate on (key, salt),
    * final aggregate on key. For algebraic aggregates Spark's own
    * partial aggregation already does this map-side; the salted form
    * additionally splits the REDUCE side of a hot key, which matters
    * for high-cardinality-input aggs (collect/distinct) where one
    * reducer would otherwise hold the whole hot key's data.
    * Demonstrated for sum/count (mergeable by addition).
    */
  def saltedSumCount(df: DataFrame, key: String, valueCol: String,
      distributor: String, nSalts: Int): DataFrame =
    df.withColumn(SaltCol, pmod(hash(col(distributor)), lit(nSalts)))
      .groupBy(col(key), col(SaltCol))
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
      .groupBy(col(key))
      .agg(sum(col("__psum")).as("sum_value"),
        sum(col("__pcnt")).cast("long").as("n"))
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism barriers for CPU-dense pipeline stages (r19).
  *
  * The r18 "distribute-before-explode" barriers used
  * `repartition(col(key))` — a REPARTITION_BY_COL exchange that AQE's
  * size-based partition coalescing is free to merge. Size-based
  * coalescing is the right default for byte-bound stages, but it is
  * blind to CPU density: the barrier'd text/hash pipelines do
  * seconds of per-byte work (explode to shingles/trigrams, two md5
  * digests per element, per-key aggregation) over megabytes of
  * input, and at fixture scale AQE folded the post-barrier stage
  * back to ONE task — exactly the single-thread bottleneck the
  * barrier was built to remove (StageStats r19: N_DEDUP4's signature
  * stage ran 1 task × 2.4 s while its cached twin ran 32 × 80 ms).
  *
  * `Distribute.by` pins the barrier with an EXPLICIT partition count
  * (REPARTITION_BY_NUM is exempt from AQE coalescing) equal to the
  * session's `spark.sql.shuffle.partitions` — the same
  * scale-parameterized knob everything else follows ($SPARK_GRAFT_CPUS
  * locally, the cluster's setting in production). At 100 TB the
  * barrier carries enough bytes that AQE would not have coalesced it
  * anyway; this changes nothing there except determinism of the
  * stage width.
  */
object Distribute {
  def by(df: DataFrame, cols: Column*): DataFrame =
    df.repartition(
      df.sparkSession.sessionState.conf.numShufflePartitions, cols: _*)
}

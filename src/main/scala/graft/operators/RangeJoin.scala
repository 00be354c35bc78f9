package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Binned range join — the scalable shape for interval joins with NO
  * shared equi key (SURVEY §4 scale toolkit; Q_JOIN15).
  *
  * A range-only join (`l.ts BETWEEN r.lo AND r.hi`) gives Catalyst no
  * equi conjunct, so it plans BroadcastNestedLoopJoin (fine while one
  * side broadcasts) or CartesianProduct (never fine). At 100 TB with
  * both sides large, the right plan is the time-binning rewrite every
  * large-scale engine uses for interval overlap:
  *
  *   - each POINT row gets one fixed-width bin: floor(epoch / width);
  *   - each INTERVAL row is exploded to every bin its [lo, hi] span
  *     overlaps (bounded-span intervals → bounded fan-out);
  *   - equi-join on the bin (an ordinary hash shuffle both sides can
  *     partition by), then re-apply the exact range predicate.
  *
  * A point row has exactly one bin, so a qualifying (interval, point)
  * pair meets in exactly one bin — no post-join dedup. Hot bins (load
  * spikes) are ordinary join skew: AQE's skew-join split or
  * [[Skew.saltedJoin]] apply unchanged because the bin IS an equi key.
  */
object RangeJoin {

  private val BinCol = "__graft_bin"

  /** Join `points` (event-time rows) to `intervals` ([lo, hi] rows).
    * Returns matched pairs: all columns of both inputs. `width` is the
    * bin width in seconds; choose it near the typical interval span so
    * the interval-side fan-out stays at ~2 bins per row.
    */
  def binned(points: DataFrame, pointTs: Column,
      intervals: DataFrame, lo: Column, hi: Column,
      width: Long): DataFrame = {
    val binOf = (c: Column) => floor(unix_timestamp(c) / width)
    val p = points.withColumn(BinCol, binOf(pointTs))
    val iv = intervals.withColumn(BinCol,
      explode(sequence(binOf(lo), binOf(hi))))
    p.join(iv, p(BinCol) === iv(BinCol) &&
        pointTs >= lo && pointTs <= hi)
      .drop(BinCol)
  }
}

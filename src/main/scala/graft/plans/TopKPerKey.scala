package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute,
  Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution,
  Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy,
  UnaryExecNode}

/** Whole-operator custom plan: per-key top-k (first k rows per key
  * under `order`) as a native logical node + planner strategy + a
  * two-phase physical operator — the (c)-tier extension mechanism
  * (`LogicalPlan` + `SparkStrategy` + `SparkPlan`, registered through
  * `SparkSessionExtensions.injectPlannerStrategy`).
  *
  * Why it earns a custom operator: the stock formulation
  * (`row_number().over(Window.partitionBy(keys).orderBy(order)) <= k`)
  * shuffles EVERY input row to its key's reducer before any row can be
  * discarded. This operator plans two phases:
  *
  *   1. partial (pre-shuffle): each input partition locally sorts on
  *      (keys, order) — the same local sort the window variant performs
  *      on the reducer side — and keeps at most k rows per key, so the
  *      exchange carries ≤ k·|keys present| rows per partition instead
  *      of all of them;
  *   2. final (post-shuffle): rows of one key meet in one partition
  *      (`ClusteredDistribution`), are re-sorted (EnsureRequirements
  *      inserts the sort from `requiredChildOrdering`), and the same
  *      group-scan keeps the global first k per key.
  *
  * At 100 TB the shuffle IS the cost: for k=3 over a billion rows per
  * key-group the partial phase sends thousands of rows where the window
  * form sends a billion. Algebraically this is the same partial/final
  * split Spark applies to aggregates — top-k per key is a distributive
  * "aggregate" whose partial state is its local top-k.
  *
  * Semantics: row_number-style (ties broken by `order`, which callers
  * make total by appending a unique key), output = child columns
  * unchanged, rows of a key emitted contiguously in `order`.
  */
case class TopKPerKey(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k > 0, s"k must be positive, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerKey = copy(child = newChild)
}

/** Plans [[TopKPerKey]] as partial + final [[TopKPerKeyExec]]. */
class TopKStrategy(session: SparkSession) extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKey(keys, order, k, child) =>
      val partial =
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))
      TopKPerKeyExec(keys, order, k, partial = false, partial) :: Nil
    case _ => Nil
  }
}

/** Group-scan over (keys, order)-sorted input keeping the first k rows
  * of every key run. `partial = true` runs pre-exchange on arbitrary
  * partitioning (local prune); `partial = false` demands
  * `ClusteredDistribution(keys)` so EnsureRequirements inserts the
  * hash exchange (and re-sort) between the two phases.
  */
case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(keys) :: Nil

  private def scanOrder: Seq[SortOrder] =
    keys.map(SortOrder(_, Ascending)) ++ order

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(scanOrder)

  override def outputOrdering: Seq[SortOrder] = scanOrder

  override def outputPartitioning = child.outputPartitioning

  override def nodeName: String =
    if (partial) "GraftTopKPerKeyPartial" else "GraftTopKPerKeyFinal"

  protected override def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val keyExprs = keys
    val limit = k
    child.execute().mapPartitions({ iter =>
      // Input is sorted by (keys, order): one forward scan, O(1) state.
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      var currentKey: UnsafeRow = null
      var emitted = 0
      iter.filter { row =>
        val key = keyProj(row)
        if (currentKey == null || key != currentKey) {
          currentKey = key.copy() // proj buffer is reused; detach
          emitted = 1
          true
        } else {
          emitted += 1
          emitted <= limit
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerKeyExec = copy(child = newChild)
}
